"""Property-based replay equality: ANY small change-event log — arbitrary
ops, out-of-order seq_nos, ties, deletes, random batch splits — replays
through the engine to exactly the pandas-oracle state.

Residual-tie rule: events agreeing on the whole (seq_no, event_ts,
batch_id, op) tuple must carry identical payloads (duplicate delivery);
the strategy canonicalizes generated events accordingly, mirroring the
engine's documented contract (SURVEY.md §2.6)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arango_etl_spark.operators.merge_into import apply_changes
from arango_etl_spark.oracle import assert_states_equal, reduce_events_pandas
from arango_etl_spark.plans.lakehouse import SnapshotTable
from tests.test_merge import PAYLOAD_SCHEMA, mk_events

TS0 = dt.datetime(2024, 1, 1)


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    events = []
    seen_keys = {}
    for _ in range(n):
        doc = f"d{draw(st.integers(0, 7))}"
        seq = draw(st.integers(0, 15))
        ts = TS0 + dt.timedelta(seconds=draw(st.integers(0, 5)))
        batch = draw(st.integers(0, 2))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        key = (doc, seq, ts, batch, op)
        if key in seen_keys:
            # duplicate delivery: identical payload required
            events.append(seen_keys[key])
            continue
        if op == "delete":
            toks = None
        else:
            toks = draw(
                st.lists(st.integers(0, 99), min_size=1, max_size=5)
            )
        row = (
            op, doc, seq, toks, None if toks is None else len(toks),
            f"src_{draw(st.integers(0, 2))}", batch, ts,
        )
        seen_keys[key] = row
        events.append(row)
    split = draw(st.integers(0, len(events)))
    return events[:split], events[split:]


@pytest.mark.parametrize("strategy", ["mor", "cow"])
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # stable examples run-to-run (CI determinism)
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=event_logs())
def test_any_log_matches_oracle(spark, tmp_path_factory, strategy, log):
    first, second = log
    tmp = tmp_path_factory.mktemp(f"prop_{strategy}")
    t = SnapshotTable.create(
        str(tmp / "t"), PAYLOAD_SCHEMA, key_col="doc_id", n_buckets=4
    )
    if first:
        apply_changes(spark, t, mk_events(spark, first), strategy=strategy)
    if second:
        apply_changes(spark, t, mk_events(spark, second), strategy=strategy)

    all_events = mk_events(spark, first + second).toPandas()
    expected = reduce_events_pandas(all_events)
    assert_states_equal(t.read(spark).toPandas(), expected)
