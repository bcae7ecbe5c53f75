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


# ---------------------------------------------------------------- as-of join
@st.composite
def asof_cases(draw):
    keys = ["a", "b"]
    n_l = draw(st.integers(1, 8))
    n_r = draw(st.integers(0, 8))
    left = [
        (draw(st.sampled_from(keys)), TS0 + dt.timedelta(seconds=draw(st.integers(0, 9))), i)
        for i in range(n_l)
    ]
    right = [
        (
            draw(st.sampled_from(keys)),
            TS0 + dt.timedelta(seconds=draw(st.integers(0, 9))),
            draw(st.integers(0, 5)),  # rid tiebreak (may collide; value keyed off it)
            float(draw(st.integers(0, 100))),
        )
        for _ in range(n_r)
    ]
    # dedupe right on (key, ts, rid): colliding tiebreaks are undefined order
    right = list({(k, ts, rid): (k, ts, rid, v) for k, ts, rid, v in right}.values())
    return left, right


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=asof_cases())
def test_asof_matches_bruteforce(spark, case):
    """asof_join == per-row brute force: latest right (ts, rid) at-or-before
    each left ts per key (inclusive semantics, right-only tiebreak)."""
    from arango_etl_spark.operators.asof import asof_join

    left_rows, right_rows = case
    left = spark.createDataFrame(
        left_rows, "key string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        right_rows or [("_none_", TS0, 0, 0.0)],
        "key string, ts timestamp, rid int, quote double",
    )
    out = {
        r["lid"]: r["quote_asof"]
        for r in asof_join(
            left, right, ["key"], "ts", ["quote"], tiebreak_col="rid"
        ).collect()
    }
    for k, lts, lid in left_rows:
        cands = [
            (ts, rid, v) for (rk, ts, rid, v) in (right_rows or [])
            if rk == k and ts <= lts
        ]
        want = max(cands)[2] if cands else None
        assert out[lid] == want, (k, lts, lid, cands)


# ----------------------------------------------------------------- geo cells
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
            st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_geo_cell_invariants(spark, pts):
    """Any point: its cell's bounding box contains it (clamped at the
    poles/antimeridian), and parent indices == child indices >> shift."""
    import json as _json

    from arango_etl_spark.operators import geo

    df = spark.createDataFrame(
        [(i, la, ln) for i, (la, ln) in enumerate(pts)],
        "id long, lat double, lng double",
    )
    eps = 1e-9  # box edges recomputed from indices: allow 1 ulp-ish slack
    for r in geo.geo_enrich(df, "lat", "lng", res=8, parent_res=3).collect():
        poly = _json.loads(r["geojson"])["coordinates"][0]
        (w, s), (e, n) = poly[0], poly[2]
        lat, lng = pts[r["id"]]
        assert w - eps <= lng <= e + eps, (lng, w, e)
        assert s - eps <= lat <= n + eps, (lat, s, n)
        _, x, y = r["cell"].split("_")
        _, px, py = r["parent_cell"].split("_")
        assert (int(x) >> 5, int(y) >> 5) == (int(px), int(py))


# ---------------------------------------------------------------- range join
@st.composite
def _interval_cases(draw):
    n_facts = draw(st.integers(1, 25))
    n_ivs = draw(st.integers(1, 10))
    facts = [
        (i, draw(st.integers(0, 10_000)))          # ts in seconds*10
        for i in range(n_facts)
    ]
    ivs = []
    for j in range(n_ivs):
        a = draw(st.integers(0, 10_000))
        b = draw(st.integers(0, 10_000))
        lo, hi = min(a, b), max(a, b)
        ivs.append((j, lo, hi + draw(st.integers(0, 5))))
    return facts, ivs


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_interval_cases())
def test_range_join_equals_naive_inequality_join(spark, case):
    """For ANY fact/interval arrangement (zero-length, bin-straddling,
    duplicate, nested, far-apart intervals) the binned range join must
    produce the exact pair set of the naive inequality join, at a bin
    width that is never aligned with the data."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from arango_etl_spark.operators.rangejoin import range_join

    facts, ivs = case
    t0 = _dt.datetime(2024, 1, 1)

    def ts(deciseconds):
        return t0 + _dt.timedelta(milliseconds=100 * deciseconds)

    fdf = spark.createDataFrame(
        [(i, ts(s)) for i, s in facts], "event_id long, ts timestamp"
    )
    idf = spark.createDataFrame(
        [(j, ts(a), ts(b)) for j, a, b in ivs],
        "iv long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["event_id"], r["iv"])
        for r in range_join(fdf, idf, bin_seconds=7).collect()
    }
    naive = {
        (i, j)
        for i, s in facts
        for j, a, b in ivs
        if a <= s < b
    }
    assert got == naive


# ------------------------------------------------------------ quantization
@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_quantize_roundtrip_bound(spark, vecs):
    """Any float32 vector (negatives, zeros, tiny/huge magnitudes):
    components land in [-127, 127] and dequantization error per
    component is <= scale/2 (the half-step bound of round-to-nearest)."""
    from arango_etl_spark.operators.similarity import quantize_embeddings

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    import numpy as np

    for i, v in rows:
        q = got[i]
        v32 = [float(np.float32(x)) for x in v]
        assert all(-127 <= c <= 127 for c in q["qvec"]), q
        sc = q["q_scale"]
        assert sc > 0
        for qc, vc in zip(q["qvec"], v32):
            assert abs(qc * sc - vc) <= sc / 2 * (1 + 1e-12)
