"""Single-threaded reference reducer — the correctness oracle (FIXTURES.md §4).

Given the change-event log, compute the expected final table state with
DuckDB (no Spark involved): per doc_id take the winning event under the
canonical LWW order (seq_no, event_ts, batch_id, op — max wins; residual
ties are duplicate deliveries with identical payloads), drop docs whose
winner is a delete.

This is the deterministic re-statement of what the reference achieves only
probabilistically via commutative UPSERT races
(/root/reference/src/handler/arangodb.rs:223-225 — arrival-order LWW,
a hazard fixed here per SURVEY.md §4.3.3).
"""

from __future__ import annotations

import duckdb
import pandas as pd

LWW_ORDER_SQL = "seq_no DESC, event_ts DESC, batch_id DESC, op DESC"


def reduce_events_duckdb(events_glob: str, extra_cols: tuple[str, ...] = ()) -> pd.DataFrame:
    """Final state from raw event parquet files (hive-partitioned dirs ok)."""
    extra = "".join(f", {c}" for c in extra_cols)
    q = f"""
        WITH ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY {LWW_ORDER_SQL}
            ) AS rn
            FROM read_parquet('{events_glob}', hive_partitioning=true,
                              union_by_name=true)
        )
        SELECT doc_id, tokens, n_tok, source{extra}
        FROM ranked WHERE rn = 1 AND op <> 'delete'
        ORDER BY doc_id
    """
    return duckdb.sql(q).df()


def reduce_events_pandas(events: pd.DataFrame, extra_cols: tuple[str, ...] = ()) -> pd.DataFrame:
    """Same reduction in pure pandas (independent second oracle)."""
    df = events.copy()
    df = df.sort_values(
        ["doc_id", "seq_no", "event_ts", "batch_id", "op"],
        ascending=[True, False, False, False, False],
        kind="mergesort",
    )
    winners = df.groupby("doc_id", as_index=False).first()
    winners = winners[winners["op"] != "delete"]
    cols = ["doc_id", "tokens", "n_tok", "source", *extra_cols]
    return (
        winners[cols].sort_values("doc_id").reset_index(drop=True)
    )


def assert_states_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Order-insensitive equality with token-array comparison (the per-row
    invariant from BASELINE.json input_hint)."""
    a = actual.sort_values("doc_id").reset_index(drop=True)
    e = expected.sort_values("doc_id").reset_index(drop=True)
    assert list(a["doc_id"]) == list(e["doc_id"]), (
        f"doc_id sets differ: {len(a)} vs {len(e)} rows; "
        f"only-actual={set(a['doc_id']) - set(e['doc_id'])} "
        f"only-expected={set(e['doc_id']) - set(a['doc_id'])}"
    )
    for col in e.columns:
        if col == "tokens":
            continue
        av, ev = list(a[col]), list(e[col])
        mism = [
            (d, x, y)
            for d, x, y in zip(a["doc_id"], av, ev)
            if not (x == y or (pd.isna(x) and pd.isna(y)))
        ]
        assert not mism, f"column {col}: {len(mism)} mismatches, first 5: {mism[:5]}"
    for d, x, y in zip(a["doc_id"], a["tokens"], e["tokens"]):
        xs = [] if x is None else list(x)
        ys = [] if y is None else list(y)
        assert xs == ys, f"token-array mismatch for {d}: {xs[:8]}… vs {ys[:8]}…"
