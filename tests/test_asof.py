"""Edge cases for the as-of join composition (operators/asof.py):
no-prior-right → null, inclusive same-timestamp semantics, per-key
isolation, and multiple value columns."""

from __future__ import annotations

import datetime as dt

from arango_etl_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_asof_basic_and_null_before_first_right(spark):
    left = spark.createDataFrame(
        [("k1", ts(5), 100), ("k1", ts(15), 101), ("k1", ts(1), 102)],
        "key string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [("k1", ts(3), 1, 30.0), ("k1", ts(10), 2, 31.0)],
        "key string, ts timestamp, rid int, quote double",
    )
    out = {
        r["lid"]: r["quote_asof"]
        for r in asof_join(
            left, right, ["key"], "ts", ["quote"], tiebreak_col="rid"
        ).collect()
    }
    assert out == {102: None, 100: 30.0, 101: 31.0}


def test_asof_inclusive_same_timestamp(spark):
    left = spark.createDataFrame(
        [("k1", ts(10), 1)], "key string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("k1", ts(10), 1, 42.0)], "key string, ts timestamp, rid int, quote double"
    )
    out = asof_join(
        left, right, ["key"], "ts", ["quote"], tiebreak_col="rid"
    ).collect()
    assert out[0]["quote_asof"] == 42.0  # right row at identical ts is visible


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame(
        [("a", ts(10), 1), ("b", ts(10), 2)], "key string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("a", ts(5), 1, 1.0)], "key string, ts timestamp, rid int, quote double"
    )
    out = {
        r["lid"]: r["quote_asof"]
        for r in asof_join(
            left, right, ["key"], "ts", ["quote"], tiebreak_col="rid"
        ).collect()
    }
    assert out == {1: 1.0, 2: None}


def test_asof_multiple_value_columns(spark):
    left = spark.createDataFrame(
        [("k", ts(10), 1)], "key string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("k", ts(4), 1, 7.0, "x"), ("k", ts(8), 2, 9.0, "y")],
        "key string, ts timestamp, rid int, quote double, tag string",
    )
    out = asof_join(
        left, right, ["key"], "ts", ["quote", "tag"], tiebreak_col="rid"
    ).collect()[0]
    assert (out["quote_asof"], out["tag_asof"]) == (9.0, "y")


def test_asof_synthesized_tiebreak_not_in_output(spark):
    """Right-only tiebreak: the all-null column synthesized on the left for
    ordering must not leak into the output schema (round-1 ADVICE)."""
    left = spark.createDataFrame(
        [("k1", ts(5), 100)], "key string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("k1", ts(3), 1, 30.0)],
        "key string, ts timestamp, rid int, quote double",
    )
    out = asof_join(left, right, ["key"], "ts", ["quote"], tiebreak_col="rid")
    assert "rid" not in out.columns
    assert out.collect()[0]["quote_asof"] == 30.0


def test_asof_value_col_clash_raises(spark):
    """A value_col already present on the left would be silently
    null-clobbered — must raise instead."""
    import pytest

    left = spark.createDataFrame(
        [("k1", ts(5), 1.0)], "key string, ts timestamp, quote double"
    )
    right = spark.createDataFrame(
        [("k1", ts(3), 30.0)], "key string, ts timestamp, quote double"
    )
    with pytest.raises(ValueError, match="already exist"):
        asof_join(left, right, ["key"], "ts", ["quote"])
