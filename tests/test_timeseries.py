"""Unit tests for operators/timeseries.resample (gap-filled
time-bucket resampling with last-observation-carried-forward)."""
from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from arango_etl_spark.operators.timeseries import resample

_EPOCH0 = 1767225600  # 2026-01-01T00:00:00Z, divisible by the bucket widths


def _ts(sec: int) -> datetime:
    return datetime.fromtimestamp(_EPOCH0 + sec, tz=timezone.utc).replace(
        tzinfo=None
    )


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts timestamp, v double, eid bigint"
    )


def _grid(out):
    rows = out.select(
        "k",
        (F.unix_timestamp("bucket_ts") - F.lit(_EPOCH0)).alias("off"),
        "value",
        "filled",
    ).collect()
    return {(r.k, r.off): (r.value, r.filled) for r in rows}


def test_resample_fills_gaps_per_key(spark):
    df = _df(spark, [
        ("a", _ts(5), 1.0, 1),     # bucket 0
        ("a", _ts(35), 2.0, 2),    # bucket 3
        ("b", _ts(15), 5.0, 3),    # bucket 1
    ])
    got = _grid(resample(df, "k", "ts", "v", 10, tiebreak_col="eid"))
    assert got[("a", 0)] == (1.0, False)
    assert got[("a", 10)] == (1.0, True)
    assert got[("a", 20)] == (1.0, True)
    assert got[("a", 30)] == (2.0, False)
    assert got[("b", 0)] == (None, False)   # before first obs: no fill
    assert got[("b", 10)] == (5.0, False)
    assert got[("b", 30)] == (5.0, True)
    assert len(got) == 8  # 2 keys x 4 buckets


def test_resample_last_obs_wins_in_bucket(spark):
    df = _df(spark, [
        ("a", _ts(1), 1.0, 1),
        ("a", _ts(9), 9.0, 2),     # same bucket, later ts wins
        ("a", _ts(9), 7.0, 1),     # tie on ts: higher eid wins -> 9.0
    ])
    out = resample(df, "k", "ts", "v", 10, tiebreak_col="eid").collect()
    assert len(out) == 1 and out[0].value == 9.0


def test_resample_guard_trips_lazily(spark):
    df = _df(spark, [
        ("a", _ts(0), 1.0, 1),
        ("a", _ts(1000), 2.0, 2),
    ])
    q = resample(df, "k", "ts", "v", 1, max_buckets=10)  # plan OK
    with pytest.raises(Exception, match="max_buckets"):
        q.collect()  # guard fires at execution


def test_resample_empty_input(spark):
    df = _df(spark, [])
    assert resample(df, "k", "ts", "v", 10).count() == 0


def test_resample_linear_interpolation(spark):
    df = _df(spark, [
        ("a", _ts(5), 1.0, 1),     # bucket 0
        ("a", _ts(45), 9.0, 2),    # bucket 4
        ("b", _ts(15), 5.0, 3),    # bucket 1, single obs
    ])
    got = _grid(resample(df, "k", "ts", "v", 10, tiebreak_col="eid",
                         method="linear"))
    assert got[("a", 0)] == (1.0, False)
    assert got[("a", 10)] == (3.0, True)
    assert got[("a", 20)] == (5.0, True)
    assert got[("a", 30)] == (7.0, True)
    assert got[("a", 40)] == (9.0, False)
    # single observation: nothing to interpolate outside it
    assert got[("b", 0)] == (None, False)
    assert got[("b", 10)] == (5.0, False)
    assert got[("b", 20)] == (None, False)   # no extrapolation past last
    assert got[("b", 40)] == (None, False)


def test_resample_method_validation(spark):
    df = _df(spark, [("a", _ts(0), 1.0, 1)])
    with pytest.raises(ValueError, match="method"):
        resample(df, "k", "ts", "v", 10, method="spline")
