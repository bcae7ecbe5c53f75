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


# ---------------------------------------------------------- range join
def _rj_frames(spark):
    facts = spark.createDataFrame(
        [(1, ts(0)), (2, ts(3599)), (3, ts(3600)),
         (4, ts(7199)), (5, ts(10800))],
        "event_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [("a", ts(0), ts(3600)),        # [0, 3600)
         ("b", ts(3600), ts(7200)),     # [3600, 7200) — starts on boundary
         ("c", ts(3500), ts(3700))],    # straddles a bin boundary
        "iv string, start_ts timestamp, end_ts timestamp",
    )
    return facts, ivs


def test_range_join_half_open_and_bin_edges(spark):
    """[start, end): boundary fact joins the STARTING interval only; an
    interval straddling a bin edge matches facts in both bins; each pair
    appears exactly once despite multi-bin registration."""
    from arango_etl_spark.operators.rangejoin import range_join

    facts, ivs = _rj_frames(spark)
    got = {
        (r["event_id"], r["iv"])
        for r in range_join(facts, ivs, bin_seconds=3600).collect()
    }
    assert got == {
        (1, "a"), (2, "a"),        # 3599 in [0,3600); NOT in b
        (2, "c"), (3, "c"),        # c straddles the 3600 bin edge
        (3, "b"), (4, "b"),        # 3600 exactly → b, not a
    }


def test_range_join_subsecond_end(spark):
    """Millisecond binning: an interval ending at x.5s still catches a
    fact at x.3s (a seconds-truncated bin key would miss it)."""
    from arango_etl_spark.operators.rangejoin import range_join

    facts = spark.createDataFrame(
        [(1, ts(7200) + dt.timedelta(milliseconds=300))],
        "event_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [("s", ts(7100), ts(7200) + dt.timedelta(milliseconds=500))],
        "iv string, start_ts timestamp, end_ts timestamp",
    )
    got = range_join(facts, ivs, bin_seconds=3600).collect()
    assert [(r["event_id"], r["iv"]) for r in got] == [(1, "s")]


def test_range_join_left_keeps_unmatched(spark):
    from arango_etl_spark.operators.rangejoin import range_join

    facts, ivs = _rj_frames(spark)
    rows = range_join(facts, ivs, bin_seconds=3600, how="left").collect()
    by_event: dict = {}
    for r in rows:
        by_event.setdefault(r["event_id"], []).append(r["iv"])
    assert sorted(by_event[5]) == [None]          # outside every interval
    assert sorted(by_event[2]) == ["a", "c"]
    assert len(rows) == 7                          # 6 matches + 1 null row


def test_range_join_rejects_unknown_how(spark):
    import pytest

    from arango_etl_spark.operators.rangejoin import range_join

    facts, ivs = _rj_frames(spark)
    with pytest.raises(ValueError, match="inner/left"):
        range_join(facts, ivs, how="full")


def test_range_join_bin_blowup_guard(spark):
    from arango_etl_spark.operators.rangejoin import range_join

    facts = spark.createDataFrame(
        [(1, ts(100))], "event_id long, ts timestamp"
    )
    wide = spark.createDataFrame(
        [("y", ts(0), ts(366 * 24 * 3600))],   # a year-wide interval
        "iv string, start_ts timestamp, end_ts timestamp",
    )
    import pytest

    with pytest.raises(Exception, match="widen bin_seconds"):
        range_join(facts, wide, bin_seconds=1,
                   max_bins_per_interval=10_000).collect()
    # same interval passes with a deliberate higher cap / coarser bins
    ok = range_join(facts, wide, bin_seconds=24 * 3600).collect()
    assert [(r["event_id"], r["iv"]) for r in ok] == [(1, "y")]
