"""Unit tests for operators/timeseries.py — gap filling, OHLC bars.

Synthetic frames pin the semantic edges the catalog queries (which run
on dense-ish driver data) can't isolate: interior gaps, leading NULLs,
timestamp ties on bar boundaries, single-row bars.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hobbes_spark.operators.timeseries import daily_spine, gap_fill_ffill, ohlc


def _d(s):
    return dt.date.fromisoformat(s)


@pytest.fixture(scope="module")
def sparse(spark):
    rows = [
        ("a", _d("2024-01-01"), 2, 10.0),
        ("a", _d("2024-01-04"), 1, 40.0),
        ("b", _d("2024-01-02"), 3, 7.0),
    ]
    return spark.createDataFrame(rows, "k string, d date, n_obs long, v double")


def test_daily_spine_is_per_key_dense(spark, sparse):
    out = {
        (r["k"], str(r["d"]))
        for r in daily_spine(sparse, ["k"], "d").collect()
    }
    assert out == {
        ("a", "2024-01-01"), ("a", "2024-01-02"),
        ("a", "2024-01-03"), ("a", "2024-01-04"),
        ("b", "2024-01-02"),
    }


def test_gap_fill_carries_value_and_zero_fills_count(spark, sparse):
    out = gap_fill_ffill(sparse, ["k"], "d", ["v"], count_col="n_obs")
    got = {(r["k"], str(r["d"])): (r["n_obs"], r["v"]) for r in out.collect()}
    assert got[("a", "2024-01-01")] == (2, 10.0)
    assert got[("a", "2024-01-02")] == (0, 10.0)  # filled forward
    assert got[("a", "2024-01-03")] == (0, 10.0)
    assert got[("a", "2024-01-04")] == (1, 40.0)  # new observation wins
    assert got[("b", "2024-01-02")] == (3, 7.0)  # single-day key: spine = 1 row


def test_gap_fill_no_cross_key_bleed(spark):
    # key "b" starts after "a" ends; its first row must NOT inherit a's value
    rows = [
        ("a", _d("2024-01-01"), 1, 5.0),
        ("b", _d("2024-01-03"), 1, 9.0),
    ]
    df = spark.createDataFrame(rows, "k string, d date, n_obs long, v double")
    out = gap_fill_ffill(df, ["k"], "d", ["v"])
    got = {(r["k"], str(r["d"])): r["v"] for r in out.collect()}
    assert got == {("a", "2024-01-01"): 5.0, ("b", "2024-01-03"): 9.0}


@pytest.fixture(scope="module")
def ticks(spark):
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        # same-timestamp tie on the open: id 1 < id 2 must win "open"
        ("x", t0, 1, 100.0),
        ("x", t0, 2, 101.0),
        ("x", t0 + dt.timedelta(hours=1), 3, 95.0),
        ("x", t0 + dt.timedelta(hours=2), 4, 103.0),
        # next day, single tick: open == close == high == low
        ("x", t0 + dt.timedelta(days=1), 5, 50.0),
        ("y", t0, 6, 1.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, id long, v double")


def test_ohlc_tie_break_and_extremes(spark, ticks):
    bars = ohlc(ticks, ["k"], "ts", "id", "v", F.to_date("ts"), "d")
    got = {
        (r["k"], str(r["d"])): (r["open"], r["high"], r["low"], r["close"], r["n"])
        for r in bars.collect()
    }
    assert got[("x", "2024-01-01")] == (100.0, 103.0, 95.0, 103.0, 4)
    assert got[("x", "2024-01-02")] == (50.0, 50.0, 50.0, 50.0, 1)
    assert got[("y", "2024-01-01")] == (1.0, 1.0, 1.0, 1.0, 1)


def test_ohlc_volume_col_override(spark, ticks):
    with_cents = ticks.withColumn(
        "cents", F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint")
    )
    bars = ohlc(
        with_cents, ["k"], "ts", "id", "v", F.to_date("ts"), "d",
        volume_col="cents",
    )
    got = {(r["k"], str(r["d"])): r["volume"] for r in bars.collect()}
    assert got[("x", "2024-01-01")] == 39900  # 100+101+95+103 in cents


def test_ohlc_is_single_shuffle(spark, ticks):
    bars = ohlc(ticks, ["k"], "ts", "id", "v", F.to_date("ts"), "d")
    plan = bars._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan  # pure hash agg, no per-key sort


def test_change_intervals_semantics_and_single_shuffle(spark):
    from hobbes_spark.operators.timeseries import change_intervals

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: A A B A  -> intervals A, B, A (middle repeat collapses)
        (1, 1, "A", t0),
        (1, 2, "A", t0 + dt.timedelta(minutes=1)),
        (1, 3, "B", t0 + dt.timedelta(minutes=2)),
        (1, 4, "A", t0 + dt.timedelta(minutes=3)),
        # u2: single event -> one open-ended current interval
        (2, 5, "Z", t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, status string, ts timestamp")
    out = change_intervals(df, ["user_id"], "ts", "event_id", "status")
    got = sorted(
        (r["user_id"], r["status"], r["effective_to_us"] is None, r["is_current"])
        for r in out.collect()
    )
    assert got == [
        (1, "A", False, False),
        (1, "A", True, True),
        (1, "B", False, False),
        (2, "Z", True, True),
    ]
    # half-open continuity: each close equals the next open
    ivs = sorted(
        ((r["effective_from_us"], r["effective_to_us"]) for r in out.collect()
         if r["user_id"] == 1)
    )
    for (f1, t1), (f2, _) in zip(ivs, ivs[1:]):
        assert t1 == f2
    # fresh (uncollected) frame: an executed AQE plan stringifies both
    # Final and Initial plans, double-counting the one real exchange
    fresh = change_intervals(df, ["user_id"], "ts", "event_id", "status")
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") == 1  # both windows share one keyed sort


def test_concurrency_peak_sweep_counts_overlap(spark):
    """Three users with overlapping sessions on one day: peak must see
    the 3-way overlap; a lone single-event (zero-length) session still
    counts 1 (closed intervals: the +1 sorts first at equal ts)."""
    from hobbes_spark.queries import QUERIES
    import os
    import tempfile

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows, eid = [], 0

    def ev(u, minutes):
        nonlocal eid
        eid += 1
        return (eid, u, t0 + dt.timedelta(minutes=minutes), "click", 1.0, "{}")

    # sessions need < 30-min event gaps to stay single sessions:
    # u1: 10:00-10:40 (events every 20 min) ; u2: 10:20-10:45 ;
    # u3: 10:30-10:35 → three sessions all live at 10:30
    # u4: two sessions 10:00-10:05 and 11:00-11:01 (60-min gap splits)
    rows += [ev(1, 0), ev(1, 20), ev(1, 40), ev(2, 20), ev(2, 45),
             ev(3, 30), ev(3, 35)]
    rows += [ev(4, 0), ev(4, 5), ev(4, 60), ev(4, 61)]
    # next day: a lone single-event session must still register peak 1
    rows += [ev(5, 24 * 60)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, "
              "value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["day"]: r["peak"]
               for r in QUERIES["concurrency_peak"].spark(spark, d).collect()}
    assert out == {"2024-03-01": 3, "2024-03-02": 1}  # 3-way at 10:30


def test_mad_outliers_flags_planted_spike(spark):
    """One wild value among uniform ones: MAD stays small (robust), the
    spike flags as the only outlier."""
    from hobbes_spark.queries import QUERIES
    import os
    import tempfile

    t0 = dt.datetime(2024, 3, 1)
    rows = [(i, 1, t0, "click", float(v), "{}")
            for i, v in enumerate([10, 11, 12, 10, 11, 12, 10, 11, 500])]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, "
              "value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["mad_outliers"].spark(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["median"] == 11.0 and r["mad"] == 1.0
    assert r["n_outliers"] == 1 and r["n"] == 9  # only the 500 spike


def test_change_intervals_null_status_runs(spark):
    """Transitions INTO a NULL status are changes (prev != NULL used to
    evaluate NULL and silently drop the row, hiding the NULL run and
    emitting two consecutive same-status intervals), NULL runs collapse
    like any other run, and a log STARTING with NULL still opens an
    interval."""
    import datetime as dt
    from hobbes_spark.operators.timeseries import change_intervals

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    df = spark.createDataFrame(
        [(1, 1, t(0), None), (1, 2, t(1), "A"), (1, 3, t(2), None),
         (1, 4, t(3), None), (1, 5, t(4), "A")],
        "user_id long, event_id long, ts timestamp, status string",
    )
    out = change_intervals(df, ["user_id"], "ts", "event_id", "status")
    runs = [(r["status"], r["is_current"]) for r in out.orderBy("effective_from_us").collect()]
    assert runs == [(None, False), ("A", False), (None, False), ("A", True)]


def test_gap_fill_drops_null_dates_explicitly(spark):
    from hobbes_spark.operators.timeseries import gap_fill_ffill

    df = spark.createDataFrame(
        [("a", "2021-01-01", 1.0), ("a", None, 9.0)],
        "k string, d string, v double",
    ).selectExpr("k", "CAST(d AS DATE) AS d", "v")
    out = gap_fill_ffill(df, ["k"], "d", ["v"]).collect()
    assert len(out) == 1 and out[0]["v"] == 1.0


def test_ohlc_ignores_null_ticks(spark):
    import pyspark.sql.functions as F

    from hobbes_spark.operators.timeseries import ohlc

    df = spark.createDataFrame(
        [(1, "2021-01-01 10:00:00", None), (2, "2021-01-01 11:00:00", 10.0),
         (3, "2021-01-01 12:00:00", 12.0)],
        "id bigint, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = ohlc(df, keys=[], bucket=F.to_date("ts"), value_col="v",
               ts_col="ts", id_col="id").collect()[0]
    assert (row["open"], row["high"], row["low"], row["close"], row["n"]) == (
        10.0, 12.0, 10.0, 12.0, 2,
    )
