"""Time-series operators: dense-spine gap filling and OHLC bar rollups.

The reference's series support stops at trailing/expanding windows and
linear extrapolation (SURVEY §2.8; reference `Logic Commit
Frequency.hb` builds daily series by group-count only).  Real telemetry
and market data need two more shapes that belong in the same family:

* **gap filling** — regularize an irregular series onto a dense per-key
  time spine and carry the last observation forward, so downstream
  moving windows (`moving R n`) see one row per tick instead of
  silently skipping missing days;
* **OHLC bars** — the hypertable-style rollup (open/high/low/close per
  key per bucket) that compresses raw ticks into fixed-width bars.

Scale design (100 TB):

* The spine is built from a per-key ``min/max`` aggregate — one keyed
  shuffle whose output is ONE ROW PER KEY — and exploded back to days
  on that tiny aggregate side, never on the raw events.  The join back
  to observations shuffles both sides on ``(key, tick)``, the same key
  the downstream window uses, so AQE coalesces and no second exchange
  appears.
* Forward fill is ``last(value, ignorenulls)`` over a keyed window —
  the one inherently sequential step.  Each key's timeline must meet in
  one task; keys are the unit of parallelism (fine for telemetry where
  keys ≫ cores).  For a single pathological multi-year key, the known
  fix is a two-pass segment fill (fill within coarse tiles, then
  propagate tile boundaries); not needed at this catalog's shapes.
* OHLC is ONE hash aggregate: ``min_by/max_by`` over a
  ``struct(ts, id)`` tiebreaker plus plain min/max/count/sum, all with
  map-side partial aggregation.  No window, no sort — the whole rollup
  is a single shuffle of partial states, which is what lets a
  1000-executor cluster turn 100 TB of ticks into bars without ever
  materializing a per-key ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def daily_spine(df: DataFrame, keys: list[str], date_col: str) -> DataFrame:
    """One row per (key, day) for every day between each key's first and
    last observed day.  ``date_col`` must be DATE-typed.

    The explode happens AFTER the min/max aggregate, so its input is one
    row per key regardless of input size."""
    span = df.groupBy(*keys).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    return span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr("interval 1 day"))
        ).alias(date_col),
    )


def gap_fill_ffill(
    df: DataFrame,
    keys: list[str],
    date_col: str,
    fill_cols: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """Regularize ``df`` (≤1 row per (keys, date_col)) onto the dense
    daily spine; carry ``fill_cols`` forward (last observation), and
    zero-fill ``count_col`` if given (a count's absence means 0, not
    "unchanged").  Rows before a key's first observation keep NULL.

    Rows whose ``date_col`` is NULL are dropped explicitly (they have no
    place on a date spine; silently vanishing through the spine join was
    worse than an explicit policy), and a key with ONLY NULL dates
    contributes nothing."""
    df = df.filter(F.col(date_col).isNotNull())
    spine = daily_spine(df, keys, date_col)
    joined = spine.join(df, on=[*keys, date_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for c in fill_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    if count_col is not None:
        out = out.withColumn(
            count_col, F.coalesce(F.col(count_col), F.lit(0).cast("bigint"))
        )
    return out


def ohlc(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    bucket: Column,
    bucket_name: str = "bucket",
    volume_col: str | None = None,
) -> DataFrame:
    """Open/high/low/close/volume bars per (keys, bucket) in ONE hash
    aggregate — ``min_by``/``max_by`` on a (ts, id) struct pick the
    first/last tick deterministically (id breaks timestamp ties), and
    every aggregate here partial-aggregates map-side.

    ``volume_col`` sums a caller-supplied column instead of
    ``value_col`` — pass an exact integer-unit column (e.g. cents) when
    the volume must be order-independent across partitions."""
    tie = F.struct(F.col(ts_col), F.col(id_col))
    # a tick with a NULL value or NULL timestamp cannot anchor a bar:
    # min_by/max_by would happily pick it for open/close while high/low
    # skip it — an internally inconsistent bar (NULL open, real high)
    df = df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
    return (
        df.withColumn(bucket_name, bucket)
        .groupBy(*keys, bucket_name)
        .agg(
            F.min_by(F.col(value_col), tie).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), tie).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum(volume_col or value_col).alias("volume"),
        )
    )


def change_intervals(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str,
    status_col: str,
) -> DataFrame:
    """Collapse a per-key event log into SCD2-style validity intervals:
    one row per run of consecutive equal ``status_col`` values, with
    ``effective_from_us`` / ``effective_to_us`` (epoch micros, half-open
    — ``to`` is the next change's ``from``) and ``is_current`` on the
    open-ended last run.

    Both windows and the change filter partition on ``keys`` with the
    same ordering, so the whole build is ONE keyed shuffle + one sort;
    the filter between the two windows preserves partitioning and
    ordering, so Spark inserts no second exchange (plan-asserted in
    tests). Epoch-micros output avoids cross-engine timestamp
    stringification drift.

    Same-instant flip-flops (several status changes at one microsecond,
    e.g. A,B,A with equal ``ts_col``) are PINNED semantics, not an
    accident: ordering is (ts, tiebreak), so each superseded change
    emits a ZERO-LENGTH half-open interval ``[t, t)`` and the highest
    tiebreak owns the interval that extends past ``t``.  An as-of
    lookup at exactly ``t`` therefore resolves to the last writer by
    tiebreak — matching the reference's last-revision-wins cache model.
    Regression-pinned in tests/test_property_timeseries.py::
    test_change_intervals_same_instant_flip_flop."""
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)
    # null-safe change detection: `prev != status` is NULL (row dropped)
    # when either side is NULL, which would swallow transitions INTO a
    # NULL status and then emit two consecutive same-status intervals
    # around the hidden NULL run. A first-row prev is NULL via lag and
    # must count as a change, hence the negated eqNullSafe (which also
    # treats NULL==NULL as "no change", collapsing NULL runs correctly).
    changed = (
        df.withColumn("__prev", F.lag(status_col).over(w))
        .withColumn("__first", F.row_number().over(w) == 1)
        .filter(
            F.col("__first") | ~F.col("__prev").eqNullSafe(F.col(status_col))
        )
        .drop("__prev", "__first")
    )
    w2 = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)
    out = changed.withColumn(
        "effective_from_us", F.unix_micros(F.col(ts_col))
    ).withColumn(
        "effective_to_us", F.lead(F.unix_micros(F.col(ts_col))).over(w2)
    )
    return out.withColumn("is_current", F.col("effective_to_us").isNull())
