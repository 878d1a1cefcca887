"""Watermarked stream-stream joins.

The canonical attribution shape: match each event in one stream to
events in another with the same key within a bounded event-time window
(click → purchase, impression → conversion). Both sides carry
watermarks and the join predicate bounds the time gap, so the engine
can size state and emit/evict deterministically — the two requirements
for an unbounded join to be feasible at all.

Works identically on batch DataFrames (same plan, no watermark), which
is how the tests pin correctness: replay both streams, compare with the
batch join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str | None = "1 hour",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join rows sharing ``on`` where the right event lands in
    ``[left_ts, left_ts + within]``.

    Right payload columns that would collide with a left column come
    back as ``{right_prefix}{name}`` (so an events-to-events self-join
    yields ``value`` and ``r_value``, not two ``value`` columns); a
    prefixed name that still collides raises.

    State note: per key, the engine keeps left rows for ``within`` +
    watermark delay and right rows for the watermark delay — bounded by
    arrival rate, independent of stream length. Outer variants require
    both watermarks (Spark enforces this).
    """
    lpay = [c for c in left.columns if c not in (on, left_ts)]
    rpay = [c for c in right.columns if c not in (on, right_ts)]
    # names this join manufactures: payload columns may not collide with
    # them on EITHER side (a left column literally named "right_ts" would
    # make the join condition ambiguous, not merely shadowed)
    reserved = {"left_ts", "right_ts", "__k", "__rk"}
    hit = sorted(reserved & (set(lpay) | set(rpay)))
    if hit:
        raise ValueError(f"interval_join: column names are reserved: {hit}")
    taken = {on, "left_ts", "right_ts", *lpay}
    rename = {c: (f"{right_prefix}{c}" if c in taken else c) for c in rpay}
    outs = list(rename.values())
    still = [n for n in outs if n in taken or outs.count(n) > 1]
    if still:
        raise ValueError(f"interval_join: output columns would clash: {sorted(set(still))}")
    def _instant(df: DataFrame, ts: str) -> Column:
        # Watermarks require an instant (TIMESTAMP, not TIMESTAMP_NTZ —
        # Spark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).
        # A timezone-less event time is pinned as UTC wall-clock, which
        # is deterministic and order/gap-preserving, so the join result
        # is identical to comparing the raw NTZ values.
        if dict(df.dtypes).get(ts) == "timestamp_ntz":
            return F.to_utc_timestamp(F.col(ts), "UTC")
        return F.col(ts)

    l = left.select(  # noqa: E741
        F.col(on).alias("__k"),
        _instant(left, left_ts).alias("left_ts"),
        *[F.col(c) for c in lpay],
    )
    r = right.select(
        F.col(on).alias("__rk"),
        _instant(right, right_ts).alias("right_ts"),
        *[F.col(c).alias(rename[c]) for c in rpay],
    )
    if watermark is not None and left.isStreaming:
        l = l.withWatermark("left_ts", watermark)  # noqa: E741
    if watermark is not None and right.isStreaming:
        r = r.withWatermark("right_ts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {within}"))
    )
    out = l.join(r, cond, how)
    if how in ("left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"):
        # semi/anti outputs carry only left-side columns — there is no
        # __rk to coalesce (referencing it raises UNRESOLVED_COLUMN)
        return out.withColumnRenamed("__k", on)
    # In right/full outer mode an unmatched right row carries its key
    # only in __rk (__k is NULL) — coalesce before collapsing to the
    # single output key column, or the row comes back keyless.
    return (
        out.withColumn("__k", F.coalesce(F.col("__k"), F.col("__rk")))
        .drop("__rk")
        .withColumnRenamed("__k", on)
    )
