"""Ordered-series window functions: ``moving`` and ``expanding``.

Reference semantics (SURVEY §2.8): both operate over the current physical
row order established by ``sort by``; ``moving R n`` yields NULL until the
trailing window holds ``n`` rows (`MTTR.hb:31-35` filters those NULLs right
after), ``expanding R`` is the cumulative reduction from the first row
(`Metrics.fs:59`, "Burn up").

Scale: an unpartitioned ``Window.orderBy`` funnels every row through one
task. That is correct *and cheap* for the reference's use (windows always
run after aggregation to a small per-sprint/per-day series), but callers
windowing raw events at scale must pass ``partition_by`` so the shuffle
stays keyed (e.g. per user, per device).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from hobbes_spark.expressions import c
from hobbes_spark.reductions import reduction_fn

__all__ = ["moving_col", "expanding_col"]


def _window(order_exprs: Sequence[Column], partition_by: Sequence[str]):
    # c(), not raw names: flattened dot-path partition columns must not
    # parse as struct access (the convention every other operator follows)
    keys = [c(n) for n in partition_by]
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    return w.orderBy(*order_exprs)


def _over(reduction: str, value: Column, w) -> Column:
    """Apply a reduction over a window frame. ``distinct`` needs its own
    spelling: Spark rejects DISTINCT aggregate functions over windows
    (count_distinct(...).over(w) is an AnalysisException), but
    size(collect_set(...)) computes the same distinct-non-NULL count and
    is window-legal — the grammar allows ``moving distinct n col``, so
    the valid program must compile."""
    if reduction == "distinct":
        return F.size(F.collect_set(value).over(w))
    return reduction_fn(reduction)(value).over(w)


def moving_col(
    reduction: str,
    n: int,
    value: Column,
    order_exprs: Sequence[Column],
    partition_by: Sequence[str] = (),
) -> Column:
    """Trailing-``n``-rows reduction; NULL while the window is short.

    ``count(1)`` over the same frame detects the short leading windows —
    this counts *rows present*, so the NULL-prefix has exactly ``n - 1``
    entries regardless of NULLs in the value column, matching the
    reference ("yields missing until window full", snippets:182-188).
    """
    if n < 1:
        raise ValueError("moving window size must be >= 1")
    w = _window(order_exprs, partition_by).rowsBetween(-(n - 1), 0)
    full = F.count(F.lit(1)).over(w) >= n
    return F.when(full, _over(reduction, value, w))


def expanding_col(
    reduction: str,
    value: Column,
    order_exprs: Sequence[Column],
    partition_by: Sequence[str] = (),
) -> Column:
    """Cumulative reduction from the first row to the current row."""
    w = _window(order_exprs, partition_by).rowsBetween(Window.unboundedPreceding, 0)
    return _over(reduction, value, w)
