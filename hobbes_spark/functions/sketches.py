"""Mergeable sketches: pre-aggregated approximate state that composes.

The 100 TB pattern these enable: instead of re-scanning a year of raw
events to answer "distinct users last month", keep one small HLL sketch
per (day, key) — built once, at ingest — and MERGE sketches for any
later rollup. Merging is associative and lossless with respect to the
sketch's own estimate (merging daily sketches gives byte-identical
state to sketching the union directly — pinned in tests), so rollups
over any time range are sketch-sized work, not data-sized work.

Built on Spark's Apache DataSketches integration
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` —
public since 3.5): deterministic, bounded-error (~1.6%/sqrt(2^lgk)),
and the binary sketch column stores/round-trips through parquet, so a
sketch table IS a queryable materialized aggregate.

``count_min_sketch`` serves the companion question — approximate
per-item frequencies (heavy hitters) in one pass with bounded
overcount — same build-small-merge-later shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_group_sketches",
    "hll_rollup_estimate",
    "hll_estimate",
    "theta_group_sketches",
    "theta_overlap_estimate",
]


def hll_group_sketches(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per ``keys`` group over ``col``:
    ``(*keys, sketch: binary)``.

    This is the ingest-time step: one shuffle keyed by ``keys`` (with
    map-side partial aggregation — sketches merge inside each input
    partition first, so shuffle volume is sketches, not rows). Persist
    the result; never rescan the raw data for distinct-count rollups
    again. ``lgk`` trades size for error (2^lgk buckets; 12 → ~1.6 KB,
    ~2.5% rel. std. error).
    """
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch")
    )


def hll_rollup_estimate(
    sketches: DataFrame,
    by: Sequence[str],
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge per-group sketches up to the coarser ``by`` keys and
    estimate: ``(*by, approx_distinct: bigint)``.

    Input is a sketch table (from :func:`hll_group_sketches`, possibly
    read back from parquet); cost is proportional to the number of
    sketches, independent of the original row count. ``by=[]`` gives
    the single global rollup.
    """
    gb = sketches.groupBy(*[F.col(k) for k in by]) if by else sketches.groupBy()
    return gb.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    )


def hll_estimate(sketch: Column | str) -> Column:
    """Estimate of one sketch value (row-wise)."""
    col = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(col)


def theta_group_sketches(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """One Theta sketch per ``keys`` group over ``col``:
    ``(*keys, sketch: binary)``. Same build-once shape as
    :func:`hll_group_sketches`; Theta costs a little more space but its
    sketches support set INTERSECTION, not just union."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.theta_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch")
    )


def theta_overlap_estimate(
    sketches: DataFrame,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Approximate size of the INTERSECTION of all groups' sets — the
    join-free audience-overlap query ("users who did A *and* B"): one
    row ``(approx_overlap: double)`` from the per-group sketch table.

    The exact form of this question is a self-join (or N-way join) on
    the raw data per combination asked; the sketch form answers any
    combination from state whose size is independent of the data.
    """
    return sketches.groupBy().agg(
        F.theta_sketch_estimate(
            F.theta_intersection_agg(F.col(sketch_col))
        ).alias("approx_overlap")
    )
