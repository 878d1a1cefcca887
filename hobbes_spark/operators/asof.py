"""As-of and range (interval) joins — the time-series join operators the
DataFrame API lacks as primitives, built Spark-first so they hold at
100 TB.

* :func:`asof_join` — for each left row, the single most recent right
  row with ``r.on <= l.on`` (backward; or the earliest with
  ``r.on >= l.on``, forward) within the same ``by`` keys. Implemented
  as the union + last-non-null-window plan: ONE shuffle on the ``by``
  keys and a linear scan per partition — no per-key collect, no range
  cross-join, no skew beyond what the keys themselves carry. This is
  the standard massively-parallel as-of shape (both sides sorted
  together, matches carried by a running window).

* :func:`range_join` — point-in-interval equi-ization by binning:
  intervals explode to the fixed-width bins they cover, points map to
  exactly one bin, and the join becomes a plain hash equi-join on
  (keys..., bin) with an exact residual filter. A point lands in one
  bin, so no pair can match twice — no dedup pass. Bin width trades
  replication (wide intervals → more bins) against bucket selectivity;
  at scale choose it near the median interval width.

Reference parity note: the reference engine has no as-of/range join
(SURVEY §2.5 covers only single-field equi Join and Merge —
``/root/reference/hobbes.core/src/implementation/Collection.fs``); these
are the beyond-reference operators a training-data/event pipeline needs
(attribution, banding, nearest-reading joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance: Column | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the columns of the
    nearest ``right`` row at-or-before it (``direction='backward'``) or
    at-or-after it (``'forward'``) on ``on``, matching on ``by``.

    Right-side payload columns come back prefixed with ``right_prefix``
    (the join column as ``{prefix}{on}``). Unmatched left rows keep
    NULLs (left-join semantics). ``tolerance`` (a Column interval or
    numeric delta) drops matches farther than that from the left time.

    Ties: when several right rows share the same ``(by, on)``, the one
    last in the union sort order wins — make the right side unique on
    ``(by, on)`` first if tie choice matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward/forward, got {direction!r}")
    by = list(by)
    lcols = left.columns
    rpay = [c for c in right.columns if c not in by]
    clashes = [c for c in rpay if f"{right_prefix}{c}" in lcols]
    if clashes:
        raise ValueError(f"asof_join: output columns would clash: {clashes}")
    payload = F.struct(*[F.col(c).alias(c) for c in rpay])
    rp_type = right.select(payload.alias("p")).schema["p"].dataType

    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__tag"),
        F.lit(None).cast(rp_type).alias("__rp"),
    )
    # NULL-`on` right rows can never satisfy r.on <= l.on (or >=): SQL
    # comparison with NULL is unknown. Without this filter the window's
    # NULLS FIRST (asc) ordering would sort them before EVERY left row
    # and last(ignorenulls) would hand them out as spurious matches.
    # NULL-`by` right rows likewise match nothing under SQL equality —
    # left rows with NULL keys come back unmatched, not paired with
    # each other through a shared NULL window partition.
    right = right.filter(F.col(on).isNotNull())
    for k in by:
        right = right.filter(F.col(k).isNotNull())
    l_on_t, r_on_t = left.schema[on].dataType, right.schema[on].dataType
    if l_on_t != r_on_t:
        # the union coerces the right `on` to the LEFT's type; a lossy
        # narrowing (double->int, timestamp->date) would fabricate
        # matches a true comparison rejects — same fail-fast policy as
        # bloom's key-type guard. Cast explicitly to the wider type.
        raise ValueError(
            f"asof_join: `{on}` types differ (left {l_on_t.simpleString()}, "
            f"right {r_on_t.simpleString()}); cast one side explicitly — "
            "an implicit narrowing cast would fabricate matches"
        )
    r_vals = {c: F.col(c) for c in by}
    r_vals[on] = F.col(on).cast(left.schema[on].dataType)
    r_tag = right.select(
        *[
            r_vals.get(c, F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__tag"),
        payload.alias("__rp"),
    )

    unioned = l_tag.unionByName(r_tag)
    asc = direction == "backward"
    order = [F.col(on).asc() if asc else F.col(on).desc(), F.col("__tag").asc()]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
    out = matched.filter(F.col("__tag") == 1).drop("__tag", "__rp")
    # A NULL-`on` left row matches nothing (its comparison with any
    # right time is unknown). Under asc it happens to sort first and
    # already sees no right rows; under desc (forward) it would sort
    # LAST and inherit the window's accumulated match — mask both
    # directions explicitly rather than lean on sort position.
    out = out.withColumn("__m", F.when(F.col(on).isNotNull(), F.col("__m")))

    if tolerance is not None:
        lts, rts = F.col(on), F.col("__m")[on]
        delta = (lts - rts) if asc else (rts - lts)
        out = out.withColumn(
            "__m", F.when(rts.isNotNull() & (delta <= tolerance), F.col("__m"))
        )
    for c in rpay:
        out = out.withColumn(f"{right_prefix}{c}", F.col("__m")[c])
    return out.drop("__m")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    by: Sequence[str] = (),
    bin_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join each ``left`` row (a point ``point``) to every ``right`` row
    whose interval ``[lower, upper]`` (inclusive) contains it, optionally
    also matching ``by`` keys.

    Both sides get a ``floor(x / bin_width)`` bin key; intervals are
    exploded to each covered bin, so the physical join is a hash
    equi-join on (by..., bin) + residual ``lower <= point <= upper`` —
    never a nested-loop cross product. ``how='left'`` keeps unmatched
    points with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner/left, got {how!r}")
    if not bin_width > 0:
        raise ValueError(f"range_join: bin_width must be positive, got {bin_width}")
    by = list(by)
    overlap = set(left.columns) & set(right.columns)
    if overlap - set(by):
        raise ValueError(f"range_join: overlapping non-key columns {sorted(overlap - set(by))}")
    lb = F.floor(F.col(point) / bin_width)
    l_binned = left.withColumn("__bin", lb)
    bins = F.sequence(
        F.floor(F.col(lower) / bin_width).cast("bigint"),
        F.floor(F.col(upper) / bin_width).cast("bigint"),
    )
    # an inverted interval (lower > upper) can never contain a point —
    # and without this filter F.sequence would AUTO-STEP DOWNWARD
    # through it, exploding one corrupt row into |lower-upper|/width
    # bins (the same sequence footgun linear_extrapolation guards)
    right = right.filter(F.col(lower) <= F.col(upper))
    r_binned = right.withColumn("__bin", F.explode(bins))
    cond = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in by] + [
        F.col("l.__bin") == F.col("r.__bin"),
        F.col(f"l.{point}") >= F.col(f"r.{lower}"),
        F.col(f"l.{point}") <= F.col(f"r.{upper}"),
    ]
    joined = l_binned.alias("l").join(r_binned.alias("r"), cond, how)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c not in by
    ]
    return joined.select(*keep)
