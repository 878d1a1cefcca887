"""Column profiling: per-column completeness and cardinality in one
pass — the data-quality report a pipeline runs before trusting a new
drop of data (the shape popularized by Deequ/TFDV).

Scale design: everything folds into ONE aggregate over the input.
``exact=False`` (the default, and the only sane setting at 100 TB) uses
``approx_count_distinct`` (HyperLogLog++), which keeps the plan a plain
partial/final aggregate. ``exact=True`` switches to exact
``COUNT(DISTINCT)`` — Spark plans n distinct aggregates as an Expand
that replicates every row once per profiled column, so reserve it for
slim column lists or gate-scale checks (the DuckDB oracle can only
replay the exact path).

Reference parity: hobbes has no profiling statement; nearest behavior
is `dense columns`' null-ratio bookkeeping (SURVEY §2.2), which
``n_nulls`` generalizes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hobbes_spark.expressions import c as _c

__all__ = [
    "profile_columns", "winsorize", "equi_depth_histogram", "cohens_kappa",
]


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = False
) -> DataFrame:
    """One row per profiled column: ``col_name, n_rows, n_nulls,
    n_distinct`` (n_distinct excludes NULL, matching both engines'
    COUNT(DISTINCT)).

    The per-column stats are aggregated as an array of structs in a
    single ``agg`` and exploded afterwards, so the input is scanned
    once regardless of how many columns are profiled.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    n = F.count(F.lit(1))
    entries = []
    for col in cols:
        # _c, not F.col: flattened dot-path names (a.b) are single flat
        # columns here, not struct access
        nd = F.count_distinct(_c(col)) if exact else F.approx_count_distinct(_c(col))
        entries.append(
            F.struct(
                F.lit(col).alias("col_name"),
                (n - F.count(_c(col))).cast("bigint").alias("n_nulls"),
                nd.cast("bigint").alias("n_distinct"),
            )
        )
    agg = df.agg(F.array(*entries).alias("__p"), n.cast("bigint").alias("n_rows"))
    return agg.select(F.explode("__p").alias("p"), "n_rows").select(
        "p.col_name", "n_rows", "p.n_nulls", "p.n_distinct"
    )


def winsorize(
    df,
    keys: list[str],
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
):
    """Per-group winsorization: clamp ``value_col`` into each group's
    [P(lo), P(hi)] percentile band — the robust-normalization step that
    keeps a handful of pathological values (run-away quality scores,
    corrupt telemetry) from dominating downstream training signals.

    Adds ``p_lo``, ``p_hi``, ``clipped`` (the clamped value) and
    ``was_clipped``. Exact interpolated percentiles (``F.percentile``)
    match DuckDB's ``percentile_cont``; at 100 TB switch the percentile
    call to ``approx_percentile`` — same plan shape, mergeable sketch
    state instead of a per-group sort.

    Plan shape: ONE grouped aggregate produces a |groups|-row bounds
    table that broadcasts back onto the fact — the fact table is read
    once and never shuffles (plan-asserted in tests)."""
    bounds = F.broadcast(
        df.groupBy(*[_c(k).alias(f"__bk{i}") for i, k in enumerate(keys)]).agg(
            F.percentile(_c(value_col), F.lit(lo)).alias("p_lo"),
            F.percentile(_c(value_col), F.lit(hi)).alias("p_hi"),
        )
    )
    # NULL-SAFE key match: the groupBy above produces a NULL-key bounds
    # row, and a plain equi-join would silently DROP every NULL-key fact
    # row instead of clamping it
    cond = None
    for i, k in enumerate(keys):
        step = _c(k).eqNullSafe(F.col(f"__bk{i}"))
        cond = step if cond is None else (cond & step)
    # greatest/least SKIP NULL arguments (they don't propagate), so a
    # bare clamp would turn a NULL measurement into the group's P(lo) —
    # fabricated data. NULL in, NULL out.
    clipped = F.when(
        _c(value_col).isNotNull(),
        F.least(F.greatest(_c(value_col), F.col("p_lo")), F.col("p_hi")),
    )
    return (
        df.join(bounds, cond)
        .drop(*[f"__bk{i}" for i in range(len(keys))])
        .withColumn("clipped", clipped)
        .withColumn("was_clipped", F.col("clipped") != _c(value_col))
    )


def equi_depth_histogram(df, value_col: str, buckets: int = 10):
    """Equi-depth (equal-frequency) histogram: ``buckets`` rows of
    ``(bucket, n, lo, hi)`` where bucket boundaries are the exact
    interpolated percentiles of ``value_col``.

    The naive formulation — ``ntile(buckets)`` over a GLOBAL ordering —
    funnels the whole table through one task; this one computes the
    boundary percentiles in a single aggregate (a 1-row broadcast) and
    assigns each row by counting boundaries below its value, so the
    table is scanned once, never globally sorted. At 100 TB swap the
    percentile call for ``approx_percentile`` — same shape, sketch
    state. Rows equal to a boundary go to the lower bucket (assignment
    is ``1 + Σ (value > boundary)``, matching SQL's percentile_cont)."""
    fracs = [i / buckets for i in range(1, buckets)]
    bounds = F.broadcast(
        df.agg(
            F.percentile(F.col(value_col), F.array(*[F.lit(f) for f in fracs]))
            .alias("__b")
        )
    )
    assign = F.lit(1)
    for i in range(buckets - 1):
        assign = assign + F.when(F.col(value_col) > F.col("__b")[i], 1).otherwise(0)
    # NULL values satisfy no `> boundary` test and would land in bucket
    # 1, inflating its count while min/max ignore them; the histogram is
    # over the non-null distribution, same population as the boundaries.
    return (
        df.filter(F.col(value_col).isNotNull())
        .crossJoin(bounds)
        .select(assign.cast("int").alias("bucket"), F.col(value_col).alias("__v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
    )


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa between two label columns — the chance-corrected
    agreement a labeling pipeline checks when comparing two quality-
    classifier versions, two annotation passes, or model-vs-human
    labels over the same documents (kappa near 0 = the expensive new
    labels add nothing beyond class priors).

    Returns ONE row ``(n, agree, kappa_num, kappa_den, kappa)``.  The
    arithmetic is EXACT integers end to end:

        kappa = (N·agree − Σ_c na_c·nb_c) / (N² − Σ_c na_c·nb_c)

    which equals the textbook (p_o − p_e)/(1 − p_e) with both sides
    multiplied by N² — so an external engine replays numerator and
    denominator bit-for-bit, and the double division of two exact
    integers is IEEE-determined.  ``kappa_num``/``kappa_den`` are
    DECIMAL(38,0) (ADVICE r8): N² overflows int64 once N exceeds
    ~3.04e9 rows — routine at 100 TB — so every product (N·agree,
    na·nb, N²) is computed in decimal, exact up to N = 1e19.
    ``kappa`` is NULL when the denominator
    is 0 (both columns constant and equal: p_e = 1, agreement is
    undefined, not perfect).  NULL labels are a CLASS (two NULLs agree)
    — drop them upstream if your convention differs.

    Scale shape: one corpus-sized keyed aggregation to the (a, b)
    contingency table (map-side combined, at most |A|·|B| rows), then
    class-sized arithmetic.  Nothing corpus-sized ever reaches the
    driver."""
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("\x00null"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("\x00null"))
    ct = df.groupBy(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    na = ct.groupBy("__a").agg(F.sum("__n").alias("__na"))
    nb = ct.groupBy("__b").agg(F.sum("__n").alias("__nb"))
    # Σ_c na_c·nb_c over classes appearing on EITHER side: classes
    # absent from one side contribute 0, so the inner join is exact
    dec = "decimal(38,0)"
    pe_num = (
        na.join(nb, na["__a"] == nb["__b"], "inner")
        .agg(
            F.coalesce(
                F.sum(F.col("__na").cast(dec) * F.col("__nb").cast(dec)),
                F.lit(0).cast(dec),
            ).alias("__pe")
        )
    )
    totals = ct.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n"))), F.lit(0)
        ).cast("bigint").alias("agree"),
    )
    out = totals.crossJoin(F.broadcast(pe_num))
    nd = F.col("n").cast(dec)
    num = nd * F.col("agree").cast(dec) - F.col("__pe")
    den = nd * nd - F.col("__pe")
    return out.select(
        "n", "agree",
        num.cast(dec).alias("kappa_num"),
        den.cast(dec).alias("kappa_den"),
        F.when(
            den != 0, num.cast("double") / den.cast("double")
        ).alias("kappa"),
    )
