"""Deterministic, reproducible sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partitioning and neither stable
across runs nor expressible in SQL — useless for auditable corpus
construction. These operators instead hash a key column: a row is in
the sample iff the first 8 hex chars of ``md5(key)`` (an effectively
uniform 32-bit integer) fall under ``fraction * 2^32``. Properties the
hash form buys at any scale:

* **stable** — the same row is selected regardless of partitioning,
  cluster size, or execution order;
* **consistent across fractions** — the 10% sample is a superset of the
  1% sample (nested samples for scaling-law runs);
* **map-only** — a scan filter, no shuffle, fully pushdown-friendly;
* **cross-engine** — md5 is bit-identical in DuckDB, so sampling
  queries carry full value-hash oracles.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hobbes_spark.expressions import c, md5_prefix_bigint

__all__ = [
    "hash_bucket",
    "hash_sample",
    "hash_sample_by",
    "weighted_mixture",
    "temperature_fractions",
    "temperature_sample",
    "mixture_plan",
    "apply_mixture_plan",
    "epoch_shuffle",
    "top_fraction_by",
    "group_sample",
    "systematic_weighted_sample",
    "leakage_safe_split",
    "fim_transform",
    "span_corrupt",
]

_SCALE = 1 << 32


def hash_bucket(col: Column | str, salt: str = "") -> Column:
    """Uniform value in [0, 2^32) from ``md5(salt || \\x1f || key)``.
    ``salt`` decorrelates independent samples drawn from the same key;
    the unit-separator byte between salt and key keeps the framing
    unambiguous (without it, salt 'a' + key 'bc' would hash identically
    to salt 'ab' + key 'c', quietly correlating "independent" samples
    whose salts are prefixes of each other).

    NULL keys map to one sentinel bucket rather than NULL — otherwise a
    NULL-keyed row would fail every ``< threshold`` filter and silently
    vanish even from a fraction=1.0 sample. All NULL-key rows therefore
    sample together (all in or all out at a given fraction/salt)."""
    key = F.coalesce(c(col).cast("string"), F.lit("\x00null"))
    src = F.concat(F.lit(salt), F.lit("\x1f"), key)
    return md5_prefix_bigint(src, 8)


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample, keyed on ``key``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"hash_sample: fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(key, salt) < int(fraction * _SCALE))


def leakage_safe_split(
    df: DataFrame,
    cluster_col: str,
    weights: "dict[str, float]",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign train/val/test splits by CLUSTER, not by row: every member
    of a duplicate/near-dup cluster receives the same split, so held-out
    evaluation can never contain a near-duplicate of a training document
    — the leakage that row-level splitting reintroduces even AFTER
    dedup whenever clustering was approximate or keep-best retained one
    representative of many.

    ``weights`` is an ordered ``{split_name: fraction}`` summing to 1
    (±1e-9); the cluster key hashes through :func:`hash_bucket` (md5 —
    cross-engine replayable, NULL keys bucket together via its
    sentinel) and takes the name of the first cumulative threshold it
    falls under.  Deterministic under any partitioning and cluster
    size, and ONE map-side expression: no shuffle, no join — at 100 TB
    the split is free.  Compose: exact fingerprint or connected-
    component label -> cluster column -> this.

    CROSS-ENGINE THRESHOLD CONTRACT (ADVICE r8): the k-th boundary is

        t_k = floor( (Σ_{i<=k} Fraction(w_i)) * 2^32 )

    computed in EXACT rational arithmetic over the IEEE-double weight
    values (``fractions.Fraction(w)`` is the double's exact binary
    expansion), so the thresholds are independent of accumulation
    order — a float running sum would make ``{a:..., b:..., c:...}``
    boundaries depend on addition order, and an external replayer
    computing ``int(0.9 * 2**32)`` from the independent cumulative
    fraction could disagree by one bucket for adversarial weight lists.
    Replayers: either reuse these exact-rational thresholds, or note
    that for round decimal weights (0.8/0.1/0.1 etc.) ``int(cum_float *
    2**32)`` happens to coincide — the catalog oracle documents which
    it uses."""
    if not weights:
        raise ValueError("leakage_safe_split: weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(
            f"leakage_safe_split: all weights must be > 0, got {weights}"
        )
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"leakage_safe_split: weights must sum to 1, got {total}"
        )
    from fractions import Fraction

    h = hash_bucket(cluster_col, salt)
    names = list(weights)
    expr = None
    cum = Fraction(0)
    for name in names[:-1]:
        cum += Fraction(weights[name])  # exact: no accumulation-order drift
        cond = h < int(cum * _SCALE)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    # the last split takes the remainder, so integer rounding of the
    # thresholds can never leave a cluster unassigned
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr)


def hash_sample_by(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: Mapping[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Stratified deterministic sampling: per-stratum fractions (e.g.
    down-weight a dominant source, keep all of a rare one). Strata not
    listed get ``default``. One scan, no shuffle."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"hash_sample_by: fraction for {s!r} must be in [0, 1]")
    thresh = F.lit(int(default * _SCALE))
    col = c(strata)
    for s, f in fractions.items():
        thresh = F.when(col == s, F.lit(int(f * _SCALE))).otherwise(thresh)
    return df.filter(hash_bucket(key, salt) < thresh)


def epoch_shuffle(df: DataFrame, key: str, epoch: int = 0) -> DataFrame:
    """Deterministic global shuffle for a training epoch: order rows by
    ``md5(epoch-salt || key)``. Every epoch is an independent, fully
    reproducible permutation — unlike ``orderBy(rand())``, re-running
    the job (or resuming after failure) yields byte-identical batch
    order, and the order is auditable in SQL.

    The sort is a range-partitioned shuffle (Spark samples the hash
    space to build balanced ranges), which is exactly the one
    unavoidable shuffle any global training-order pass costs; the hash
    key is uniform so the ranges cannot skew. Ties (duplicate keys)
    break on the key itself, keeping the permutation total and stable.
    """
    h = hash_bucket(key, f"epoch={epoch}:")
    return df.orderBy(h.asc(), c(key).asc())


def weighted_mixture(
    sources: Mapping[str, DataFrame], key: str, weights: Mapping[str, float], salt: str = ""
) -> DataFrame:
    """Training-mixture construction: per-source deterministic sampling
    rates, unioned by name. ``weights`` are sampling fractions per
    source (not renormalized); missing sources are excluded entirely.
    The union is schema-aligned (``unionByName``), each branch a
    map-only filtered scan."""
    picked = []
    for name, frac in weights.items():
        if name not in sources:
            raise KeyError(f"weighted_mixture: unknown source {name!r}")
        picked.append(hash_sample(sources[name], key, frac, salt=salt))
    if not picked:
        raise ValueError("weighted_mixture: no sources selected")
    out = picked[0]
    for nxt in picked[1:]:
        out = out.unionByName(nxt)
    return out


def temperature_fractions(
    df: DataFrame,
    strata: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
) -> DataFrame:
    """Per-stratum sampling fractions from temperature-scaled size
    weights: ``p_s ∝ (n_s/N)^alpha`` (the multilingual-mixing rule of
    mT5/XLM-R — ``alpha < 1`` up-weights rare sources relative to their
    raw share; ``alpha = 1`` is proportional, ``alpha = 0`` uniform),
    then ``frac_s = min(1, target_rows · p_s / n_s)``.

    Returns ``(strata, n, frac)`` — a tiny table (one row per stratum)
    computed by one keyed count; everything after the count is
    expression-level on that tiny table, so nothing is collected to the
    driver. ``target_rows`` defaults to the corpus size (pure
    re-balancing).
    """
    if alpha < 0:
        raise ValueError(f"temperature_fractions: alpha must be >= 0, got {alpha}")
    counts = df.groupBy(c(strata).alias(strata)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    sizes = counts.agg(
        F.sum("n").cast("double").alias("__N"),
    )
    w = counts.crossJoin(F.broadcast(sizes)).withColumn(
        "__w", F.pow(F.col("n") / F.col("__N"), F.lit(float(alpha)))
    )
    z = w.agg(F.sum("__w").alias("__Z"), F.max("__N").alias("__N2"))
    tgt = (
        F.lit(float(target_rows)) if target_rows is not None else F.col("__N2")
    )
    return (
        w.crossJoin(F.broadcast(z))
        .withColumn(
            "frac",
            F.least(F.lit(1.0), tgt * (F.col("__w") / F.col("__Z")) / F.col("n")),
        )
        .select(strata, "n", "frac")
    )


def temperature_sample(
    df: DataFrame,
    key: str,
    strata: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-balanced resampling: compute
    :func:`temperature_fractions` and keep each row iff its hash bucket
    falls under its stratum's threshold. The fractions table (one row
    per stratum) BROADCASTS back onto the fact scan, so the corpus
    itself never shuffles — one count aggregation plus a map-only
    filtered scan, the same audit-friendly md5 selection as
    :func:`hash_sample` (stable across partitionings, nested across
    targets, SQL-replayable).

    The join back onto the scan is NULL-safe: ``temperature_fractions``
    counts the NULL stratum into N and assigns it a fraction like any
    other group, so a plain equi-join would silently drop every
    NULL-stratum row the fractions table had budgeted for —
    inconsistent with :func:`hash_bucket`'s deliberate NULL-key
    handling."""
    fr = temperature_fractions(df, strata, alpha, target_rows).select(
        c(strata).alias("__s"), F.floor(F.col("frac") * _SCALE).alias("__t")
    )
    return (
        df.join(F.broadcast(fr), c(strata).eqNullSafe(F.col("__s")))
        .filter(hash_bucket(key, salt) < F.col("__t"))
        .drop("__s", "__t")
    )


def top_fraction_by(
    df: DataFrame,
    by: list[str],
    score_col: Column | str,
    frac: float,
    tiebreak: list[str],
) -> DataFrame:
    """Keep the top ``frac`` of rows per group, ranked by ``score_col``
    descending — calibrated per-group filtering (the CCNet move: a
    global quality cutoff over-prunes low-resource languages, so the
    threshold is a per-language quantile instead of a constant).

    ``tiebreak`` columns must make the ordering total; with a total
    order the kept set is exactly reproducible across engines and
    partitionings (no percent_rank ties to wobble). Rank by a ROUNDED
    score when the score is a float computed differently elsewhere.

    One shuffle on ``by``; the row_number and count windows share the
    partitioning, so Catalyst plans a single exchange.
    """
    if not 0 < frac <= 1:
        raise ValueError("top_fraction_by: frac must be in (0, 1]")
    if not tiebreak:
        raise ValueError("top_fraction_by: tiebreak columns are required")
    from pyspark.sql import Window

    order = [c(score_col).desc(), *[F.col(t).asc() for t in tiebreak]]
    w = Window.partitionBy(*by).orderBy(*order)
    wc = Window.partitionBy(*by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__rn") <= F.ceil(F.round(F.lit(float(frac)) * F.col("__n"), 9)))
        .drop("__rn", "__n")
    )


def group_sample(
    df: DataFrame,
    keys: "list[str]",
    id_col: str,
    k: int,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """EXACTLY ``k`` rows per group (fewer if the group is smaller),
    chosen deterministically: rank rows inside each group by a seeded
    hash of their id and keep the first ``k``. Unlike fraction sampling
    (:func:`hash_sample_by`), the per-group yield is fixed — the
    "k examples per source/language" inspection and eval-set shape.

    Distributed shape: a rank<=k window over the group keys, which
    Spark executes with WindowGroupLimit — each map task keeps only its
    local top-k per key BEFORE the shuffle, so shuffle volume is
    ~k x groups, not the data. Changing ``seed`` redraws the sample;
    rows keep their draw across runs (resumable pipelines).

    ``hash_fn='md5'`` ranks by the md5 hex string instead — byte-equal
    in external engines (the correctness-gate path); xxhash64 is the
    8-byte production rank key. Both are uniform; a given (seed, id)
    draws differently under the two, so pick one per pipeline.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"group_sample: k must be >= 1, got {k}")
    if hash_fn == "xxhash64":
        rank_key = F.xxhash64(F.lit(seed), c(id_col))
    elif hash_fn == "md5":
        rank_key = F.md5(F.concat(F.lit(f"{seed}|"), c(id_col).cast("string")))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    w = Window.partitionBy(*[c(x) for x in keys]).orderBy(rank_key, c(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def mixture_plan(
    df: DataFrame,
    strata: str,
    weights: Mapping[str, float],
    token_budget: float,
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Token-budget training-mixture planner: given target mixture
    ``weights`` per stratum (domain/source — the recipe a pretraining
    run publishes, cf. the Pile's per-set epochs, Gao et al. 2021
    Table 1) and a total ``token_budget``, compute for every stratum
    the deterministic sampling rate that hits its share of the budget:
    ``rate = min(1, budget·w / tokens_available)``.

    Where :func:`temperature_fractions` derives weights from SIZES and
    counts ROWS, this takes the weights as the externally-specified
    recipe and budgets TOKENS — the unit checkpoints are priced in.

    Returns one row per stratum that appears in ``weights`` OR in the
    corpus: ``(strata, n_docs, n_tokens, target_weight, target_tokens,
    rate, expected_tokens, epochs, exhausted)``. ``exhausted`` marks
    strata whose every token is taken and the target share is STILL
    missed (``rate`` capped at 1) — the signal to re-weight, upsample,
    or find more data; ``epochs`` is the UNCAPPED ``budget·w / tokens``
    (the Pile's fractional per-source epoch count, Gao et al. 2021
    Table 1): how many passes over the stratum would fill its share if
    the pipeline repeats data. For strata WITH tokens, ``epochs > 1``
    iff ``exhausted``; a recipe stratum missing from the corpus is
    ``exhausted`` with ``epochs`` 0 — no number of passes over nothing
    fills a share, so check ``exhausted``, not ``epochs``, to find
    every under-supplied stratum.
    Strata in the corpus but not in the recipe get ``target_weight`` 0
    (planned out, listed so nothing disappears silently); recipe
    strata missing from the corpus get zero counts and ``exhausted``
    true. ``weights`` are renormalized to sum to 1 in iteration order.

    Plan shape: ONE keyed aggregation over the corpus (count + token
    sum, partial map-side); everything after is arithmetic on two
    STRATUM-sized tables (the counts × the recipe — Spark does not
    support a broadcast build for full-outer joins, so this join is a
    sort-merge over rows-per-stratum inputs, i.e. negligible; the
    corpus itself is never re-shuffled). Token counts are exact
    integers and the rate arithmetic is literal-double IEEE ops, so
    the whole plan replays bit-for-bit in the DuckDB oracle without
    any rounding step. Apply the plan with :func:`apply_mixture_plan`
    (same md5-bucket selection as :func:`hash_sample` — stable,
    nested, SQL-replayable).
    """
    if not weights:
        raise ValueError("mixture_plan: weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("mixture_plan: weights must be >= 0")
    if token_budget <= 0:
        raise ValueError(f"mixture_plan: token_budget must be > 0, got {token_budget}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("mixture_plan: weights must sum to > 0")
    norm = {k: float(w) / total_w for k, w in weights.items()}

    from hobbes_spark.functions.text import token_count

    spark = df.sparkSession
    toks = c(token_col).cast("bigint") if token_col is not None else token_count(c(text_col))
    counts = df.groupBy(c(strata).alias(strata)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("n_tokens"),
    )
    # type the recipe's stratum column from df's schema — a hardcoded
    # string here would make the full-outer join below lean on implicit
    # coercion for non-string strata (e.g. bigint domain ids), which can
    # silently miss keys or change the output column's type
    strata_type = df.schema[strata].dataType.simpleString()
    recipe = spark.createDataFrame(
        [(k, w) for k, w in norm.items()],
        f"{strata} {strata_type}, target_weight double",
    )
    # no broadcast hint: Spark can't broadcast-build a full-outer join
    # (the hint would be silently dropped with a warning); both sides
    # are stratum-sized, so the sort-merge here is trivially small
    joined = counts.join(recipe, strata, "full_outer").select(
        strata,
        F.coalesce("n_docs", F.lit(0).cast("bigint")).alias("n_docs"),
        F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
        F.coalesce("target_weight", F.lit(0.0)).alias("target_weight"),
    )
    target = F.lit(float(token_budget)) * F.col("target_weight")
    rate = F.when(
        (F.col("n_tokens") > 0) & (F.col("target_weight") > 0),
        F.least(F.lit(1.0), target / F.col("n_tokens")),
    ).otherwise(F.lit(0.0))
    return (
        joined.withColumn("target_tokens", F.floor(target).cast("bigint"))
        .withColumn("rate", rate)
        .withColumn(
            "expected_tokens", F.floor(F.col("rate") * F.col("n_tokens")).cast("bigint")
        )
        .withColumn(
            "epochs",
            F.when(
                (F.col("n_tokens") > 0) & (F.col("target_weight") > 0),
                target / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "exhausted",
            (F.col("target_weight") > 0)
            & (F.col("n_tokens").cast("double") < target),
        )
    )


def apply_mixture_plan(
    df: DataFrame,
    plan: DataFrame,
    strata: str,
    key: str,
    salt: str = "",
) -> DataFrame:
    """Materialize a :func:`mixture_plan`: keep each row iff its
    deterministic md5 bucket falls under its stratum's planned
    ``rate``. The plan is stratum-sized and BROADCASTS onto the corpus
    scan — a map-only filtered pass, no shuffle of the corpus; the
    same audit-friendly selection as :func:`hash_sample` (stable
    across partitionings, nested across budgets: raising the budget
    only ADDS documents). NULL-stratum rows join null-safely so a
    planned-out NULL stratum filters like any other."""
    pr = plan.select(
        c(strata).alias("__s"), F.floor(F.col("rate") * _SCALE).alias("__t")
    )
    return (
        df.join(F.broadcast(pr), c(strata).eqNullSafe(F.col("__s")), "left")
        .filter(hash_bucket(key, salt) < F.coalesce(F.col("__t"), F.lit(0)))
        .drop("__s", "__t")
    )


def systematic_weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    strata: str | None = None,
    salt: str = "",
    copies_col: str = "copies",
    shards: int | None = None,
) -> DataFrame:
    """Weight-proportional sample of exactly ``k`` draws per stratum
    (globally when ``strata`` is None) via SYSTEMATIC resampling — the
    particle-filter scheme (Kitagawa 1996; Douc & Cappé 2005 call it
    the lowest-variance of the classic resamplers): lay ``k`` evenly
    spaced pointers over the cumulative INTEGER weight line at
    ``(2j+1)·W/(2k)`` and take the row covering each pointer.

    Why this form and not Efraimidis-Elias ``u^(1/w)`` keys: the
    pointer arithmetic is pure integer math, so the selection is
    bit-identical in any engine — no ``pow``/``ln`` whose last-ulp
    differences across libm implementations could flip a rank at a
    rounding boundary (the repo-wide cross-engine policy; see
    ``expressions.md5_prefix_bigint``). Weights must be non-negative
    INTEGERS — which is the natural LLM-pipeline case: sample documents
    proportional to their token counts, so the expected token volume
    drawn from every document is equal.

    Mechanics: rows order by the deterministic hash shuffle
    ``hash_bucket(key, salt)`` (ties by key), the running weight sum
    ``cum`` comes from the shared two-pass distributed prefix scan
    (``functions/prefix.py`` — NOT one window per stratum), and row i
    is drawn ``g(cum_i) − g(cum_i − w_i)`` times where
    ``g(y) = (2k·y + W) div (2W)`` counts pointers ≤ y. All operands
    non-negative bigints, so ``div`` (truncation) equals floor in both
    engines. Σ copies = k exactly per stratum with W > 0; a row with
    ``w > W/k`` can be drawn more than once (weighted sampling with
    bounded replacement — the standard systematic behavior; cap weights
    upstream if strict without-replacement matters). ANSI mode turns
    the ``2k·y`` overflow (k·W ≥ 2^62) into a loud error, not a wrong
    sample.

    Returns the selected rows with ``copies_col`` (bigint ≥ 1) — keep
    it for upsampling-aware consumers or drop it for a plain sample.
    NULL/negative weights are rejected loudly (a silent coalesce-to-0
    would make "why is my doc missing" undebuggable at 100 TB).
    """
    from hobbes_spark.functions.prefix import default_shards, prefix_sum

    if k < 1:
        raise ValueError(f"systematic_weighted_sample: k must be >= 1, got {k}")
    from pyspark.sql.types import IntegralType

    if not isinstance(df.schema[weight_col].dataType, IntegralType):
        raise ValueError(
            f"systematic_weighted_sample: {weight_col!r} must be an integer "
            f"column (got {df.schema[weight_col].dataType.simpleString()}); "
            "pre-round fractional weights explicitly — silent rounding here "
            "would change who gets sampled"
        )
    by = [strata] if strata is not None else []
    out = df.withColumn("__h", hash_bucket(key, salt)).withColumn(
        "__w", c(weight_col).cast("bigint")
    )
    out = prefix_sum(out, by, [F.col("__h"), c(key)], "__w", "__cum", 
                     default_shards(out, "__h") if shards is None else shards)
    # totals derive from the PRISTINE input, not from `out`: a
    # totals-from-out self-join leaves two `__w` lineages in scope and
    # the analyzer rejects the later copies expression as ambiguous
    totals = df.groupBy(*[c(b) for b in by]).agg(
        F.sum(c(weight_col).cast("bigint")).alias("__tot")
    )
    if by:
        cond = c(by[0]).eqNullSafe(F.col("__sk"))
        totals = totals.select(c(by[0]).alias("__sk"), "__tot")
        out = out.join(F.broadcast(totals), cond).drop("__sk")
    else:
        out = out.crossJoin(F.broadcast(totals))
    bad = (F.col("__w") < 0) | c(weight_col).isNull()
    # NB: the total is named __tot, not __W — Spark resolves column
    # names case-insensitively by default, so __W would collide with __w
    copies = F.expr(
        f"CAST(({2 * k}L * __cum + __tot) div (2L * __tot) "
        f"- ({2 * k}L * (__cum - __w) + __tot) div (2L * __tot) AS BIGINT)"
    )
    out = out.withColumn(
        copies_col,
        F.when(bad, F.raise_error(F.lit(
            "systematic_weighted_sample: NULL or negative weight"
        )))
        # an all-zero-weight stratum has no pointer line at all (W = 0
        # would also be a div-by-zero under ANSI): nothing is drawn
        .when(F.col("__tot") <= 0, F.lit(0).cast("bigint"))
        .otherwise(copies),
    )
    return out.filter(F.col(copies_col) >= 1).drop("__h", "__w", "__cum", "__tot")


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.5,
    salt: str = "fim",
    pre_token: str = "<PRE>",
    suf_token: str = "<SUF>",
    mid_token: str = "<MID>",
) -> DataFrame:
    """Fill-in-the-middle training transform (round 10 — the code-model
    data-prep op): a deterministic ~``rate`` fraction of documents is
    rewritten in PSM order —
    ``<PRE> prefix <SUF> suffix <MID> middle`` — teaching the model to
    infill; the rest pass through unchanged.

    Everything is hash-derived from the DOCUMENT KEY (the
    :func:`hash_bucket` md5 machinery, salts ``{salt}``/``{salt}/c1``/
    ``{salt}/c2``), so the gate AND both character cut points are
    reproducible across engines, runs, retries and epochs — an external
    SQL oracle replays the exact same splits, and re-running the
    pipeline cannot leak a second variant of the same document into
    training.  Cut points are uniform over [0, L] character positions
    (min->lo, max->hi; middle = (lo, hi]), matching the public FIM
    recipe's uniform two-point split.  NULL text passes through NULL
    with ``is_fim`` false.  Pure Column expressions: map-only,
    codegen, zero shuffle at any scale."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"fim_transform: rate must be in [0, 1], got {rate}")
    text = c(text_col)
    length = F.length(text)
    gate = (
        (hash_bucket(id_col, salt) < int(rate * _SCALE))
        & text.isNotNull()
    )
    u1 = hash_bucket(id_col, f"{salt}/c1")
    u2 = hash_bucket(id_col, f"{salt}/c2")
    # floor(u * (L+1) / 2^32): uniform over the L+1 cut positions 0..L
    c1 = (u1 * (length + 1) / _SCALE).cast("long")
    c2 = (u2 * (length + 1) / _SCALE).cast("long")
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    prefix = F.substring(text, F.lit(1), lo)
    middle = F.substring(text, lo + 1, hi - lo)
    suffix = F.substring(text, hi + 1, length - hi)
    fim = F.concat(
        F.lit(pre_token), prefix, F.lit(suf_token), suffix,
        F.lit(mid_token), middle,
    )
    return df.withColumn("is_fim", gate).withColumn(
        "fim_text", F.when(gate, fim).otherwise(text)
    )


def span_corrupt(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_spans: int = 2,
    salt: str = "span",
    sentinel_fmt: str = "<extra_id_{i}>",
) -> DataFrame:
    """T5/UL2-style span-corruption prep (round 10, the denoising twin
    of :func:`fim_transform`): ``n_spans`` character spans per document
    are cut out and replaced by sentinels —

    * ``corrupt_input``:  kept text with ``<extra_id_k>`` where span k
      was;
    * ``corrupt_target``: ``<extra_id_k>`` + span k for every k, closed
      by the final sentinel ``<extra_id_n>``

    — the exact encoder/decoder pair the objective trains on.  All
    ``2 * n_spans`` cut points are hash-derived from the DOCUMENT KEY
    (:func:`hash_bucket`, salts ``{salt}/c0..``) and sorted in-plan
    (``array_sort``), so spans are reproducible across engines, runs
    and retries; spans may legitimately be empty or adjacent (two equal
    cuts), exactly as a uniform cut model allows.  NULL text yields
    NULL outputs.  Pure Column expressions — map-only, codegen, zero
    shuffle; at 100 TB this rides the training-export scan."""
    if n_spans < 1:
        raise ValueError(f"span_corrupt: n_spans must be >= 1, got {n_spans}")
    text = c(text_col)
    length = F.length(text)
    cuts = F.array_sort(F.array(*[
        (hash_bucket(id_col, f"{salt}/c{j}") * (length + 1) / _SCALE)
        .cast("long")
        for j in range(2 * n_spans)
    ]))

    def cut(k: int):  # 1-based into the sorted array
        return F.element_at(cuts, k)

    inp_parts = []
    tgt_parts = []
    prev_end = F.lit(0).cast("long")
    for k in range(n_spans):
        s, e2 = cut(2 * k + 1), cut(2 * k + 2)
        sent = F.lit(sentinel_fmt.format(i=k))
        inp_parts += [F.substring(text, prev_end + 1, s - prev_end), sent]
        tgt_parts += [sent, F.substring(text, s + 1, e2 - s)]
        prev_end = e2
    inp_parts.append(F.substring(text, prev_end + 1, length - prev_end))
    tgt_parts.append(F.lit(sentinel_fmt.format(i=n_spans)))
    return df.withColumn("corrupt_input", F.concat(*inp_parts)).withColumn(
        "corrupt_target", F.concat(*tgt_parts)
    )
