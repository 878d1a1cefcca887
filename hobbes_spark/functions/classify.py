"""Hashing-trick linear text classification (fastText-shaped scoring).

The standard quality-classifier deployment for pretraining corpora
(e.g. the GPT-3 / PaLM "quality filter" stage) is: train a linear model
offline, then score billions of documents with it. The scoring pass is
what has to scale, and its Spark shape is fixed regardless of where the
weights came from:

* tokens → feature buckets via the hashing trick (no vocabulary file,
  bounded dimensionality, identical on any engine);
* bucket → weight through a **broadcast** of the (tiny) weight vector —
  a model of a few thousand floats joined map-side against a corpus of
  any size;
* per-document mean pooling + sigmoid — one keyed groupBy with
  map-side partial aggregation.

One shuffle total, keyed by document id. No Python in the row path.

Weights are supplied as a ``(bucket, weight)`` DataFrame (scored via
broadcast join). :func:`pseudo_weights` generates a deterministic
weight table from the bucket id — a stand-in "model" whose values any
SQL engine can reproduce, so the full scoring path carries a value-hash
oracle (the plumbing under a real trained model is byte-identical).

Bucketing reuses :func:`hobbes_spark.functions.sampling.hash_bucket`
(md5-derived 32-bit uniform), the repo's cross-engine hash convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hobbes_spark.expressions import c
from hobbes_spark.functions.sampling import hash_bucket
from hobbes_spark.functions.text import tokens

__all__ = [
    "feature_bucket", "pseudo_weights", "linear_text_scores",
    "ridge_gram", "ridge_fit", "ridge_score",
]


def feature_bucket(token: Column | str, dim: int = 1024, salt: str = "") -> Column:
    """Hashing-trick feature index in [0, dim) for one token."""
    return (hash_bucket(token, salt) % F.lit(dim)).cast("bigint")


def pseudo_weights(spark, dim: int = 1024) -> DataFrame:
    """Deterministic stand-in weight vector: weight(b) is a Knuth
    multiplicative hash of the bucket id mapped into [-0.5, 0.5).
    Replace with real trained weights in production; the scoring plan
    is identical either way.

    Weights are exact multiples of 2^-20 (dyadic rationals), so the
    per-document weight SUM is exact in IEEE doubles in ANY addition
    order — no engine/partitioning-dependent last-ulp drift, which
    matters because a half-up rounding boundary can otherwise flip on
    the order Spark's partial aggregates happen to combine in (observed
    once at sf0.01 before this was pinned)."""
    return spark.range(dim).select(
        F.col("id").cast("bigint").alias("bucket"),
        (
            ((F.col("id") * F.lit(2654435761)) % F.lit(1048576)).cast("double")
            / F.lit(1048576.0)
            - F.lit(0.5)
        ).alias("weight"),
    )


def linear_text_scores(
    df: DataFrame,
    text_col: str,
    weights: DataFrame,
    id_col: str = "doc_id",
    dim: int = 1024,
    bias: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Score every document with a linear bag-of-hashed-tokens model.

    Returns ``(id_col, n_tokens, logit, score, label)`` where
    ``logit = bias + mean(weight[bucket(token)])``, ``score`` is the
    sigmoid of the logit and ``label = score >= 0.5``. Empty documents
    get ``logit = bias`` (mean over zero tokens contributes nothing).

    ``weights`` must be ``(bucket, weight)`` with one row per bucket in
    [0, dim); missing buckets are treated as weight 0 via the left join.

    ``explode_outer`` (not ``explode``) keeps one NULL-token row per
    empty document, so a single keyed groupBy scores every doc — no
    second corpus shuffle to re-attach token-less rows.
    """
    toks = df.select(
        c(id_col).alias(id_col),
        F.explode_outer(tokens(F.lower(c(text_col)))).alias("__tok"),
    ).withColumn(
        "bucket",
        F.when(F.col("__tok").isNotNull(), feature_bucket(F.col("__tok"), dim, salt)),
    )
    w = F.broadcast(weights.select("bucket", "weight"))
    pooled = (
        toks.join(w, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("__tok").cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__wsum"),
        )
    )
    logit = F.lit(bias) + F.coalesce(
        F.col("__wsum") / F.nullif(F.col("n_tokens"), F.lit(0)), F.lit(0.0)
    )
    return (
        pooled.withColumn("logit", logit)
        .withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))
        .withColumn("label", (F.col("score") >= 0.5))
        .drop("__wsum")
    )


def ridge_gram(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
) -> DataFrame:
    """ONE-row Gram summary of a labeled table: ``n``, every
    ``g_i_j = Σ x_i·x_j`` (upper triangle) and ``b_i = Σ x_i·y`` — the
    sufficient statistics of a least-squares/ridge fit, as ONE
    aggregation over the corpus.

    This is the 100 TB shape of linear-probe training: the corpus-sized
    work is a single scan with map-side partial aggregation producing
    d·(d+3)/2 + 1 numbers; the d×d solve that follows is driver-side
    arithmetic on kilobytes (:func:`ridge_fit`). Features and label
    must be INTEGER-valued columns (token counts, char counts, flags):
    products and sums then stay in exact bigint arithmetic — no
    accumulation-order float drift, so an external engine replays every
    cell bit-for-bit. ANSI mode raises loudly on bigint overflow
    (Σ x_i·x_j past 2^63) instead of wrapping; rescale features first
    if that fires.

    NULLs are rejected IN-PLAN (the ``systematic_weighted_sample``
    pattern): ``F.sum`` skips NULLs per-cell while ``n`` counts every
    row, so a NULL anywhere would make the sufficient statistics
    mutually inconsistent — different cells aggregated over different
    row subsets, a Gram matrix corresponding to no actual dataset.
    Filter or fill upstream; a silent coalesce-to-0 here would fit the
    wrong model without telling anyone.
    """
    if not feature_cols:
        raise ValueError("ridge_gram: feature_cols must be non-empty")
    from pyspark.sql.types import IntegralType

    for col in [*feature_cols, label_col]:
        if not isinstance(df.schema[col].dataType, IntegralType):
            raise ValueError(
                f"ridge_gram: {col!r} must be an integer column (got "
                f"{df.schema[col].dataType.simpleString()}) — integer "
                "sufficient statistics are what make the fit exactly "
                "reproducible across engines"
            )

    def _nn(name: str) -> Column:
        return F.when(
            c(name).isNull(),
            F.raise_error(F.lit(
                f"ridge_gram: NULL in column {name!r} — NULL rows would "
                "make the Gram sufficient statistics inconsistent "
                "(sum skips them, n counts them); filter or fill first"
            )),
        ).otherwise(c(name).cast("bigint"))

    xs = [_nn(f) for f in feature_cols]
    y = _nn(label_col)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i, xi in enumerate(xs):
        for j in range(i, len(xs)):
            aggs.append(F.sum(xi * xs[j]).alias(f"g_{i}_{j}"))
    for i, xi in enumerate(xs):
        aggs.append(F.sum(xi * y).alias(f"b_{i}"))
    return df.groupBy().agg(*aggs)


def ridge_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    l2: float = 1.0,
    dp: int = 6,
) -> list[float]:
    """Closed-form ridge regression ``w = (G + λI)^{-1} b`` from
    :func:`ridge_gram`'s exact integer sufficient statistics — the
    linear quality-probe fit (train on a labeled slice, then score the
    corpus with :func:`ridge_score`). One Spark job; the solve is a
    driver-side d×d ``numpy.linalg.solve`` (kilobytes — the
    kmeans-centroid driver-scalar precedent). Weights round half-up to
    ``dp`` decimals with the IEEE-exact ``floor(x·10^dp + 0.5)/10^dp``
    so downstream scoring expressions are engine-reproducible given the
    same weights."""
    import numpy as np

    if l2 < 0:
        raise ValueError(f"ridge_fit: l2 must be >= 0, got {l2}")
    row = ridge_gram(df, feature_cols, label_col).first()
    # an empty input yields NULL sums (count()=0): float(None) would
    # crash opaquely in the loop below — name the real problem instead
    if row["n"] == 0:
        raise ValueError("ridge_fit: input DataFrame has no rows — nothing to fit")
    d = len(feature_cols)
    G = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = float(row[f"g_{i}_{j}"])
    b = np.array([float(row[f"b_{i}"]) for i in range(d)])
    try:
        w = np.linalg.solve(G + l2 * np.eye(d), b)
    except np.linalg.LinAlgError as exc:
        # only reachable with l2 == 0: λI makes G + λI positive definite
        raise ValueError(
            f"ridge_fit: Gram matrix is singular (linearly dependent "
            f"features) and l2={l2} adds no regularization — raise l2 "
            "or drop the dependent feature"
        ) from exc
    import math

    return [math.floor(x * 10**dp + 0.5) / 10**dp for x in w]


def ridge_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "score",
) -> DataFrame:
    """Map-only linear scoring with fixed literal ``weights`` (from
    :func:`ridge_fit` or anywhere): ``Σ w_i·x_i`` as one codegen
    expression — the corpus never shuffles, and with exact-arithmetic
    weights the scores replay identically in any engine."""
    if len(weights) != len(feature_cols):
        raise ValueError(
            f"ridge_score: {len(weights)} weights for "
            f"{len(feature_cols)} features"
        )
    expr = F.lit(0.0)
    for w, f in zip(weights, feature_cols):
        expr = expr + F.lit(float(w)) * c(f).cast("double")
    return df.withColumn(out_col, expr)
