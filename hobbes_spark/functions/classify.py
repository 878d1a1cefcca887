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

__all__ = ["feature_bucket", "pseudo_weights", "linear_text_scores"]


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
