"""Skew helpers and IVF ANN: exact equivalence for salted ops, recall
floor for the IVF index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hobbes_spark.functions.similarity import cosine_topk, ivf_topk
from hobbes_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """1 hot key carrying ~90% of rows + a long tail."""
    hot = spark.range(0, 9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(0, 1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_direct(spark, skewed):
    got = salted_agg(
        skewed, ["k"], {"v": "sum"}, salts=8
    ).withColumnRenamed("v", "s")
    want = skewed.groupBy("k").agg(F.sum("v").alias("s"))
    g = {r["k"]: r["s"] for r in got.collect()}
    w = {r["k"]: r["s"] for r in want.collect()}
    assert g.keys() == w.keys()
    assert all(abs(g[k] - w[k]) < 1e-6 for k in w)


def test_salted_agg_mean_and_count(spark, skewed):
    got = salted_agg(skewed, ["k"], {"v": "mean"}, salts=8)
    want = {r["k"]: r["m"] for r in skewed.groupBy("k").agg(F.avg("v").alias("m")).collect()}
    for r in got.collect():
        assert abs(r["v"] - want[r["k"]]) < 1e-9

    got2 = salted_agg(skewed, ["k"], {"v": "count"}, salts=8)
    want2 = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count("v").alias("n")).collect()}
    assert {r["k"]: r["v"] for r in got2.collect()} == want2


def test_salted_agg_rejects_nonalgebraic(skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(skewed, ["k"], {"v": "median"})


def test_salted_agg_balances_partitions(spark, skewed):
    """The stage-1 shuffle must spread the hot key over the salt space."""
    stage1 = (
        skewed.withColumn("__salt", F.floor(F.rand(42) * 8).cast("int"))
        .groupBy("k", "__salt")
        .count()
    )
    hot = stage1.filter(F.col("k") == "HOT").collect()
    assert len(hot) == 8  # all 8 salt cells occupied
    assert max(r["count"] for r in hot) < 9000 * 0.25  # no cell holds the key


def test_salted_join_equals_direct(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", 1.0)] + [(f"t{i}", float(i)) for i in range(50)], "k string, w double"
    )
    got = salted_join(skewed, dim, "k", salts=4).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    )
    want = skewed.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    )
    g = {r["k"]: (r["n"], round(r["s"], 6)) for r in got.collect()}
    w = {r["k"]: (r["n"], round(r["s"], 6)) for r in want.collect()}
    assert g == w


def test_salted_join_left_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("HOT", 1.0)], "k string, w double")
    got = salted_join(skewed, dim, "k", salts=4, how="left")
    assert got.count() == skewed.count()
    assert got.filter(F.col("w").isNull()).count() == 1000  # the tail


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, nlist=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF recall {recall:.2f} too low"
    # nprobe = nlist degenerates to exact search
    full = ivf_topk(emb, queries, k=5, nlist=8, nprobe=8)
    f = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f == e


def test_salted_mean_ignores_nulls(spark):
    """mean must divide by the NON-null count per column (avg semantics),
    not the group row count."""
    df = spark.createDataFrame(
        [("k", 2.0), ("k", None), ("k", 4.0)], "k string, v double"
    )
    got = salted_agg(df, ["k"], {"v": "mean"}, salts=4).collect()[0]["v"]
    assert abs(got - 3.0) < 1e-9


def test_salted_join_rejects_full(spark, skewed):
    dim = spark.createDataFrame([("HOT", 1.0)], "k string, w double")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(skewed, dim, "k", how="full")


def test_ivf_index_persists_and_searches_identically(spark, sf_dir, tmp_path):
    """Build once, write, read back, search: results must equal the
    one-shot ivf_topk (the index is a table, not session state)."""
    from hobbes_spark.functions.similarity import (
        ivf_build,
        ivf_read,
        ivf_search,
        ivf_topk,
    )
    from hobbes_spark.pipeline import Pipeline

    emb = Pipeline.table(spark, sf_dir, "embeddings").df
    queries = emb.limit(5)
    direct = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, queries, k=5, nlist=8, nprobe=8).collect()
    )
    assigned, centroids = ivf_build(emb, nlist=8)
    from hobbes_spark.functions.similarity import ivf_write

    ivf_write(str(tmp_path / "idx"), assigned, centroids)
    a2, c2 = ivf_read(spark, str(tmp_path / "idx"))
    stored = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_search(a2, c2, queries, k=5, nprobe=8).collect()
    )
    assert stored == direct and len(stored) == 25


def test_ragged_corpus_dim_raises(spark):
    """A mixed-dimension corpus must fail fast: the Arrow sign kernel
    signs other-dim vectors all-zero, which would silently collapse the
    ragged subset into one LSH bucket (Θ(m²) candidates, lost recall)."""
    from hobbes_spark.functions.similarity import corpus_dim

    ok = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, None)],
        "id bigint, v array<double>",
    )
    assert corpus_dim(ok, "v") == 2
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0, 5.0])], "id bigint, v array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        corpus_dim(ragged, "v")
    assert corpus_dim(ok.filter("id = 3"), "v") is None
