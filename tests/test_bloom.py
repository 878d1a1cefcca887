"""Bloom-prefiltered joins: exactness vs the plain joins, the
no-false-negative invariant, and the plan shape (the definitely-absent
branch must reach the output without any join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hobbes_spark.operators.bloom import (
    bloom_anti_join,
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)

BITS = 1 << 16
K = 4


@pytest.fixture(scope="module")
def sides(spark):
    left = (
        spark.range(5000)
        .withColumn("k", F.concat(F.lit("key"), (F.col("id") % 1200).cast("string")))
        .withColumn("payload", F.col("id") * 2)
        .drop("id")
    )
    right = (
        spark.range(80)
        .withColumn("k", F.concat(F.lit("key"), (F.col("id") * 13).cast("string")))
        .select("k")
    )
    return left, right


def test_semi_equals_plain_semi(spark, sides):
    left, right = sides
    exp = sorted(r.payload for r in left.join(right, "k", "left_semi").collect())
    got = sorted(
        r.payload for r in bloom_semi_join(left, right, "k", BITS, K).collect()
    )
    assert got == exp and len(got) > 0


def test_anti_equals_plain_anti_and_keeps_nulls(spark, sides):
    left, right = sides
    left = left.unionByName(
        spark.sql("SELECT CAST(NULL AS STRING) AS k, CAST(-1 AS BIGINT) AS payload")
    )
    exp = sorted(
        (r.payload, r.k) for r in left.join(right, "k", "left_anti").collect()
    )
    got = sorted(
        (r.payload, r.k)
        for r in bloom_anti_join(left, right, "k", BITS, K).collect()
    )
    assert got == exp
    assert (-1, None) in got  # NULL keys survive anti (SQL semantics)


def test_no_false_negatives(spark, sides):
    left, right = sides
    bf = bloom_build(right, "k", BITS, K)
    tagged = bloom_might_contain(left, bf, "k", BITS, K)
    missed = (
        tagged.join(right, "k", "left_semi").filter(~F.col("__maybe")).count()
    )
    assert missed == 0


def test_anti_plan_bypasses_join_for_clean_rows(spark, sides):
    """The union's first branch (definitely absent) must contain no
    equi-join — only the maybe branch joins. One BroadcastNestedLoopJoin
    (the 1-row bitmap cross join) per branch is expected; exactly one
    equi-join total."""
    left, right = sides
    plan = (
        bloom_anti_join(left, right, "k", BITS, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_equi = plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert n_equi == 1
    assert "Union" in plan


def test_key_type_mismatch_raises(spark):
    """xxhash64 is width-sensitive: int-vs-bigint keys of the same value
    hash differently, so a mismatched pair would produce Bloom false
    NEGATIVES the exact join can't repair — must refuse up front."""
    left = spark.range(10).select(F.col("id").cast("int").alias("k"))
    right = spark.range(5).select(F.col("id").alias("k"))  # bigint
    with pytest.raises(ValueError, match="type mismatch"):
        bloom_semi_join(left, right, "k", BITS, K)
    with pytest.raises(ValueError, match="type mismatch"):
        bloom_anti_join(left, right, "k", BITS, K)
    # matched types after an explicit cast: exactness restored
    got = sorted(
        r.k
        for r in bloom_semi_join(
            left, right.select(F.col("k").cast("int")), "k", BITS, K
        ).collect()
    )
    assert got == [0, 1, 2, 3, 4]
