#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-ish action that forces every
operator (df.write.format("noop") is the standard trick; we use
foreach-free collect-less materialization with write noop).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from hobbes_spark.queries import QUERIES
    from hobbes_spark.session import get_spark

    spark = get_spark("hobbes_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, spec in QUERIES.items() if spec.bench]
    # warm up the JVM + parquet footers once with the cheapest pipeline
    QUERIES[names[0]].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        spec = QUERIES[name]
        # best of 2: the first run pays one-time codegen/JIT compile
        # (3-6x noise locally, irrelevant at cluster scale); the second
        # measures the steady-state plan
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # the round-1 headline set, frozen: the catalog keeps growing, so the
    # all-queries total is not comparable across rounds — this subset is
    _R1_CORE = [
        "flowerpot", "group_all_sum", "group_maxby", "pivot_count",
        "moving_mean", "moving_partitioned", "join_on_field",
        "join_broadcast_dims", "text_stats", "dedup_exact",
        "minhash_pairs_fast", "cosine_topk", "curate_corpus",
        "salted_group_sum",
    ]
    core = round(sum(timings[n] for n in _R1_CORE if n in timings), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "value_core_r1": core,
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
