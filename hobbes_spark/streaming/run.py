"""Replay helpers: run a streaming plan to completion and hand back the
result as a normal DataFrame.

``availableNow`` processes everything currently in the source and
terminates — Spark's bounded-replay mode. This is how a streaming plan
gets an oracle check (the driver compares the replayed result against
DuckDB over the same parquet) and how backfills run in production: same
plan, bounded trigger.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def replay_to_df(
    stream_df: DataFrame,
    spark: SparkSession,
    mode: str = "complete",
    timeout_s: float = 600,  # must be > 0 (Spark rejects 0)
) -> DataFrame:
    """Run a streaming DataFrame with ``trigger(availableNow)`` into a
    memory sink; return the sink contents."""
    name = "replay_" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if not finished:
        q.stop()
        raise TimeoutError(
            f"stream replay did not finish within {timeout_s}s; "
            "partial results discarded (raise timeout_s for big backlogs)"
        )
    return spark.table(name)
