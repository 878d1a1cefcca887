"""Replay helpers: run a streaming plan to completion and hand back the
result as a normal DataFrame.

``availableNow`` processes everything currently in the source and
terminates — Spark's bounded-replay mode. This is how a streaming plan
gets an oracle check (the driver compares the replayed result against
DuckDB over the same parquet) and how backfills run in production: same
plan, bounded trigger.
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


@contextlib.contextmanager
def pinned_shuffle_partitions(spark: SparkSession, n: int | None):
    """Pin ``spark.sql.shuffle.partitions`` for the duration of a
    streaming query START (the value is captured into the checkpoint at
    first start — batch queries under AQE re-coalesce and don't care),
    then restore the session value. ``None`` is a no-op. The pin is
    session-global while held: start the stream inside the block and
    don't start unrelated queries concurrently (the replay helpers and
    the catalog's drain loops are all serial)."""
    if n is None:
        yield
        return
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def replay_to_df(
    stream_df: DataFrame,
    spark: SparkSession,
    mode: str = "complete",
    timeout_s: float = 600,  # must be > 0 (Spark rejects 0)
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame with ``trigger(availableNow)`` into a
    memory sink; return the sink contents.

    ``state_partitions``: shuffle/state partition count pinned for this
    query's start (see :func:`pinned_shuffle_partitions`) — pass
    :func:`hobbes_spark.streaming.source.source_scaled_partitions` of
    the source path to make state-store commit cost track input scale
    instead of the session constant. Results are partition-count
    independent; only the state layout changes."""
    name = "replay_" + uuid.uuid4().hex[:12]
    with pinned_shuffle_partitions(spark, state_partitions):
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


def uncommit_last_batch(checkpoint_dir: str) -> int:
    """Simulate a crash AFTER a trigger's sink write but BEFORE its
    offset commit: delete the newest commit file from a streaming
    checkpoint (plus the local filesystem's hidden ``.crc`` sidecar,
    which a real crash also loses — keeping it fails the re-commit
    rename).  On the next start Spark re-runs that batch with the same
    offsets and the same ``batch_id`` — exactly the replay an
    exactly-once sink must absorb.  Returns the replayed batch id.

    Recovery-drill utility: the restart-replay tests and the
    ``stream_restart_*`` catalog rows both kill-and-restart through
    this one spelling."""
    commits = os.path.join(checkpoint_dir, "commits")
    ids = sorted(int(f) for f in os.listdir(commits) if f.isdigit())
    if not ids:
        raise ValueError(f"uncommit_last_batch: no commits in {commits}")
    os.remove(os.path.join(commits, str(ids[-1])))
    crc = os.path.join(commits, f".{ids[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return ids[-1]
