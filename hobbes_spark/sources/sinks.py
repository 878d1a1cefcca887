"""Sinks: the uniform ``DataResult`` wire format and cached materialization.

Reference wire format (`workers/localdata.worker/src/Data.fs:45-49`;
sample at `tools/visualizer/cli/src/Program.fs:49`)::

    {"columnNames": [...], "values": [[...], ...], "rowCount": N}

and the per-prefix result cache keyed ``md5(source):t1:t2…``
(`tools/workbench/src/Types.fs:176-184`).
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql import DataFrame

__all__ = ["to_data_result", "to_json_rows", "checkpoint", "write_partitioned", "write_bucketed"]


def _encode(v):
    """Typed JSON encode matching the reference's Format sink
    (`workers/calculator.worker/src/Processer.fs:40-66`): DateTime ISO,
    numbers raw, bool, null."""
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return v


def to_data_result(df: DataFrame) -> dict:
    """Materialize as a ``DataResult`` dict. Collects to the driver by
    design — this is the *export* boundary, used for final (small) results
    exactly like the reference's Format sink; never in the transform path.
    """
    cols = df.columns
    values = [[_encode(v) for v in row] for row in df.collect()]
    return {"columnNames": cols, "values": values, "rowCount": len(values)}


def to_data_result_json(df: DataFrame) -> str:
    return json.dumps(to_data_result(df))


def to_json_rows(df: DataFrame):
    """Row-major JSON objects (``df.toJSON`` — distributed encode)."""
    return df.toJSON()


def checkpoint(pipeline, base_dir: str) -> "DataFrame":
    """Per-prefix parquet checkpoint: write the pipeline's current result
    under its cache key and return a re-read DataFrame, truncating lineage
    — the Spark analog of the reference's uniform cache + ``dependsOn``
    chains (`workers/calculator.worker/src/Program.fs:25-56`)."""
    path = os.path.join(base_dir, pipeline.cache_key())
    # gate on the writer's _SUCCESS marker so a crashed partial write is
    # redone, never served. (Driver-local check: for object-store
    # base_dirs use the Hadoop FS API instead.)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pipeline.df.write.mode("overwrite").parquet(path)
    return pipeline.df.sparkSession.read.parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols=(),
    max_records_per_file: int | None = None,
    sort_within: tuple = (),
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink tuned against the 100 TB small-files
    problem: rows are clustered to their output partition before the
    write (one shuffle) so each Hive partition is written by few tasks
    instead of every task emitting a sliver into every partition;
    ``max_records_per_file`` re-splits oversized outputs, and
    ``sort_within`` orders rows inside files (better parquet stats ->
    better row-group pruning for readers filtering on those columns).
    """
    out = df
    if partition_cols:
        out = out.repartition(*[out[p] for p in partition_cols])
    if sort_within:
        # partition columns lead the sort: the dynamic-partition writer
        # demands ordering by them and would otherwise re-sort, throwing
        # away the sort_within order inside each file
        order = [*partition_cols, *sort_within]
        out = out.sortWithinPartitions(*[out[s] for s in order])
    writer = out.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple,
    num_buckets: int = 32,
    sort_cols: tuple = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed-table sink: pre-shuffles rows into ``num_buckets`` hash
    buckets on ``bucket_cols`` at write time, so every later equi-join or
    aggregation on those columns runs SHUFFLE-FREE — the join reads
    matching buckets side by side. This is the co-location lever for the
    repeatedly-joined 100 TB fact tables (pay the shuffle once at ingest,
    never per query). ``sort_cols`` additionally orders rows inside each
    bucket (sort-merge joins skip their sort stage too).

    Bucketing metadata lives in the session catalog (``saveAsTable``);
    read back with ``spark.table(table)``. Pick ``num_buckets`` so one
    bucket of the largest table fits an executor's memory — and keep it
    IDENTICAL across tables meant to join (differing counts re-shuffle).
    """
    if not bucket_cols:
        raise ValueError("write_bucketed: bucket_cols must be non-empty")
    if num_buckets <= 0:
        raise ValueError("write_bucketed: num_buckets must be positive")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
