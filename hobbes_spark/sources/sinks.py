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

__all__ = ["to_data_result", "to_json_rows", "checkpoint"]


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
    if not os.path.exists(path):
        pipeline.df.write.mode("overwrite").parquet(path)
    return pipeline.df.sparkSession.read.parquet(path)
