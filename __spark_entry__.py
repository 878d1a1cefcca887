"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``hobbes_spark.queries``; this file stays a
thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's flowerpot.hb pipeline
    (filter → group-by maxby → regex/int derive → nested-if state → slice)
    re-expressed on the orders table. Driver checks rows>0 on sf0.001."""
    from hobbes_spark.queries import QUERIES

    return QUERIES["flowerpot"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hobbes_spark.queries import QUERIES

    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from hobbes_spark.queries import QUERIES

    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
