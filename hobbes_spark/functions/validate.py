"""Declarative data-quality validation: constraint checks as ONE
aggregate pass (the Deequ-shaped gate a production pipeline runs before
publishing a table).

Each check compiles to an aggregate expression; ``validate`` evaluates
every row-level check in a single scan with map-side partial
aggregation, so a 100 TB table pays one pass regardless of how many
constraints it declares. Uniqueness is the only check that needs
distinct state — it rides the same aggregate via ``count_distinct``
(Expand-based exact; swap to ``approx_count_distinct`` for a cheap
screen at extreme cardinalities).

Output is long-form — one row per check: ``(check, n_violations,
passed)`` — so the report itself is pipeline-friendly (filter
``NOT passed``, alert, block the publish).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hobbes_spark.expressions import c as _c


def _count_if(cond: Column) -> Column:
    # coalesce: SUM over ZERO rows is NULL — an empty frame must report
    # 0 violations / passed=true, not a NULL that vanishes from a
    # `passed == False` filter while failing a `passed == True` gate
    return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast("bigint")


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", _count_if(_c(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = _c(col)
    return (
        f"in_range({col},{lo},{hi})",
        _count_if(c.isNotNull() & ((c < lo) | (c > hi))),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    c = _c(col)
    vals = ",".join(str(v) for v in values)
    return (
        f"accepted_values({col},[{vals}])",
        _count_if(c.isNotNull() & ~c.isin(values)),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = _c(col)
    return (
        f"matches({col},{pattern})",
        _count_if(c.isNotNull() & ~c.rlike(pattern)),
    )


def unique(*cols: str) -> tuple[str, Column]:
    # _c, not F.col: the flat model's dot-path names (Iteration.Level2)
    # must not parse as struct access — same convention as every module
    key = F.struct(*[_c(col) for col in cols])
    return (
        f"unique({','.join(cols)})",
        (F.count(key) - F.count_distinct(key)).cast("bigint"),
    )


def validate(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate all checks in one aggregate pass; one report row per
    check: ``(check, n_violations, passed)``."""
    entries = [
        F.struct(
            F.lit(name).alias("check"), expr.alias("n_violations")
        )
        for name, expr in checks
    ]
    agg = df.agg(F.array(*entries).alias("__checks"))
    return agg.select(F.explode("__checks").alias("c")).select(
        "c.check",
        "c.n_violations",
        (F.col("c.n_violations") == 0).alias("passed"),
    )
