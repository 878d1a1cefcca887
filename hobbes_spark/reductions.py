"""The reference's reduction set as Spark aggregate builders.

Grammar-fixed set (`hobbes.YAML-tmLanguage:14`):
``count distinct max mean median min stddev sum variance``.

Typing rules (SURVEY §2.4): a bare ``group by ks -> R`` applies ``R`` to
*every remaining column*; numeric-only reductions drop non-numeric columns
(Deedle numeric aggregation behavior, [inferred] — the oracle SQL in
``__spark_entry__.py`` pins the same rule so it is verified per round).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "REDUCTIONS",
    "NUMERIC_ONLY",
    "reduction_fn",
    "is_numeric_type",
    "numeric_columns",
]

REDUCTIONS: dict[str, Callable[[Column], Column]] = {
    "count": F.count,
    "distinct": F.count_distinct,
    "max": F.max,
    "mean": F.avg,
    "median": F.median,  # exact median (Spark 3.4+), matches DuckDB median
    "min": F.min,
    "stddev": F.stddev_samp,
    "sum": F.sum,
    "variance": F.var_samp,
}

#: reductions that only make sense on numeric columns; applying a bare
#: ``group by -> R`` with one of these drops non-numeric columns.
NUMERIC_ONLY = frozenset({"mean", "median", "stddev", "sum", "variance"})

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def reduction_fn(name: str) -> Callable[[Column], Column]:
    try:
        return REDUCTIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown reduction {name!r}; expected one of {sorted(REDUCTIONS)}"
        ) from None


def is_numeric_type(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC_TYPES)


def numeric_columns(df) -> list[str]:
    """Names of numeric columns, in schema order."""
    return [f.name for f in df.schema.fields if is_numeric_type(f.dataType)]
