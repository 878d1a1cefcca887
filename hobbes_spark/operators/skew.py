"""Skew handling: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (one language, one event type, one
empty-string id) can pin an entire stage on one task. AQE's skew-join
splitting handles sort-merge *joins*; these helpers cover the two cases
it does not:

* :func:`salted_agg` — hot-key ``groupBy``: pre-aggregate on
  ``(key, salt)`` so every partial fits a task, then combine per key.
  Doubles the shuffle count but each shuffle is balanced; for algebraic
  reductions the result is exactly equal to the direct ``groupBy``.
* :func:`salted_join` — hot-key equi-join where the dimension side is
  too big to broadcast: replicate the dimension ``salts`` times, give
  each fact row a random salt, join on ``(key, salt)`` — every hot key
  spreads over ``salts`` tasks.

Salts are deterministic given ``seed`` (``F.rand(seed)``), so runs are
reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hobbes_spark.expressions import c

__all__ = ["salted_agg", "salted_join"]

#: reduction -> (per-salt partial, per-key combine) — algebraic pairs
#: whose two-phase composition equals the direct aggregation
_ALGEBRAIC: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    values: dict[str, str],
    salts: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Two-phase salted aggregation: ``values`` maps column -> reduction
    (sum/count/min/max; mean decomposes to sum+count automatically).

    Exactly equivalent to ``df.groupBy(keys).agg(...)`` — verified
    against it in tests — but no task ever holds more than ~1/salts of a
    hot key's rows.
    """
    means = [col for col, r in values.items() if r == "mean"]
    plain = {col: r for col, r in values.items() if r != "mean"}
    for col in means:
        plain[col] = "sum"

    partials: list[Column] = []
    combines: list[Column] = []
    # ordinal intermediate aliases (__p_0, not __p_<name>): a value
    # column whose NAME contains a dot would otherwise re-enter F.col as
    # struct-field access and fail resolution — the flat model produces
    # such names by design
    ordinal = {col: i for i, col in enumerate(values)}
    for col, red in plain.items():
        if red not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic reduction {red!r}; use groupBy directly")
        part, comb = _ALGEBRAIC[red]
        partials.append(part(c(col)).alias(f"__p_{ordinal[col]}"))
        combines.append(comb(F.col(f"__p_{ordinal[col]}")).alias(col))
    for col in means:
        # mean = sum / NON-NULL count, per column (avg semantics)
        partials.append(F.count(c(col)).alias(f"__pn_{ordinal[col]}"))
        combines.append(F.sum(F.col(f"__pn_{ordinal[col]}")).alias(f"__n_{ordinal[col]}"))

    salt = F.floor(F.rand(seed) * salts).cast("int")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*[c(k) for k in keys], F.col("__salt"))
        .agg(*partials)
    )
    out = stage1.groupBy(*[c(k) for k in keys]).agg(*combines)
    for col in means:
        out = out.withColumn(
            col, c(col) / F.nullif(F.col(f"__n_{ordinal[col]}"), F.lit(0))
        ).drop(f"__n_{ordinal[col]}")
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salts: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact`` has hot keys and ``dim`` is too big to
    broadcast: ``dim`` is replicated ``salts`` times, ``fact`` rows get
    a random salt, and the join key becomes ``(on, salt)``.

    Join semantics (inner/left/semi/anti) are unchanged — each fact row
    matches exactly the one dim replica carrying its salt. Right/full
    joins would surface each unmatched dim key once per replica and are
    rejected."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would "
            "multiply unmatched dim rows by the salt count"
        )
    overlap = (set(fact.columns) & set(dim.columns)) - {on}
    if overlap:
        # same guard as asof_join/range_join: duplicate non-key output
        # columns fail far away with AMBIGUOUS_REFERENCE
        raise ValueError(
            f"salted_join: overlapping non-key columns {sorted(overlap)}; "
            "rename or drop them on one side first"
        )
    salt = F.floor(F.rand(seed) * salts).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return f.join(d, on=[on, "__salt"], how=how).drop("__salt")
