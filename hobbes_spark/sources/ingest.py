"""Ingestion to the uniform flat data model.

The reference flattens arbitrary nested JSON to dot-path columns
(``Iteration.IterationLevel2``; arrays to ``a.0``, ``a.1`` …) and sniffs
each value float -> DateTime -> int -> string
(``readValue``, `tools/visualizer/web/src/Server/Reader.fs:20-50`;
duplicate `tools/visualizer/cli/src/ODataProvider.fs:35-55`).

Spark reads nested JSON natively into ``StructType``/``ArrayType``, so
flattening is a *utility* here, not a data-model constraint — and the
sniffing cascade becomes a per-COLUMN decision (one schema pass) instead
of per-cell work, which is what makes it viable at 100 TB: the data path
is pure ``try_cast`` expressions inside codegen.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "flatten",
    "sniff_types",
    "read_json_uniform",
    "read_csv_uniform",
    "local_data",
    "rest_pages",
]


def _qseg(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _flat_exprs(
    schema: T.StructType, prefix: str, qprefix: str, array_sizes: dict[str, int]
):
    """Recursive dot-path column expressions for a (possibly nested)
    schema. The QUOTED path is built per level from each field's own
    name (never by re-splitting the joined alias): a source field whose
    name itself contains a dot — ``@odata.context`` is the canonical
    OData case — must quote as one segment, not get misread as
    struct-field access."""
    exprs = []
    for field in schema.fields:
        path = f"{prefix}.{field.name}" if prefix else field.name
        qpath = f"{qprefix}.{_qseg(field.name)}" if qprefix else _qseg(field.name)
        if isinstance(field.dataType, T.StructType):
            exprs.extend(_flat_exprs(field.dataType, path, qpath, array_sizes))
        elif isinstance(field.dataType, T.ArrayType):
            n = array_sizes.get(path, 0)
            elem = field.dataType.elementType
            for i in range(n):
                # F.get, not getItem: widths come from the MAX length, so
                # shorter rows must widen with NULL (the reference's
                # per-record widening) — under ANSI mode getItem throws
                # INVALID_ARRAY_INDEX on the first ragged row instead
                if isinstance(elem, T.StructType):
                    for sub in elem.fields:
                        exprs.append(
                            F.get(F.col(qpath), i).getField(sub.name)
                            .alias(f"{path}.{i}.{sub.name}")
                        )
                else:
                    exprs.append(F.get(F.col(qpath), i).alias(f"{path}.{i}"))
        else:
            exprs.append(F.col(qpath).alias(path))
    return exprs


def _array_paths(schema: T.StructType, prefix: str, qprefix: str):
    """(alias_path, quoted_path) of every array field at ANY struct
    depth — the same recursion as ``_flat_exprs``, so no array column a
    flatten would emit can be missed by the width scan (a two-deep
    ``a.b.c`` array used to silently disappear)."""
    out = []
    for field in schema.fields:
        path = f"{prefix}.{field.name}" if prefix else field.name
        qpath = f"{qprefix}.{_qseg(field.name)}" if qprefix else _qseg(field.name)
        if isinstance(field.dataType, T.StructType):
            out.extend(_array_paths(field.dataType, path, qpath))
        elif isinstance(field.dataType, T.ArrayType):
            out.append((path, qpath))
    return out


def flatten(df: DataFrame) -> DataFrame:
    """Flatten nested structs to ``a.b`` columns and arrays to indexed
    ``a.0 … a.{maxlen-1}`` columns, recursively (one level of array
    nesting, like the reference's row-local recursion).

    Array widths need a max-length scan (single agg job over just the
    array columns); the reference pays the same cost implicitly by
    widening per record.
    """
    pairs = _array_paths(df.schema, "", "")
    sizes: dict[str, int] = {}
    if pairs:
        row = df.agg(
            *[F.max(F.size(F.col(q))).alias(str(i)) for i, (_, q) in enumerate(pairs)]
        ).first()
        sizes = {ap: max(row[str(i)] or 0, 0) for i, (ap, _) in enumerate(pairs)}
    return df.select(*_flat_exprs(df.schema, "", "", sizes))


def sniff_types(
    df: DataFrame,
    sample_rows: int | None = None,
    decimal_comma: bool = False,
) -> DataFrame:
    """Per-column type inference with the reference's cascade
    float -> timestamp -> int -> string (`Reader.fs:25-37`), lifted from
    per-cell to per-column: a column converts to type ``t`` iff every
    non-empty value try_casts to ``t``.

    Empty strings count as missing (the reference treats ``''`` as the
    empty value — `MTTR.hb:18`) and become NULL in the typed output.
    One aggregate pass decides; the rewrite is pure ``try_cast``.

    ``decimal_comma=True`` parses numerics under a comma-decimal locale
    ("1.234,56" → 1234.56). A value only counts as locale-numeric when
    its dots sit in PROPER 3-digit group positions (``1.234.567,89``) —
    blind dot-stripping would "parse" dotted dates ("02.01.2024" →
    2012024.0), version strings and IPs as garbage doubles, silently
    corrupting exactly the locale data the flag targets; malformed
    grouping (including the ambiguous "1.5") falls through the cascade
    to timestamp/string instead. The reference itself is split on
    locale handling: its two ``readValue`` copies disagree
    (`Reader.fs:25-37` parses invariant-culture,
    `ODataProvider.fs:36-48` uses the host culture — SURVEY §1.3), so
    the behavior is an explicit flag here rather than an ambient host
    setting; default stays invariant. Timestamps sniff from the
    ORIGINAL text either way.
    """
    string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not string_cols:
        return df
    probe = df.limit(sample_rows) if sample_rows else df
    from hobbes_spark.expressions import c as _c

    def numeric_text(v):
        if not decimal_comma:
            return v
        shaped = v.rlike(r"^[+-]?(\d+|\d{1,3}(\.\d{3})+)(,\d+)?$")
        return F.when(
            shaped, F.translate(F.translate(v, ".", ""), ",", ".")
        )

    checks = []
    for col in string_cols:
        v = F.when(_c(col) == "", None).otherwise(_c(col))
        nv = numeric_text(v)
        checks.append(F.count(v).alias(f"{col}#sniff_n"))
        checks.append(F.count(nv.try_cast("double")).alias(f"{col}#sniff_d"))
        checks.append(F.count(F.try_to_timestamp(v)).alias(f"{col}#sniff_t"))
        checks.append(F.count(nv.try_cast("bigint")).alias(f"{col}#sniff_i"))
    row = probe.agg(*checks).first()
    out = []
    for field in df.schema.fields:
        col = field.name
        if col not in string_cols:
            out.append(F.col(f"`{col}`"))
            continue
        v = F.when(_c(col) == "", None).otherwise(_c(col))
        nv = numeric_text(v)
        n = row[f"{col}#sniff_n"]
        if n == 0:
            out.append(v.alias(col))  # all missing: keep as (null) string
        elif row[f"{col}#sniff_d"] == n:
            # float FIRST, matching the reference cascade (Reader.fs:25-37
            # tries float before int): an all-integer column types as
            # double, exactly as it would there.
            out.append(nv.try_cast("double").alias(col))
        elif row[f"{col}#sniff_t"] == n:
            out.append(F.try_to_timestamp(v).alias(col))
        elif row[f"{col}#sniff_i"] == n:
            # unreachable in practice (ints parse as doubles); kept as a
            # safety net for exotic numerics the double parser rejects
            out.append(nv.try_cast("bigint").alias(col))
        else:
            out.append(v.alias(col))
    return df.select(*out)


def read_json_uniform(spark: SparkSession, path_or_rdd, multiline: bool = False) -> DataFrame:
    """JSON -> flat dot-path columns -> sniffed types: the reference's
    whole ingestion story (`Reader.fs:20-50`) in three declarative steps."""
    df = spark.read.option("multiLine", multiline).json(path_or_rdd)
    return sniff_types(flatten(df))


def local_data(spark: SparkSession, columns: Sequence[str], rows: Iterable[Sequence]) -> DataFrame:
    """``provider: localdata`` — inline table literal: ``columns`` +
    row-major ``rows`` of JSON scalars
    (`workers/localdata.worker/src/Data.fs:12-49`)."""
    return spark.createDataFrame([tuple(r) for r in rows], schema=list(columns))


def rest_pages(
    spark: SparkSession,
    pages: Sequence[str],
    values_field: str | None = None,
    sniff: bool = True,
) -> DataFrame:
    """``provider: rest`` with one or many fetched page bodies: parse each
    JSON page, optionally descend into the named array field, union all
    (`tools/visualizer/cli/src/Program.fs:131-178`).

    Network fetch is out of engine scope (the reference's collectors are
    separate workers); this takes the page *bodies* and does the uniform
    parse. Pages parallelize across the cluster via ``parallelize``.

    ``sniff=False`` returns the flattened frame with every column cast
    to string, deferring the type cascade — for callers that union
    several feeds and must sniff ONCE over the union so the same
    column can't type differently per feed (see
    :func:`hobbes_spark.sources.collectors.read_azdo_commits`).
    """
    rdd = spark.sparkContext.parallelize(list(pages), max(1, min(len(pages), 64)))
    df = spark.read.json(rdd)
    if values_field and values_field in df.columns:
        field = df.schema[values_field].dataType
        if not (isinstance(field, T.ArrayType) and isinstance(field.elementType, T.StructType)):
            raise ValueError(
                f"values field {values_field!r} holds no records "
                f"(inferred {field.simpleString()}) — empty feed?"
            )
        df = df.select(F.explode(F.col(values_field)).alias("__v")).select("__v.*")
    flat = flatten(df)
    if not sniff:
        from hobbes_spark.expressions import c as _c

        return flat.select(
            *[_c(col).cast("string").alias(col) for col in flat.columns]
        )
    return sniff_types(flat)


def read_csv_uniform(
    spark: SparkSession,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    decimal_comma: bool = False,
) -> DataFrame:
    """CSV -> sniffed types, through the same per-column cascade as the
    JSON path (float -> timestamp -> int -> string, `Reader.fs:25-37`).

    The file is read all-string deliberately — Spark's own
    ``inferSchema`` samples rows and follows different locale/precision
    rules, while :func:`sniff_types` applies the reference's semantics
    (a column types as ``t`` iff EVERY non-empty value casts, empty
    string = missing) in one aggregate pass over the full data. CSV is
    already flat, so no flatten step.
    """
    df = (
        spark.read.option("header", header)
        .option("delimiter", delimiter)
        .option("inferSchema", False)
        .csv(path)
    )
    return sniff_types(df, decimal_comma=decimal_comma)
