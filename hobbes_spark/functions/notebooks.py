"""Jupyter notebook (.ipynb) cell extraction — the third leg of the
code-corpus ingest family (markdown_to_text, code corpora, notebooks):
an ipynb is JSON (nbformat 4), and training pipelines want its CELLS —
markdown prose routed to the text stack, code cells to the code stack
— not the raw JSON envelope with outputs and metadata noise.

Pure Spark JSON ops: ``from_json`` with an explicit schema (never
schema inference on the hot path), ``zip_with`` to reconcile the
format's one wrinkle — ``source`` may legally be EITHER an array of
lines OR a single string (nbformat §4; both occur in the wild) — and
``posexplode`` to one row per cell.  Map-only + bounded explode
(notebooks hold tens-to-hundreds of cells), zero shuffle, JVM-side.

Reference parity note: beyond-reference surface (SURVEY §2.12 treats
payloads as opaque); the nbformat spec is public (nbformat.readthedocs
/ jupyter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["notebook_cells"]

#: explicit nbformat-4 schemas: one with array-of-lines source, one
#: with string source — PERMISSIVE from_json nulls the mismatching
#: field per cell, and zip_with coalesces the two parses
_NB_ARR = ("struct<nbformat int, "
           "metadata struct<kernelspec struct<language string>>, "
           "cells array<struct<cell_type string, source array<string>>>>")
_NB_STR = ("struct<nbformat int, "
           "metadata struct<kernelspec struct<language string>>, "
           "cells array<struct<cell_type string, source string>>>")


def notebook_cells(
    df: DataFrame, id_col: str = "doc_id", json_col: str = "raw"
) -> DataFrame:
    """One row per notebook cell: ``(id, cell_index, cell_type,
    language, source, n_lines)``.  ``source`` is the joined cell text
    (array-of-lines sources concatenate verbatim — nbformat lines keep
    their trailing newlines); ``n_lines`` is the stored line count
    (array length, or newline-split count for string sources).
    Documents that do not parse as a notebook (invalid JSON, no
    ``cells`` array) yield NO rows — same drop posture as the media
    parsers.  NULL cell_type survives as NULL (a malformed cell is
    visible, not invented)."""
    a = F.from_json(F.col(json_col), _NB_ARR)
    b = F.from_json(F.col(json_col), _NB_STR)
    cells = F.zip_with(
        a["cells"],
        b["cells"],
        lambda x, y: F.struct(
            F.coalesce(x["cell_type"], y["cell_type"]).alias("cell_type"),
            F.coalesce(
                F.when(x["source"].isNotNull(), F.array_join(x["source"], "")),
                y["source"],
            ).alias("source"),
            F.coalesce(
                F.when(x["source"].isNotNull(), F.size(x["source"])),
                F.size(F.split(y["source"], "\n")),
            ).alias("n_lines"),
        ),
    )
    lang = F.coalesce(
        a["metadata"]["kernelspec"]["language"],
        b["metadata"]["kernelspec"]["language"],
    )
    return (
        df.select(
            F.col(id_col),
            lang.alias("language"),
            F.posexplode(cells).alias("cell_index", "__cell"),
        )
        .select(
            id_col,
            F.col("cell_index").cast("int").alias("cell_index"),
            F.col("__cell.cell_type").alias("cell_type"),
            "language",
            F.col("__cell.source").alias("source"),
            F.col("__cell.n_lines").cast("int").alias("n_lines"),
        )
    )
