"""Resolve a ``.hb`` program's provider header into a source Pipeline.

The reference routes each provider name to a collector worker
(`workers/syncronization.worker/src/Program.fs:55-63`); here the header
maps to a reader:

* ``provider: odata``     — ``url`` + ``select``/``filter``/``expand``
  via :func:`hobbes_spark.sources.odata.read_odata` (fetcher injected —
  the ``user``/``pwd`` header values are credentials for *your* fetcher)
* ``provider: rest``      — one or many ``url`` entries, optional
  ``values:`` array field (`Logic Commit Frequency.hb:1-21`)
* ``provider: localdata`` — inline ``columns`` + ``rows`` or a named
  table from the caller (`workers/localdata.worker/src/Data.fs:12-49`)
* ``provider: git``       — commit history of a local clone via
  :func:`hobbes_spark.sources.collectors.read_git_commits` (the
  git.worker's collection step, `.gitmodules:16-18`)
* ``provider: parquet``   — engine-native path (beyond-reference)
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

from hobbes_spark.pipeline import Pipeline

__all__ = ["resolve_source", "run_hb_program"]


def _get(props: Mapping, key: str):
    v = props.get(key)
    return v.strip() if isinstance(v, str) else v


def resolve_source(
    spark: SparkSession,
    properties: Mapping,
    tables: Mapping[str, DataFrame] | None = None,
    fetcher: Callable[[str], str] | None = None,
) -> Pipeline:
    provider = (_get(properties, "provider") or "").lower()
    meta = properties.get("meta") or {}
    name = (meta.get("name") if isinstance(meta, Mapping) else None) or _get(
        properties, "name"
    )

    if provider == "parquet":
        return Pipeline.from_parquet(spark, _get(properties, "url"))

    if provider == "localdata":
        if tables and name in (tables or {}):
            return Pipeline.of(tables[name], f"localdata:{name}")
        cols = properties.get("columns")
        rows = properties.get("rows")
        if cols and rows is not None:
            import json

            from hobbes_spark.sources.ingest import local_data

            # header values are strings: columns as '- a' list items, rows
            # as '- [1, "x"]' JSON arrays
            if isinstance(cols, str):
                cols = cols.split()
            rows = [json.loads(r) if isinstance(r, str) else r for r in rows]
            return Pipeline.of(local_data(spark, cols, rows), "localdata:inline")
        raise ValueError(
            f"localdata needs an inline columns/rows pair or a table named "
            f"{name!r} passed via tables="
        )

    if provider == "odata":
        if fetcher is None:
            raise ValueError(
                "provider: odata needs a fetcher (the reference's collector "
                "workers own the network; pass fetcher=lambda url: <body>)"
            )
        from hobbes_spark.sources.odata import odata_url, read_odata

        url = odata_url(
            _get(properties, "url"),
            select=_get(properties, "select"),
            filter=_get(properties, "filter"),
            expand=_get(properties, "expand"),
        )
        return Pipeline.of(read_odata(spark, url, fetcher), f"odata:{url}")

    if provider == "git":
        # the git.worker's job on a local clone (`.gitmodules:16-18`;
        # the submodule is private — contract reconstructed from the
        # public AzDO commit shape its feeds surface)
        from hobbes_spark.sources.collectors import read_git_commits

        path = _get(properties, "url") or _get(properties, "path")
        if not path:
            raise ValueError("provider: git needs a url/path to a local clone")
        return Pipeline.of(read_git_commits(spark, path), f"git:{path}")

    if provider == "rest":
        if fetcher is None:
            raise ValueError("provider: rest needs a fetcher")
        from hobbes_spark.sources.ingest import rest_pages

        urls = properties.get("url")
        if not urls:
            raise ValueError(
                "provider: rest needs at least one url header entry"
            )
        if isinstance(urls, str):
            urls = [urls]
        pages = [fetcher(u) for u in urls]
        return Pipeline.of(
            rest_pages(spark, pages, values_field=_get(properties, "values")),
            "rest",
        )

    raise ValueError(f"unknown provider {provider!r}")


def run_hb_program(
    spark: SparkSession,
    text: str,
    tables: Mapping[str, DataFrame] | None = None,
    fetcher: Callable[[str], str] | None = None,
) -> Pipeline:
    """Parse + resolve the provider header + execute: the whole §3.1
    lifecycle (`.hb` text → provider fetch → flatten → transform fold)."""
    from hobbes_spark.hb.compiler import compile_hb

    prog, run = compile_hb(text)
    source = resolve_source(spark, prog.properties, tables=tables, fetcher=fetcher)
    return run(source)
