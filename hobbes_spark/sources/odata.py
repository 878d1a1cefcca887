"""The ``provider: odata`` source: query-option assembly, pagination,
uniform parse.

Reference behavior (`tools/visualizer/cli/src/ODataProvider.fs`):
``$filter``/``$select``/``$expand`` written into the URL (:97-112), the
page loop follows ``@odata.nextLink`` until absent (:76-95), and each
page's ``value`` array is flattened into dot-path columns.

Network transport is injected (``fetcher: url -> response body``) — the
reference runs its fetch in separate collector workers, and this
container has no network; everything after the byte boundary (JSON
parse, flattening, type sniffing) is real Spark and distributed via
``rest_pages``.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession

from hobbes_spark.sources.ingest import rest_pages

__all__ = ["odata_url", "read_odata"]

Fetcher = Callable[[str], str]


def odata_url(
    base: str,
    select: str | None = None,
    filter: str | None = None,  # noqa: A002 - OData's own name
    expand: str | None = None,
    top: int | None = None,
) -> str:
    """Assemble the feed URL with OData query options, matching the
    reference's parameter writer (`ODataProvider.fs:97-112`). ``base``
    may already end with ``?``."""
    def enc(v: str, safe: str) -> str:
        # headers carry either raw values (MTTR.hb) or pre-encoded ones
        # (flowerpot.hb's %2F/%20) — re-quoting the latter would
        # double-encode. "Pre-encoded" means a valid %XX escape exists;
        # a bare '%' in a raw value (filter on '100%') must still encode
        import re as _re

        if _re.search(r"%[0-9A-Fa-f]{2}", v):
            return v
        return quote(v, safe=safe)

    params = []
    if expand:
        params.append(f"$expand={enc(expand, '/,$')}")
    if select:
        params.append(f"$select={enc(select, '/,$')}")
    if filter:
        params.append(f"$filter={enc(filter, '/,$')}")
    if top is not None:
        params.append(f"$top={top}")
    if not params:
        return base
    sep = "" if base.endswith(("?", "&")) else ("&" if "?" in base else "?")
    return base + sep + "&".join(params)


def read_odata(
    spark: SparkSession,
    url: str,
    fetcher: Fetcher,
    max_pages: int = 10_000,
) -> DataFrame:
    """Fetch every page of an OData feed (following ``@odata.nextLink``),
    then parse all pages distributed: ``value`` arrays exploded, nested
    records flattened to dot-path columns, types sniffed per column.

    The fetch loop is driver-side and sequential like the reference's
    (pagination is inherently serial — each next link comes from the
    previous page); page *parsing* is the heavy part and runs on
    executors."""
    pages: list[str] = []
    next_url: str | None = url
    while next_url and len(pages) < max_pages:
        body = fetcher(next_url)
        pages.append(body)
        doc = json.loads(body)
        next_url = doc.get("@odata.nextLink") or doc.get("odata.nextLink")
    if next_url:
        raise ValueError(
            f"OData feed exceeded max_pages={max_pages} with more pages "
            f"remaining ({next_url}) — raise max_pages rather than "
            "silently truncating the feed"
        )
    if not pages:
        raise ValueError(f"OData feed returned no pages: {url}")
    # page bodies are held (and nextLink-parsed) on the driver; at very
    # large feed sizes, batch calls to read_odata per page range instead
    return rest_pages(spark, pages, values_field="value")
