"""Web-corpus URL operators: canonicalization, host extraction, host
blocklist filtering.

Every web-scale corpus pipeline (CommonCrawl-derived sets, C4, RefinedWeb)
dedupes and filters BY URL before touching document text: the same page
arrives under scheme/host case variants, tracking-parameter decorations
(``utm_*``, ``fbclid``…), fragments and default ports, and naive string
equality misses all of them. These operators normalize those variants
into one canonical spelling with PURE Column expressions — no UDF, no
shuffle, replayable in any engine with regex + list functions (the
DuckDB oracle replays every rule) — so URL-level dedup is a map-only
``groupBy`` upstream of text processing at 100 TB.

Canonicalization contract (documented, deliberately conservative):

* scheme and host lowercase; userinfo (``user:pw@``) removed;
* default ports stripped (``:80`` for http, ``:443`` for https; other
  ports kept);
* fragment removed;
* tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``igshid``, ``mc_eid``), remaining query params sorted
  byte-wise (param order never changes server routing for sane sites —
  the standard crawler assumption);
* empty path becomes ``/``; other paths byte-preserved (case and
  percent-encoding are SIGNIFICANT in paths, so they are not touched);
* non-URLs (no ``scheme://``) canonicalize to NULL — filter or
  passthrough explicitly, never guess.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hobbes_spark.expressions import c

__all__ = ["canonical_url", "url_host", "filter_blocked_hosts"]

#: query parameters that never change page identity — RE2-safe
#: alternation shared by the Spark expression and the DuckDB oracle
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid)(=.*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_host(col: Column | str) -> Column:
    """Lowercased host of a URL (port and userinfo stripped); NULL for
    strings without a ``scheme://``."""
    u = F.trim(c(col))
    has_scheme = u.rlike(_SCHEME_RE)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    nouser = F.regexp_replace(hostport, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(nouser, r":\d*$", ""))
    return F.when(has_scheme & (F.length(host) > 0), host)


def canonical_url(col: Column | str) -> Column:
    """Canonical spelling of a URL per the module contract; NULL for
    non-URLs. One codegen expression — no UDF, no shuffle."""
    u = F.trim(c(col))
    has_scheme = u.rlike(_SCHEME_RE)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    nofrag = F.regexp_replace(u, r"#.*$", "")
    rest = F.regexp_replace(nofrag, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    nouser = F.regexp_replace(hostport, r"^[^@]*@", "")
    host = F.lower(F.regexp_replace(nouser, r":\d*$", ""))
    port = F.regexp_extract(nouser, r":(\d+)$", 1)
    keep_port = (
        (F.length(port) > 0)
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    hostout = F.concat(
        host, F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    )
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    path_norm = F.when(F.length(path) == 0, F.lit("/")).otherwise(path)
    query = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    out = F.concat(scheme, F.lit("://"), hostout, path_norm, canon_q)
    return F.when(has_scheme & (F.length(host) > 0), out)


def filter_blocked_hosts(
    df: DataFrame,
    url_col: str,
    blocked: Sequence[str],
    keep_non_urls: bool = False,
) -> DataFrame:
    """Drop rows whose URL host is a blocked domain or any subdomain of
    one (``example.com`` blocks ``example.com`` AND ``a.example.com`` —
    the standard blocklist semantics). The list compiles into ONE
    expression over the extracted host: map-only, no join, so a
    10k-domain blocklist costs the same plan shape as one domain.
    Rows without a parseable URL drop by default (``keep_non_urls``
    keeps them — metadata rows, inline docs)."""
    if not blocked:
        raise ValueError("filter_blocked_hosts: blocked list must be non-empty")
    host = url_host(c(url_col))
    bad = F.lit(False)
    for b in blocked:
        bl = b.lower().lstrip(".")
        if not bl:
            raise ValueError("filter_blocked_hosts: empty domain in blocklist")
        bad = bad | (host == bl) | host.endswith("." + bl)
    cond = ~bad
    if keep_non_urls:
        return df.filter(host.isNull() | cond)
    return df.filter(host.isNotNull() & cond)
