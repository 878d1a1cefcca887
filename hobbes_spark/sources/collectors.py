"""Collector sources: the data-acquisition step of the reference's
git / azuredevops workers, re-expressed at the engine boundary.

Both worker submodules are private and absent from the reference tree
(`.gitmodules:13-18`), so the observable contract is what the in-tree
programs drive:

* `tests/transformations/Logic Commit Frequency.hb:1-13` points
  ``provider: rest`` at the Azure DevOps git commits API
  (``.../_apis/git/repositories/{id}/commits?api-version=6.0&$top=N``)
  — the worker's output shape is therefore the PUBLIC AzDO commit
  record (``commitId``, ``author{name,email,date}``,
  ``committer{…}``, ``comment``), ingested through the same uniform
  flatten + sniff cascade as every other JSON feed.
* the git worker clones and walks real repositories; the equivalent
  engine-boundary operation is a ``git log`` walk of a local clone.

Acquisition (the subprocess / HTTP byte boundary) is driver-side by
design — the reference runs it in dedicated worker *processes* too
(`workers/syncronization.worker/src/Program.fs:55-63` routes provider
names to workers). Engine distribution starts at the record stream:
multi-repo fan-out parallelizes per repository, and everything
downstream of :func:`read_git_commits` / :func:`read_azdo_commits` is
ordinary DataFrame ops. A 100 TB corpus is never ONE repo's log; it is
many repos × many pages, and both readers take the many-shaped input.
"""

from __future__ import annotations

import re
import subprocess
import warnings
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "git_log_records",
    "read_git_commits",
    "read_git_numstat",
    "azdo_commits_url",
    "read_azdo_commits",
]

Fetcher = Callable[[str], str]

# Records are NUL-terminated (``git log -z`` — NUL cannot occur in any
# git output field, unlike printable control bytes which a hostile
# commit SUBJECT may contain). Fields split on %x1f with
# maxsplit=7, so a subject containing the field separator keeps its
# tail instead of shifting fields; the leading-hash validation below
# rejects any frame that still comes out misaligned.
_FIELD_SEP = "\x1f"
_PRETTY = _FIELD_SEP.join(["%H", "%an", "%ae", "%aI", "%cn", "%ce", "%cI", "%s"])
_HEX40 = frozenset("0123456789abcdef")
# --date=iso-strict / %aI shape: 2024-01-02T03:04:05+01:00 (or ...Z)
_ISO_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:[+-]\d{2}:\d{2}|Z)$")

_COMMIT_SCHEMA = T.StructType(
    [
        T.StructField("commit_id", T.StringType(), False),
        T.StructField("author_name", T.StringType(), True),
        T.StructField("author_email", T.StringType(), True),
        T.StructField("authored_at", T.StringType(), True),
        T.StructField("committer_name", T.StringType(), True),
        T.StructField("committer_email", T.StringType(), True),
        T.StructField("committed_at", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)


def git_log_records(
    repo_path: str, max_count: int | None = None, rev: str = "HEAD"
) -> list[tuple]:
    """Walk a local clone's history into plain records (the collector
    step itself — subprocess boundary, no Spark).

    ``--date=iso-strict`` timestamps keep the author's own UTC offset;
    the typed reader normalizes to session-zone timestamps exactly as
    the uniform sniffing cascade does for HTTP feeds.
    """
    cmd = ["git", "-C", repo_path, "log", "-z", f"--pretty=format:{_PRETTY}"]
    if max_count is not None:
        cmd.append(f"--max-count={int(max_count)}")
    # `--` pins rev as a revision: a branch named like an option (or
    # shadowed by a file path) cannot be re-parsed as something else
    cmd += [rev, "--"]
    out = subprocess.run(
        # git emits UTF-8 regardless of the host locale; decode it
        # explicitly so a C/POSIX environment can't crash the collector
        # on a non-ASCII author name
        cmd, capture_output=True, check=True,
        encoding="utf-8", errors="replace",
    ).stdout
    return _parse_log_frames(out, origin=repo_path)


def _parse_log_frames(out: str, origin: str = "?") -> list[tuple]:
    """NUL-framed ``git log`` output → validated 8-tuples.

    A commit id alone isn't enough to accept a frame: git permits
    control bytes (including the \\x1f field separator) inside ident
    names, which would shift every later field one slot while the id
    still validates.  Pinning the two ISO-8601 timestamp slots catches
    any such shift — a name fragment can't look like
    ``2024-01-02T03:04:05+00:00``.  Misaligned frames are dropped with
    a warning rather than silently garbling names / NULLing timestamps
    downstream."""
    records: list[tuple] = []
    dropped = 0
    for chunk in out.split("\0"):
        chunk = chunk.strip("\n")
        if not chunk:
            continue
        parts = chunk.split(_FIELD_SEP, 7)
        if (
            len(parts) == 8
            and len(parts[0]) == 40
            and set(parts[0]) <= _HEX40
            and _ISO_RE.match(parts[3])
            and _ISO_RE.match(parts[6])
        ):
            records.append(tuple(parts))
        else:
            dropped += 1
    if dropped:
        warnings.warn(
            f"git_log_records({origin!r}): dropped {dropped} misaligned "
            "log frame(s) (ident containing separator bytes?)",
            stacklevel=2,
        )
    return records


def read_git_commits(
    spark: SparkSession,
    repo_path: str,
    max_count: int | None = None,
    rev: str = "HEAD",
) -> DataFrame:
    """The git worker's commit stream as a typed DataFrame:
    ``commit_id, author_name, author_email, authored_at(ts),
    committer_name, committer_email, committed_at(ts), message``.

    Timestamps arrive ISO-8601-with-offset and convert inside codegen
    (``try_to_timestamp``), mirroring the per-column cascade of
    `tools/visualizer/web/src/Server/Reader.fs:25-37` — the reference's
    commit feeds go through the same string→timestamp sniff.
    """
    rows = git_log_records(repo_path, max_count=max_count, rev=rev)
    df = spark.createDataFrame(rows, schema=_COMMIT_SCHEMA)
    return df.select(
        "commit_id",
        "author_name",
        "author_email",
        F.try_to_timestamp(F.col("authored_at")).alias("authored_at"),
        "committer_name",
        "committer_email",
        F.try_to_timestamp(F.col("committed_at")).alias("committed_at"),
        "message",
    )


def read_git_numstat(
    spark: SparkSession, repo_path: str, rev: str = "HEAD"
) -> DataFrame:
    """Per-file churn: ``commit_id, file_path, insertions, deletions``
    (one row per touched file; binary files report NULL counts, as
    ``git log --numstat`` prints ``-``).

    This is the long-form table behind code-churn analytics — joinable
    back to :func:`read_git_commits` on ``commit_id``; the join key is
    unique on the commit side, so it broadcasts.
    """
    out = subprocess.run(
        # the pretty string here is %H only (no message), so \x1e cannot
        # be injected by commit content the way it could in the commit
        # walk; encoding pinned for the same locale reason as there
        [
            "git", "-C", repo_path, "log", "--numstat",
            "--pretty=format:\x1e%H", rev, "--",
        ],
        capture_output=True, check=True, encoding="utf-8", errors="replace",
    ).stdout
    rows: list[tuple] = []
    for chunk in out.split("\x1e"):
        lines = [ln for ln in chunk.splitlines() if ln.strip()]
        if not lines:
            continue
        commit_id, *stat_lines = lines
        for ln in stat_lines:
            parts = ln.split("\t")
            if len(parts) != 3:
                continue
            ins, dels, path = parts
            rows.append(
                (
                    commit_id,
                    path,
                    int(ins) if ins.isdigit() else None,
                    int(dels) if dels.isdigit() else None,
                )
            )
    schema = T.StructType(
        [
            T.StructField("commit_id", T.StringType(), False),
            T.StructField("file_path", T.StringType(), False),
            T.StructField("insertions", T.LongType(), True),
            T.StructField("deletions", T.LongType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema=schema)


def azdo_commits_url(
    organization: str,
    project: str,
    repository_id: str,
    top: int = 10000,
    skip: int = 0,
    api_version: str = "6.0",
) -> str:
    """The commits-API URL shape `Logic Commit Frequency.hb:3-12`
    drives, plus ``$skip`` for the page loop (the .hb header's single
    ``$top=10000`` page is the degenerate one-page case)."""
    url = (
        f"https://dev.azure.com/{organization}/{project}/_apis/git/"
        f"repositories/{repository_id}/commits?api-version={api_version}"
        f"&$top={int(top)}"
    )
    if skip:
        url += f"&$skip={int(skip)}"
    return url


def read_azdo_commits(
    spark: SparkSession,
    fetcher: Fetcher,
    organization: str,
    project: str,
    repository_ids: Sequence[str],
    top: int = 10000,
    max_pages_per_repo: int = 1000,
    api_version: str = "6.0",
) -> DataFrame:
    """The azuredevops worker's commit collection: page every
    repository's commits API (``$top``/``$skip`` until a short page),
    parse through the uniform cascade, and tag provenance.

    Network transport is injected exactly as in
    :func:`hobbes_spark.sources.odata.read_odata` — the reference keeps
    fetch in collector workers, and this container has no network.
    Per-repo page streams union by name, so ragged flattened schemas
    across repos are tolerated (missing columns go NULL), matching the
    reference's widening per record (`Reader.fs:20-50`).  The type
    cascade runs ONCE over the union (pages parse all-string per repo),
    so the same column can never sniff to different types in different
    repos and break the union; and a repo that still returns full pages
    at ``max_pages_per_repo`` raises instead of silently truncating its
    commit stream (the repo-wide no-silent-caps rule).
    """
    import json as _json
    from concurrent.futures import ThreadPoolExecutor

    from hobbes_spark.sources.ingest import rest_pages, sniff_types

    def fetch_repo(repo_id: str) -> list[str]:
        # pages within one repo are inherently serial ($skip depends on
        # how many rows came back so far); repos are independent and
        # overlap via the thread pool below
        pages: list[str] = []
        for page_no in range(max_pages_per_repo):
            url = azdo_commits_url(
                organization, project, repo_id,
                top=top, skip=page_no * top, api_version=api_version,
            )
            body = fetcher(url)
            n = len((_json.loads(body) or {}).get("value") or [])
            if n:
                pages.append(body)
            if n < top:
                break
        else:  # every page was full — probe once more before raising:
            # a repo with exactly max_pages_per_repo*top commits ends
            # legitimately on a full page (ADVICE r5 false positive)
            url = azdo_commits_url(
                organization, project, repo_id,
                top=top, skip=max_pages_per_repo * top, api_version=api_version,
            )
            try:
                more = bool((_json.loads(fetcher(url)) or {}).get("value"))
            except Exception as e:  # probe failed: can't PROVE the feed ended
                raise ValueError(
                    f"repository {repo_id!r} hit max_pages_per_repo="
                    f"{max_pages_per_repo} on a full page and the confirming "
                    f"probe at skip={max_pages_per_repo * top} failed ({e}); "
                    "cannot prove the feed ended — raise the cap or fix the "
                    "probe rather than risk a silently truncated commit stream"
                ) from e
            if more:
                raise ValueError(
                    f"repository {repo_id!r} still returned full pages after "
                    f"max_pages_per_repo={max_pages_per_repo} "
                    f"({max_pages_per_repo * top} commits fetched); raise the "
                    "cap — truncating a commit stream silently corrupts "
                    "frequency analytics"
                )
        return pages

    with ThreadPoolExecutor(max_workers=min(8, len(repository_ids)) or 1) as pool:
        fetched = list(pool.map(fetch_repo, repository_ids))

    per_repo = [
        # sniff=False: all-string frames union losslessly; the cascade
        # runs once below over the union of every repo's pages
        rest_pages(spark, pages, values_field="value", sniff=False).withColumn(
            "repository_id", F.lit(repo_id)
        )
        for repo_id, pages in zip(repository_ids, fetched)
        if pages
    ]
    if not per_repo:
        raise ValueError("no commits in any repository — empty feed?")
    out = per_repo[0]
    for df in per_repo[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return sniff_types(out)
