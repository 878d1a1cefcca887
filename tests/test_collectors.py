"""Collector sources: git history walk and Azure DevOps commits paging
(`hobbes_spark/sources/collectors.py` — the engine-boundary equivalent
of the reference's private git/azuredevops worker submodules,
`.gitmodules:13-18`).

The git tests build a throwaway repository with PINNED identities and
dates, so every assertion is deterministic; the AzDO tests run a fake
paged commits API through the injected fetcher.
"""

from __future__ import annotations

import json
import subprocess

import pytest
from pyspark.sql import functions as F

from hobbes_spark.sources.collectors import (
    azdo_commits_url,
    read_azdo_commits,
    read_git_commits,
    read_git_numstat,
)

_ENV = {
    "GIT_AUTHOR_NAME": "Ada Tester",
    "GIT_AUTHOR_EMAIL": "ada@example.test",
    "GIT_COMMITTER_NAME": "Bot Committer",
    "GIT_COMMITTER_EMAIL": "bot@example.test",
    "HOME": "/tmp",
}


def _run(repo, *args, date=None):
    env = dict(_ENV)
    if date:
        env["GIT_AUTHOR_DATE"] = date
        env["GIT_COMMITTER_DATE"] = date
    subprocess.run(
        ["git", "-C", str(repo), *args],
        env=env, check=True, capture_output=True,
    )


@pytest.fixture(scope="module")
def fixture_repo(tmp_path_factory):
    repo = tmp_path_factory.mktemp("gitrepo")
    subprocess.run(
        ["git", "init", "-q", "-b", "main", str(repo)],
        env=_ENV, check=True, capture_output=True,
    )
    (repo / "a.txt").write_text("one\ntwo\n")
    _run(repo, "add", "a.txt")
    _run(repo, "commit", "-q", "-m", "first: add a.txt",
         date="2021-03-01T10:00:00+00:00")
    (repo / "a.txt").write_text("one\ntwo\nthree\n")
    (repo / "b.bin").write_bytes(b"\x00\x01\x02")
    _run(repo, "add", "a.txt", "b.bin")
    _run(repo, "commit", "-q", "-m", "second: grow a, add binary",
         date="2021-03-01T18:30:00+02:00")
    (repo / "a.txt").write_text("one\n")
    _run(repo, "add", "a.txt")
    # multiline message: the \x1e/\x1f record framing must survive it
    _run(repo, "commit", "-q", "-m", "third: shrink a\n\nwith a body line",
         date="2021-03-03T09:15:00+00:00")
    return repo


def test_git_commits_typed_and_ordered(spark, fixture_repo):
    df = read_git_commits(spark, str(fixture_repo))
    assert [f.name for f in df.schema.fields] == [
        "commit_id", "author_name", "author_email", "authored_at",
        "committer_name", "committer_email", "committed_at", "message",
    ]
    assert dict(df.dtypes)["authored_at"] == "timestamp"
    rows = df.orderBy("authored_at").collect()
    assert len(rows) == 3
    assert rows[0]["author_name"] == "Ada Tester"
    assert rows[0]["committer_email"] == "bot@example.test"
    # subject only — body folded away by %s, framing intact
    assert rows[2]["message"] == "third: shrink a"
    assert all(len(r["commit_id"]) == 40 for r in rows)
    # offset-aware: 18:30+02:00 == 16:30Z sits between the two Z commits
    days = [r["authored_at"].strftime("%Y-%m-%d") for r in rows]
    assert days == ["2021-03-01", "2021-03-01", "2021-03-03"]


def test_git_commit_frequency_shape(spark, fixture_repo):
    """The Git.fs commit-frequency analytic (daily counts) over the
    collector output — the reference's own use of this feed."""
    df = read_git_commits(spark, str(fixture_repo))
    freq = (
        df.groupBy(F.to_date("authored_at").alias("day"))
        .count().orderBy("day").collect()
    )
    assert [(str(r["day"]), r["count"]) for r in freq] == [
        ("2021-03-01", 2), ("2021-03-03", 1),
    ]


def test_git_numstat_long_form(spark, fixture_repo):
    ns = read_git_numstat(spark, str(fixture_repo))
    pdf = ns.orderBy("commit_id", "file_path").toPandas()
    # 3 commits touch: {a}, {a, b.bin}, {a} -> 4 file rows
    assert len(pdf) == 4
    by_file = pdf.groupby("file_path").size().to_dict()
    assert by_file == {"a.txt": 3, "b.bin": 1}
    bin_row = pdf[pdf.file_path == "b.bin"].iloc[0]
    assert bin_row.insertions is None or str(bin_row.insertions) == "nan"
    # join key back to commits is unique commit-side
    commits = read_git_commits(spark, str(fixture_repo))
    joined = ns.join(commits.select("commit_id", "message"), "commit_id")
    assert joined.count() == 4


def test_git_max_count_limits_walk(spark, fixture_repo):
    assert read_git_commits(spark, str(fixture_repo), max_count=2).count() == 2


# --------------------------------------------------------------------- #
# Azure DevOps commits API paging
# --------------------------------------------------------------------- #


def _commit(i, repo):
    return {
        "commitId": f"{repo}{i:038d}"[:40],
        "author": {
            "name": f"dev{i % 3}",
            "email": f"dev{i % 3}@example.test",
            "date": f"2020-06-{(i % 28) + 1:02d}T12:00:00Z",
        },
        "committer": {
            "name": f"dev{i % 3}",
            "email": f"dev{i % 3}@example.test",
            "date": f"2020-06-{(i % 28) + 1:02d}T12:05:00Z",
        },
        "comment": f"change {i}",
    }


def _fake_azdo(counts):
    """counts: repo_id -> total commits. Serves $top/$skip pages."""
    calls = []

    def fetch(url):
        calls.append(url)
        from urllib.parse import parse_qs, urlparse

        u = urlparse(url)
        repo = u.path.split("/repositories/")[1].split("/")[0]
        qs = parse_qs(u.query)
        top = int(qs["$top"][0])
        skip = int(qs.get("$skip", ["0"])[0])
        total = counts[repo]
        rows = [_commit(i, repo) for i in range(skip, min(skip + top, total))]
        return json.dumps({"count": len(rows), "value": rows})

    fetch.calls = calls
    return fetch


def test_azdo_url_matches_reference_shape():
    url = azdo_commits_url("kmddk", "kmdlogic", "abc-123")
    assert url == (
        "https://dev.azure.com/kmddk/kmdlogic/_apis/git/repositories/"
        "abc-123/commits?api-version=6.0&$top=10000"
    )
    assert azdo_commits_url("o", "p", "r", top=50, skip=100).endswith(
        "&$top=50&$skip=100"
    )


def test_azdo_commits_pages_until_short_page(spark):
    fetch = _fake_azdo({"repoA": 25, "repoB": 7})
    df = read_azdo_commits(
        spark, fetch, "org", "proj", ["repoA", "repoB"], top=10
    )
    assert df.count() == 32
    # repoA: 10+10+5 (3 calls), repoB: 7 (1 call)
    assert len(fetch.calls) == 4
    tagged = dict(
        (r["repository_id"], r["n"])
        for r in df.groupBy("repository_id").agg(F.count("*").alias("n")).collect()
    )
    assert tagged == {"repoA": 25, "repoB": 7}
    # flattened dot-path columns came through the uniform cascade, typed
    assert "author.name" in df.columns
    assert dict(df.dtypes)["author.date"] == "timestamp"


def test_azdo_exact_page_boundary_stops(spark):
    fetch = _fake_azdo({"repoC": 20})
    df = read_azdo_commits(spark, fetch, "org", "proj", ["repoC"], top=10)
    assert df.count() == 20
    # 10+10, then one empty probe page (the API reports no more)
    assert len(fetch.calls) == 3


def test_azdo_empty_feed_raises(spark):
    fetch = _fake_azdo({"repoD": 0})
    with pytest.raises(ValueError, match="empty feed"):
        read_azdo_commits(spark, fetch, "org", "proj", ["repoD"], top=10)


def test_hb_git_provider(spark, fixture_repo):
    """``provider: git`` end-to-end through the .hb front-end."""
    from hobbes_spark.hb import run_hb_program

    # the Logic Commit Frequency.hb shape (reference :33-38) on the
    # local-clone provider instead of the AzDO rest feed
    program = (
        f"provider: git\nurl: {fixture_repo}\n\n"
        'create column "day" (format date authored_at date)\n'
        'create column "tick" 1\n'
        'slice columns "day" tick\n'
        "group by day -> sum\n"
        'rename column tick "count"\n'
        "sort by column day\n"
    )
    out = run_hb_program(spark, program)
    rows = out.df.collect()
    assert [r["count"] for r in rows] == [2, 1]


# --------------------------------------------------------------------- #
# Review-hardening regressions
# --------------------------------------------------------------------- #


def test_git_hostile_subject_framing(spark, tmp_path):
    """A commit SUBJECT containing the field/record separator bytes must
    not shift fields or truncate other commits: records are NUL-framed
    (git log -z) and fields split with maxsplit, so the hostile bytes
    stay inside the message column."""
    repo = tmp_path / "hostile"
    subprocess.run(
        ["git", "init", "-q", "-b", "main", str(repo)],
        env=_ENV, check=True, capture_output=True,
    )
    (repo / "f.txt").write_text("a\n")
    _run(repo, "add", "f.txt")
    _run(repo, "commit", "-q", "-m", "clean one",
         date="2022-01-01T10:00:00+00:00")
    (repo / "f.txt").write_text("b\n")
    _run(repo, "add", "f.txt")
    _run(repo, "commit", "-q", "-m", "evil \x1f mid \x1e subject",
         date="2022-01-02T10:00:00+00:00")
    (repo / "f.txt").write_text("c\n")
    _run(repo, "add", "f.txt")
    _run(repo, "commit", "-q", "-m", "clean two",
         date="2022-01-03T10:00:00+00:00")

    df = read_git_commits(spark, str(repo))
    rows = df.orderBy("authored_at").collect()
    assert len(rows) == 3  # nothing dropped, nothing split in two
    assert [len(r["commit_id"]) for r in rows] == [40, 40, 40]
    assert rows[0]["message"] == "clean one"
    assert rows[2]["message"] == "clean two"
    assert "evil" in rows[1]["message"]  # hostile bytes stay in-message
    assert rows[1]["author_name"] == "Ada Tester"  # fields unshifted


def test_git_non_ascii_identities(spark, tmp_path):
    """UTF-8 decode is pinned explicitly, so non-ASCII author names
    survive regardless of the host locale."""
    repo = tmp_path / "utf8"
    subprocess.run(
        ["git", "init", "-q", "-b", "main", str(repo)],
        env=_ENV, check=True, capture_output=True,
    )
    (repo / "f.txt").write_text("a\n")
    env = dict(_ENV, GIT_AUTHOR_NAME="José Ñandú",
               GIT_AUTHOR_DATE="2022-02-01T10:00:00+00:00",
               GIT_COMMITTER_DATE="2022-02-01T10:00:00+00:00")
    subprocess.run(["git", "-C", str(repo), "add", "f.txt"],
                   env=env, check=True, capture_output=True)
    subprocess.run(["git", "-C", str(repo), "commit", "-q", "-m", "héllo"],
                   env=env, check=True, capture_output=True)
    row = read_git_commits(spark, str(repo)).collect()[0]
    assert row["author_name"] == "José Ñandú"
    assert row["message"] == "héllo"


def test_misaligned_ident_frame_dropped_with_warning():
    """git permits \x1f inside ident NAMES (not just subjects); such a
    frame shifts every later field one slot while the leading commit id
    still validates. The parser pins the two ISO-8601 timestamp slots,
    so a shifted frame is dropped (with a warning) instead of shipping
    garbled names and NULL timestamps downstream."""
    from hobbes_spark.sources.collectors import _FIELD_SEP, _parse_log_frames

    sha_a = "a" * 40
    sha_b = "b" * 40
    good = _FIELD_SEP.join(
        [sha_a, "Ada", "ada@x", "2024-01-02T03:04:05+00:00",
         "Bot", "bot@x", "2024-01-02T03:05:05+00:00", "msg"]
    )
    # author name contains the separator: 9 raw fields, maxsplit folds
    # the overflow into the message slot but the timestamps shift
    evil = _FIELD_SEP.join(
        [sha_b, "Evil", "guy", "evil@x", "2024-01-03T03:04:05+00:00",
         "Bot", "bot@x", "2024-01-03T03:05:05+00:00", "msg"]
    )
    with pytest.warns(UserWarning, match="dropped 1 misaligned"):
        records = _parse_log_frames("\0".join([good, evil]), origin="test")
    assert len(records) == 1
    assert records[0][0] == sha_a


def test_azdo_page_cap_raises_instead_of_truncating(spark):
    """max_pages_per_repo consecutive FULL pages means the cap (not the
    feed) ended the walk — that must raise, not silently truncate the
    repo's commit stream (the repo-wide no-silent-caps rule)."""
    fetch = _fake_azdo({"repoE": 35})
    with pytest.raises(ValueError, match="max_pages_per_repo"):
        read_azdo_commits(
            spark, fetch, "org", "proj", ["repoE"], top=10, max_pages_per_repo=3
        )
    # a repo with EXACTLY cap*top commits ends legitimately on a full
    # page: the extra empty probe proves the feed ended — no spurious
    # raise (ADVICE r5)
    fetch2 = _fake_azdo({"repoE": 30})
    df = read_azdo_commits(
        spark, fetch2, "org", "proj", ["repoE"], top=10, max_pages_per_repo=3
    )
    assert df.count() == 30


def test_azdo_union_sniffs_once_across_repos(spark):
    """The type cascade runs over the UNION of every repo's pages: a
    column that is all-numeric in one repo but mixed in another must
    type consistently (string) instead of bigint-vs-string breaking or
    silently coercing the unionByName."""
    pages = {
        "repoN": json.dumps(
            {"value": [{"commitId": "1" * 40, "push": {"pushId": "123"},
                        "author": {"name": "a", "email": "a@x",
                                   "date": "2020-06-01T12:00:00Z"}}]}
        ),
        "repoS": json.dumps(
            {"value": [{"commitId": "2" * 40, "push": {"pushId": "not-a-number"},
                        "author": {"name": "b", "email": "b@x",
                                   "date": "2020-06-02T12:00:00Z"}}]}
        ),
    }

    def fetch(url):
        repo = url.split("/repositories/")[1].split("/")[0]
        if "$skip" in url:
            return json.dumps({"value": []})
        return pages[repo]

    df = read_azdo_commits(spark, fetch, "org", "proj", ["repoN", "repoS"], top=10)
    kinds = dict(df.dtypes)
    assert kinds["push.pushId"] == "string"  # one sniff over the union
    assert kinds["author.date"] == "timestamp"  # cascade still applies
    assert df.count() == 2
