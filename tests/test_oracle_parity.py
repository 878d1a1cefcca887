"""Local mirror of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle over the same parquet, compare row count,
column set, and an order-insensitive value snapshot.

The driver does this at sf=0.01; tests run sf0.001 (override with
SPARK_GRAFT_TEST_SF_DIR) so the loop stays fast while iterating.
"""

import math

import duckdb
import pytest

from hobbes_spark.queries import QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 == 3 across engines
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _snapshot(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)
    )
    return cols, rows


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if s.oracle])
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    spec = QUERIES[name]
    got = spec.spark(spark, sf_dir).toPandas()
    exp = ddb.execute(spec.oracle).df()
    g_cols, g_rows = _snapshot(got)
    e_cols, e_rows = _snapshot(exp)
    assert g_cols == e_cols, f"{name}: column mismatch {g_cols} vs {e_cols}"
    assert len(g_rows) == len(e_rows), f"{name}: row count {len(g_rows)} vs {len(e_rows)}"
    mism = [i for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={g_rows[mism[0]]} oracle={e_rows[mism[0]]}"
    )


_ROWS_ONLY = [n for n, s in QUERIES.items() if s.oracle is None]


def test_no_rows_only_queries_remain():
    """Round 4 gave the last rows-only entry (the HLL rollup) a
    replayable oracle twin; every catalog query now carries a DuckDB
    oracle. Pin that as an invariant — a new rows-only entry weakens
    the correctness gate and must be a deliberate, visible choice."""
    assert _ROWS_ONLY == [], (
        f"rows-only queries reappeared (weaker driver check): {_ROWS_ONLY}"
    )


def test_driver_window_contract():
    """The driver records the FIRST 50 catalog entries: the reordered
    window must hold exactly 50 distinct oracled names (a rows-only row
    in the window wastes a signing slot).  Round-7 criterion: the
    window is the CHANGE-AWARE staleness cohort of
    ``tools/window_cohort.py`` — queries whose implementing functions
    were edited after their last driver signature outrank pure age
    (their signatures no longer cover the code that runs), then the
    longest-unsigned by (last-signed round, name); never-signed entries
    count as round 0 and automatically lead.  Round-9 criterion (r8
    verdict item 1): the cohort is computed AS OF the record named by
    ``queries.WINDOW_FROZEN_AT`` — not the newest file on disk — so
    this test stays green when the next round's CORRECTNESS record
    lands.  Rotation-due enforcement (newest record != stamp) lives in
    tools/gate_check.py, which is loud without making `pytest tests/`
    red at every round boundary."""
    import os
    import re
    import sys

    from hobbes_spark.queries import WINDOW_FROZEN_AT

    names = list(QUERIES)
    window = names[:50]
    assert len(set(window)) == 50
    assert all(QUERIES[n].oracle for n in window)

    frozen_round = int(re.fullmatch(r"CORRECTNESS_r(\d+)", WINDOW_FROZEN_AT).group(1))

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, root)
    try:
        from tools.window_cohort import (
            compute_cohort,
            last_signed_rounds,
            record_commits,
        )
    finally:
        sys.path.remove(root)
    if not last_signed_rounds(frozen_round):
        return  # fresh checkout without driver records: nothing to pin
    if not record_commits():
        # tarball checkout without git history: change-awareness can't
        # compute and compute_cohort degrades to pure staleness, which
        # the change-aware static window legitimately differs from
        return
    expected = set(compute_cohort(50, as_of=frozen_round))
    assert set(window) == expected, (
        f"window must be the change-aware staleness cohort as of "
        f"{WINDOW_FROZEN_AT}: "
        f"missing={sorted(expected - set(window))}, "
        f"extra={sorted(set(window) - expected)}"
    )


# --------------------------------------------------------------------- #
# Planted-edge-case parity (round 4): the driver tables contain no NULL
# texts, no sub-10-row series, and no same-timestamp events, so these
# latent Spark-vs-oracle divergences could never trip the main gate;
# each test replays a catalog query AND its oracle over planted data
# that exercises exactly the edge.
# --------------------------------------------------------------------- #


def _mini_gate(spark, tmp_path, name, tables):
    """Run QUERIES[name] and its DuckDB oracle over planted tables."""
    import duckdb as _duckdb

    sf = str(tmp_path / "sf")
    con = _duckdb.connect()
    for t, df in tables.items():
        df.write.mode("overwrite").parquet(f"{sf}/{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet/*.parquet')"
        )
    spec = QUERIES[name]
    got = spec.spark(spark, sf).toPandas()
    exp = con.execute(spec.oracle).df()
    con.close()
    return _snapshot(got), _snapshot(exp)


def test_dedup_exact_null_texts_parity(spark, tmp_path):
    """Every NULL-text row survives — in the operator AND the oracle
    (the SQL used to collapse all NULL fingerprints into one window
    partition and keep only the min id)."""
    docs = spark.createDataFrame(
        [(1, "same text", "en", "web", 9), (2, "same text", "en", "web", 9),
         (3, None, "en", "web", 0), (4, None, "en", "web", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got, exp = _mini_gate(spark, tmp_path, "dedup_exact", {"documents": docs})
    assert got == exp
    ids = sorted(int(r[0]) for r in got[1])
    assert ids == [1, 3, 4]  # dup collapsed, both NULL-text rows kept


def test_concurrency_peak_timestamp_ties_parity(spark, tmp_path):
    """Same-timestamp events must land in the same session in both
    engines (the running sum used to be frame-ambiguous on ties)."""
    from pyspark.sql import functions as F

    rows = [
        (1, 10, "2021-05-01 10:00:00", "click", 1.0, "{}"),
        (2, 10, "2021-05-01 10:00:00", "view", 1.0, "{}"),   # tie with 1
        (3, 10, "2021-05-01 12:00:00", "click", 1.0, "{}"),  # new session
        (4, 20, "2021-05-01 11:00:00", "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts string, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got, exp = _mini_gate(spark, tmp_path, "concurrency_peak", {"events": ev})
    assert got == exp


def test_buckets_mean_small_series_parity(spark, tmp_path):
    """A series with fewer than 10 distinct days must still split into
    per-row buckets in BOTH engines — the oracle's total // 10 used to
    be 0, collapsing everything into bucket 10 via LEAST(NULL, 10)."""
    from pyspark.sql import functions as F

    rows = [
        (i, f"2021-06-{(i % 4) + 1:02d} 12:00:00", 10 + i, "click", 1.0, "{}")
        for i in range(12)  # 4 distinct days -> total=4 < 10
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got, exp = _mini_gate(spark, tmp_path, "buckets_mean", {"events": ev})
    assert got == exp
    assert len(got[1]) == 4  # one bucket per day, not one collapsed row


def test_gopher_quality_edges_parity(spark, tmp_path):
    """The driver corpus has no newlines, bullets, ellipses, '#'
    symbols, or NULL texts, so the line/symbol rules are degenerate at
    the main gate; this replays the catalog query AND its oracle over
    documents that exercise every rule (incl. the '....' leftmost-match
    and unicode-ellipsis corners) and demands byte-identical output."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over that lazy dog with it " * 6,
             "en", "web", 0),
            (2, "five short words only here", "en", "web", 0),
            (3, None, "en", "web", 0),
            (4, "", "en", "web", 0),
            (5, "   ", "en", "web", 0),
            (6, "- bullet one\n- bullet two\nplain tail line", "en", "web", 0),
            (7, "thought...\nfour dots....\nunicode one…\nplain", "en", "web", 0),
            (8, "# tags # and # more # symbols here", "en", "web", 0),
            (9, "123 456 789 000 111", "en", "web", 0),
            (10, " ".join(["incomprehensibility"] * 60), "en", "web", 0),
            # CRLF endings: Java '$' matches before a trailing \r, RE2
            # does not — the \r?\n line split must keep both engines
            # identical (round-6 review fix)
            (11, "thought...\r\nbullet next\r\n- a bullet line\r\nplain", "en",
             "web", 0),
            # lone \r (classic-Mac ending) stays INSIDE a line after the
            # \r?\n split; '$' would still diverge (Java matches before a
            # final line terminator, RE2 does not) — the \z anchor pins
            # strict end-of-text in both engines
            (12, "ends with ellipsis...\rtail", "en", "web", 0),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got, exp = _mini_gate(spark, tmp_path, "gopher_quality", {"documents": docs})
    assert got == exp


def test_c4_quality_edges_parity(spark, tmp_path):
    """The driver corpus is single-line prose, so the C4 line rules are
    near-degenerate at the main gate; this replays the catalog query
    AND its oracle over documents exercising every rule — multi-line
    filtering, the quote terminal, the javascript line, lorem-ipsum
    casing, the raw-page brace flag, empty/NULL text, and the
    empty-kept-list array_to_string(NULL) corner — demanding
    byte-identical output."""
    docs = spark.createDataFrame(
        [
            (1, "Good first sentence with many words here.\nshort one.\n"
                "No terminal punctuation on this longer line\n"
                "Please enable JavaScript to continue viewing now.\n"
                'Quoted sentence of at least five words."',
             "en", "web", 0),
            (2, "One good sentence right here today. Second good one lands "
                "here. Third good one closes it.", "en", "web", 0),
            (3, "This page mentions LOREM IPSUM dolor sit amet today. "
                "More valid sentences follow it here. And one more for "
                "the count.", "en", "web", 0),
            (4, "A fine sentence with enough words. var x = { a: 1 } "
                "appears mid-page. Another fine sentence with enough "
                "words. Closing sentence with enough words too.", "en",
             "web", 0),
            (5, None, "en", "web", 0),
            (6, "", "en", "web", 0),
            (7, "no terminal marks at all on this page", "en", "web", 0),
            # CRLF endings (round-6 review fix): without the \r?\n split
            # Spark kept these lines ('$' matches before \r) while the
            # RE2 oracle kept none — verified divergence, now pinned
            (8, "Good first sentence with many words here.\r\n"
                "Second fine sentence with many words too.\r\n"
                "Third fine sentence with enough words here.\r\n",
             "en", "web", 0),
            # lone \r inside a line: '$' would count this terminal in
            # Spark only; the \z anchor agrees (not terminal) in both
            (9, "A sentence that seems to end here.\rhidden tail", "en",
             "web", 0),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got, exp = _mini_gate(spark, tmp_path, "c4_quality", {"documents": docs})
    assert got == exp
