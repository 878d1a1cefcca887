"""Behavioral tests for corpus-curation operators (functions/curation.py):
decontamination, repetition filters, token-budget packing. The value-level
oracle gate lives in test_oracle_parity; these pin semantics the SQL twin
can't (plan shape, flag thresholds, overflow behavior).
"""

import pytest
from pyspark.sql import functions as F

from hobbes_spark.functions.curation import (
    decontaminate,
    pack_documents,
    repetition_stats,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_decontaminate_drops_overlap_keeps_clean(spark):
    ev = _docs(spark, [(100, "alpha beta gamma delta epsilon", "eval")])
    tr = _docs(
        spark,
        [
            (1, "prefix words alpha beta gamma delta epsilon suffix", "web"),
            (2, "completely different content with no shared phrases at all", "web"),
            (3, "alpha beta gamma but the tail diverges here entirely", "web"),
        ],
    )
    got = sorted(
        r["doc_id"] for r in decontaminate(tr, ev, "text", n=5).collect()
    )
    # doc 1 contains the eval 5-gram; doc 3 shares only 3 leading words
    assert got == [2, 3]


def test_decontaminate_broadcast_and_shuffle_paths_agree(spark, sf_dir):
    from hobbes_spark.pipeline import Pipeline

    docs = Pipeline.table(spark, sf_dir, "documents").df
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    a = {r["doc_id"] for r in decontaminate(tr, ev, n=8).collect()}
    b = {
        r["doc_id"]
        for r in decontaminate(tr, ev, n=8, broadcast_eval=False).collect()
    }
    assert a == b and len(a) > 0


def test_decontaminate_broadcasts_eval_side(spark):
    ev = _docs(spark, [(9, "one two three four five six seven eight", "e")])
    tr = _docs(spark, [(1, "one two three four five six seven eight nine", "w")])
    plan = decontaminate(tr, ev, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval-gram set must broadcast


def test_repetition_flags_degenerate_doc(spark):
    df = _docs(
        spark,
        [
            (1, "spam " * 50, "w"),  # one word repeated: dup_word_frac ~ 0.98
            (2, "the quick brown fox jumps over a lazy dog near town", "w"),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["dup_word_frac"] > 0.9
    assert rows[1]["top_bigram_frac"] > 0.9
    assert not rows[1]["keep_repetition"]
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["keep_repetition"]


def test_repetition_empty_and_single_token(spark):
    df = _docs(spark, [(1, "", "w"), (2, "solo", "w")])
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i in (1, 2):
        assert rows[i]["dup_word_frac"] == 0.0
        assert rows[i]["top_bigram_frac"] == 0.0
        assert rows[i]["keep_repetition"]


def test_pack_documents_contiguous_with_single_overflow(spark):
    # budget 10; token counts 4,4,4 -> first two fill 8, third starts at 8
    # (< 10) so it joins pack 0 and overflows it to 12: overflow-by-one.
    rows = [(i, " ".join(["w"] * 4), "s") for i in range(1, 4)]
    rows += [(4, " ".join(["w"] * 4), "s")]  # starts at 12 -> pack 1
    out = pack_documents(_docs(spark, rows), budget=10).collect()
    packs = {r["doc_id"]: (r["pack_id"], r["pack_pos"]) for r in out}
    assert packs[1] == (0, 1) and packs[2] == (0, 2) and packs[3] == (0, 3)
    assert packs[4] == (1, 1)


def test_pack_documents_partitions_by_source(spark):
    rows = [(1, "a b c", "s1"), (2, "a b c", "s2")]
    out = pack_documents(_docs(spark, rows), budget=2).collect()
    assert all(r["pack_id"] == 0 for r in out)  # each source starts fresh


def test_pack_documents_sharded_equals_single_window(spark):
    """The distributed two-pass prefix scan must reproduce the single
    per-source window EXACTLY — blocks are contiguous ranges of the
    order column, so local sums + block offsets is the same running
    total. Skewed doc_id gaps and uneven source sizes on purpose."""
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(400):
        doc_id = i * rnd.choice([1, 3, 17]) + (i % 5)  # gappy, non-uniform
        # a NULL source group too: the offsets join must be null-safe
        # or the sharded path silently drops the whole NULL group
        rows.append((doc_id, " ".join(["w"] * rnd.randint(1, 30)),
                     None if i % 7 == 0 else f"s{i % 3}"))
    # distinct doc_ids only: ties across rows make ANY prefix-sum
    # nondeterministic, sharded or not
    seen, uniq = set(), []
    for r in rows:
        if r[0] not in seen:
            seen.add(r[0])
            uniq.append(r)
    df = _docs(spark, uniq)
    single = sorted(
        ((r["doc_id"], r["source"], r["pack_id"], r["pack_pos"])
         for r in pack_documents(df, budget=40, shards=1).collect())
    )
    for shards in (2, 8, 32):
        sharded = sorted(
            ((r["doc_id"], r["source"], r["pack_id"], r["pack_pos"])
             for r in pack_documents(df, budget=40, shards=shards).collect())
        )
        assert sharded == single, f"shards={shards} diverged"


def test_word_ngrams_short_doc_empty(spark):
    df = word_ngrams(_docs(spark, [(1, "a b", "s")]), "text", 3)
    assert df.first()["ngrams"] == []


def test_contamination_report_counts_shared_grams(spark):
    from hobbes_spark.functions.curation import contamination_report

    ev = _docs(spark, [(100, "a b c d e f", "eval")])
    tr = _docs(
        spark,
        [
            (1, "x a b c d e f y", "w"),
            (2, "nothing shared here at all with anyone", "w"),
        ],
    )
    rows = {r["doc_id"]: r["shared_grams"]
            for r in contamination_report(tr, ev, n=5).collect()}
    # eval 5-grams: {a b c d e, b c d e f}; doc 1 contains both
    assert rows == {1: 2}


def test_unigram_scores_rank_rare_token_docs_lower(spark):
    from hobbes_spark.functions.curation import unigram_logprob_scores

    rows = [(i, "the cat sat on the mat", "w") for i in range(10)]
    rows.append((99, "zyzzyva qwertic florp blurn xanthic grue", "w"))
    out = {r["doc_id"]: r for r in
           unigram_logprob_scores(_docs(spark, rows)).collect()}
    common = out[0]["mean_logprob"]
    rare = out[99]["mean_logprob"]
    assert rare < common  # rare-vocab doc is less probable under the LM
    assert out[99]["n_tokens"] == 6
    # empty-doc rows are absent, not zero-scored
    empty = _docs(spark, [(7, "", "w")])
    assert unigram_logprob_scores(empty).count() == 0


def test_chunk_documents_overlap_and_tail(spark):
    from hobbes_spark.functions.curation import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = _docs(spark, [(1, toks, "w"), (2, "", "w")])
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    assert all(r["doc_id"] == 1 for r in rows)  # empty doc -> no rows
    # stride 2: starts 1,3,5,7,9 -> last two chunks shorten to 4,2 tokens
    assert [r["chunk_start"] for r in rows] == [1, 3, 5, 7, 9]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t2 t3 t4 t5"  # 2-token overlap kept
    assert rows[-1]["n_chunk_tokens"] == 2
    from pyspark.sql import functions as FF
    total = sum(r["n_chunk_tokens"] for r in rows)
    assert total == 4 + 4 + 4 + 4 + 2


def test_chunk_documents_validates_overlap(spark):
    import pytest as _pytest

    from hobbes_spark.functions.curation import chunk_documents

    with _pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a", "w")]), chunk_tokens=4, overlap=4)


def test_redact_pii_tags_and_preserves_rest(spark):
    from hobbes_spark.functions.curation import redact_pii

    df = spark.createDataFrame(
        [("write bob.smith+x@corp.example.org from 192.168.1.4 or +1 555-867-5309 ok",),
         ("no pii here just words",)],
        "t string",
    )
    got = [r["r"] for r in df.select(redact_pii("t").alias("r")).collect()]
    assert got[0] == "write <EMAIL> from <IP> or <PHONE> ok"
    assert got[1] == "no pii here just words"


# --------------------------------------------------------------------- #
# property-based invariants (random word-salad corpora)
# --------------------------------------------------------------------- #

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _WORDS = ["the", "cat", "sat", "mat", "dog", "ran", "big", "red"]
    _text = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(" ".join)
    _corpus = st.lists(_text, min_size=1, max_size=12)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=_corpus)
    def test_prop_pack_conserves_tokens_and_positions(spark, texts):
        """Packing is a partition: token totals conserved, pack ids
        non-decreasing in doc order (gaps allowed — a doc overflowing a
        pack by more than one budget advances the floor counter), and
        positions contiguous from 1 within each pack."""
        df = _docs(spark, [(i, t, f"s{i % 2}") for i, t in enumerate(texts)])
        rows = pack_documents(df, budget=7).collect()
        total = sum(r["token_count"] for r in rows)
        want = sum(len(t.split()) if t.strip() else 0 for t in texts)
        assert total == want
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        for rs in by_src.values():
            rs.sort(key=lambda r: r["doc_id"])
            ids = [r["pack_id"] for r in rs]
            assert ids == sorted(ids) and ids[0] == 0
            for p in set(ids):
                pos = sorted(r["pack_pos"] for r in rs if r["pack_id"] == p)
                assert pos == list(range(1, len(pos) + 1))

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=_corpus)
    def test_prop_chunks_reassemble_documents(spark, texts):
        """Dropping each chunk's overlap prefix (after the first) and
        concatenating in order reproduces the original tokens exactly."""
        from hobbes_spark.functions.curation import chunk_documents

        df = _docs(spark, [(i, t, "s") for i, t in enumerate(texts)])
        rows = chunk_documents(df, chunk_tokens=5, overlap=2).collect()
        by_doc = {}
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
            toks = r["chunk_text"].split()
            prev = by_doc.setdefault(r["doc_id"], [])
            prev.extend(toks if not prev else toks[len(prev) - (r["chunk_start"] - 1):])
        for i, t in enumerate(texts):
            want = t.split() if t.strip() else []
            if want:
                assert by_doc[i] == want
            else:
                assert i not in by_doc

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=_corpus)
    def test_prop_decontaminate_is_anti_monotone(spark, texts):
        """Clean set is a subset of train and disjoint from the docs a
        contamination report flags."""
        from hobbes_spark.functions.curation import contamination_report

        docs = [(i, t, "s") for i, t in enumerate(texts)]
        df = _docs(spark, docs)
        ev = df.filter(F.col("doc_id") % 3 == 0)
        tr = df.filter(F.col("doc_id") % 3 != 0)
        clean = {r["doc_id"] for r in decontaminate(tr, ev, n=3).collect()}
        flagged = {r["doc_id"] for r in contamination_report(tr, ev, n=3).collect()}
        train_ids = {r["doc_id"] for r in tr.collect()}
        assert clean <= train_ids
        assert clean.isdisjoint(flagged)
        assert clean | flagged == train_ids


def test_duplicate_ngram_stats_planted_copy(spark):
    from hobbes_spark.functions.curation import duplicate_ngram_stats

    base = "one two three four five six seven eight nine ten"
    rows = [
        (1, base),                      # full copy of 2 -> all grams shared
        (2, base),
        (3, base + " eleven twelve"),   # shares the 3 grams of the common prefix
        (4, "totally different words here with no overlap at all ok"),
        (5, "short text"),              # < n tokens -> zero grams
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_ngram_stats(df, "text", n=8).collect()}
    # 10 tokens, n=8 -> 3 grams per full-copy doc, all shared
    assert out[1]["n_grams"] == 3 and out[1]["dup_gram_frac"] == 1.0
    assert out[2]["dup_gram_frac"] == 1.0
    assert not out[1]["keep_dup"] and not out[2]["keep_dup"]
    # doc 3 has 5 grams, the 3 prefix grams are shared with docs 1/2
    assert out[3]["n_grams"] == 5 and out[3]["dup_grams"] == 3
    assert abs(out[3]["dup_gram_frac"] - 0.6) < 1e-12
    # unique doc: zero duplication, kept
    assert out[4]["dup_grams"] == 0 and out[4]["keep_dup"]
    # gram-less docs: zeros, kept
    for d in (5, 6):
        assert out[d]["n_grams"] == 0
        assert out[d]["dup_gram_frac"] == 0.0
        assert out[d]["keep_dup"]


def test_remove_duplicate_spans_cuts_shared_spans(spark):
    from hobbes_spark.functions.curation import remove_duplicate_spans

    base = "a b c d e f g h"  # exactly one 8-gram, shared by docs 1/2
    rows = [
        (1, base + " i j"),            # span at pos 0 -> "i j" survives
        (2, "x " + base + " z"),       # span at pos 1 -> "x z" survives
        (3, "unique words only here nothing shared at all ok fine"),
        (4, ""),
        (5, None),
        (6, "p q"),                    # < n tokens: untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, "text", n=8).collect()}
    assert out[1]["clean_text"] == "i j" and out[1]["kept_tokens"] == 2
    assert out[2]["clean_text"] == "x z" and out[2]["kept_tokens"] == 2
    assert out[1]["n_tokens"] == 10 and out[2]["n_tokens"] == 10
    # untouched docs come back normalized but complete
    assert out[3]["clean_text"].startswith("unique words")
    assert out[3]["kept_tokens"] == out[3]["n_tokens"] == 10
    for d in (4, 5):
        assert out[d]["clean_text"] == "" and out[d]["n_tokens"] == 0
    assert out[6]["clean_text"] == "p q" and out[6]["kept_tokens"] == 2


def test_remove_duplicate_spans_within_doc_repeat(spark):
    from hobbes_spark.functions.curation import remove_duplicate_spans

    # the same 4-gram occurs twice INSIDE one doc -> both occurrences cut
    # (suffix-array semantics: within-doc repeats count, unlike the
    # cross-doc-only duplicate_ngram_stats)
    rows = [(1, "k l m n MID k l m n TAIL")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_spans(df, "text", n=4).collect()[0]
    assert out["clean_text"] == "mid tail"
    assert out["n_tokens"] == 10 and out["kept_tokens"] == 2


def test_remove_duplicate_spans_validates_args(spark):
    import pytest as _pytest

    from hobbes_spark.functions.curation import remove_duplicate_spans

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        remove_duplicate_spans(df, "text", n=0)
    with _pytest.raises(ValueError):
        remove_duplicate_spans(df, "text", min_count=1)


class TestDsirWeights:
    def test_target_docs_score_higher(self, spark):
        """Docs drawn from the target domain must get higher importance
        weights than out-of-domain docs, and exp(log_weight) must be
        finite/positive."""
        import math

        from hobbes_spark.functions.curation import dsir_log_weights

        rows = [
            (1, "alpha beta gamma delta", "t"),
            (2, "alpha beta gamma epsilon", "t"),
            (3, "totally unrelated words here", "c"),
            (4, "alpha beta gamma delta", "c"),   # in-domain text, corpus source
            (5, "", "c"),                          # tokenless: absent from output
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
        target = df.filter(F.col("source") == "t")
        got = {r.doc_id: r.log_weight for r in dsir_log_weights(df, target).collect()}
        assert 5 not in got
        assert got[4] > got[3]  # in-domain text outranks out-of-domain
        assert all(math.isfinite(w) for w in got.values())


class TestDedupParagraphs:
    def test_first_occurrence_survives_later_copies_cut(self, spark):
        from hobbes_spark.functions.curation import dedup_paragraphs

        df = spark.createDataFrame(
            [
                (1, "unique one\n\nshared boilerplate\n\nunique two"),
                (2, "shared   BOILERPLATE\n\nanother unique"),  # ws/case variant
                (3, "shared boilerplate"),  # nothing else -> empty doc
            ],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r for r in dedup_paragraphs(df).collect()}
        assert got[1].clean_text == "unique one\n\nshared boilerplate\n\nunique two"
        assert got[1].n_paras == 3 and got[1].kept_paras == 3
        assert got[2].clean_text == "another unique"
        assert got[2].n_paras == 2 and got[2].kept_paras == 1
        assert got[3].clean_text == "" and got[3].kept_paras == 0

    def test_within_doc_repeat_collapses(self, spark):
        from hobbes_spark.functions.curation import dedup_paragraphs

        df = spark.createDataFrame(
            [(1, "same para\n\nsame para\n\nsame para")], "doc_id bigint, text string"
        )
        r = dedup_paragraphs(df).collect()[0]
        assert r.clean_text == "same para" and r.n_paras == 3 and r.kept_paras == 1

    def test_null_and_empty_text(self, spark):
        from hobbes_spark.functions.curation import dedup_paragraphs

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "   \n\n  ")], "doc_id bigint, text string"
        )
        for r in dedup_paragraphs(df).collect():
            assert r.clean_text == "" and r.n_paras == 0 and r.kept_paras == 0

    def test_multiple_blank_lines_one_separator(self, spark):
        from hobbes_spark.functions.curation import dedup_paragraphs

        df = spark.createDataFrame(
            [(1, "a b\n\n\n\nc d")], "doc_id bigint, text string"
        )
        r = dedup_paragraphs(df).collect()[0]
        assert r.n_paras == 2 and r.clean_text == "a b\n\nc d"


class TestRemoveBoilerplateLines:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_drops_every_occurrence_corpus_wide(self, spark):
        from hobbes_spark.functions.curation import remove_boilerplate_lines

        banner = "Subscribe to our newsletter today"
        rows = [(i, f"unique body line {i} of doc\n{banner}") for i in range(5)]
        got = {
            r.doc_id: r
            for r in remove_boilerplate_lines(
                self._df(spark, rows), max_docs=3, min_chars=10
            ).collect()
        }
        for i in range(5):
            assert got[i].clean_text == f"unique body line {i} of doc"
            assert (got[i].n_lines, got[i].kept_lines) == (2, 1)

    def test_under_threshold_and_short_lines_survive(self, spark):
        from hobbes_spark.functions.curation import remove_boilerplate_lines

        # "shared across three docs" appears in exactly max_docs docs (kept);
        # "ok" repeats in all five but is under min_chars (never dropped).
        rows = [
            (i, ("shared across three docs\nok" if i < 3 else "other text here\nok"))
            for i in range(5)
        ]
        got = {
            r.doc_id: r
            for r in remove_boilerplate_lines(
                self._df(spark, rows), max_docs=3, min_chars=10
            ).collect()
        }
        assert got[0].clean_text == "shared across three docs\nok"
        assert got[4].clean_text == "other text here\nok"

    def test_normalization_case_and_whitespace(self, spark):
        from hobbes_spark.functions.curation import remove_boilerplate_lines

        # Same line modulo case/extra spaces in 4 docs -> all dropped.
        variants = [
            "Cookie Policy Applies Here",
            "cookie policy applies here",
            "COOKIE   POLICY  APPLIES HERE",
            "  cookie policy applies here  ",
        ]
        rows = [(i, f"body {i} stays right here\n{v}") for i, v in enumerate(variants)]
        got = {
            r.doc_id: r
            for r in remove_boilerplate_lines(
                self._df(spark, rows), max_docs=3, min_chars=10
            ).collect()
        }
        for i in range(4):
            assert got[i].clean_text == f"body {i} stays right here"

    def test_order_preserved_and_null_text(self, spark):
        from hobbes_spark.functions.curation import remove_boilerplate_lines

        rows = [(1, "first line kept\nsecond line kept\nthird line kept"), (2, None)]
        got = {
            r.doc_id: r
            for r in remove_boilerplate_lines(
                self._df(spark, rows), max_docs=3
            ).collect()
        }
        assert got[1].clean_text == "first line kept\nsecond line kept\nthird line kept"
        assert got[2].clean_text == "" and got[2].n_lines == 0
        assert got[2].kept_lines == 0

    def test_offender_set_broadcasts(self, spark):
        from hobbes_spark.functions.curation import remove_boilerplate_lines

        rows = [(i, f"line {i} body text here\ncommon footer line here") for i in range(6)]
        plan = remove_boilerplate_lines(self._df(spark, rows))._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestBigramScores:
    def test_word_salad_scores_below_fluent(self, spark):
        from hobbes_spark.functions.curation import bigram_logprob_scores

        fluent = "the quick brown fox jumps over the lazy dog"
        rows = [(i, fluent) for i in range(6)]
        # same unigrams, scrambled order -> same unigram stats, alien bigrams
        rows.append((99, "dog the over quick lazy brown the jumps fox"))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r.doc_id: r.mean_logprob for r in bigram_logprob_scores(df).collect()}
        assert got[99] < got[0] - 1.0  # collapses by >1 nat under the bigram LM

    def test_short_docs_absent_counts_right(self, spark):
        from hobbes_spark.functions.curation import bigram_logprob_scores

        df = spark.createDataFrame(
            [(1, "one"), (2, ""), (3, None), (4, "two words here")],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.n_bigrams for r in bigram_logprob_scores(df).collect()}
        assert got == {4: 2}


class TestTemperatureSample:
    def _docs(self, spark, sizes):
        rows = []
        i = 0
        for src, n in sizes.items():
            for _ in range(n):
                rows.append((i, src))
                i += 1
        return spark.createDataFrame(rows, "doc_id bigint, source string")

    def test_alpha_one_is_proportional(self, spark):
        from hobbes_spark.functions.sampling import temperature_fractions

        df = self._docs(spark, {"big": 800, "small": 200})
        fr = {r.source: r.frac for r in
              temperature_fractions(df, "source", alpha=1.0, target_rows=500).collect()}
        assert fr["big"] == pytest.approx(0.5) and fr["small"] == pytest.approx(0.5)

    def test_low_alpha_upweights_rare_sources(self, spark):
        from hobbes_spark.functions.sampling import temperature_fractions

        df = self._docs(spark, {"big": 900, "small": 100})
        fr = {r.source: r.frac for r in
              temperature_fractions(df, "source", alpha=0.3, target_rows=500).collect()}
        assert fr["small"] > fr["big"]  # rare source sampled at a higher rate
        fr0 = {r.source: r.frac for r in
               temperature_fractions(df, "source", alpha=0.0, target_rows=500).collect()}
        # alpha=0: uniform share per source -> 250 rows each
        assert fr0["small"] == pytest.approx(1.0)  # capped: 250 > 100
        assert fr0["big"] == pytest.approx(250 / 900)

    def test_sample_is_deterministic_and_capped(self, spark):
        from hobbes_spark.functions.sampling import temperature_sample

        df = self._docs(spark, {"a": 500, "b": 50})
        s1 = sorted(r.doc_id for r in temperature_sample(df, "doc_id", "source",
                                                         alpha=0.5, target_rows=200).collect())
        s2 = sorted(r.doc_id for r in temperature_sample(df, "doc_id", "source",
                                                         alpha=0.5, target_rows=200).collect())
        assert s1 == s2 and 120 <= len(s1) <= 280  # hash sampling is ~binomial

    def test_fractions_broadcast_not_shuffle(self, spark):
        from hobbes_spark.functions.sampling import temperature_sample

        df = self._docs(spark, {"a": 100, "b": 100})
        plan = temperature_sample(df, "doc_id", "source")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_validation(self, spark):
        from hobbes_spark.functions.sampling import temperature_fractions

        df = self._docs(spark, {"a": 10})
        with pytest.raises(ValueError):
            temperature_fractions(df, "source", alpha=-0.1)

    def test_null_stratum_is_sampled_not_dropped(self, spark):
        """temperature_fractions counts the NULL stratum into N and
        assigns it a fraction; the sample join must be null-safe so
        those rows are actually sampled at that fraction instead of
        silently vanishing in an equi-join."""
        from hobbes_spark.functions.sampling import (
            temperature_fractions,
            temperature_sample,
        )

        rows = [(i, "a") for i in range(200)] + [(i + 200, None) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id bigint, source string")
        fr = {r.source: r.frac for r in
              temperature_fractions(df, "source", alpha=1.0, target_rows=200).collect()}
        assert fr[None] == pytest.approx(0.5)  # NULL stratum budgeted
        got = temperature_sample(df, "doc_id", "source", alpha=1.0,
                                 target_rows=200).collect()
        n_null = sum(1 for r in got if r.source is None)
        assert n_null > 0  # sampled, not dropped
        assert 60 <= n_null <= 140  # ~binomial around 100


# --------------------------------------------------------------------- #
# Review-hardening regressions (round 4, batch B)
# --------------------------------------------------------------------- #


def test_decontaminate_drops_null_id_contaminated_doc(spark):
    from hobbes_spark.functions.curation import decontaminate

    train = spark.createDataFrame(
        [(1, "totally clean text here nothing shared at all today ok"),
         (None, "the quick brown fox jumps over the lazy dog again now")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again now")],
        ["doc_id", "text"],
    )
    kept = decontaminate(train, ev, "text", n=8).collect()
    # the NULL-id contaminated doc must DROP (conservative direction),
    # not slip through the anti-join on a NULL key
    assert [r["doc_id"] for r in kept] == [1]


def test_pack_documents_rejects_bad_budget(spark):
    from hobbes_spark.functions.curation import pack_documents

    df = spark.createDataFrame([(1, "a b c", "s")], ["doc_id", "text", "source"])
    with pytest.raises(ValueError, match="budget"):
        pack_documents(df, budget=0)


def test_quality_score_null_text_scores_below_empty(spark):
    from hobbes_spark.functions.text import quality_score

    df = spark.createDataFrame([(1, None), (2, "")], ["id", "text"])
    rows = {r["id"]: r["q"] for r in df.select(
        "id", quality_score("text").alias("q")).collect()}
    # NULL text must not collect length-saturation credit: both score
    # the same floor (0.2 from the punct term), not 0.5 vs 0.2
    assert abs(rows[1] - rows[2]) < 1e-12


def test_lang_scores_and_wordlike_total_on_null(spark):
    from hobbes_spark.functions.text import lang_scores, wordlike_token_count

    df = spark.createDataFrame([(None,)], "text string")
    s = lang_scores("text")
    row = df.select(
        wordlike_token_count("text").alias("w"), s["zh"].alias("zh"),
        s["en"].alias("en"),
    ).collect()[0]
    assert row["w"] == 0 and row["zh"] == 0 and row["en"] == 0


# --------------------------------------------------------------------- #
# Gopher quality-rule battery (round 6)
# --------------------------------------------------------------------- #


def _gq(spark, rows, **kw):
    from hobbes_spark.functions.curation import gopher_quality_stats

    return {
        r["doc_id"]: r
        for r in gopher_quality_stats(_docs(spark, rows), **kw).collect()
    }


def test_gopher_word_count_and_stopword_rules(spark):
    good = "the quick brown fox jumps over that lazy dog with vigor " * 6
    rows = _gq(
        spark,
        [
            (1, good, "w"),                      # 66 words, 3 stopword hits
            (2, "five short words only here", "w"),  # < 50 words
            (3, None, "w"),                      # NULL text
        ],
        min_stopword_hits=2,
    )
    assert rows[1]["word_count"] == 66
    assert rows[1]["stopword_hits"] == 3  # the / that / with (distinct)
    assert 3.0 <= rows[1]["mean_word_len"] <= 10.0
    assert rows[1]["alpha_word_frac"] == 1.0
    assert rows[1]["keep_quality"]
    assert rows[2]["word_count"] == 5 and not rows[2]["keep_quality"]
    assert rows[3]["word_count"] == 0
    assert rows[3]["mean_word_len"] == 0.0
    assert not rows[3]["keep_quality"]


def test_gopher_line_and_symbol_signals(spark):
    bullets = "- first item\n- second item\n- third item"
    ellipses = "trailing thought...\nanother one…\nplain line"
    symbols = "# # # only two words"
    digits = "123 456 789"
    rows = _gq(
        spark,
        [(1, bullets, "w"), (2, ellipses, "w"), (3, symbols, "w"), (4, digits, "w")],
    )
    assert rows[1]["bullet_line_frac"] == 1.0       # > 0.9 -> rule fails
    assert not rows[1]["keep_quality"]
    assert abs(rows[2]["ellipsis_line_frac"] - 2 / 3) < 1e-12
    # '...' counts once per 3 chars; '#' once per char: 3 hashes over
    # 6 whitespace tokens (the hashes themselves tokenize as words)
    assert abs(rows[3]["symbol_word_ratio"] - 3 / 6) < 1e-12
    assert rows[4]["alpha_word_frac"] == 0.0        # digit-only tokens
    assert not rows[4]["keep_quality"]


def test_gopher_mean_word_length_bounds(spark):
    long_words = " ".join(["incomprehensibility"] * 60)   # mean 19 > 10
    rows = _gq(spark, [(1, long_words, "w")])
    assert rows[1]["word_count"] == 60
    assert rows[1]["mean_word_len"] == 19.0
    assert not rows[1]["keep_quality"]


# --------------------------------------------------------------------- #
# C4 cleaning-rule battery (round 6)
# --------------------------------------------------------------------- #


def _c4(spark, rows, **kw):
    from hobbes_spark.functions.curation import c4_quality_stats

    return {
        r["doc_id"]: r
        for r in c4_quality_stats(_docs(spark, rows), **kw).collect()
    }


def test_c4_line_filter_rules(spark):
    text = "\n".join(
        [
            "This line has enough words and ends properly.",  # kept
            "Too short ends.",                                # < 5 words
            "This line has plenty of words but no terminal punctuation",
            "Enable javascript to view this page properly.",  # javascript
            'A quoted sentence with five words here."',       # kept (quote)
        ]
    )
    rows = _c4(spark, [(1, text, "w")])
    r = rows[1]
    assert r["n_lines"] == 5
    assert r["kept_lines"] == 2
    assert abs(r["kept_line_frac"] - 0.4) < 1e-12
    assert r["clean_text"].splitlines() == [
        "This line has enough words and ends properly.",
        'A quoted sentence with five words here."',
    ]


def test_c4_page_rules(spark):
    ok = "One good sentence right here today. " * 3
    rows = _c4(
        spark,
        [
            (1, ok, "w"),
            (2, "Only two sentences survive here fine. Second one is here too.", "w"),
            (3, ok + " Lorem Ipsum dolor sit amet it says.", "w"),
            (4, ok + " code = { nested }", "w"),
            (5, None, "w"),
        ],
    )
    assert rows[1]["sentence_count"] == 3 and rows[1]["keep_c4"]
    assert rows[2]["sentence_count"] == 2 and not rows[2]["keep_c4"]
    assert rows[3]["has_lorem_ipsum"] and not rows[3]["keep_c4"]
    # the '{' flag reads the RAW page (C4 drops the whole page), even
    # though the brace line itself also failed the line filter
    assert rows[4]["has_curly_brace"] and not rows[4]["keep_c4"]
    assert rows[5]["n_lines"] == 1 and rows[5]["kept_lines"] == 0
    assert rows[5]["clean_text"] == "" and not rows[5]["keep_c4"]


def test_c4_banned_words_param(spark):
    text = "The gadget word appears in this sentence today. " * 3
    base = _c4(spark, [(1, text, "w")])
    assert base[1]["banned_word_hits"] == 0 and base[1]["keep_c4"]
    banned = _c4(spark, [(1, text, "w")], banned_words=("gadget", "widget"))
    assert banned[1]["banned_word_hits"] == 1
    assert not banned[1]["keep_c4"]


def test_gopher_custom_stopword_list(spark):
    text = "alpha beta gamma " * 20  # 60 words, no English stopwords
    base = _gq(spark, [(1, text, "w")])
    assert base[1]["stopword_hits"] == 0 and not base[1]["keep_quality"]
    custom = _gq(
        spark, [(1, text, "w")],
        required_stopwords=("alpha", "beta"), min_stopword_hits=2,
    )
    assert custom[1]["stopword_hits"] == 2 and custom[1]["keep_quality"]


class TestPerplexityBuckets:
    """CCNet-style head/middle/tail partition (Wenzek et al. 2020 §4.3).
    The oracle gate pins values; these pin the semantics the SQL twin
    can't show: PER-LANGUAGE cutoffs, short-doc absence, and the
    broadcast shape of the cutoff join."""

    def _corpus(self, spark):
        # Two "languages" with deliberately different fluency levels:
        # every 'xx' doc is scrambled relative to the en base sentence,
        # so a GLOBAL cutoff would label all of xx "tail". Within each
        # language there are fluent docs (repeated base order), mildly
        # perturbed ones, and word salad.
        en_base = "the quick brown fox jumps over the lazy dog again today"
        xx_base = "dog lazy the over jumps fox brown quick the today again"
        rows = []
        i = 0
        for lang, base in (("en", en_base), ("xx", xx_base)):
            words = base.split()
            for _ in range(4):  # fluent copies dominate the bigram LM
                rows.append((i, base, lang)); i += 1
            mid = " ".join(words[2:] + words[:2])  # rotated: mostly-seen bigrams
            rows.append((i, mid, lang)); i += 1
            salad = " ".join(words[::2] + words[1::2])
            rows.append((i, salad, lang)); i += 1
        return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    def test_per_language_cutoffs_not_global(self, spark):
        from hobbes_spark.functions.curation import perplexity_buckets

        out = perplexity_buckets(self._corpus(spark)).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, set()).add(r.bucket)
        # each language is cut at ITS OWN tertiles -> both get a head
        # and a tail despite xx scoring worse than en globally
        assert by_lang["en"] >= {"head", "tail"}
        assert by_lang["xx"] >= {"head", "tail"}

    def test_salad_buckets_worse_than_fluent_within_lang(self, spark):
        from hobbes_spark.functions.curation import perplexity_buckets

        rank = {"head": 0, "middle": 1, "tail": 2}
        out = {r.doc_id: r for r in perplexity_buckets(self._corpus(spark)).collect()}
        # doc 0 = fluent en, doc 5 = en salad; doc 6 = fluent xx, doc 11 = xx salad
        assert rank[out[0].bucket] < rank[out[5].bucket]
        assert rank[out[6].bucket] < rank[out[11].bucket]
        assert out[0].log_ppl < out[5].log_ppl

    def test_short_docs_absent_and_lang_none_global(self, spark):
        from hobbes_spark.functions.curation import perplexity_buckets

        df = spark.createDataFrame(
            [(1, "one", "en"), (2, None, "en"),
             (3, "three words here", "en"), (4, "three words here", "en"),
             (5, "three words here", "en")],
            "doc_id bigint, text string, lang string",
        )
        got = perplexity_buckets(df).collect()
        assert sorted(r.doc_id for r in got) == [3, 4, 5]
        flat = perplexity_buckets(df, lang_col=None).collect()
        assert sorted(r.doc_id for r in flat) == [3, 4, 5]
        assert "lang" not in flat[0].asDict()
        # identical scores tie on the cutoff -> everyone is "head"
        assert {r.bucket for r in flat} == {"head"}

    def test_cutoff_join_broadcasts(self, spark):
        from hobbes_spark.functions.curation import perplexity_buckets

        plan = (
            perplexity_buckets(self._corpus(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_invalid_cutoffs_raise(self, spark):
        from hobbes_spark.functions.curation import perplexity_buckets

        with pytest.raises(ValueError):
            perplexity_buckets(self._corpus(spark), cutoffs=(0.9, 0.1))


class TestMixturePlan:
    """Token-budget mixture planner (sampling.mixture_plan) + its
    deterministic apply. The oracle gate pins the plan values; these
    pin the branch semantics and the apply's map-only/nested shape."""

    def _docs(self, spark):
        rows = []
        i = 0
        for src, n in (("a", 20), ("b", 10), ("c", 5)):
            for _ in range(n):
                rows.append((i, "five tokens in this doc", src))
                i += 1
        rows.append((i, "nullsource doc words here", None))
        return spark.createDataFrame(rows, "doc_id bigint, text string, source string")

    def test_rates_exhaustion_and_leftovers(self, spark):
        from hobbes_spark.functions.sampling import mixture_plan

        # tokens: a=100, b=50, c=25, NULL=4. budget 120 at weights
        # a=0.5, b=0.25, ghost=0.25 -> targets a=60, b=30, ghost=30.
        plan = {r["source"]: r for r in mixture_plan(
            self._docs(spark), "source",
            {"a": 0.5, "b": 0.25, "ghost": 0.25}, 120.0,
        ).collect()}
        assert plan["a"]["rate"] == 0.6 and plan["a"]["expected_tokens"] == 60
        assert not plan["a"]["exhausted"]
        assert plan["b"]["rate"] == 0.6 and not plan["b"]["exhausted"]
        # recipe stratum absent from the corpus: zero counts, exhausted
        assert plan["ghost"]["n_tokens"] == 0 and plan["ghost"]["rate"] == 0.0
        assert plan["ghost"]["exhausted"]
        # corpus strata not in the recipe stay visible, planned out
        assert plan["c"]["target_weight"] == 0.0 and plan["c"]["rate"] == 0.0
        assert not plan["c"]["exhausted"]
        assert plan[None]["n_tokens"] == 4 and plan[None]["rate"] == 0.0

    def test_exhausted_source_fully_consumed(self, spark):
        from hobbes_spark.functions.sampling import mixture_plan

        plan = {r["source"]: r for r in mixture_plan(
            self._docs(spark), "source", {"c": 1.0}, 1000.0,
        ).collect()}
        # target 1000 > 25 available: rate caps at 1, all tokens taken
        assert plan["c"]["rate"] == 1.0
        assert plan["c"]["expected_tokens"] == plan["c"]["n_tokens"] == 25
        assert plan["c"]["exhausted"]

    def test_apply_nested_and_planned_out_dropped(self, spark):
        from hobbes_spark.functions.sampling import apply_mixture_plan, mixture_plan

        docs = self._docs(spark)
        w = {"a": 0.5, "b": 0.5}
        small = apply_mixture_plan(
            docs, mixture_plan(docs, "source", w, 60.0), "source", "doc_id"
        ).collect()
        big = apply_mixture_plan(
            docs, mixture_plan(docs, "source", w, 120.0), "source", "doc_id"
        ).collect()
        kept_small = {r.doc_id for r in small}
        kept_big = {r.doc_id for r in big}
        # raising the budget only ADDS documents (nested md5 selection)
        assert kept_small <= kept_big
        # planned-out strata (c, NULL) are fully dropped
        assert all(r.source in ("a", "b") for r in big)

    def test_apply_broadcasts_plan(self, spark):
        from hobbes_spark.functions.sampling import apply_mixture_plan, mixture_plan

        docs = self._docs(spark)
        plan = mixture_plan(docs, "source", {"a": 1.0}, 50.0)
        phys = (
            apply_mixture_plan(docs, plan, "source", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in phys

    def test_validation(self, spark):
        from hobbes_spark.functions.sampling import mixture_plan

        docs = self._docs(spark)
        with pytest.raises(ValueError):
            mixture_plan(docs, "source", {}, 100.0)
        with pytest.raises(ValueError):
            mixture_plan(docs, "source", {"a": -0.1}, 100.0)
        with pytest.raises(ValueError):
            mixture_plan(docs, "source", {"a": 1.0}, 0.0)


def test_mixture_plan_epochs_fractional(spark):
    from hobbes_spark.functions.sampling import mixture_plan

    df = spark.createDataFrame(
        [(i, "five tokens in this doc", "a") for i in range(10)]
        + [(100, "five tokens in this doc", "b")],
        "doc_id bigint, text string, source string",
    )
    # a: 50 tokens, b: 5 tokens; budget 100 at a=0.5, b=0.5 ->
    # a needs 1 epoch exactly (50/50), b needs 10 (50/5): upsample
    plan = {r["source"]: r for r in mixture_plan(
        df, "source", {"a": 0.5, "b": 0.5}, 100.0
    ).collect()}
    assert plan["a"]["epochs"] == 1.0 and not plan["a"]["exhausted"]
    assert plan["b"]["epochs"] == 10.0 and plan["b"]["exhausted"]
    # for strata WITH tokens, epochs > 1 iff exhausted; rate stays capped
    assert plan["b"]["rate"] == 1.0


def test_mixture_plan_nonstring_strata(spark):
    """The recipe side types its stratum column from df's schema, so a
    bigint domain-id stratum joins by value — no implicit string
    coercion to silently miss keys or retype the output column."""
    from hobbes_spark.functions.sampling import mixture_plan

    df = spark.createDataFrame(
        [(i, "five tokens in this doc", 7) for i in range(10)]
        + [(100, "five tokens in this doc", 8)],
        "doc_id bigint, text string, domain_id bigint",
    )
    out = mixture_plan(df, "domain_id", {7: 0.5, 9: 0.5}, 50.0)
    assert out.schema["domain_id"].dataType.simpleString() == "bigint"
    plan = {r["domain_id"]: r for r in out.collect()}
    assert plan[7]["n_tokens"] == 50 and plan[7]["rate"] == 0.5
    assert plan[9]["n_tokens"] == 0 and plan[9]["exhausted"]
    assert plan[8]["target_weight"] == 0.0


class TestBlocklist:
    """C4-style phrase-blocklist filter (curation.blocklist_stats)."""

    def test_whole_word_and_phrase_counting(self, spark):
        from hobbes_spark.functions.curation import blocklist_stats

        df = spark.createDataFrame(
            [
                (1, "please Click Here to buy now"),      # 2 phrase hits
                (2, "clicking hereabouts buys nowhere"),  # substrings only: 0
                (3, "winner winner"),                     # 2 word hits
                (4, "unwinnerly winners"),                # boundary: 0
                (5, None),                                # NULL kept
            ],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: r for r in blocklist_stats(
            df, "text", ("click here", "buy now", "winner")
        ).collect()}
        assert got[1]["blocklist_hits"] == 2 and not got[1]["keep_blocklist"]
        assert got[2]["blocklist_hits"] == 0 and got[2]["keep_blocklist"]
        assert got[3]["blocklist_hits"] == 2
        assert got[4]["blocklist_hits"] == 0
        assert got[5]["blocklist_hits"] == 0 and got[5]["keep_blocklist"]

    def test_longest_phrase_wins_overlap(self, spark):
        from hobbes_spark.functions.curation import blocklist_stats

        # 'limited time offer' contains 'time'; longest-first ordering
        # must count the phrase once, not shadow it with the short term
        df = spark.createDataFrame(
            [(1, "a limited time offer today")], "doc_id bigint, text string"
        )
        got = blocklist_stats(df, "text", ("time", "limited time offer")).collect()[0]
        assert got["blocklist_hits"] == 1

    def test_regex_metachars_escaped_and_validation(self, spark):
        from hobbes_spark.functions.curation import blocklist_pattern, blocklist_stats

        df = spark.createDataFrame([(1, "cost is $9.99 ok")], "doc_id bigint, text string")
        got = blocklist_stats(df, "text", ("$9.99",)).collect()[0]
        assert got["blocklist_hits"] == 1
        with pytest.raises(ValueError):
            blocklist_pattern([])
        with pytest.raises(ValueError):
            blocklist_pattern(["  ", ""])
        with pytest.raises(ValueError):
            blocklist_pattern(["$$$", "!!!"])  # no word characters

    def test_unicode_adjacency_matches_oracle_engine(self, spark):
        """Regression for the \\b portability bug: Java's \\b is
        Unicode-word-aware, RE2's is ASCII-only, so a \\b pattern gave
        Spark 0 / DuckDB 1 on '\u00e9winner'. Token matching must count 1
        in BOTH engines — unicode letters are separators by contract."""
        import duckdb

        from hobbes_spark.functions.curation import blocklist_pattern, blocklist_stats

        # includes U+0130: JVM lower() full-maps it to i + COMBINING DOT
        # (and is locale-sensitive for 'I') while DuckDB simple-maps —
        # the ASCII translate() fold sidesteps engine case mapping
        cases = ["\u00e9winner ok", "\u6c49winner", "winner\u00e9 ok",
                 "a winner b", "\u0130winner x", "\u0130WINNER", "Iwinner"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(cases)], "doc_id bigint, text string"
        )
        got = {r["doc_id"]: r["blocklist_hits"]
               for r in blocklist_stats(df, "text", ("winner",)).collect()}
        assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 0}
        from hobbes_spark.functions.curation import blocklist_subject_sql

        pat = blocklist_pattern(("winner",))
        con = duckdb.connect()
        for i, t in enumerate(cases):
            d = con.execute(
                f"SELECT len(regexp_extract_all({blocklist_subject_sql('?')}, ?))",
                [t, pat],
            ).fetchone()[0]
            assert d == got[i], (t, d, got[i])

    def test_adjacent_blocked_tokens_both_count(self, spark):
        from hobbes_spark.functions.curation import blocklist_stats

        # the double-space framing: adjacent needles must not share a
        # boundary space and hide one another
        df = spark.createDataFrame(
            [(1, "winner winner click here click here")],
            "doc_id bigint, text string",
        )
        got = blocklist_stats(df, "text", ("winner", "click here")).collect()[0]
        assert got["blocklist_hits"] == 4


def test_nfc_normalize_composes_and_propagates_null(spark):
    """text.nfc_normalize (round 9): decomposed base+combining pairs
    compose (length drops), precomposed and ASCII are fixed points,
    NULL propagates, and the result is idempotent."""
    from pyspark.sql import functions as F

    from hobbes_spark.functions.text import nfc_normalize

    rows = [
        (1, "café"),   # e + COMBINING ACUTE -> café (5 -> 4)
        (2, "café"),    # precomposed: identity
        (3, "Å"),      # A + COMBINING RING -> Å (2 -> 1)
        (4, "plain"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {r["id"]: (r["n"], r["l"]) for r in df.select(
        "id",
        nfc_normalize("t").alias("n"),
        F.length(nfc_normalize("t")).alias("l"),
    ).collect()}
    assert out[1] == ("café", 4)
    assert out[2] == ("café", 4)
    assert out[3] == ("Å", 1)
    assert out[4] == ("plain", 5)
    assert out[5] == (None, None)
    # idempotent: NFC of NFC is itself
    twice = df.select(
        "id", nfc_normalize(nfc_normalize("t")).alias("n2")
    ).collect()
    once = {r["id"]: out[r["id"]][0] for r in twice}
    assert all(r["n2"] == once[r["id"]] for r in twice)


def test_unicode_normalize_forms_and_validation(spark):
    """unicode_normalize (round 9): NFKC folds compatibility
    characters (hand-derived: ligature, superscript, fullwidth), NFD
    decomposes what NFC composes, and bad forms raise."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from hobbes_spark.functions.text import unicode_normalize

    rows = [(1, "ﬁre"), (2, "x²"), (3, "café")]
    df = spark.createDataFrame(rows, "id int, t string")
    nfkc = {r["id"]: r["n"] for r in
            df.select("id", unicode_normalize("t", "NFKC").alias("n")).collect()}
    assert nfkc == {1: "fire", 2: "x2", 3: "café"}
    nfd = df.filter(F.col("id") == 3).select(
        unicode_normalize("t", "NFD").alias("n"),
        F.length(unicode_normalize("t", "NFD")).alias("l"),
    ).first()
    assert (nfd["n"], nfd["l"]) == ("café", 5)
    with _pt.raises(ValueError, match="form must be"):
        unicode_normalize("t", "NFKX")


class TestDuplicateSubstringSpans:
    """r13: Lee et al. 2022 exact-substring spans — gram fingerprints +
    adjacent-run merge into maximal spans, no suffix array, no k-times
    covered-token explode."""

    def _spans(self, spark, rows, k=6):
        from hobbes_spark.functions.dedup import duplicate_substring_spans

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = duplicate_substring_spans(df, "text", k=k).collect()
        out = {}
        for r in got:
            out.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"], r["span_tokens"],
                 r["n_windows"]))
        return {d: sorted(v) for d, v in out.items()}

    def test_maximal_spans_overlap_and_nesting(self, spark):
        run = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"
        rows = [
            (1, "x1 x2 " + run + " y1 y2"),
            (2, "z1 r1 r2 r3 r4 r5 r6 r7 r8 w1 w2 w3"),
            # two islands in one doc; the 2nd repeats the full run
            (3, "r3 r4 r5 r6 r7 r8 r9 r10 q1 " + run),
            (4, "totally unrelated words that appear once only here"),
        ]
        got = self._spans(spark, rows, k=6)
        assert got[1] == [(2, 11, 10, 5)]
        assert got[2] == [(1, 8, 8, 3)]
        assert got[3] == [(0, 7, 8, 3), (9, 18, 10, 5)]
        assert 4 not in got  # no duplicated window -> no row

    def test_min_length_k_enforced(self, spark):
        # a 5-token shared run yields NO span at k=6
        rows = [(1, "a b c d e zz1"), (2, "a b c d e zz2")]
        assert self._spans(spark, rows, k=6) == {}
        # but at k=5 it is exactly one 5-token span in each doc
        got = self._spans(spark, rows, k=5)
        assert got == {1: [(0, 4, 5, 1)], 2: [(0, 4, 5, 1)]}

    def test_within_doc_repeat_counts(self, spark):
        # corpus-wide occurrence count: the repeat lives in ONE doc
        rows = [(1, "m1 m2 m3 m4 m5 m6 gap1 gap2 m1 m2 m3 m4 m5 m6")]
        got = self._spans(spark, rows, k=6)
        assert got == {1: [(0, 5, 6, 1), (8, 13, 6, 1)]}

    def test_validation_and_empty(self, spark):
        import pytest as _p

        from hobbes_spark.functions.dedup import duplicate_substring_spans

        df = spark.createDataFrame(
            [(1, None), (2, "")], "doc_id long, text string")
        assert duplicate_substring_spans(df, "text", k=6).count() == 0
        with _p.raises(ValueError):
            duplicate_substring_spans(df, "text", k=0)
        with _p.raises(ValueError):
            duplicate_substring_spans(df, "text", k=6, min_count=1)

    def test_plan_no_covered_token_explode(self, spark):
        # the span path must not contain a sequence()-explode of
        # covered indices — that is the k-times blowup it avoids
        from hobbes_spark.functions.dedup import duplicate_substring_spans

        df = spark.createDataFrame(
            [(1, "a b c d e f g")], "doc_id long, text string")
        plan = (
            duplicate_substring_spans(df, "text", k=6)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "sequence(" not in plan


class TestRemoveSubstringSpans:
    """r13: span SUBTRACTION at Lee et al. 2022 semantics — maximal
    >=k-token duplicated runs cut, remainder kept."""

    def test_subtraction_and_remainder(self, spark):
        from hobbes_spark.functions.dedup import remove_substring_spans

        run = "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"
        rows = [
            (1, "x1 x2 " + run + " y1 y2"),
            (2, "z1 " + run + " w1"),
            (3, "all unique words in this one nothing shared here at all"),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               remove_substring_spans(df, "text", k=6).collect()}
        assert out[1]["clean_text"] == "x1 x2 y1 y2"
        assert out[1]["n_tokens"] == 14 and out[1]["kept_tokens"] == 4
        assert out[2]["clean_text"] == "z1 w1"
        # a doc with no duplicated span comes back complete (normalized)
        assert out[3]["kept_tokens"] == out[3]["n_tokens"] == 11
        assert out[4]["clean_text"] == "" and out[4]["n_tokens"] == 0

    def test_short_shared_run_survives(self, spark):
        from hobbes_spark.functions.dedup import remove_substring_spans

        # a 5-token shared run is BELOW k=6: nothing is cut (the
        # window-removal operator at n=5 would have cut it)
        rows = [(1, "a b c d e tail1"), (2, "a b c d e tail2")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               remove_substring_spans(df, "text", k=6).collect()}
        assert out[1]["kept_tokens"] == 6 and out[2]["kept_tokens"] == 6
