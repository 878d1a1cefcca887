"""Unigram-LM tokenizer (`functions/unigram.py`) vs the published
algorithm (Kudo 2018, SentencePiece `--model_type=unigram`): Viterbi
segmentation semantics, hard-EM learning behavior, reconstruction, and
the driver-local one-job scale contract shared with `learn_bpe`."""

from __future__ import annotations

import math

import pytest

from hobbes_spark.functions.unigram import (
    UNK_LOGPROB,
    learn_unigram_lm,
    unigram_encode,
    viterbi_segment,
)

# the hand-computable fixture inventory used by the catalog's
# unigram_encode_fixture oracle — margins are decades wide, so no
# float-tie wobble can flip a segmentation
FIXTURE = {
    "a": math.log(0.25),
    "b": math.log(0.25),
    "c": math.log(0.05),
    "ab": math.log(0.4),
    "abc": math.log(0.05),
}


def _wf(spark, pairs):
    return spark.createDataFrame(pairs, "word string, freq bigint")


class TestViterbi:
    def test_hand_computed_segmentations(self):
        # abab: ab|ab = 0.16 beats a|b|a|b = 0.0039
        assert viterbi_segment("abab", FIXTURE, 3) == ["ab", "ab"]
        # abc: whole piece 0.05 beats ab|c = 0.02
        assert viterbi_segment("abc", FIXTURE, 3) == ["abc"]
        # abca: abc|a = 0.0125 beats ab|c|a = 0.005
        assert viterbi_segment("abca", FIXTURE, 3) == ["abc", "a"]
        assert viterbi_segment("bbb", FIXTURE, 3) == ["b", "b", "b"]
        # unknown char falls back to itself at UNK cost
        assert viterbi_segment("ax", FIXTURE, 3) == ["a", "x"]

    def test_tie_prefers_longest_piece(self):
        # p(xy) == p(x)p(y) exactly -> tie; the longer piece must win
        lps = {"x": math.log(0.5), "y": math.log(0.5), "xy": math.log(0.25)}
        assert viterbi_segment("xy", lps, 2) == ["xy"]

    def test_reconstruction_always_holds(self):
        for w in ("abcabc", "xyzzy", "a", "q", "abcx"):
            assert "".join(viterbi_segment(w, FIXTURE, 3)) == w


class TestLearnUnigramLM:
    def test_learns_the_dominant_piece(self, spark):
        # a corpus that is overwhelmingly 'ab' repetitions: the learned
        # inventory must contain a multi-char 'ab'-family piece with
        # count >> any single char's
        wf = _wf(spark, [("ababab", 50), ("abab", 30), ("ab", 20), ("ba", 2)])
        out = {r["piece"]: r for r in learn_unigram_lm(wf, vocab_size=6).collect()}
        assert "a" in out and "b" in out  # chars never pruned
        multi = [p for p in out if len(p) > 1]
        assert multi, "no multi-char piece survived"
        best = max(multi, key=lambda p: out[p]["count"])
        assert set(best) <= {"a", "b"} and out[best]["count"] > out["ba" if "ba" in out else "a"]["count"] / 10

    def test_vocab_size_and_char_floor(self, spark):
        wf = _wf(spark, [("abcdef", 5), ("abcabc", 5), ("defdef", 5)])
        out = learn_unigram_lm(wf, vocab_size=8).collect()
        assert len(out) <= 8
        pieces = {r["piece"] for r in out}
        assert {"a", "b", "c", "d", "e", "f"} <= pieces
        # vocab_size below the char count floors at the char count
        tiny = learn_unigram_lm(_wf(spark, [("abcdef", 5)]), vocab_size=2).collect()
        assert {r["piece"] for r in tiny} >= {"a", "b", "c", "d", "e", "f"}

    def test_probs_normalize_and_deterministic(self, spark):
        wf = _wf(spark, [("hello", 4), ("help", 3), ("yellow", 2)])
        a = learn_unigram_lm(wf, vocab_size=10).collect()
        b = learn_unigram_lm(wf, vocab_size=10).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        total = sum(math.exp(r["logprob"]) for r in a)
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_validation(self, spark):
        wf = _wf(spark, [("ab", 1)])
        with pytest.raises(ValueError):
            learn_unigram_lm(wf, vocab_size=0)
        with pytest.raises(ValueError):
            learn_unigram_lm(wf, vocab_size=5, shrink_factor=1.5)
        with pytest.raises(ValueError):
            learn_unigram_lm(wf, vocab_size=5, max_piece_len=0)

    def test_runs_one_spark_job(self, spark):
        """Same scale contract as learn_bpe: learning is driver-local
        over the bounded (word, freq) table — exactly ONE Spark job
        (the collect) regardless of vocab size or EM rounds."""
        wf = _wf(spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
                         ("lowest", 4), ("newer", 3), ("wider", 2), ("news", 5)])
        sc = spark.sparkContext
        sc.setJobGroup("unigram-learn", "count jobs for learn_unigram_lm")
        try:
            out = learn_unigram_lm(wf, vocab_size=12, em_iters=3)
        finally:
            sc.setJobGroup("unigram-after", "outside the counted window")
        assert len(out.collect()) > 0
        ids = sc.statusTracker().getJobIdsForGroup("unigram-learn")
        assert len(ids) == 1, f"learn_unigram_lm ran {len(ids)} jobs; must be exactly 1"


class TestUnigramEncode:
    def test_encode_matches_viterbi_and_reconstructs(self, spark):
        df = spark.createDataFrame(
            [(1, "abab abc"), (2, "ABCA bbb"), (3, None), (4, "  ")],
            "id long, text string",
        )
        got = {r["id"]: r["unigram_tokens"]
               for r in unigram_encode(df, "text", FIXTURE).collect()}
        assert got[1] == ["ab", "ab", "abc"]
        assert got[2] == ["abc", "a", "b", "b", "b"]  # lowercased first
        assert got[3] == [] and got[4] == []

    def test_encode_is_arrow_batched(self, spark):
        df = spark.createDataFrame([(1, "ab")], "id long, text string")
        eplan = (
            unigram_encode(df, "text", FIXTURE)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" in eplan and "BatchEvalPython" not in eplan

    def test_learned_inventory_round_trips_through_encode(self, spark):
        wf = _wf(spark, [("hello", 4), ("help", 3), ("yellow", 2)])
        pieces = {r["piece"]: r["logprob"]
                  for r in learn_unigram_lm(wf, vocab_size=10).collect()}
        df = spark.createDataFrame([(1, "hello yellow help")], "id long, text string")
        toks = unigram_encode(df, "text", pieces).collect()[0]["unigram_tokens"]
        assert "".join(toks) == "helloyellowhelp"

    def test_empty_pieces_raise(self, spark):
        df = spark.createDataFrame([(1, "ab")], "id long, text string")
        with pytest.raises(ValueError):
            unigram_encode(df, "text", {})
