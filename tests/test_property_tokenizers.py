"""Property-based pins for the round-6 additions: unigram-LM Viterbi
segmentation, text normalization, and the mixture planner — each
checked against an INDEPENDENT pure-Python reference (the
test_property_curation pattern: the DuckDB oracle gates
engine-vs-engine lockstep; this layer catches a bug mirrored
faithfully into the oracle).

Spark jobs are kept out of the hypothesis loops where possible
(viterbi_segment is plain Python; the Spark-backed properties batch
the whole example through one job).
"""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hobbes_spark.functions.text import NORMALIZE_RULES
from hobbes_spark.functions.unigram import UNK_LOGPROB, viterbi_segment

# ---------------------------------------------------------------- #
# Viterbi segmentation vs brute-force enumeration
# ---------------------------------------------------------------- #

_ALPHA = "abc"

words = st.text(alphabet=_ALPHA + "x", min_size=1, max_size=9)
inventories = st.dictionaries(
    st.text(alphabet=_ALPHA, min_size=1, max_size=3),
    st.floats(min_value=-8.0, max_value=-0.1),
    min_size=1,
    max_size=12,
).map(lambda d: {**{ch: -3.0 for ch in _ALPHA}, **d})


def _brute_best(word: str, lps: dict, max_len: int) -> float:
    """Best achievable score over ALL segmentations, by recursion —
    independent of the DP implementation."""
    if not word:
        return 0.0
    best = -math.inf
    for ln in range(1, min(max_len, len(word)) + 1):
        piece = word[:ln]
        lp = lps.get(piece)
        if lp is None:
            if ln == 1:
                lp = UNK_LOGPROB
            else:
                continue
        rest = _brute_best(word[ln:], lps, max_len)
        if lp + rest > best:
            best = lp + rest
    return best


@given(word=words, lps=inventories)
@settings(max_examples=200, deadline=None)
def test_viterbi_is_globally_optimal_and_reconstructs(word, lps):
    max_len = max(len(p) for p in lps)
    segs = viterbi_segment(word, lps, max_len)
    # reconstruction is unconditional
    assert "".join(segs) == word
    # the DP's score equals the brute-force optimum
    score = sum(lps.get(p, UNK_LOGPROB) for p in segs)
    assert score == pytest.approx(_brute_best(word, lps, max_len), abs=1e-9)
    # every emitted multi-char piece is from the inventory
    assert all(p in lps or len(p) == 1 for p in segs)


# ---------------------------------------------------------------- #
# normalize_text vs an independent Python-re interpreter
# ---------------------------------------------------------------- #

_DIRTY_FRAGS = [
    "plain words",
    "“curly” and ‘single’",
    "dash – here — and ―",
    "dots … more",
    "nb sp and　ideographic",
    "zero​width‍",
    "ctrl\x01\x02chars",
    "\r\nCRLF\rlone",
    "tabs\t\tdouble",
    "  spaced  out  ",
    "\n\n\n\nblank runs",
]

dirty_texts = st.lists(
    st.sampled_from(_DIRTY_FRAGS), min_size=1, max_size=6
).map(" ".join)


def _py_norm(s: str) -> str:
    # edge-trim is part of NORMALIZE_RULES itself (engine trim() only
    # strips spaces; Python strip() takes all whitespace — the rules
    # are the single source all three interpreters share)
    for pat, rep in NORMALIZE_RULES:
        s = re.sub(pat, rep, s)
    return s


@pytest.mark.usefixtures("spark")
@given(texts=st.lists(dirty_texts, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_normalize_matches_python_reference_and_idempotent(spark, texts):
    from hobbes_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    out = df.select(
        "i",
        normalize_text("t").alias("c1"),
        normalize_text(normalize_text("t")).alias("c2"),
    ).collect()
    got = {r["i"]: r for r in out}
    for i, t in enumerate(texts):
        assert got[i]["c1"] == _py_norm(t), repr(t)
        # normalization is idempotent: a second pass changes nothing
        assert got[i]["c2"] == got[i]["c1"], repr(t)


# ---------------------------------------------------------------- #
# mixture_plan invariants vs independent arithmetic
# ---------------------------------------------------------------- #

recipes = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]),
    st.floats(min_value=0.01, max_value=5.0),
    min_size=1,
    max_size=4,
)


@pytest.mark.usefixtures("spark")
@given(recipe=recipes,
       sizes=st.lists(st.integers(min_value=0, max_value=6), min_size=3, max_size=3),
       budget=st.floats(min_value=1.0, max_value=500.0))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mixture_plan_invariants(spark, recipe, sizes, budget):
    from hobbes_spark.functions.sampling import mixture_plan

    rows, i = [], 0
    for src, n in zip(("a", "b", "c"), sizes):
        for _ in range(n):
            rows.append((i, "four plain words here", src))
            i += 1
    if not rows:
        rows = [(0, "four plain words here", "a")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    plan = {r["source"]: r for r in
            mixture_plan(df, "source", recipe, budget).collect()}

    total_w = sum(recipe.values())
    for src, r in plan.items():
        w = recipe.get(src, 0.0) / total_w if src in recipe else 0.0
        assert r["target_weight"] == pytest.approx(w, abs=1e-15)
        # rate in [0, 1]; expected <= available; exact recomputation
        assert 0.0 <= r["rate"] <= 1.0
        assert r["expected_tokens"] <= r["n_tokens"]
        if r["n_tokens"] > 0 and w > 0:
            assert r["rate"] == min(1.0, budget * w / r["n_tokens"])
            assert r["epochs"] == budget * w / r["n_tokens"]
            assert r["exhausted"] == (r["n_tokens"] < budget * w)
        else:
            assert r["rate"] == 0.0 and r["epochs"] == 0.0
    # every recipe stratum and every corpus stratum is visible
    assert set(plan) == set(recipe) | {s for _, _, s in rows}


# ---------------------------------------------------------------- #
# byte-level BPE: exact round trip on arbitrary unicode (the property
# word-level BPE cannot give — r11 verdict item 2)
# ---------------------------------------------------------------- #


@given(
    text=st.text(min_size=0, max_size=200),
    merge_seed=st.lists(
        st.tuples(st.sampled_from("abcdeÃ©ĠtĊ"), st.sampled_from("abcdeÃ©Ġt")),
        max_size=8,
    ),
)
@settings(max_examples=60, deadline=None)
def test_byte_bpe_round_trip_pure(text, merge_seed):
    """encode∘decode == identity for ANY text and ANY merge list —
    driver-side through the same _apply_ranked_merges/_to_byte_units
    kernels the pandas_udf captures (no Spark job per example)."""
    from hobbes_spark.functions.bpe import (
        _apply_ranked_merges,
        _to_byte_units,
        byte_bpe_decode,
        pretokenize,
    )

    merges = list(dict.fromkeys(merge_seed))  # dedup, keep order
    ranks = {p: i for i, p in enumerate(merges)}
    toks = []
    for p in pretokenize(text):
        toks.extend(_apply_ranked_merges(list(_to_byte_units(p)), merges, ranks))
    assert byte_bpe_decode(toks) == text
    # pre-tokenization partitions the input exactly
    assert "".join(pretokenize(text)) == text
