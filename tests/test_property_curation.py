"""Property-based parity for the quality-rule batteries: random
structured documents through ``gopher_quality_stats`` /
``c4_quality_stats`` vs INDEPENDENT pure-Python re-implementations of
the published rules (Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2).

The DuckDB oracle twins gate engine-vs-engine agreement; this layer
pins both against a third, from-the-paper interpreter, so a bug that
was faithfully mirrored into the oracle (the historical lockstep
failure mode) still gets caught.

Fragments bias toward the nasty corners: CRLF and lone-\r endings,
'....' leftmost-match counting, unicode ellipsis, bullets, quote
terminals, tab padding (split artifacts), and the javascript rule.
The generator avoids \x0B and non-ASCII whitespace on purpose: Java,
RE2, and Python draw \\s differently there, and the engine pair is
pinned lockstep — a third engine class would need the wider class in
all three places at once.

Each example ships the whole doc list through ONE Spark job.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hobbes_spark.functions.text import STOPWORDS

FRAGMENTS = [
    "the quick brown fox jumps over that lazy dog with it ",
    "short words. ",
    "incomprehensibility ",
    "123 456 ",
    "ends properly.",
    "ends with bang!",
    'quoted terminal."',
    "curly terminal”",
    "trailing thought...",
    "four dots....",
    "unicode one…",
    "- bullet item here",
    "* starred item",
    "• dot bullet",
    "# tag",
    "no terminal at all",
    "Please enable JavaScript now.",
    "lorem ipsum dolor.",
    "code = { x }",
    "\t",
    "   ",
    "\n",
    "\r\n",
    "\r",
    "",
]

doc = st.one_of(
    st.none(),
    st.lists(st.sampled_from(FRAGMENTS), min_size=0, max_size=12).map("".join),
)
corpora = st.lists(doc, min_size=1, max_size=10)

_SPACES = " "


def _rt(s: str) -> str:
    return s.rstrip(_SPACES)


def _lt(s: str) -> str:
    return s.lstrip(_SPACES)


def _split_keep(s: str) -> list[str]:
    """Mirror of text.tokens(): spaces-only trim, blank -> [], else
    \\s+ split KEEPING empty artifacts (both engines keep them)."""
    t = s.strip(_SPACES)
    if t == "":
        return []
    return re.split(r"\s+", t)


def _gopher_ref(text, stops=STOPWORDS):
    raw = text if text is not None else ""
    toks = _split_keep(raw.lower())
    lines = re.split(r"\r?\n", raw)
    wc = len(toks)
    char_sum = sum(len(t) for t in toks)
    mean_len = char_sum / wc if wc else 0.0
    hash_hits = raw.count("#")
    # str.count consumes non-overlapping leftmost matches — exactly the
    # replace() length-delta both engines use ('....' counts one '...')
    ell_hits = raw.count("...") * 3 / 3.0 + raw.count("…")
    sym = (hash_hits + ell_hits) / wc if wc else 0.0
    nl = len(lines)
    bullet = (
        sum(1 for l in lines if re.search(r"^[•‣▪\-\*]", _lt(l))) / nl
        if nl
        else 0.0
    )
    ell_line = (
        sum(1 for l in lines if re.search(r"(\.\.\.|…)\Z", _rt(l))) / nl
        if nl
        else 0.0
    )
    alpha = (
        sum(1 for t in toks if re.search("[a-z]", t)) / wc if wc else 0.0
    )
    hits = len(set(toks) & set(stops))
    keep = (
        50 <= wc <= 100_000
        and 3.0 <= mean_len <= 10.0
        and sym <= 0.1
        and bullet <= 0.9
        and ell_line <= 0.3
        and alpha >= 0.8
        and hits >= 2
    )
    return {
        "word_count": wc,
        "mean_word_len": mean_len,
        "symbol_word_ratio": sym,
        "bullet_line_frac": bullet,
        "ellipsis_line_frac": ell_line,
        "alpha_word_frac": alpha,
        "stopword_hits": hits,
        "keep_quality": keep,
    }


def _c4_ref(text, min_words=5, min_sentences=3):
    raw = text if text is not None else ""
    lines = re.split(r"\r?\n", raw)
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"”]\Z', _rt(l))
        and len([w for w in _split_keep(l) if w != ""]) >= min_words
        and not re.search(r"\bjavascript\b", l.lower())
    ]
    clean = "\n".join(kept)
    sentences = len(re.findall(r"[.!?]", clean))
    lorem = "lorem ipsum" in raw.lower()
    brace = "{" in raw
    keep = sentences >= min_sentences and not lorem and not brace
    return {
        "n_lines": len(lines),
        "kept_lines": len(kept),
        "kept_line_frac": len(kept) / len(lines) if lines else 0.0,
        "sentence_count": sentences,
        "has_lorem_ipsum": lorem,
        "has_curly_brace": brace,
        "clean_text": clean,
        "keep_c4": keep,
    }


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _check(got_rows, ref_fn, texts, float_cols, exact_cols):
    got = {r["doc_id"]: r for r in got_rows}
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        exp = ref_fn(t)
        for k in exact_cols:
            assert got[i][k] == exp[k], (k, i, repr(t), got[i][k], exp[k])
        for k in float_cols:
            assert abs(got[i][k] - exp[k]) < 1e-12, (k, i, repr(t))


@pytest.mark.usefixtures("spark")
@given(texts=corpora)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gopher_matches_paper_reference(spark, texts):
    from hobbes_spark.functions.curation import gopher_quality_stats

    out = gopher_quality_stats(
        _docs_df(spark, texts), required_stopwords=STOPWORDS
    ).collect()
    _check(
        out,
        _gopher_ref,
        texts,
        float_cols=(
            "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
            "ellipsis_line_frac", "alpha_word_frac",
        ),
        exact_cols=("word_count", "stopword_hits", "keep_quality"),
    )


@pytest.mark.usefixtures("spark")
@given(texts=corpora)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_c4_matches_paper_reference(spark, texts):
    from hobbes_spark.functions.curation import c4_quality_stats

    out = c4_quality_stats(_docs_df(spark, texts)).collect()
    _check(
        out,
        _c4_ref,
        texts,
        float_cols=("kept_line_frac",),
        exact_cols=(
            "n_lines", "kept_lines", "sentence_count", "has_lorem_ipsum",
            "has_curly_brace", "clean_text", "keep_c4",
        ),
    )
