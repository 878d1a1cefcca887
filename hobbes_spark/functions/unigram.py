"""Unigram-LM subword tokenizer: vocabulary learning and Viterbi
encoding (Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates" — the SentencePiece
`--model_type=unigram` algorithm, the other production tokenizer family
next to BPE).

Scale shape — the same factoring as :mod:`hobbes_spark.functions.bpe`:

* the ONE corpus-sized pass is ``bpe.word_frequencies`` (token explode →
  keyed count, pruned by ``max_words``). Everything in
  :func:`learn_unigram_lm` runs on that bounded ``(word, freq)`` table,
  collected ONCE — vocabulary learning costs the same on 100 TB as on
  100 MB, and runs exactly one Spark job per call (the collect).
  SentencePiece itself learns from the same pruned frequency table
  in-process for the same reason.
* :func:`unigram_encode` applies a learned piece inventory to text.
  Viterbi segmentation is inherently per-word sequential, so this is
  the sanctioned Arrow escape hatch: a pandas_udf with a per-batch word
  cache (Zipf makes the hit rate ~99%), never a row-at-a-time UDF —
  the exact posture of ``bpe.bpe_encode``.

Determinism (what lets the catalog pin the encoder against a
hand-computed literal oracle, the ``kmeans_fixture_exact`` precedent):
every tie in learning breaks on the piece string (binary order), the
E-step counts are freq-weighted INTEGERS (hard-EM / Viterbi counts, so
no float-summation-order wobble), and the Viterbi DP prefers the
longest piece on score ties. The hard-EM (Viterbi-count) E-step is the
standard deterministic simplification of Kudo's forward-backward EM;
the pruning criterion (drop the lowest-expected-count pieces, never
single characters) is the simplification SentencePiece applies between
EM rounds.
"""

from __future__ import annotations

import math
from collections.abc import Mapping

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from hobbes_spark.expressions import c

__all__ = ["learn_unigram_lm", "unigram_encode", "viterbi_segment"]

#: log-prob charged per character not covered by the piece inventory
#: (byte-fallback-ish: the unknown character is emitted as its own
#: piece rather than a destructive <unk> collapse).
UNK_LOGPROB = -20.0


def viterbi_segment(
    word: str, logprobs: Mapping[str, float], max_piece_len: int, unk_logprob: float = UNK_LOGPROB
) -> list[str]:
    """Max-likelihood segmentation of ``word`` under an independent
    piece model: DP over end positions, ``best[i] = max_j best[j] +
    lp(word[j:i])``. Characters absent from the inventory cost
    ``unk_logprob`` and are emitted verbatim. Ties prefer the LONGEST
    piece ending at each position (smallest ``j`` wins via strict-``>``
    update over ascending ``j``), so the result is total-order
    deterministic."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logprobs.get(piece)
            if lp is None:
                if i - j == 1:  # unknown single character fallback
                    lp = unk_logprob
                else:
                    continue
            score = best[j] + lp
            if score > best[i]:
                best[i], back[i] = score, j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def learn_unigram_lm(
    word_freq: DataFrame,
    vocab_size: int,
    seed_size: int = 1000,
    max_piece_len: int = 8,
    shrink_factor: float = 0.75,
    em_iters: int = 2,
    max_vocab: int = 1_000_000,
) -> DataFrame:
    """Learn a unigram-LM piece inventory from a ``(word, freq)`` table
    (build it with ``bpe.word_frequencies`` — the one corpus-sized
    pass). Returns ``(piece, logprob, count)`` with exactly
    ``min(vocab_size, reachable)`` rows: seed with all frequent
    substrings, alternate hard-EM re-estimation (Viterbi counts) with
    lowest-count pruning at ``shrink_factor`` per round until the
    vocabulary fits, single characters never pruned (full coverage,
    SentencePiece's ``required_chars`` rule).

    Runs exactly ONE Spark job (the collect of the vocab-sized
    frequency table); learning is driver-local — see the module
    docstring for why that is the scale-correct factoring."""
    if vocab_size < 1:
        raise ValueError(f"learn_unigram_lm: vocab_size must be >= 1, got {vocab_size}")
    if max_piece_len < 1:
        raise ValueError(f"learn_unigram_lm: max_piece_len must be >= 1, got {max_piece_len}")
    if not 0.0 < shrink_factor < 1.0:
        raise ValueError(
            f"learn_unigram_lm: shrink_factor must be in (0, 1), got {shrink_factor}"
        )
    spark = word_freq.sparkSession
    # GUARDED driver collect (round 8, same contract as learn_bpe): one
    # row past ``max_vocab`` proves an unbounded table and raises before
    # the driver materializes it — still exactly one Spark job.
    from hobbes_spark.functions.bpe import bounded_vocab_rows

    rows = bounded_vocab_rows(word_freq, max_vocab, "learn_unigram_lm")
    vocab: list[tuple[str, int]] = [(r["word"], int(r["freq"])) for r in rows]

    # ---- seed: every substring up to max_piece_len, freq-weighted ----
    sub_counts: dict[str, int] = {}
    chars: set[str] = set()
    for word, freq in vocab:
        chars.update(word)
        n = len(word)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                piece = word[i : i + ln]
                sub_counts[piece] = sub_counts.get(piece, 0) + freq
    multi = sorted(
        ((p, cnt) for p, cnt in sub_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(seed_size - len(chars), 0)]
    counts: dict[str, int] = {ch: sub_counts[ch] for ch in chars}
    counts.update(dict(multi))

    def em_round(cur: dict[str, int]) -> dict[str, int]:
        total = sum(cur.values())
        lps = {p: math.log(cnt / total) for p, cnt in cur.items() if cnt > 0}
        new: dict[str, int] = {}
        for word, freq in vocab:
            for piece in viterbi_segment(word, lps, max_piece_len):
                new[piece] = new.get(piece, 0) + freq
        # characters stay segmentable even when currently unused
        for ch in chars:
            new.setdefault(ch, 1)
        return new

    target = max(vocab_size, len(chars))
    while True:
        for _ in range(em_iters):
            counts = em_round(counts)
        if len(counts) <= target:
            break
        keep = max(target, int(len(counts) * shrink_factor))
        kept_multi = sorted(
            ((p, cnt) for p, cnt in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(keep - len(chars), 0)]
        counts = {ch: counts.get(ch, 1) for ch in chars}
        counts.update(dict(kept_multi))

    total = sum(counts.values())
    rows = sorted(
        (p, math.log(cnt / total), int(cnt)) for p, cnt in counts.items() if cnt > 0
    )
    return spark.createDataFrame(rows, "piece string, logprob double, count bigint")


def unigram_encode(
    df: DataFrame,
    text_col: str,
    pieces: Mapping[str, float],
    out_col: str = "unigram_tokens",
    max_piece_len: int | None = None,
    unk_logprob: float = UNK_LOGPROB,
) -> DataFrame:
    """Apply a learned piece inventory: text → array of subword pieces,
    each word segmented by max-likelihood Viterbi under ``pieces``
    (piece → logprob). Arrow-batched pandas_udf with a per-batch word
    cache; the inventory dict is captured once per executor. Unknown
    characters are emitted verbatim at ``unk_logprob`` cost, so the
    concatenation of a word's pieces always reconstructs the word.

    Pre-tokenization contract (deliberately SentencePiece-shaped, NOT
    the repo's curation conventions): words are FULL-UNICODE lowercased
    (Python ``str.lower()`` — e.g. ``É``→``é``, beyond the ASCII
    ``translate`` fold used by the blocklist) and split on ALL Unicode
    whitespace (Python ``str.split()`` — NBSP and friends included,
    wider than the Java ``\\s`` ASCII class ``tokens()`` uses). Both
    choices run entirely inside this one Arrow kernel, so there is no
    cross-engine regex to keep in lockstep; the
    ``unigram_encode_fixture`` literal oracle pins exactly these
    semantics. Pre-normalize upstream with ``text.normalize_text`` if
    the corpus needs the curation-stack conventions instead."""
    if not pieces:
        raise ValueError("unigram_encode: pieces must be non-empty")
    lps = dict(pieces)
    plen = max_piece_len if max_piece_len is not None else max(len(p) for p in lps)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None or not str(t).strip():
                out.append([])
                continue
            toks: list[str] = []
            for w in str(t).strip().lower().split():
                got = cache.get(w)
                if got is None:
                    got = viterbi_segment(w, lps, plen, unk_logprob)
                    cache[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(c(text_col)))
