"""Byte-pair-encoding vocabulary learning and application (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the tokenizer-training step of an LLM data pipeline).

Scale shape — the part that matters at 100 TB:

* :func:`word_frequencies` is the ONE corpus-sized pass (token explode →
  keyed count). Everything after runs on the distinct-word table, whose
  size is bounded by ``max_words`` — so merge learning costs the same on
  100 TB as on 100 MB once frequencies exist. This is the standard
  factoring (SentencePiece/fastBPE likewise learn from a pruned
  word-frequency table).
* :func:`learn_bpe` iterates num_merges times over that small table:
  pair counting is a groupBy on (vocab_size × avg_word_len) rows, the
  argmax is a 1-row collect (a scalar driver decision, the
  ``kmeans_lloyd`` centroid precedent), and the symbol rewrite is a pure
  JVM ``aggregate`` fold — no Python in any per-row path.
  ``localCheckpoint`` after each rewrite keeps the plan flat across
  iterations.
* :func:`bpe_encode` applies a learned merge list to text. Applying
  ~10k ordered merges is inherently per-word sequential, so this is the
  sanctioned Arrow escape hatch: a pandas_udf with the rank-dict
  algorithm and a per-batch word cache (Zipf makes the cache hit rate
  ~99%), never a row-at-a-time Python UDF.

Determinism (what lets a DuckDB oracle replay the learning loop
bit-for-bit, the unrolled-CTE precedent of ``kmeans_clusters``): pair
selection orders by (count DESC, left ASC, right ASC) — binary string
order in both engines — and the rewrite is the greedy left-to-right
merge both implementations of record use.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from hobbes_spark.expressions import c
from hobbes_spark.functions.text import tokens

__all__ = ["END_TOKEN", "word_frequencies", "learn_bpe", "bpe_encode"]

END_TOKEN = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int | None = None,
    min_freq: int = 1,
) -> DataFrame:
    """Corpus → ``(word, freq)``: lower-cased whitespace words, counted.
    ``max_words`` keeps the top-N by (freq DESC, word ASC) — the
    deterministic prune that bounds every later stage."""
    wf = (
        df.select(F.explode(tokens(F.lower(c(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    if min_freq > 1:
        wf = wf.filter(F.col("freq") >= min_freq)
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    return wf


def _to_symbols(word):
    """word → [c1, c2, …, END_TOKEN] as a pure expression."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )
    return F.concat(chars, F.array(F.lit(END_TOKEN)))


def _merge_fold(syms, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) → left+right,
    as an ``aggregate`` fold (the overlap semantics of the reference
    implementations: in ``a a a`` the pair (a,a) merges once)."""
    l, r, m = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(m)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    word_freq: DataFrame,
    num_merges: int,
    min_count: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a ``(word, freq)`` table.

    Returns the merge table ``(rank, lhs, rhs, merged, pair_count)`` —
    the artifact a tokenizer ships. Stops early when no pair reaches
    ``min_count`` (the paper's stopping criterion)."""
    if num_merges < 1:
        raise ValueError(f"learn_bpe: num_merges must be >= 1, got {num_merges}")
    spark = word_freq.sparkSession
    words = word_freq.select(
        "freq", _to_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple] = []
    for rank in range(num_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i"),
                "syms",
            )
            .select(
                F.element_at("syms", F.col("i")).alias("lhs"),
                F.element_at("syms", F.col("i") + 1).alias("rhs"),
                "freq",
            )
            .groupBy("lhs", "rhs")
            .agg(F.sum("freq").alias("pair_count"))
            .filter(F.col("pair_count") >= min_count)
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        best = pairs[0]
        merges.append(
            (rank, best["lhs"], best["rhs"], best["lhs"] + best["rhs"],
             int(best["pair_count"]))
        )
        words = words.select(
            "freq", _merge_fold(F.col("syms"), best["lhs"], best["rhs"]).alias("syms")
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply an ordered merge list: text → array of subword tokens.

    Arrow-batched pandas_udf (the sanctioned escape hatch — ~10k ordered
    merges are inherently per-word sequential), with a per-batch word
    cache; the merge-rank dict is captured once per executor, not
    per row. Output per document is the concatenation of its words'
    subword sequences, each word ending in ``</w>``."""
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END_TOKEN]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_i = rk, i
            if best_rank is None:
                break
            # apply the winning merge greedily left-to-right
            l, r = merges[best_rank]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            if t is None or not str(t).strip():
                out.append([])
                continue
            toks: list[str] = []
            for w in str(t).strip().lower().split():
                toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(c(text_col)))
