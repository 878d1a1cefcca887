"""Corpus-curation operators for pretraining pipelines: test-set
decontamination, repetition-based quality filters, and token-budget
document packing.

All three are pure DataFrame compositions (no Python in the row path).
Each has an exact DuckDB twin in ``hobbes_spark.queries`` for the
correctness gate.

Scale notes (100 TB):

* ``decontaminate`` is the n-gram-overlap decontamination used for LLM
  eval hygiene (Brown et al. 2020 §C used 13-grams). The eval side is
  tiny next to the training corpus, so its distinct-gram set broadcasts;
  the training side then needs ONE shuffle-free semi-join pass plus the
  final anti-join on doc ids (shuffled on the id, which AQE handles).
* ``repetition_stats`` (Rae et al. 2021, Gopher §A1.1 quality rules) is
  per-document arithmetic — embarrassingly parallel, no shuffle. The
  top-n-gram mode runs O(distinct·total) per doc via expression-level
  ``filter``/``transform``; documents are bounded (cap them upstream),
  so per-row cost is bounded too.
* ``pack_documents`` assigns contiguous docs to fixed token budgets with
  one keyed window (partitioned by ``by`` — never a global window), the
  standard sequence-packing prep for pretraining batches.

The staged ``withColumn`` projections are load-bearing: an array
expression referenced inside a ``transform``/``filter`` lambda is
re-evaluated per element unless it is a real projected column (see
``winnow_fingerprints``), turning O(n) docs O(n²).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hobbes_spark.expressions import c
from hobbes_spark.functions.text import tokens

__all__ = [
    "word_ngrams",
    "duplicate_ngram_stats",
    "remove_duplicate_spans",
    "dedup_paragraphs",
    "remove_boilerplate_lines",
    "decontaminate",
    "contamination_report",
    "repetition_stats",
    "gopher_quality_stats",
    "c4_quality_stats",
    "blocklist_pattern",
    "blocklist_subject",
    "blocklist_subject_sql",
    "blocklist_stats",
    "chunk_documents",
    "pack_documents",
    "unigram_logprob_scores",
    "bigram_logprob_scores",
    "perplexity_buckets",
    "dsir_log_weights",
    "redact_pii",
]

#: (pattern, replacement) pairs for :func:`redact_pii` — deliberately
#: simple classes+quantifiers so Java (Spark) and RE2 (DuckDB/oracle)
#: regex engines agree byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # no leading \b: it would exclude a leading "+" (and RE2 — the oracle
    # engine — has no lookbehind to express "start or non-digit" better)
    (r"(?:\+\d{1,3}[ -]?)?(?:\(\d{2,4}\)[ -]?)?\d{3}[ -]\d{3,4}(?:[ -]\d{1,4})?\b", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace email / IPv4 / phone-shaped spans with typed placeholder
    tags — the standard pre-release scrub pass for web-scraped corpora.
    Pure chained ``regexp_replace`` (JVM-side, codegen); patterns are
    heuristics, not a compliance guarantee."""
    out = c(col)
    for pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def word_ngrams(df: DataFrame, text_col: str, n: int, out_col: str = "ngrams") -> DataFrame:
    """Add ``out_col``: the array of space-joined word ``n``-grams of the
    casefolded whitespace tokens of ``text_col`` (empty array when the
    document has fewer than ``n`` tokens). Delegates to
    ``dedup.word_shingles`` — the zip_with'd-slices form, ~7x faster
    than the per-index ``transform(sequence, slice)`` formulation."""
    if n < 1:
        raise ValueError(f"word_ngrams: n must be >= 1, got {n}")
    from hobbes_spark.functions.dedup import word_shingles

    return df.withColumn(out_col, word_shingles(c(text_col), n))


def _gram_hashes(df: DataFrame, text_col: str, n: int, id_cols: Sequence[str]) -> DataFrame:
    """(id_cols..., gram_hash) — one row per n-gram occurrence, keyed by
    the shared numeric window hash (``dedup.exploded_window_hashes``; no
    gram strings are ever built). The key is engine-internal — the
    oracle compares surviving doc sets, not keys — and a 64-bit
    collision over corpus-sized gram counts (~2^-25 at a billion grams)
    at worst drops one extra training doc, the conservative direction
    for decontamination."""
    from hobbes_spark.functions.dedup import exploded_window_hashes

    ex = exploded_window_hashes(df, text_col, n, [F.col(k) for k in id_cols])
    return ex.withColumnRenamed("s", "gram_hash")


def duplicate_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document duplicate-text statistics in the style of exact
    substring deduplication (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): a word ``n``-gram occurrence is
    *duplicated* if the same gram appears in at least one OTHER
    document; each doc reports how much of it is duplicated text.

    Adds ``n_grams`` (total gram occurrences), ``dup_grams``
    (occurrences of cross-doc-shared grams), ``dup_gram_frac``, and
    ``keep_dup`` (``dup_gram_frac <= threshold``) to ``df``. Docs with
    fewer than ``n`` tokens have zero grams and ``dup_gram_frac`` 0.0
    (nothing to share). Within-doc repetition is deliberately NOT
    counted — that signal is :func:`repetition_stats`.

    Plan shape: gram occurrences are the shared numeric window-hash
    stream (``dedup.exploded_window_hashes`` — no gram strings); then
    (doc, gram) count aggregation → docs-per-gram as a ``count(*)``
    window over the per-(doc, gram) rows (one row per doc-gram, so the
    plain count IS the distinct-doc count — no count-distinct, no
    vocabulary join) → per-doc sums → one keyed join back onto ``df``.
    Four keyed shuffles, all partial-aggregated map-side, keys growing
    with the data; the same posture as TF-IDF. The 64-bit gram-hash
    collision caveat of ``_gram_hashes`` applies: a collision can only
    mark a unique gram as duplicated (conservative direction).
    """
    if n < 1:
        raise ValueError(f"duplicate_ngram_stats: n must be >= 1, got {n}")
    occ = _gram_hashes(df, text_col, n, [id_col])
    dg = occ.groupBy(id_col, "gram_hash").agg(F.count(F.lit(1)).alias("__cnt"))
    flagged = dg.withColumn(
        "__ndocs", F.count(F.lit(1)).over(Window.partitionBy("gram_hash"))
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.sum("__cnt").cast("bigint").alias("__ng"),
        F.sum(F.when(F.col("__ndocs") >= 2, F.col("__cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("__dg"),
    )
    out = df.join(per_doc, id_col, "left")
    frac = F.coalesce(
        F.col("__dg") / F.nullif(F.col("__ng"), F.lit(0)), F.lit(0.0)
    )
    return (
        out.withColumn("n_grams", F.coalesce(F.col("__ng"), F.lit(0).cast("bigint")))
        .withColumn("dup_grams", F.coalesce(F.col("__dg"), F.lit(0).cast("bigint")))
        .withColumn("dup_gram_frac", frac)
        .withColumn("keep_dup", F.col("dup_gram_frac") <= threshold)
        .drop("__ng", "__dg")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring span REMOVAL (Lee et al. 2021): where
    :func:`duplicate_ngram_stats` only *scores* documents, this rebuilds
    the corpus with every duplicated span cut out — the "dedup the
    substrings, keep the rest of the doc" treatment the paper found
    strictly better than whole-doc dropping.

    A word ``n``-gram occurrence is *duplicated* when the same gram
    appears at least ``min_count`` times in the whole corpus (other docs
    OR elsewhere in the same doc — unlike the cross-doc-only stats op,
    matching the paper's suffix-array semantics at word granularity).
    Every token covered by at least one duplicated window is removed;
    ``clean_text`` is the surviving casefolded tokens re-joined with
    single spaces (so an untouched doc comes back whitespace/case
    normalized, which the oracle mirrors). Docs with fewer than ``n``
    tokens are never cut.

    Adds ``clean_text``, ``n_tokens``, ``kept_tokens``.
    ``id_col`` must uniquely identify documents and be non-NULL — the
    per-doc re-assembly groups by it and the join back is a plain equi
    join, so a NULL or duplicated id merges/loses documents (same
    contract as any groupBy-rebuild; validate ids upstream, e.g. with
    functions/validate.py's unique+null checks).

    Plan shape — all explodes and keyed shuffles, no per-doc HOF scans
    (a ``filter(tokens, exists(dup_pos...))`` formulation is O(tokens ×
    dup-spans) per doc and not codegen'd; spammy docs make that
    quadratic):

    1. gram occurrences ``(id, pos, g)`` via the shared numeric
       window-hash stream (posexplode keeps the start position; no gram
       strings are built — see ``dedup.exploded_window_hashes``);
    2. one ``count(*)`` window over ``g`` marks duplicated occurrences
       (occurrence count, not distinct-doc count — within-doc repeats
       also count, so no per-(doc,gram) pre-aggregation is needed);
    3. duplicated windows explode to covered token indices; a left-anti
       join on ``(id, token_idx)`` drops covered tokens from the
       posexploded token stream (duplicate covered-indices are fine —
       anti-join semantics dedupe for free, no DISTINCT shuffle);
    4. per-doc re-assembly: ``array_sort(collect_list(struct(idx,tok)))``
       → ``concat_ws``, then one keyed join back onto ``df``.

    Four shuffles total (gram window, anti-join, doc re-assembly, join
    back), every one keyed by data-proportional keys; the gram window is
    uniformly distributed (64-bit hashes) so no skew salting is needed.
    The 64-bit collision caveat of ``_gram_hashes`` applies: a collision
    can only remove an extra span (the conservative direction for
    training-data hygiene).
    """
    if n < 1:
        raise ValueError(f"remove_duplicate_spans: n must be >= 1, got {n}")
    if min_count < 2:
        raise ValueError(
            f"remove_duplicate_spans: min_count must be >= 2, got {min_count}"
        )
    from hobbes_spark.functions.dedup import chained_window_hashes

    tok = df.select(c(id_col).alias(id_col), tokens(F.lower(c(text_col))).alias("__tk"))
    th = tok.select(
        id_col, F.transform("__tk", lambda t: F.xxhash64(t)).alias("__th")
    )
    sh = th.select(id_col, chained_window_hashes(F.col("__th"), n).alias("__sh"))
    occ = sh.select(
        id_col, F.posexplode_outer("__sh").alias("pos", "g")
    ).filter(F.col("g").isNotNull())
    dup = occ.withColumn(
        "__c", F.count(F.lit(1)).over(Window.partitionBy("g"))
    ).filter(F.col("__c") >= min_count)
    removed = dup.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("__tidx"),
    )
    tokix = tok.select(
        id_col, F.posexplode_outer("__tk").alias("__tidx", "__tok")
    ).filter(F.col("__tidx").isNotNull())
    kept = tokix.join(removed, [id_col, "__tidx"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__tidx", "__tok"))),
                lambda s: s["__tok"],
            ),
        ).alias("__clean"),
        F.count(F.lit(1)).cast("bigint").alias("__kept"),
    )
    return (
        df.withColumn(
            "n_tokens", F.size(tokens(F.lower(c(text_col)))).cast("bigint")
        )
        .join(clean, id_col, "left")
        .withColumn("clean_text", F.coalesce(F.col("__clean"), F.lit("")))
        .withColumn(
            "kept_tokens", F.coalesce(F.col("__kept"), F.lit(0).cast("bigint"))
        )
        .drop("__clean", "__kept")
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph-granularity dedup (the practical midpoint between
    whole-doc dropping and 8-gram span surgery): split each document on
    blank lines, drop every paragraph whose normalized text already
    appeared earlier in the corpus — FIRST occurrence (lowest
    ``(id, paragraph index)``) survives, later copies are cut — and
    rebuild the document from its surviving paragraphs. The
    boilerplate-paragraph treatment of the CCNet/RefinedWeb lineage:
    repeated headers, navigation blocks, license blurbs vanish
    corpus-wide while every document keeps its unique remainder.

    Adds ``clean_text`` (survivors re-joined with a blank line),
    ``n_paras``, ``kept_paras``. Documents with no non-empty paragraph
    (NULL/empty text) come back with ``clean_text=''`` and zero counts.
    ``id_col`` must uniquely identify documents and be non-NULL — the
    per-doc re-assembly groups by it and the join back is a plain equi
    join, so a NULL or duplicated id merges/loses documents (same
    contract as any groupBy-rebuild; validate ids upstream, e.g. with
    functions/validate.py's unique+null checks).

    Plan shape: posexplode paragraphs → ONE keyed window over the
    paragraph fingerprint (xxhash64 of the casefolded
    whitespace-collapsed paragraph — an 8-byte uniformly-distributed
    shuffle key, never the paragraph string) → per-doc ordered
    re-assembly → join back. Three keyed shuffles, no skew (fingerprints
    are uniform; a boilerplate paragraph repeated millions of times
    lands in one window partition but carries only (id, idx) pairs).
    """
    paras = F.filter(
        F.transform(F.split(c(text_col), r"\n\s*\n"), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    ex = df.select(
        c(id_col).alias(id_col), F.posexplode_outer(paras).alias("pidx", "para")
    ).filter(F.col("para").isNotNull())
    norm = F.regexp_replace(F.lower(F.col("para")), r"\s+", " ")
    w = Window.partitionBy("__fp")
    first = F.min(F.struct(c(id_col), F.col("pidx"))).over(w)
    kept = (
        ex.withColumn("__fp", F.xxhash64(norm))
        .withColumn("__first", first)
        .filter(
            (c(id_col) == F.col(f"__first.{id_col}"))
            & (F.col("pidx") == F.col("__first.pidx"))
        )
    )
    clean = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", "para"))),
                lambda s: s["para"],
            ),
        ).alias("__clean"),
        F.count(F.lit(1)).cast("bigint").alias("__kept"),
    )
    return (
        df.withColumn("n_paras", F.coalesce(F.size(paras), F.lit(0)).cast("bigint"))
        .join(clean, id_col, "left")
        .withColumn("clean_text", F.coalesce(F.col("__clean"), F.lit("")))
        .withColumn("kept_paras", F.coalesce(F.col("__kept"), F.lit(0).cast("bigint")))
        .drop("__clean", "__kept")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 3,
    min_chars: int = 10,
) -> DataFrame:
    """Corpus-frequency line filtering (the C4/RefinedWeb boilerplate
    pass, Raffel et al. 2020 §2.2 / Penedo et al. 2023 §G): a LINE that
    appears (normalized) in more than ``max_docs`` distinct documents is
    navigation/footer/cookie-banner boilerplate — drop every occurrence
    corpus-wide and rebuild each document from its surviving lines.
    Finer than :func:`dedup_paragraphs` (which keeps the FIRST copy;
    boilerplate should keep none) and complementary to the 8-gram span
    surgery of :func:`remove_duplicate_spans`.

    Lines shorter than ``min_chars`` after normalization (casefold +
    whitespace collapse) are never dropped: one-word lines ("Yes", "*")
    legitimately repeat across documents.

    Adds ``clean_text`` (survivors re-joined with ``\\n``), ``n_lines``,
    ``kept_lines``; NULL-text documents come back empty with zero counts.

    Plan shape (100 TB): the boilerplate SET is tiny by construction
    (only lines repeated across > ``max_docs`` docs), so the fact side
    never shuffles for the filter — distinct (fingerprint, doc) pairs
    aggregate down to the offender fingerprints, which BROADCAST into a
    left-anti hash join against the exploded lines. Fingerprints are
    ``xxhash64`` of the normalized line (8-byte uniform key; a line
    repeated millions of times is heavy in the AGG but carries only id
    pairs, and map-side partial distinct collapses per-doc repeats
    before the shuffle). Reassembly is the one keyed shuffle on the doc
    id. Total: two small agg shuffles over (fp, id) pairs + one doc-key
    shuffle; document text itself moves exactly once.
    """
    lines = F.split(c(text_col), "\n")
    ex = df.select(
        c(id_col).alias(id_col), F.posexplode_outer(lines).alias("lidx", "line")
    ).filter(F.col("line").isNotNull())
    norm = F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " "))
    ex = ex.withColumn(
        "__fp", F.when(F.length(norm) >= min_chars, F.xxhash64(norm))
    )
    offenders = (
        ex.filter(F.col("__fp").isNotNull())
        .select("__fp", id_col)
        .distinct()
        .groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_docs)
        .select("__fp")
    )
    # NULL __fp (short/never-droppable lines) passes a left_anti equi-join
    # untouched: NULL matches nothing.
    kept = ex.join(F.broadcast(offenders), "__fp", "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("lidx", "line"))),
                lambda s: s["line"],
            ),
        ).alias("__clean"),
        F.count(F.lit(1)).cast("bigint").alias("__kept"),
    )
    return (
        df.withColumn("n_lines", F.coalesce(F.size(lines), F.lit(0)).cast("bigint"))
        .join(clean, id_col, "left")
        .withColumn("clean_text", F.coalesce(F.col("__clean"), F.lit("")))
        .withColumn("kept_lines", F.coalesce(F.col("__kept"), F.lit(0).cast("bigint")))
        .drop("__clean", "__kept")
    )


def _eval_gram_hits(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    n: int,
    id_col: str,
    broadcast_eval: bool,
) -> DataFrame:
    """(id_col, gram_hash) — every training-doc gram occurrence that also
    appears in the eval set's distinct grams. The shared core of
    :func:`decontaminate` (distinct ids → anti-join) and
    :func:`contamination_report` (per-doc counts)."""
    train_grams = _gram_hashes(train, text_col, n, [id_col])
    eval_grams = _gram_hashes(eval_df, text_col, n, []).distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return train_grams.join(eval_grams, "gram_hash", "left_semi")


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop training documents sharing any word ``n``-gram with the eval
    set (GPT-3-style n-gram decontamination).

    Returns ``train`` rows whose documents contain no eval n-gram.
    ``broadcast_eval`` (default) broadcasts the distinct eval-gram set —
    right for the usual benchmark-sized eval suite; switch it off if the
    eval side is itself corpus-sized and let the sort-merge path run.
    """
    hits = _eval_gram_hits(train, eval_df, text_col, n, id_col, broadcast_eval)
    dirty = hits.select(c(id_col).alias("__dirty_id")).distinct()
    # NULL-SAFE anti join: a contaminated doc with a NULL id must still
    # drop — a plain equi-anti-join never matches NULL keys and would
    # leak eval text into the training corpus, the non-conservative
    # direction. (If any NULL-id doc is dirty, all NULL-id docs drop:
    # over-dropping is the safe side; give docs real ids to avoid it.)
    return train.join(
        dirty, c(id_col).eqNullSafe(F.col("__dirty_id")), "left_anti"
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination evidence instead of a hard drop:
    ``(id_col, shared_grams)`` for every training doc sharing >= 1 word
    ``n``-gram with the eval set. The audit companion to
    :func:`decontaminate` — same join shape, but keeps the counts so a
    reviewer can rank by severity before deciding a threshold.
    """
    hits = _eval_gram_hits(train, eval_df, text_col, n, id_col, broadcast_eval)
    return hits.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("shared_grams")
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-trained unigram language-model score per document: the
    mean natural-log probability of the doc's casefolded tokens under
    add-``alpha``-smoothed corpus unigram frequencies. The CCNet-style
    perplexity quality filter (Wenzek et al. 2020 use a KenLM 5-gram;
    the unigram variant keeps it SQL-expressible and model-free) —
    gibberish and boilerplate-heavy docs score far below the mean.

    Two aggregations and one join, all keyed on uniform token strings:
    explode tokens → vocab counts (map-side partial agg) → join tokens
    back to their corpus frequency → per-doc mean. The vocab side is
    data-dependent but heavy-tailed; AQE handles the join strategy
    (broadcasts when the vocab fits, sort-merge otherwise).

    Returns ``(id_col, n_tokens, mean_logprob)``; docs with no tokens
    are absent (no tokens, no evidence).
    """
    toks = (
        df.select(F.col(id_col), tokens(F.lower(c(text_col))).alias("__tk"))
        .select(id_col, F.explode_outer("__tk").alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    vocab = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("cnt"))
    sizes = vocab.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vsize")
    )
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(sizes))
        .select(
            id_col,
            (
                F.log(
                    (F.col("cnt") + F.lit(alpha))
                    / (F.col("total") + F.lit(alpha) * F.col("vsize"))
                )
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.avg("__lp").alias("mean_logprob"),
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-trained BIGRAM language-model score per document: mean
    natural-log of add-``alpha``-smoothed ``P(w2|w1) = (c(w1 w2) + α) /
    (c(w1) + α·V)`` over the doc's casefolded token bigrams (V =
    unigram vocabulary size). One conditioning order up from
    :func:`unigram_logprob_scores` — a shuffled-word document scores
    like its source under the unigram model but collapses under the
    bigram one, so this is the cheapest model-free fluency signal
    (KenLM's 5-gram is the production referent; bigrams keep it
    SQL-expressible).

    Plan shape: one explode per n-gram order (bigram occurrences +
    unigram occurrences), two frequency aggregations keyed on uniform
    gram strings (map-side partials), two joins back (AQE broadcasts
    the vocab sides when they fit), one per-doc mean. Nothing leaves
    the cluster.

    Returns ``(id_col, n_bigrams, mean_logprob)``; docs with fewer than
    2 tokens are absent (no bigram evidence).
    """
    bi = (
        word_ngrams(df.select(F.col(id_col), c(text_col)), text_col, 2, "__bi")
        .select(id_col, F.explode("__bi").alias("bg"))
    )
    uni = (
        df.select(F.explode(tokens(F.lower(c(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c1"))
    )
    vsize = uni.agg(F.count("*").alias("vsize"))
    bi_counts = bi.groupBy("bg").agg(F.count("*").cast("bigint").alias("c12"))
    first_tok = F.substring_index(F.col("bg"), " ", 1)
    scored = (
        bi.join(bi_counts, "bg")
        .withColumn("tok", first_tok)
        .join(uni, "tok")
        .crossJoin(F.broadcast(vsize))
        .select(
            id_col,
            F.log(
                (F.col("c12") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("vsize"))
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.avg("__lp").alias("mean_logprob"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = 0.8,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition quality signals, one row per document:

    * ``dup_word_frac``   — 1 − distinct/total over casefolded tokens
      (the all-lines-duplicated signal, word-level because the driver
      corpus has no line structure);
    * ``top_bigram_frac`` — occurrences of the most frequent word bigram
      over total bigrams (Gopher's "top 2-gram" rule);
    * ``keep_repetition`` — both signals under their thresholds
      (defaults near Gopher's 0.2 top-2-gram cut).

    The bigram mode runs as explode → (doc, bigram) count → per-doc max,
    NOT as a per-row ``transform(array_distinct, …filter…)`` expression.
    The expression form is quadratic per doc AND, worse, any filter on
    the resulting flag gets predicate-pushed below the staged array
    projections, re-inlining the bigram array into the lambda — per
    distinct element — which turned a composed
    ``repetition_stats(...).filter(keep)`` into minutes on 500 docs
    (measured 36 s vs 0.7 s for this shape). The agg shape is immune
    (predicates cannot cross an Aggregate) and its two keyed shuffles
    are per-bigram/per-doc, partial-aggregated map-side — the same
    scale posture as the MinHash signature stage.

    Both signals run over per-token ``xxhash64`` values, not strings:
    the bigram groupBy key is the chained hash of two token hashes and
    ``dup_word_frac`` counts distinct token *hashes* (same zip_with'd
    numeric-window trick as ``dedup.exploded_window_hashes``; measured
    0.88 s → 0.51 s steady-state at sf0.1). A 64-bit in-doc collision
    merging two signals is ~2^-45 per doc-pair of grams — far below the
    thresholds' sensitivity — and both fractions are count ratios, so
    values are bit-identical to the string form absent a collision.
    """
    staged = df.withColumn("__tk", tokens(F.lower(c(text_col)))).withColumn(
        "__th", F.transform("__tk", lambda t: F.xxhash64(t))
    ).drop("__tk")
    sz = F.size(F.col("__th"))
    dup = F.when(sz > 0, 1 - F.size(F.array_distinct("__th")) / sz).otherwise(
        F.lit(0.0)
    )
    # token_count rides along so downstream packing/budgeting reuses the
    # tokenization already paid for here (pack_documents token_count_col)
    s2 = staged.withColumn("token_count", sz.cast("bigint")).withColumn(
        "dup_word_frac", dup
    )

    from hobbes_spark.functions.dedup import chained_window_hashes

    bigrams = chained_window_hashes(F.col("__th"), 2)
    bg = (
        s2.select(F.col(id_col).alias("__id"), F.explode_outer(bigrams).alias("__bg"))
        .filter(F.col("__bg").isNotNull())
    )
    per_doc = (
        bg.groupBy("__id", "__bg")
        .agg(F.count("*").alias("__c"))
        .groupBy("__id")
        .agg(F.max("__c").alias("__top"), F.sum("__c").alias("__nb"))
    )
    out = s2.drop("__th").join(
        per_doc, F.col(id_col) == F.col("__id"), "left"
    )
    top_frac = F.coalesce(F.col("__top") / F.col("__nb"), F.lit(0.0))
    return (
        out.withColumn("top_bigram_frac", top_frac)
        .withColumn(
            "keep_repetition",
            (F.col("dup_word_frac") <= max_dup_word_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac),
        )
        .drop("__id", "__top", "__nb")
    )


def gopher_quality_stats(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    required_stopwords: Sequence[str] = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021 §A1.1), one row
    per document — the non-repetition half of the filter the reference
    corpus pipelines apply before training (repetition lives in
    :func:`repetition_stats`). Default thresholds are Gopher's own:

    * ``word_count`` in [``min_words``, ``max_words``] (50..100k);
    * ``mean_word_len`` in [3, 10] characters;
    * ``symbol_word_ratio`` ≤ 0.1 — ``#`` and ellipsis (``...`` /
      ``…``) occurrences over words;
    * ``bullet_line_frac`` ≤ 0.9 — lines starting with a bullet;
    * ``ellipsis_line_frac`` ≤ 0.3 — lines ending with an ellipsis;
    * ``alpha_word_frac`` ≥ 0.8 — words containing ≥1 letter;
    * ``stopword_hits`` ≥ 2 — distinct required stopwords present
      (Gopher's "2 of the 8 common English words" rule; the list is a
      parameter because it is corpus-language-bound).

    ``keep_quality`` is the conjunction. Everything is per-document
    codegen arithmetic over two staged arrays (tokens, lines) — no
    shuffle, no UDF; the filter runs where the scan runs, the only
    acceptable posture for a rule applied to every document of a
    100 TB corpus. Empty/NULL text yields zero ratios and
    ``keep_quality = false`` (word count 0 < ``min_words``), matching
    the DuckDB oracle twin in ``hobbes_spark.queries`` bit-for-bit.
    """
    src = c(text_col)
    raw = F.coalesce(src, F.lit(""))
    # \r?\n: Java regex '$' matches before a trailing \r but RE2 (the
    # oracle engine) does not — splitting CRLF away keeps the line
    # rules engine-identical on Windows-line-ending corpora
    staged = df.withColumn("__gt", tokens(F.lower(src))).withColumn(
        "__gl", F.split(raw, r"\r?\n")
    )
    toks, lns = F.col("__gt"), F.col("__gl")
    sz = F.size(toks)
    nl = F.size(lns)
    char_sum = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
    )
    mean_len = F.coalesce(char_sum / F.nullif(sz, F.lit(0)), F.lit(0.0))
    # occurrence counts via length-delta (a char-table scan, no regex);
    # replace() consumes non-overlapping leftmost matches in both
    # engines, so '....' counts one '...' here and in the oracle
    hash_hits = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    ell_hits = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / 3.0 + (F.length(raw) - F.length(F.replace(raw, F.lit("…"), F.lit(""))))
    sym_ratio = F.coalesce(
        (hash_hits + ell_hits) / F.nullif(sz, F.lit(0)), F.lit(0.0)
    )
    bullet_frac = F.coalesce(
        F.size(F.filter(lns, lambda l: F.ltrim(l).rlike(r"^[•‣▪\-\*]")))
        / F.nullif(nl, F.lit(0)),
        F.lit(0.0),
    )
    ell_line_frac = F.coalesce(
        F.size(F.filter(lns, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)\z")))
        / F.nullif(nl, F.lit(0)),
        F.lit(0.0),
    )
    # tokens are lowercased, so [a-z] == "contains an (ASCII) letter";
    # the oracle uses the identical class — non-Latin scripts would
    # need a wider class on BOTH sides, in lockstep
    alpha_frac = F.coalesce(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        / F.nullif(sz, F.lit(0)),
        F.lit(0.0),
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in required_stopwords]),
        )
    ).cast("bigint")
    out = (
        staged.withColumn("word_count", sz.cast("bigint"))
        .withColumn("mean_word_len", mean_len)
        .withColumn("symbol_word_ratio", sym_ratio)
        .withColumn("bullet_line_frac", bullet_frac)
        .withColumn("ellipsis_line_frac", ell_line_frac)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("stopword_hits", stop_hits)
    )
    keep = (
        (F.col("word_count") >= min_words)
        & (F.col("word_count") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return out.withColumn("keep_quality", keep).drop("__gt", "__gl")


def c4_quality_stats(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    banned_words: Sequence[str] = (),
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2), one row per
    document — the other canonical web-corpus filter battery next to
    Gopher's (:func:`gopher_quality_stats`). Line rules (a line
    survives only if it ends in terminal punctuation ``[.!?"”]``, has
    ≥ ``min_words_per_line`` whitespace words, and does not mention
    ``javascript``); page rules (``sentence_count`` — terminal marks in
    the SURVIVING lines — must reach ``min_sentences``; pages
    containing ``lorem ipsum`` or a ``{`` are dropped; optional
    ``banned_words`` token hits drop the page — the parameter defaults
    empty because the actual list is deployment policy, like Gopher's
    stopword list). C4's final rule, three-sentence-span dedup, is the
    separate corpus-wide operator :func:`remove_duplicate_spans`.

    Emits ``clean_text`` (surviving lines re-joined) plus the per-rule
    stats and the ``keep_c4`` conjunction. Everything is per-document
    codegen arithmetic over one staged line array — no shuffle, no
    UDF, the only acceptable posture for a rule applied to every
    document of a 100 TB corpus. NULL/empty text yields zero counts
    and ``keep_c4 = false``, matching the DuckDB oracle twin in
    ``hobbes_spark.queries`` bit-for-bit.
    """
    raw = F.coalesce(c(text_col), F.lit(""))
    # \r?\n (not \n): see gopher_quality_stats — CRLF must not leave a
    # trailing \r for Java-vs-RE2 '$' to disagree about
    staged = df.withColumn("__c4l", F.split(raw, r"\r?\n"))
    lns = F.col("__c4l")

    staged = staged.withColumn(
        "__c4k",
        F.filter(
            lns,
            # tokens() + empty-artifact filter: split('\t', '\s+')
            # yields ['',''] in BOTH engines, so the oracle's
            # list_filter(... w <> '') must be replayed here too —
            # bare size(tokens(l)) would count the artifacts
            lambda l: F.rtrim(l).rlike(r'[.!?"”]\z')
            & (F.size(F.filter(tokens(l), lambda w: w != ""))
               >= min_words_per_line)
            & ~F.lower(l).rlike(r"\bjavascript\b"),
        ),
    ).withColumn("__c4c", F.array_join(F.col("__c4k"), "\n"))
    kept = F.col("__c4k")
    clean = F.col("__c4c")
    n_lines = F.size(lns)
    sentences = F.regexp_count(clean, F.lit(r"[.!?]")).cast("bigint")
    lorem = F.lower(raw).contains("lorem ipsum")
    brace = raw.contains("{")
    if banned_words:
        hits = F.size(
            F.array_intersect(
                F.array_distinct(tokens(F.lower(raw))),
                F.array(*[F.lit(w) for w in banned_words]),
            )
        ).cast("bigint")
    else:
        hits = F.lit(0).cast("bigint")
    out = (
        staged.withColumn("n_lines", n_lines.cast("bigint"))
        .withColumn("kept_lines", F.size(kept).cast("bigint"))
        .withColumn(
            "kept_line_frac",
            F.coalesce(
                F.size(kept) / F.nullif(n_lines, F.lit(0)), F.lit(0.0)
            ),
        )
        .withColumn("sentence_count", sentences)
        .withColumn("has_lorem_ipsum", lorem)
        .withColumn("has_curly_brace", brace)
        .withColumn("banned_word_hits", hits)
        .withColumn("clean_text", clean)
    )
    keep = (
        (F.col("sentence_count") >= min_sentences)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_curly_brace")
        & (F.col("banned_word_hits") == 0)
    )
    return out.withColumn("keep_c4", keep).drop("__c4l", "__c4k", "__c4c")


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
    out_text: str = "chunk_text",
) -> DataFrame:
    """Split documents into overlapping token windows — the long-doc
    complement of :func:`pack_documents` (packing joins short docs,
    chunking splits long ones; context-window prep for pretraining).

    One row per chunk: ``(id_col, chunk_id, chunk_start, n_chunk_tokens,
    out_text)``. Chunks start every ``chunk_tokens − overlap`` tokens and
    keep ``overlap`` tokens of left context; the tail chunk may be
    shorter (and, when a doc's length modulo the stride is small, is
    partially contained in its predecessor — the standard sliding-window
    behavior). Empty docs produce no rows.

    Pure per-row expressions + one generate — no shuffle, scales with
    input splits.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < chunk_tokens, "
            f"got overlap={overlap}, chunk_tokens={chunk_tokens}"
        )
    step = chunk_tokens - overlap
    s1 = df.select(F.col(id_col), tokens(F.lower(c(text_col))).alias("__tk"))
    sz = F.size("__tk")
    starts = F.sequence(F.lit(1), F.greatest(sz, F.lit(1)), F.lit(step))
    s2 = s1.withColumn("__start", F.explode_outer(starts)).filter(
        F.col("__start").isNotNull()
    )
    chunk = F.slice(F.col("__tk"), F.col("__start"), chunk_tokens)
    s3 = s2.select(
        id_col,
        ((F.col("__start") - 1) / F.lit(step)).cast("int").alias("chunk_id"),
        F.col("__start").alias("chunk_start"),
        chunk.alias("__chunk"),
    )
    return (
        s3.filter(F.size("__chunk") > 0)
        .select(
            id_col,
            "chunk_id",
            "chunk_start",
            F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("__chunk")).alias(out_text),
        )
    )


def pack_documents(
    df: DataFrame,
    budget: int,
    token_count_col: Column | str | None = None,
    text_col: str = "text",
    by: Sequence[str] = ("source",),
    order: Sequence[str] = ("doc_id",),
    pack_col: str = "pack_id",
    pos_col: str = "pack_pos",
    shards: int | None = None,
) -> DataFrame:
    """Assign contiguous documents to token-budget packs (sequence
    packing for pretraining): within each ``by`` group, walk documents
    in ``order`` and start a new pack once the running token total
    passes ``budget``.

    ``pack_id = floor((running_total − own_tokens) / budget)`` — each doc
    joins the pack its *predecessors* filled up to, so packs are
    deterministic and overflow by at most one document (long-doc
    spillover is the standard behavior; :func:`chunk_documents` first if
    a hard cap matters). Pack ids are non-decreasing in doc order but
    may skip values after a multi-budget doc (the floor counter advances
    past the slots it consumed). ``pack_pos`` is the doc's position in
    its pack.

    The running sum is a distributed two-pass prefix scan, not one
    window per ``by`` group: a per-group window serializes each group
    into a single task, and a 100 TB corpus with ~10 sources would pack
    on 10 cores (measured 4.8× at 16× in SCALE.md before this).
    Instead rows are range-blocked on the first ``order`` column
    (``percentile_approx`` boundaries, broadcast), summed within
    (by, block) windows — ``shards``× the parallelism — and shifted by
    per-block offset totals (a by×shards-row table, broadcast back).
    Identical results to the single window because block ranges are
    contiguous in the scan order and ties of the blocking value never
    straddle a boundary. ``shards`` defaults to min(default parallelism,
    input partitions) when the first order column is numeric — a corpus
    that fits one scan partition keeps the cheap single-window plan (the
    boundary agg + offset join are pure overhead there: 1.27 s vs 0.38 s
    at 1×, tools/scale_check.py) while a many-partition corpus fans out.
    Pass 1 to force the single-window plan (required when the order
    column is non-numeric, where range boundaries can't be computed).
    The boundary pass scans the input one extra time — materialize an
    expensive upstream first (``prepare_corpus`` localCheckpoints its
    decontaminated slice for exactly this reason).
    """
    if budget < 1:
        # fail fast like the sibling operators: budget=0 would otherwise
        # DIVIDE_BY_ZERO under ANSI mode only after the whole prefix
        # scan has run; negative budgets yield decreasing pack ids
        raise ValueError(f"pack_documents: budget must be >= 1, got {budget}")
    tc = F.size(tokens(c(text_col))) if token_count_col is None else c(token_count_col)
    out = df.withColumn("token_count", tc.cast("bigint"))
    if shards is None:
        from hobbes_spark.functions.prefix import default_shards

        shards = default_shards(df, order[0])
    # the scan itself lives in functions/prefix.py since round 7 (the
    # weighted samplers share it); expressions are verbatim what was
    # inlined here, so plans and signed oracles are unchanged
    from hobbes_spark.functions.prefix import prefix_sum

    out = prefix_sum(out, by, order, "token_count", "__run", shards)
    out = out.withColumn(
        pack_col, F.floor((F.col("__run") - F.col("token_count")) / F.lit(budget))
    )
    wp = Window.partitionBy(*[c(b) for b in by], F.col(pack_col)).orderBy(
        *[c(o) for o in order]
    )
    return out.withColumn(pos_col, F.row_number().over(wp)).drop("__run")


def _mean_logprob_under(
    toks: DataFrame,
    vocab_src: DataFrame,
    id_col: str,
    alpha: float,
    out_col: str,
) -> DataFrame:
    """Per-doc mean log-probability of ``toks`` (id, tok rows) under the
    add-``alpha``-smoothed unigram LM trained on ``vocab_src`` (id, tok
    rows). Out-of-vocabulary tokens get the smoothed zero-count mass —
    the left join + coalesce, NOT an inner join, or unseen tokens would
    silently vanish from the mean."""
    vocab = vocab_src.groupBy("tok").agg(F.count("*").cast("bigint").alias("cnt"))
    sizes = vocab.agg(F.sum("cnt").alias("total"), F.count("*").alias("vsize"))
    return (
        toks.join(vocab, "tok", "left")
        .crossJoin(F.broadcast(sizes))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                / (F.col("total") + F.lit(alpha) * F.col("vsize"))
            ).alias("__lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.avg("__lp").alias(out_col),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-shaped domain-importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    per document, ``log w(x) = lp_target(x) − lp_corpus(x)`` — how much
    more likely the doc's tokens are under a LM of the TARGET domain
    than under the corpus LM. Sampling ∝ exp(log_weight) (e.g. via
    ``sampling.hash_sample`` thresholds) reshapes the corpus toward the
    target domain. DSIR proper uses hashed-n-gram features; the unigram
    variant keeps the whole computation SQL-expressible and oracle-
    checkable, same shape as :func:`unigram_logprob_scores`.

    Plan: tokenize once, score under both vocabularies (two keyed
    vocab aggregations + two token joins, AQE picks broadcast when a
    vocab is small), one per-doc mean each. Returns
    ``(id_col, n_tokens, log_weight)``; docs with no tokens are absent.
    """
    def tok_rows(d: DataFrame) -> DataFrame:
        return (
            d.select(F.col(id_col), tokens(F.lower(c(text_col))).alias("__tk"))
            .select(id_col, F.explode_outer("__tk").alias("tok"))
            .filter(F.col("tok").isNotNull())
        )

    toks = tok_rows(df)
    lp_t = _mean_logprob_under(toks, tok_rows(target), id_col, alpha, "__lp_t")
    lp_c = _mean_logprob_under(toks, toks, id_col, alpha, "__lp_c")
    return (
        lp_t.join(lp_c.drop("n_tokens"), id_col)
        .select(
            id_col,
            "n_tokens",
            (F.col("__lp_t") - F.col("__lp_c")).alias("log_weight"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    cutoffs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    alpha: float = 0.5,
    score_dp: int | None = 4,
) -> DataFrame:
    """CCNet-style corpus partition by LM perplexity (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data" §4.3): score every document under a corpus-trained LM,
    cut each language at the ``cutoffs`` quantiles of the score, and
    label documents ``head`` (most fluent), ``middle``, ``tail``. CCNet
    trains a 5-gram KenLM per language; the bigram corpus LM
    (:func:`bigram_logprob_scores`) is the SQL-expressible analog, and
    the bucketing mechanics — per-language quantile cutoffs, not global
    ones, so no language is penalized for being far from English — are
    the part this operator reproduces.

    Plan shape: the corpus-sized work is exactly
    :func:`bigram_logprob_scores` (two explodes, two keyed frequency
    aggs, two joins back). On top of that: one doc-keyed join to
    recover ``lang_col``, one per-language quantile aggregation whose
    output is LANGUAGE-sized (tiny), and a broadcast of that cutoff
    table back onto the scored scan — the corpus never shuffles for the
    bucketing itself. At 100 TB swap the exact ``percentile`` for
    ``percentile_approx`` (t-digest, mergeable map-side); the exact
    form is kept here so the DuckDB oracle can replay the cutoffs.

    ``score_dp`` rounds the per-doc score (``log_ppl``, the negated
    mean log-prob — monotone in perplexity without the ``exp``
    overflow) and the cutoffs with the exact half-up formula
    ``floor(x·10^n + 0.5)/10^n`` BEFORE any comparison, so both
    engines compare identically-rounded doubles and a document tied
    exactly on a rounded cutoff lands in the same bucket everywhere.
    Caveat on the cutoffs themselves: Spark's exact ``percentile`` and
    DuckDB's ``quantile_cont`` both linearly interpolate sorted values,
    but may order the IEEE ops differently, so an UNROUNDED cutoff
    within an ulp of a ``5·10^-(score_dp+1)`` boundary can round to
    different values across engines and flip a tied doc's bucket — the
    labels agree after rounding EXCEPT at those interpolation-ulp
    boundaries (never observed on the test corpora, but not excluded
    by construction). Pass ``None`` only when cross-engine replay does
    not matter.

    Returns ``(id_col, [lang_col], n_bigrams, log_ppl, bucket)``; docs
    with fewer than 2 tokens have no bigram evidence and are absent,
    matching :func:`bigram_logprob_scores`.
    """
    from hobbes_spark.operators.ml import _round_half_up

    q1, q2 = cutoffs
    if not (0.0 <= q1 <= q2 <= 1.0):
        raise ValueError(f"perplexity_buckets: need 0 <= q1 <= q2 <= 1, got {cutoffs}")

    def _rd(col: Column) -> Column:
        # the shared cross-engine half-up helper: cutoff-tie bucket
        # labels depend on Spark/DuckDB agreeing bit-for-bit, so the
        # formula must stay single-sourced
        return col if score_dp is None else _round_half_up(col, score_dp)

    scores = bigram_logprob_scores(df, text_col, id_col, alpha).select(
        id_col, "n_bigrams", _rd(-F.col("mean_logprob")).alias("log_ppl")
    )
    if lang_col is None:
        scored = scores.withColumn("__lang", F.lit(None).cast("string"))
    else:
        scored = (
            df.select(F.col(id_col), c(lang_col).alias("__lang"))
            .join(scores, id_col)
        )
    cuts = scored.groupBy("__lang").agg(
        _rd(F.percentile("log_ppl", q1)).alias("__q1"),
        _rd(F.percentile("log_ppl", q2)).alias("__q2"),
    )
    out = (
        scored.join(F.broadcast(cuts), scored["__lang"].eqNullSafe(cuts["__lang"]))
        .drop(cuts["__lang"])
        .withColumn(
            "bucket",
            F.when(F.col("log_ppl") <= F.col("__q1"), F.lit("head"))
            .when(F.col("log_ppl") <= F.col("__q2"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("__q1", "__q2")
    )
    if lang_col is None:
        return out.select(id_col, "n_bigrams", "log_ppl", "bucket")
    return out.select(
        id_col, F.col("__lang").alias(lang_col), "n_bigrams", "log_ppl", "bucket"
    )


#: the ASCII word-token class the blocklist matches on — anything else
#: is a separator, identically in Java, RE2, and Python (``\\b`` is NOT
#: portable: Java's is Unicode-word-aware, RE2's is ASCII-only, and RE2
#: has no lookarounds to emulate either — a ``\\b`` pattern silently
#: diverges between Spark and the oracle on the first non-ASCII letter)
BLOCKLIST_SEP = "[^a-z0-9_]+"

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_FOLD = str.maketrans(_ASCII_UPPER, _ASCII_LOWER)


def blocklist_subject(col: Column | str) -> Column:
    """The normalized haystack :func:`blocklist_pattern` matches
    against: ASCII-case-folded, every separator run → TWO spaces, one
    space padded on each edge. Two spaces between tokens is
    load-bearing: each space-framed needle (``' winner '``) consumes
    its own framing spaces, so two ADJACENT blocked tokens still both
    count (with single spacing the shared space would be consumed by
    the first match and hide the second).

    Case folding is ``translate(A-Z → a-z)``, NOT ``lower()``: engine
    ``lower()`` is not portable (Spark's JVM full case mapping turns
    U+0130 into ``i`` + combining dot — and is locale-sensitive for
    ``I`` — while DuckDB's utf8proc simple-maps it to ``i``), and only
    ``[a-z0-9_]`` are word characters anyway, so the per-char ASCII
    fold is both sufficient and identical in Java, DuckDB, and
    Python."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.translate(c(col), _ASCII_UPPER, _ASCII_LOWER), BLOCKLIST_SEP, "  "
        ),
        F.lit(" "),
    )


def blocklist_subject_sql(expr: str) -> str:
    """The DuckDB spelling of :func:`blocklist_subject` — generated
    from the SAME constants so the subject normalization has one
    source (the repo rule for every cross-engine rule table). NULL in
    → NULL subject, matching Spark's concat NULL propagation; oracles
    coalesce before calling when they want NULL→0-hits semantics."""
    return (
        f"' ' || regexp_replace(translate({expr}, '{_ASCII_UPPER}', "
        f"'{_ASCII_LOWER}'), '{BLOCKLIST_SEP}', '  ', 'g') || ' '"
    )


def blocklist_pattern(terms: Sequence[str]) -> str:
    """One alternation regex for a phrase blocklist over the
    :func:`blocklist_subject` haystack — shared verbatim by the Spark
    operator, the DuckDB oracle, and Python ``re`` (only literal
    ``[a-z0-9_ ]`` chars and ``(?:|)`` appear, so no engine-specific
    construct exists to diverge). Each term is tokenized on the same
    separator class as the subject (symbols inside a term act as
    separators — ``'$9.99'`` matches the token sequence ``9 99``);
    longer token sequences are placed first so an overlapping shorter
    term cannot shadow them in leftmost-first alternation (Java and
    RE2 both prefer the first alternative)."""
    import re as _re

    if not terms:
        raise ValueError("blocklist_pattern: terms must be non-empty")
    needles = set()
    for t in terms:
        folded = (t or "").translate(_ASCII_FOLD)  # same ASCII-only fold
        parts = [p for p in _re.split(BLOCKLIST_SEP, folded) if p]
        if parts:
            needles.add(" " + "  ".join(parts) + " ")
    if not needles:
        raise ValueError("blocklist_pattern: no usable terms (no word characters)")
    ordered = sorted(needles, key=lambda t: (-len(t), t))
    pat = "(?:" + "|".join(ordered) + ")"
    if not _re.fullmatch(r"[a-z0-9_ |(?:)]+", pat):
        # by construction the pattern is regex-inert (no metachars, no
        # quotes); a real raise (not an assert, which -O strips) pins
        # that so a future edit can't silently break the oracle's
        # plain-'...'-literal embedding
        raise ValueError(f"blocklist_pattern: non-inert pattern {pat!r}")
    return pat


def blocklist_stats(
    df: DataFrame,
    text_col: str,
    terms: Sequence[str],
) -> DataFrame:
    """C4-style phrase-blocklist filter (Raffel et al. 2020 §2.2 drop
    any page containing a listed word/phrase; C4 ships a profanity
    list — this operator takes the list as input and stays
    content-neutral). Adds ``blocklist_hits`` (total occurrences of
    any listed word/phrase as an ASCII-token sequence,
    case-insensitive) and ``keep_blocklist`` (no hits).

    Matching is ASCII-TOKEN based, not ``\\b``-based: the text is
    normalized by :func:`blocklist_subject` and needles are
    space-framed token sequences — the one formulation Java (Spark),
    RE2 (DuckDB oracle), and Python agree on byte-for-byte (see
    ``BLOCKLIST_SEP``). Consequences, both in the conservative
    direction for a blocklist: unicode letters separate tokens
    (``'éwinner'`` still hits ``winner``), and symbols inside terms
    act as separators (``'$9.99'`` also hits ``'9 99'``).

    Scale shape: the entire list compiles into ONE alternation regex —
    two regex passes per document (separator normalize + count), no
    join, no shuffle, codegen-resident; a thousand-phrase list costs
    one compiled automaton per executor, not a broadcast join. NULL
    text has zero hits and is kept (missing is not profane)."""
    pat = blocklist_pattern(terms)
    hits = F.coalesce(
        F.regexp_count(blocklist_subject(text_col), F.lit(pat)), F.lit(0)
    ).cast("bigint")
    return (
        df.withColumn("blocklist_hits", hits)
        .withColumn("keep_blocklist", F.col("blocklist_hits") == 0)
    )
