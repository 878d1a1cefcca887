#!/usr/bin/env python
"""Scale check: do the engine's heavy plans grow linearly with data?

Materializes an N-fold copy of the driver tables (id-offset unions, so
keys stay distinct and group/join cardinalities scale too), then times
representative heavy operators at 1x and Nx. A plan that's linear prints
a time ratio well under N on a many-core machine (fixed overheads
amortize); anything superlinear is a red flag for 100 TB.

Usage: python tools/scale_check.py [multiplier] [sf_dir]
Writes scaled tables under /tmp/hobbes_scale_<N>x (reused if present).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def scaled(spark, sf_dir: str, out_dir: str, table: str, n: int, id_cols: list[str]):
    path = f"{out_dir}/{table}.parquet"
    # a committed Spark write leaves _SUCCESS; a ctrl-C'd partial write
    # leaves the directory WITHOUT it — existence alone would silently
    # reuse truncated data and report meaningless ratios
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        span = base.agg(*[F.max(F.col(c)).alias(c) for c in id_cols]).first()
        parts = []
        for i in range(n):
            p = base
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * (int(span[c]) + 1)))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # cache key includes the SOURCE dir: the same multiplier over a
    # different sf would otherwise silently reuse the other sf's tables
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    out_dir = f"/tmp/hobbes_scale_{n}x_{sf_tag}"
    os.makedirs(out_dir, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from hobbes_spark.session import get_spark

    spark = get_spark("scale_check")
    spark.sparkContext.setLogLevel("ERROR")

    li1 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev1 = spark.read.parquet(f"{sf_dir}/events.parquet")
    do1 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    or1 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    em1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # LAZY scaled-table builds (round 7): a filtered run (the per-round
    # gate selects 5 document/lineitem shapes) used to pay for scaling
    # events/orders/embeddings it never reads — at 96-192x that is
    # minutes of wasted parquet writes per invocation. Cases reference
    # tables by NAME; the first (untimed warm) use materializes.
    _ID_COLS = {
        "lineitem": ["l_orderkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "orders": ["o_orderkey", "o_custkey"],
        "embeddings": ["vec_id"],
    }
    _big: dict = {}

    def bigN(table: str):
        if table not in _big:
            _big[table] = scaled(spark, sf_dir, out_dir, table, n, _ID_COLS[table])
        return _big[table]

    def group_agg(li):
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"), F.sum("l_extendedprice"),
                F.avg("l_discount"), F.count(F.lit(1)),
            )
        )

    def keyed_window(ev):
        from pyspark.sql import Window

        daily = (
            fix_ts(ev).withColumn("d", F.to_date(F.col("ts")))
            .groupBy("user_id", "d").count()
        )
        w = Window.partitionBy("user_id").orderBy("d").rowsBetween(-6, 0)
        return daily.withColumn("m7", F.avg("count").over(w))

    def minhash(do):
        from hobbes_spark.functions.dedup import minhash_pairs

        return minhash_pairs(do, "doc_id", "text", num_hashes=32, bands=16,
                             threshold=0.5, hash_fn="xxhash64")

    def join_orders(orders):
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        return (
            orders.join(F.broadcast(cust),
                        orders.o_custkey % 1000 == cust.c_custkey % 1000)
            .groupBy("c_mktsegment").agg(F.sum("o_totalprice"))
        )

    def fix_ts(ev):
        if dict(ev.dtypes)["ts"] == "bigint":
            ev = ev.withColumn("ts", F.expr("timestamp_micros(`ts` div 1000)"))
        return ev

    def asof(ev):
        from hobbes_spark.operators.asof import asof_join

        ev = fix_ts(ev)
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        buys = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        )
        return asof_join(clicks, buys, on="ts", by=["user_id"])

    def curate(do):
        from hobbes_spark.functions import text as TX
        from hobbes_spark.functions.dedup import exact_dedup

        staged = do.withColumn("__toksl", TX.tokens(F.lower(F.col("text"))))
        toks = F.col("__toksl")
        scored = staged.select(
            "doc_id", "source", "text",
            F.size(toks).cast("bigint").alias("tc"),
            TX.quality_score_t("text", toks).alias("quality"),
            TX.lang_id_t("text", toks).alias("lang_guess"),
        )
        kept = exact_dedup(scored, "doc_id", "text").filter(
            (F.col("lang_guess") == "en") & (F.col("quality") >= 0.6)
        )
        return kept.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"), F.sum("tc").alias("tt")
        )

    def components(do):
        from hobbes_spark.functions.dedup import connected_components, minhash_pairs

        pairs = minhash_pairs(do, "doc_id", "text", num_hashes=32, bands=16,
                              threshold=0.5, hash_fn="xxhash64")
        return connected_components(pairs.select("id_a", "id_b"))

    def decontam(do):
        from hobbes_spark.functions.curation import decontaminate

        ev = do.filter(F.col("doc_id") % 20 == 0)
        tr = do.filter(F.col("doc_id") % 20 != 0)
        return decontaminate(tr, ev, n=8)

    def pack(do):
        from hobbes_spark.functions.curation import pack_documents

        return (
            pack_documents(do, budget=512)
            .groupBy("source", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("token_count").alias("tt"))
        )

    def tfidf(do):
        from hobbes_spark.functions.text import tfidf_top_terms

        return tfidf_top_terms(do, "doc_id", "text", top=3)

    def dup_ngram(do):
        from hobbes_spark.functions.curation import duplicate_ngram_stats

        return duplicate_ngram_stats(do, "text", n=8).select(
            "doc_id", "n_grams", "dup_grams", "dup_gram_frac"
        )

    def classify(do):
        from hobbes_spark.functions.classify import linear_text_scores, pseudo_weights

        return linear_text_scores(
            do, "text", pseudo_weights(do.sparkSession, 1024), dim=1024
        )

    def media_decode(do):
        from hobbes_spark.functions.multimodal import as_media, decode_image_meta

        media = as_media(do, "doc_id", "text", "text/plain")
        return decode_image_meta(media)

    def components_star(do):
        from hobbes_spark.functions.dedup import (
            connected_components_star,
            minhash_pairs,
        )

        pairs = minhash_pairs(do, "doc_id", "text", num_hashes=32, bands=16,
                              threshold=0.5, hash_fn="xxhash64")
        return connected_components_star(pairs.select("id_a", "id_b"))

    def weighted_sample_shape(do):
        # token-weighted systematic sample: the sharded prefix scan on
        # hash order + broadcast totals — k scales with corpus so the
        # output stays proportionate
        from hobbes_spark.functions.sampling import systematic_weighted_sample
        from hobbes_spark.functions.text import token_count

        d = do.withColumn("__tok", token_count("text"))
        return systematic_weighted_sample(d, "doc_id", "__tok", 1000, strata="lang")

    def join_pricer(ev):
        from hobbes_spark.operators.skew import join_cardinality_stats

        ev = fix_ts(ev)
        return join_cardinality_stats(ev, ev, "user_id", "user_id", top=20)

    def minhash_count_only(do):
        # compute-only twin of minhash_dedup: identical corpus-sized
        # work (shingle -> minhash -> band -> bucket agg) but band-sized
        # output — its ratio isolates PLAN cost from the Θ(Σk²) pair
        # volume that id-offset scaling manufactures by construction
        from hobbes_spark.functions.dedup import (
            lsh_candidate_stats, minhash_signatures_df,
        )

        sigs = minhash_signatures_df(do, "doc_id", "text", num_hashes=32)
        return lsh_candidate_stats(sigs, 32, 16)

    def components_star_linear(do):
        # compute-only twin of dedup_components_star: same signatures,
        # same components algorithm, but star edges (k-1 per bucket)
        # instead of all-pairs — identical transitive closure at <=
        # bands*n edge volume, so the ratio tracks the star iterations'
        # plan, not the duplicate-group pair blowup
        from hobbes_spark.functions.dedup import (
            connected_components_star,
            minhash_signatures_df,
            minhash_star_edges,
        )

        sigs = minhash_signatures_df(
            do, "doc_id", "text", num_hashes=32
        ).localCheckpoint()
        return connected_components_star(minhash_star_edges(sigs, 32, 16))

    def bloom_anti(do):
        from hobbes_spark.functions.text import fingerprint
        from hobbes_spark.operators.bloom import bloom_anti_join

        d = do.withColumn("__f", fingerprint("text"))
        tst = d.filter(F.col("doc_id") % 20 == 0).select("__f")
        return bloom_anti_join(
            d.filter(F.col("doc_id") % 20 != 0), tst, "__f", num_bits=1 << 22
        )

    def semantic(emb):
        from hobbes_spark.functions.dedup import semantic_dedup

        # perturb each vector by a vec_id-keyed jitter: the id-offset
        # scaling would otherwise give every vector 15 EXACT twins, and
        # pair enumeration over m-fold duplicates is Θ(m²) by
        # definition (any exact pair listing is) — that measures the
        # pathological data, not the plan. Distinct vectors measure the
        # LSH plan's scaling on realistic low-duplicate input.
        # zero-mean ±0.21/component on rms-0.13 components ⇒ copy-vs-copy
        # cosine ~0.73, safely below the 0.9 pairing threshold
        jit = emb.withColumn(
            "embedding",
            F.transform(
                "embedding",
                # pmod, not %: Spark's % is sign-preserving, and xxhash64
                # is negative half the time — plain % would skew half the
                # jitter terms to [-0.63, -0.21] instead of +/-0.21
                lambda x, i: x
                + (F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2001)) - 1000)
                .cast("double") * 0.00021,
            ),
        )
        # band-key bits sized to the corpus: bucket occupancy — and
        # with it the candidate-join cost — is n/2^bits, so LSH's
        # operating contract is bits ≈ log2(n); with fixed bits the
        # candidate stage is Θ(n²/2^bits) by construction and no plan
        # can make it linear. (The small-corpus oracle query keeps a
        # coarse 4-bit toy setting; recall on exact copies is 1.0 at
        # any width.)
        import math

        bits = max(8, int(math.ceil(math.log2(max(emb.count(), 2) / 1.5))))
        return semantic_dedup(jit, threshold=0.9, bands=6, rows_per_band=bits)

    cases = {
        "group_agg": (group_agg, li1, "lineitem"),
        "media_decode": (media_decode, do1, "documents"),
        "tfidf_top_terms": (tfidf, do1, "documents"),
        "duplicate_ngram": (dup_ngram, do1, "documents"),
        "classifier_scores": (classify, do1, "documents"),
        "decontaminate": (decontam, do1, "documents"),
        "pack_documents": (pack, do1, "documents"),
        "keyed_window": (keyed_window, ev1, "events"),
        "minhash_dedup": (minhash, do1, "documents"),
        "join_agg": (join_orders, or1, "orders"),
        "asof_join": (asof, ev1, "events"),
        "curate_corpus": (curate, do1, "documents"),
        "dedup_components": (components, do1, "documents"),
        "dedup_components_star": (components_star, do1, "documents"),
        "minhash_candidate_stats": (minhash_count_only, do1, "documents"),
        "dedup_components_star_linear": (components_star_linear, do1, "documents"),
        "weighted_sample": (weighted_sample_shape, do1, "documents"),
        "join_pricer": (join_pricer, ev1, "events"),
        "bloom_anti_join": (bloom_anti, do1, "documents"),
        "semantic_dedup": (semantic, em1, "embeddings"),
    }

    def exact_dd(do):
        from hobbes_spark.functions.dedup import exact_dedup

        return exact_dedup(do, "doc_id", "text").select("doc_id", "source")

    def paragraphs(do):
        from hobbes_spark.functions.curation import dedup_paragraphs
        from hobbes_spark.functions.text import tokens

        toks = tokens(F.lower(F.col("text")))
        nseg = F.ceil(F.size(toks) / F.lit(12.0)).cast("int")
        chunks = F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(1), nseg),
                lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * 12 + 1, F.lit(12))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pdocs = do.select("doc_id", F.concat_ws("\n\n", chunks).alias("text"))
        return dedup_paragraphs(pdocs).select("doc_id", "kept_paras")

    def cms_heavy_hitters(do):
        from hobbes_spark.functions.sketches import cms_top_items
        from hobbes_spark.functions.text import tokens

        terms = do.select(F.explode(tokens(F.lower(F.col("text")))).alias("t"))
        return cms_top_items(terms, "t", k=20)

    def q9_profit(li):
        # two-fact join graph (TPC-H Q9 shape): orders scales WITH
        # lineitem (the order-key spans align by construction), the
        # filtered part and supplier⋈nation dims stay dim-sized
        # broadcasts — exactly what a 100 TB scale-out looks like
        ords = or1 if li is li1 else bigN("orders")
        part = (
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice")
        )
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_name"
        )
        supp = (
            spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .select("s_suppkey", "s_nationkey")
            .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", F.col("n_name").alias("nation"))
        )
        rev = (
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            * (F.lit(100).cast("bigint")
               - F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint"))
        )
        cost = (
            F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("bigint")
            * F.lit(100).cast("bigint") * F.col("l_quantity").cast("bigint")
        )
        return (
            li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
            .select("nation", F.year("o_orderdate").alias("yr"),
                    (rev - cost).alias("u"))
            .groupBy("nation", "yr").agg(F.sum("u"))
        )

    def q21_grouped_exists(li):
        # EXISTS/NOT-EXISTS pair as ONE grouped pass + same-key re-join
        # (TPC-H Q21 shape): the distinct-aggregate Expand and the
        # reused order-key partitioning are what must stay linear
        ostats = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
            F.countDistinct("l_suppkey").alias("ns"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("nr"),
        )
        return (
            li.filter(F.col("l_returnflag") == "R")
            .join(ostats, F.col("l_orderkey") == F.col("ok"))
            .filter((F.col("ns") > 1) & (F.col("nr") == 1))
            .groupBy("l_suppkey").count()
        )

    def keep_best(do):
        # canonical selection end-to-end: pairs → components → argmax
        # quality per cluster (production xxhash64 path)
        from pyspark.sql import Window

        from hobbes_spark.functions.dedup import (
            connected_components, minhash_pairs,
        )
        from hobbes_spark.functions.text import quality_score

        pairs = minhash_pairs(
            do, "doc_id", "text", num_hashes=16, bands=8, threshold=0.5,
            hash_fn="xxhash64",
        )
        comp = connected_components(pairs.select("id_a", "id_b")).select(
            F.col("id").alias("cid"), F.col("comp").alias("cluster0")
        )
        scored = do.select(
            "doc_id", F.round(quality_score("text"), 6).alias("q")
        )
        labeled = scored.join(
            comp, scored["doc_id"] == F.col("cid"), "left"
        ).select(
            "doc_id", "q",
            F.coalesce(F.col("cluster0"), F.col("doc_id")).alias("cluster"),
        )
        w = Window.partitionBy("cluster").orderBy(F.desc("q"), F.asc("doc_id"))
        return (
            labeled.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).select("cluster", "doc_id", "q")
        )

    cases.update(
        {
            "exact_dedup": (exact_dd, do1, "documents"),
            "dedup_paragraphs": (paragraphs, do1, "documents"),
            "cms_heavy_hitters": (cms_heavy_hitters, do1, "documents"),
            "tpch_q9_two_fact": (q9_profit, li1, "lineitem"),
            "tpch_q21_grouped_exists": (q21_grouped_exists, li1, "lineitem"),
            "dedup_keep_best": (keep_best, do1, "documents"),
        }
    )

    def gap_fill(ev):
        from hobbes_spark.operators.timeseries import gap_fill_ffill

        ev = fix_ts(ev)
        obs = (
            ev.filter(F.col("value") > 300)
            .withColumn("d", F.to_date("ts"))
            .groupBy("user_id", "d")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("m"))
        )
        return gap_fill_ffill(obs, ["user_id"], "d", ["m"], count_col="n")

    def ohlc_bars_shape(ev):
        from hobbes_spark.operators.timeseries import ohlc

        ev = fix_ts(ev).withColumn(
            "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        )
        return ohlc(ev, ["event_type", "user_id"], "ts", "event_id", "value",
                    F.to_date("ts"), "d", volume_col="cents")

    def scd2(ev):
        from hobbes_spark.operators.timeseries import change_intervals

        ev = fix_ts(ev).select(
            "user_id", "event_id", F.col("event_type").alias("status"),
            F.col("ts").cast("timestamp").alias("ts"),
        )
        return change_intervals(ev, ["user_id"], "ts", "event_id", "status")

    def bm25(do):
        from hobbes_spark.functions.text import bm25_topk

        return bm25_topk(do, ["hash", "merge", "window"], top=20)

    def phash_pairs(do):
        # operating rules mirror LSH: duplicate-GROUP SIZE must stay
        # bounded as the corpus grows (pair listing over m-fold groups
        # is Θ(m²) by definition), and base images must be DISTINCT —
        # xxhash pixels, not the catalog query's affine toy pattern,
        # whose pixel ramp is periodic in g mod 256 and so collapses
        # 8000 groups onto ≤256 images (measured 18× at 16×: that is
        # quadratic pair OUTPUT from degenerate data, not plan cost)
        from hobbes_spark.functions.multimodal import ahash_images, phash_near_pairs

        n_docs = do.count()
        groups = max(50, n_docs // 10)
        g = F.col("doc_id") % groups
        v = F.expr(f"doc_id div {groups}")
        parts = []
        for j in range(64):
            base = F.pmod(F.xxhash64(g, F.lit(j)), F.lit(256))
            pert = F.pmod(F.xxhash64(g, F.lit(j)) + 96, F.lit(256))
            cond = (v > 0) & (
                (v % 64 == j) | ((v * 7) % 64 == j) | ((v * 13) % 64 == j)
            )
            parts.append(F.lpad(F.hex(F.when(cond, pert).otherwise(base)), 2, "0"))
        media = do.select(
            F.col("doc_id").cast("long").alias("media_id"),
            F.unhex(F.concat(*parts)).alias("content"),
        )
        return phash_near_pairs(ahash_images(media), max_hamming=8)

    cases.update(
        {
            "gap_fill_ffill": (gap_fill, ev1, "events"),
            "ohlc_bars": (ohlc_bars_shape, ev1, "events"),
            "scd2_intervals": (scd2, ev1, "events"),
            "bm25_topk": (bm25, do1, "documents"),
            "media_phash_pairs": (phash_pairs, do1, "documents"),
        }
    )

    def boilerplate(do):
        from hobbes_spark.functions.curation import remove_boilerplate_lines
        from hobbes_spark.functions.text import tokens

        toks = tokens(F.lower(F.col("text")))
        nseg = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
        chunks = F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(1), nseg),
                lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * 10 + 1, F.lit(10))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        ldocs = do.select("doc_id", F.concat_ws("\n", chunks).alias("text"))
        # id-offset scaling repeats every text 16x, so line doc-frequency
        # scales with N while the DISTINCT offender set stays constant —
        # exactly the regime the broadcast design assumes
        return remove_boilerplate_lines(ldocs).select("doc_id", "kept_lines")

    def pagerank_shape(li):
        from hobbes_spark.functions.graph import pagerank

        ords = or1 if li is li1 else bigN("orders")
        edges = li.join(
            ords.select("o_orderkey", "o_custkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        ).select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(10_000_000)).alias("dst"),
        )
        return pagerank(edges, iterations=3)

    def kmv_sketch(ev):
        from hobbes_spark.functions.sketches import (
            kmv_group_sketches, kmv_merge, kmv_quantile,
        )

        ev = fix_ts(ev).withColumn("d", F.to_date("ts"))
        daily = kmv_group_sketches(
            ev, ["event_type", "d"], "event_id", "value", k=256
        )
        merged = kmv_merge(daily, ["event_type"], k=256)
        return merged.select(
            "event_type",
            kmv_quantile("sketch", 0.5).alias("p50"),
            kmv_quantile("sketch", 0.99).alias("p99"),
        )

    def bpe_word_freq(do):
        from hobbes_spark.functions.bpe import word_frequencies

        # the ONE corpus-sized pass of tokenizer training: explode +
        # keyed count + bounded top-N prune
        return word_frequencies(do, "text", max_words=2000)

    _bpe_state: dict = {}

    def bpe_encode_shape(do):
        from hobbes_spark.functions.bpe import (
            bpe_encode, learn_bpe, word_frequencies,
        )

        if "merges" not in _bpe_state:
            # learned once from the 1x corpus (driver-local, one job);
            # the first call is the untimed warm run, so this setup
            # never bills into a timing
            _bpe_state["merges"] = [
                (r["lhs"], r["rhs"])
                for r in learn_bpe(
                    word_frequencies(do1, "text", max_words=1000), num_merges=50
                ).collect()
            ]
        return bpe_encode(do, "text", _bpe_state["merges"]).select(
            "doc_id", F.size("bpe_tokens").alias("n_subwords")
        )

    _pq_state: dict = {}

    def pq_adc(emb):
        from hobbes_spark.functions.similarity import (
            pq_adc_topk, pq_codebooks, pq_encode,
        )

        if "books" not in _pq_state:
            # codebooks built once from the 1x corpus (one job, L×D
            # doubles); first call is the untimed warm run
            _pq_state["books"] = pq_codebooks(
                em1.filter(F.col("embedding").isNotNull())
            )
        books = _pq_state["books"]
        enc = pq_encode(emb.filter(F.col("embedding").isNotNull()), books)
        qs = em1.filter(F.col("vec_id") < 3)
        return pq_adc_topk(enc, qs, books, k=10)

    def gopher_battery(do):
        from hobbes_spark.functions.curation import gopher_quality_stats

        return gopher_quality_stats(do).select(
            "doc_id", "word_count", "alpha_word_frac", "keep_quality"
        )

    def c4_battery(do):
        from hobbes_spark.functions.curation import c4_quality_stats

        return c4_quality_stats(do).select(
            "doc_id", "kept_lines", "sentence_count", "keep_c4"
        )

    _ivfpq_state: dict = {}

    def ivf_pq(emb):
        from hobbes_spark.functions.similarity import (
            ivf_pq_build, ivf_pq_search,
        )

        # the build (k-means + codebooks) is per-corpus; searches
        # dominate in production, so the timed shape is the search —
        # but the index must come from the CORPUS BEING SEARCHED, so
        # build once per scale during the untimed warm run (keyed on
        # the incoming frame object: em1 and emN are stable across the
        # warm and timed calls)
        k = id(emb)
        if k not in _ivfpq_state:
            _ivfpq_state[k] = ivf_pq_build(
                emb.filter(F.col("embedding").isNotNull()), nlist=16
            )
        enc, cents, books = _ivfpq_state[k]
        qs = em1.filter(F.col("vec_id") < 3)
        return ivf_pq_search(enc, cents, qs, books, k=10, nprobe=4)

    def ccnet_partition(do):
        from hobbes_spark.functions.curation import perplexity_buckets

        return perplexity_buckets(do).select("doc_id", "lang", "bucket")

    def mixture_apply(do):
        from hobbes_spark.functions.sampling import (
            apply_mixture_plan, mixture_plan,
        )

        # plan (one keyed agg) + apply (broadcast + map-only filter) —
        # the end-to-end recipe materialization. Fixed budget, so the
        # rates are FRACTIONAL at both scales (at 16x they shrink 16x)
        # and the md5 threshold filter is genuinely exercised; the
        # timed work (scan + token agg + map filter) is corpus-sized
        # regardless of the kept fraction
        w = {f"src{i}": 1.0 for i in range(4)}
        plan = mixture_plan(do, "source", w, 50_000.0)
        return apply_mixture_plan(do, plan, "source", "doc_id")

    def _skewed_fact_dim(ev):
        # deliberately skewed equi-join input: key 0 owns 50% of the
        # fact rows (every even event_id), the rest spread uniformly
        # over user_ids; the dim carries one row per key and SCALES
        # with the fact (user_ids are id-offset), so at Nx both the
        # hot key and the dim grow N-fold — the 100 TB hot-key regime
        ev = fix_ts(ev)
        fact = ev.select(
            F.when(F.col("event_id") % 2 == 0, F.lit(0).cast("long"))
            .otherwise(F.col("user_id")).alias("sk"),
            "event_id", "value",
        )
        dim = (
            ev.select(F.col("user_id").alias("sk")).distinct()
            .unionByName(ev.sparkSession.range(1).select(F.lit(0).cast("long").alias("sk")))
            .distinct()
            .select("sk", (F.col("sk") % 7).alias("grp"))
        )
        return fact, dim

    def skew_join_aqe(ev):
        # UNSALTED twin: sort-merge forced (merge hint beats the
        # broadcast the scaled dim might still fit) so AQE's skew-join
        # split is what has to keep the hot key off a single task —
        # plan-asserted in tests/test_skew_ivf.py
        fact, dim = _skewed_fact_dim(ev)
        return (
            fact.join(dim.hint("merge"), "sk")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        )

    def skew_join_salted(ev):
        # SALTED twin: same join, hot key pre-split over 32 salts
        # (operators/skew.py salted_join) — the fix for the cases AQE
        # does not cover (broadcast-ineligible dims, non-SMJ plans)
        from hobbes_spark.operators.skew import salted_join

        fact, dim = _skewed_fact_dim(ev)
        return (
            salted_join(fact, dim.hint("merge"), on="sk", salts=32)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        )

    def skew_join_auto(ev):
        # DERIVED-salt twin (r8 verdict item 5): the factor comes from
        # the pricer's hottest-key output over a fixed per-task target,
        # so at Nx input the factor GROWS with the hot key (the pricing
        # pass itself is two key-sized aggs — included in the timing,
        # the honest end-to-end cost of the auto path)
        from hobbes_spark.operators.skew import auto_salted_join

        fact, dim = _skewed_fact_dim(ev)
        return (
            auto_salted_join(
                fact, dim.hint("merge"), on="sk",
                target_rows_per_task=50_000,
            )
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        )

    def media_pixel_decode(do):
        # round 9: the pure-Python JPEG PIXEL decoders (baseline
        # non-interleaved + progressive SOF2) through mapInPandas —
        # per-row CPU work over Arrow batches, zero shuffle, so the
        # shape must scale ~linearly with the corpus. Payloads are the
        # frozen truth-pin streams, one of each family per doc.
        from hobbes_spark.queries import (
            _JPEG_NONINTERLEAVED_HEX,
            _JPEG_PROGRESSIVE_LADDER_HEX,
        )

        media = do.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.unhex(F.lit(_JPEG_NONINTERLEAVED_HEX)),
            ).otherwise(
                F.unhex(F.lit(_JPEG_PROGRESSIVE_LADDER_HEX))
            ).alias("content"),
        )

        def fn(batches):
            import numpy as np
            import pandas as pd

            from hobbes_spark.functions.multimodal import decode_pixels

            for pdf in batches:
                out = []
                for mid, blob in zip(pdf["doc_id"], pdf["content"]):
                    got = decode_pixels(bytes(blob))
                    if got is None:
                        continue
                    w, h, gray = got
                    a = np.asarray(gray, dtype=np.int64).reshape(h, w)
                    out.append((int(mid), int(a.mean())))
                yield pd.DataFrame(out, columns=["doc_id", "mean_px"])

        return media.mapInPandas(fn, "doc_id long, mean_px int")

    cases.update(
        {
            "skew_join_aqe": (skew_join_aqe, ev1, "events"),
            "skew_join_salted": (skew_join_salted, ev1, "events"),
            "skew_join_auto": (skew_join_auto, ev1, "events"),
            "media_pixel_decode": (media_pixel_decode, do1, "documents"),
            "boilerplate_lines": (boilerplate, do1, "documents"),
            "pagerank_3_rounds": (pagerank_shape, li1, "lineitem"),
            "kmv_quantile_sketch": (kmv_sketch, ev1, "events"),
            "bpe_word_freq": (bpe_word_freq, do1, "documents"),
            "bpe_encode": (bpe_encode_shape, do1, "documents"),
            "pq_adc_search": (pq_adc, em1, "embeddings"),
            "gopher_quality": (gopher_battery, do1, "documents"),
            "c4_quality": (c4_battery, do1, "documents"),
            "ivf_pq_search": (ivf_pq, em1, "embeddings"),
            "ccnet_buckets": (ccnet_partition, do1, "documents"),
            "mixture_apply": (mixture_apply, do1, "documents"),
        }
    )

    # round-11 crawl-layer shapes: all map-only Column regex (+ one
    # bounded explode + small-key agg) — expected ratio ~1-2
    def _wrap_html(do):
        did = F.col("doc_id").cast("string")
        return do.withColumn(
            "raw",
            F.concat(
                F.lit('<html lang="en"><head><title>'),
                F.substring("text", 1, 40),
                F.lit('</title><link rel="canonical" '
                      'href="https://c.example/'), did,
                F.lit('"></head><body><a href="https://s'),
                (F.col("doc_id") % 5).cast("string"),
                F.lit('.example.com/a">x</a><a href="https://h'),
                (F.col("doc_id") % 3).cast("string"),
                F.lit('.unknowntld/y">z</a>'),
                F.col("text"), F.lit("</body></html>"),
            ),
        )

    def html_meta_shape(do):
        from hobbes_spark.functions.web import html_meta

        cols = html_meta(F.col("raw"))
        return _wrap_html(do).select(
            "doc_id", *[v.alias(k) for k, v in cols.items()])

    def outlink_domains_shape(do):
        # the PRODUCTION path since round 12: broadcast suffix-table
        # joins (registrable_domain_df) — whole-stage codegen survives;
        # the literal-CASE twin below records the A/B counterpart
        from hobbes_spark.functions.web import (
            outlinks, registrable_domain_df, url_host)

        links = _wrap_html(do).select(
            "doc_id", F.explode(outlinks(F.col("raw"))).alias("link"))
        hosts = links.select(url_host(F.col("link")).alias("host"))
        return (registrable_domain_df(hosts, "host")
                .filter(F.col("domain").isNotNull())
                .groupBy("domain").count())

    def outlink_domains_case_shape(do):
        # A/B twin: the literal-CASE Column variant (Janino 64 KB
        # fallback path) on the identical workload
        from hobbes_spark.functions.web import (
            outlinks, registrable_domain, url_host)

        links = _wrap_html(do).select(
            "doc_id", F.explode(outlinks(F.col("raw"))).alias("link"))
        dom = registrable_domain(url_host(F.col("link")))
        return (links.select(dom.alias("domain"))
                .filter(F.col("domain").isNotNull())
                .groupBy("domain").count())

    def pdf_parse_shape(do):
        # per-row minimal PDF (uncompressed content stream built from
        # the text column) through the full object walk + BT/ET text
        # extraction — the r12 document-modality CPU shape
        from hobbes_spark.functions.pdf import pdf_features

        payload = F.concat(
            F.lit("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>"
                  "\nendobj\n2 0 obj\n<< /Type /Pages /Kids [3 0 R] "
                  "/Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent "
                  "2 0 R /Contents 4 0 R >>\nendobj\n4 0 obj\n<< /Length "),
            (F.octet_length(F.col("text")) + 26).cast("string"),
            F.lit(" >>\nstream\nBT 72 720 Td ("),
            F.regexp_replace(F.col("text"), r"([\\()])", r"\\$1"),
            F.lit(") Tj ET\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>"),
        ).cast("binary")
        media = do.select(F.col("doc_id").alias("media_id"),
                          payload.alias("content"))
        return pdf_features(media).select(
            "media_id", "n_pages", "n_chars")

    def byte_bpe_shape(do):
        # byte-level BPE encode (GPT-2 pre-tokenizer + byte mapping +
        # ranked merges) over the Arrow boundary — per-row sequential
        # CPU, the token-budget shape of a trainer-facing pipeline
        from hobbes_spark.functions.bpe import byte_bpe_encode

        merges = [("Ã", "©"), ("t", "h"), ("th", "e"), ("Ġ", "the"),
                  ("i", "n"), ("a", "n"), ("an", "d"), ("Ġ", "and")]
        return byte_bpe_encode(do, "text", merges).select(
            "doc_id", F.size("bpe_tokens").alias("n_tokens"))

    def robots_shape(do):
        from hobbes_spark.functions.web import robots_allowed

        rules = [(False, "/private/"), (True, "/private/ok/"),
                 (False, "/*.pdf$"), (False, "/tmp")]
        url = F.concat(F.lit("https://e.example/p/"),
                       F.col("doc_id").cast("string"),
                       F.when(F.col("doc_id") % 4 == 0, F.lit(".pdf"))
                       .otherwise(F.lit("")))
        return do.select("doc_id", robots_allowed(url, rules).alias("ok"))

    def warc_parse_shape(do):
        # shard-per-row WARC walk through the Arrow boundary: the text
        # column becomes a one-record PLAIN shard (codec sniff + record
        # walk + HTTP split per row, no decompress — the CPU shape is
        # the parse, matching a pre-inflated landing zone)
        from hobbes_spark.functions.warc import warc_records

        payload = F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
                  "WARC-Target-URI: https://w.example/"),
            F.col("doc_id").cast("string"),
            F.lit("\r\nContent-Type: application/http; msgtype=response"
                  "\r\nContent-Length: "),
            (F.octet_length(F.col("text")) + 44).cast("string"),
            F.lit("\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html"
                  "\r\n\r\n"),
            F.col("text"), F.lit("\r\n\r\n"),
        ).cast("binary")
        media = do.select(F.col("doc_id").alias("media_id"),
                          payload.alias("content"))
        return warc_records(media).select(
            "media_id", "record_index", "http_status",
            F.length("body").alias("n"))

    def cdx_selective_shape(do):
        # r13: CDX index build (corpus-linear) + selective fetch of the
        # ~1%-of-records host — fetch work is bounded by MATCHES, so
        # the end-to-end shape stays comfortably linear even though the
        # corpus grows 16x
        from hobbes_spark.functions.warc import cdx_fetch, cdx_index

        body = F.col("text")
        http = F.concat(
            F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
            body)
        rec = F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
                  "https://h"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(".example/p"), F.col("doc_id").cast("string"),
            F.lit("\r\nWARC-Date: 2026-02-01T10:00:00Z\r\nContent-Type: "
                  "application/http; msgtype=response\r\nContent-Length: "),
            F.octet_length(http).cast("string"),
            F.lit("\r\n\r\n"), http, F.lit("\r\n\r\n"))
        shards = (
            do.select((F.col("doc_id") % 64).alias("media_id"),
                      rec.alias("rec"))
            .groupBy("media_id")
            .agg(F.concat_ws("", F.collect_list("rec"))
                 .cast("binary").alias("content"))
        )
        idx = cdx_index(shards)
        sel = idx.filter(F.col("surt").startswith("example,h7)")).select(
            "media_id", "record_index", "offset", "length", "addressing")
        return cdx_fetch(shards, sel)

    def substring_spans_shape(do):
        # r13: Lee-et-al exact substring dedup — gram fingerprints +
        # adjacent-run merge; k=50 (the paper's setting) to pin that
        # span reconstruction does NOT pay a k x explode
        from hobbes_spark.functions.dedup import duplicate_substring_spans

        return duplicate_substring_spans(do, "text", k=50, id_col="doc_id")

    # --------------------------------------------------------------- #
    # r14 dedup-family sweep (VERDICT r13 item 8): the r13/r14 rewrites
    # carry the same 16x evidence as the rest of the catalog.
    # --------------------------------------------------------------- #

    _span1x = {"documents": None}

    def _replica_tagged(do):
        # id-offset scaling repeats every TEXT verbatim, so a
        # similarity join would pay candidate buckets N^2-fold on
        # degenerate data (the media_phash_pairs precedent). Prefix
        # every token with its replica index: replica vocabularies are
        # disjoint, so within-replica near-dup structure (the planted
        # duplicates) is preserved per replica and TRUE pairs scale
        # linearly — the regime the prefix filter is designed for.
        if _span1x["documents"] is None:
            _span1x["documents"] = int(
                do1.agg(F.max("doc_id")).first()[0]
            ) + 1
        rep = F.floor(F.col("doc_id") / F.lit(_span1x["documents"]))
        tag = F.concat(F.lit("r"), rep.cast("string"), F.lit("_"))
        tagged = F.when(
            F.col("text").isNotNull(),
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(tag, t),
                ),
            ),
        )
        return do.select("doc_id", tagged.alias("text"))

    def jaccard_prefix_shape(do):
        from hobbes_spark.functions.dedup import jaccard_join_prefix

        return jaccard_join_prefix(_replica_tagged(do), "doc_id", "text", 0.9)

    def simhash_shape(do):
        from hobbes_spark.functions.dedup import simhash60

        return do.select("doc_id", simhash60(F.col("text")).alias("fp"))

    def neardup_exact_shape(emb):
        # the exact twin is O(n^2) BY CONTRACT (the verification
        # baseline) — the sweep entry pins the Arrow kernel's CONSTANT,
        # not linearity: expect ratio ~ N^2/parallelism, and read it
        # together with pairs-scored/sec (flat = the kernel scales)
        from hobbes_spark.functions.dedup import embedding_neardup_exact

        return embedding_neardup_exact(emb, threshold=0.35)

    def curation_one_pass_shape(do):
        # the r14 prepare_corpus one-pass gate+decontamination stream
        # (repetition gates + dirty flag from ONE scan), minus pack —
        # pack_documents has its own sweep row
        from hobbes_spark.functions.curation import _gram_hashes
        from hobbes_spark.functions.dedup import chained_window_hashes
        from hobbes_spark.functions.text import tokens

        ev = do.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
        evg = F.broadcast(_gram_hashes(ev, "text", 8, []).distinct())
        tr = do.filter(F.col("doc_id") % 20 != 0).select("doc_id", "text")
        s2 = tr.select(
            "doc_id", tokens(F.lower(F.col("text"))).alias("__tk")
        ).select(
            "doc_id", F.transform("__tk", lambda t: F.xxhash64(t)).alias("__th")
        )
        th = F.col("__th")
        sz = F.size(th)
        dup = F.when(sz > 0, 1 - F.size(F.array_distinct(th)) / sz).otherwise(
            F.lit(0.0)
        )
        stream = F.concat(
            F.transform(
                chained_window_hashes(th, 2),
                lambda h: F.struct(F.lit(0).alias("k"), h.alias("h")),
            ),
            F.transform(
                chained_window_hashes(th, 8),
                lambda h: F.struct(F.lit(1).alias("k"), h.alias("h")),
            ),
        )
        ex = s2.select(
            "doc_id", sz.cast("bigint").alias("tc"), dup.alias("__dup"),
            F.explode_outer(stream).alias("__e"),
        )
        probed = ex.join(
            evg,
            (F.col("__e.k") == 1) & (F.col("__e.h") == F.col("gram_hash")),
            "left",
        ).filter(
            F.col("__e").isNull()
            | (F.col("__e.k") == 0)
            | F.col("gram_hash").isNotNull()
        )
        counts = probed.groupBy(
            "doc_id", F.col("__e.k").alias("__k"), F.col("__e.h").alias("__h")
        ).agg(
            F.count(F.lit(1)).alias("__c"),
            F.first("tc").alias("tc"),
            F.first("__dup").alias("__dup"),
        )
        per_doc = counts.groupBy("doc_id").agg(
            F.first("tc").alias("tc"),
            F.first("__dup").alias("__dup"),
            F.max(F.when(F.col("__k") == 0, F.col("__c"))).alias("__top"),
            F.sum(F.when(F.col("__k") == 0, F.col("__c"))).alias("__nb"),
            F.max(F.col("__k") == 1).alias("__dirty"),
        )
        top = F.coalesce(F.col("__top") / F.col("__nb"), F.lit(0.0))
        return per_doc.filter(
            (F.col("__dup") <= 0.8) & (top <= 0.18)
            & ~F.coalesce(F.col("__dirty"), F.lit(False))
        ).select("doc_id", "tc")

    cases.update(
        {
            "jaccard_prefix_join": (jaccard_prefix_shape, do1, "documents"),
            "simhash_fingerprint": (simhash_shape, do1, "documents"),
            "neardup_exact_arrow": (neardup_exact_shape, em1, "embeddings"),
            "curation_one_pass": (curation_one_pass_shape, do1, "documents"),
        }
    )

    cases.update(
        {
            "html_meta_extract": (html_meta_shape, do1, "documents"),
            "outlink_domain_mix": (outlink_domains_shape, do1, "documents"),
            "outlink_domain_mix_case": (
                outlink_domains_case_shape, do1, "documents"),
            "robots_decision": (robots_shape, do1, "documents"),
            "warc_record_parse": (warc_parse_shape, do1, "documents"),
            "pdf_text_parse": (pdf_parse_shape, do1, "documents"),
            "byte_bpe_encode": (byte_bpe_shape, do1, "documents"),
            "substring_dup_spans": (substring_spans_shape, do1, "documents"),
            "cdx_selective_access": (cdx_selective_shape, do1, "documents"),
        }
    )

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    only = set(sys.argv[3:])
    # Shapes whose single-measurement ratio reaches this fraction of the
    # linear bound get an automatic STEADY-STATE re-measure (best-of-3
    # per side) recorded NEXT TO the raw number — so a one-time warmup
    # artifact (Arrow dictionary build, codegen, shuffle-file creation)
    # is pinned in the artifact itself instead of explained away in
    # prose (round-8 item 4: bpe_encode's 6.6 at 16x is ~2 steady).
    # The exit criterion for linearity is ratio_steady when present.
    # 0.25 (= ratio 4 at 16x) catches the shapes the round-7 verdict
    # flagged (bpe_encode measured 4.9 in-sweep, 1.2 isolated).
    steady_frac = float(os.environ.get("HOBBES_SCALE_STEADY_FRAC", "0.25"))
    results = {}
    for name, (fn, small, big) in cases.items():
        if only and name not in only:
            continue
        # warm EACH scale's own plan before timing it: operators that
        # size themselves to the data (pack_documents shard count, LSH
        # band bits) compile a different plan at 16x than at 1x, so
        # warming only the small side would bill one-time codegen to
        # the big measurement and overstate the ratio
        big_df = bigN(big)  # lazy: first selected case builds the table
        run(fn(small))
        t0 = time.perf_counter(); run(fn(small)); t_small = time.perf_counter() - t0
        run(fn(big_df))
        t0 = time.perf_counter(); run(fn(big_df)); t_big = time.perf_counter() - t0
        results[name] = {
            "t_1x_sec": round(t_small, 2),
            f"t_{n}x_sec": round(t_big, 2),
            "ratio": round(t_big / max(t_small, 1e-9), 1),
            "linear_bound": n,
        }
        if t_big / max(t_small, 1e-9) >= steady_frac * n:
            smalls, bigs = [t_small], [t_big]
            for _ in range(2):
                t0 = time.perf_counter(); run(fn(small))
                smalls.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); run(fn(big_df))
                bigs.append(time.perf_counter() - t0)
            s_best, b_best = min(smalls), min(bigs)
            results[name].update(
                t_1x_steady_sec=round(s_best, 2),
                **{f"t_{n}x_steady_sec": round(b_best, 2)},
                ratio_steady=round(b_best / max(s_best, 1e-9), 1),
            )
        print(json.dumps({name: results[name]}), flush=True)

    # ------------------------------------------------------------- #
    # ANN recall gate (round 10, r9 verdict item 6): the LSH/IVF/PQ
    # paths are correctness-pinned by fixtures, but their RECALL was
    # only implied. Measure recall@10 of each approximate method
    # against the exact cosine baseline on the SCALED corpus, record
    # the full probe-count/recall ladder in the artifact, and gate the
    # documented rungs at floors calibrated on this synthetic corpus.
    #
    # Two conditions, because id-offset scaling DUPLICATES vectors:
    #
    # * "structure" (1x corpus): the honest tradeoff curve. The
    #   driver-generated embeddings are near-random (pairwise cos ~
    #   N(0, 0.125) at 64 dims) — adversarial for ANN, since
    #   near-uniform similarities leave little bucket/cell structure
    #   to exploit; real text/image embeddings cluster and every
    #   method's recall rises with structure. Floors here are
    #   REGRESSION floors (a broken candidate generator craters to ~0
    #   and screams), set at roughly half the values measured at sf0.1
    #   (lsh_r2 0.22, ivf_np4 0.62, np8 0.87, np12 0.97, ivf_pq 0.65,
    #   pq_adc 0.68); they are not production quality targets.
    # * "dup_routing" (Nx corpus): every vector appears N times, so
    #   each query's exact top-10 is copies of ITSELF — recall measures
    #   whether candidate ROUTING still lands identical vectors in the
    #   probed bucket/cell at scale (trivially ~1.0 when healthy, ~0
    #   when hashing/probing breaks under the bigger corpus). Floors
    #   0.7-0.8.
    #
    # Raise recall via the ladder: LSH probe_radius (probes ~
    # C(planes, r)), IVF nprobe (cells scanned), PQ-ADC -> exact rerank
    # of the ADC top-N.
    # ------------------------------------------------------------- #
    recall_gate_failed = False
    if not only or "ann_recall" in only:
        from hobbes_spark.functions.similarity import (
            cosine_topk, ivf_pq_topk, ivf_topk, lsh_bucket_topk,
            pq_adc_topk, pq_codebooks, pq_encode,
        )

        rq = em1.filter(
            (F.col("vec_id") < 10) & F.col("embedding").isNotNull()
        )

        def _pq_rerank(emb_, rq_, enc_, books_, shortlist=40, k=10):
            from hobbes_spark.functions.similarity import _topk, cosine

            short = pq_adc_topk(enc_, rq_, books_, k=shortlist).select(
                "query_id", "neighbor_id"
            )
            qv = rq_.select(F.col("vec_id").alias("query_id"),
                            F.col("embedding").alias("__qv"))
            cv = emb_.select(F.col("vec_id").alias("neighbor_id"),
                             F.col("embedding").alias("__cv"))
            scored = (
                short.join(F.broadcast(qv), "query_id")
                .join(cv, "neighbor_id")
                .select("query_id", "neighbor_id",
                        cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
            )
            return _topk(scored, k)

        def pairset(df):
            return {
                (r["query_id"], r["neighbor_id"])
                for r in df.select("query_id", "neighbor_id").collect()
            }

        conditions = {
            "structure_1x": (
                em1.filter(F.col("embedding").isNotNull()),
                {"lsh_p8_r2": 0.10, "ivf_16_np4": 0.35,
                 "ivf_16_np8": 0.60, "ivf_16_np12": 0.80,
                 "ivf_pq_16_np8": 0.40, "pq_adc_m8": 0.40,
                 "pq_adc_rerank40": 0.60},
            ),
            f"dup_routing_{n}x": (
                bigN("embeddings").filter(F.col("embedding").isNotNull()),
                {"lsh_p8_r2": 0.80, "ivf_16_np4": 0.80,
                 "ivf_16_np8": 0.80, "ivf_16_np12": 0.80,
                 "ivf_pq_16_np8": 0.70, "pq_adc_m8": 0.70,
                 "pq_adc_rerank40": 0.70},
            ),
        }
        recall_out = {}
        for cond, (emb, floors) in conditions.items():
            exact = pairset(cosine_topk(emb, rq, k=10))
            books = pq_codebooks(emb)
            enc = pq_encode(emb, books)
            ladder = {
                "lsh_p8_r0": lambda: lsh_bucket_topk(
                    emb, rq, k=10, planes=8, probe_radius=0),
                "lsh_p8_r1": lambda: lsh_bucket_topk(
                    emb, rq, k=10, planes=8, probe_radius=1),
                "lsh_p8_r2": lambda: lsh_bucket_topk(
                    emb, rq, k=10, planes=8, probe_radius=2),
                "ivf_16_np2": lambda: ivf_topk(
                    emb, rq, k=10, nlist=16, nprobe=2),
                "ivf_16_np4": lambda: ivf_topk(
                    emb, rq, k=10, nlist=16, nprobe=4),
                "ivf_16_np8": lambda: ivf_topk(
                    emb, rq, k=10, nlist=16, nprobe=8),
                "ivf_16_np12": lambda: ivf_topk(
                    emb, rq, k=10, nlist=16, nprobe=12),
                "ivf_pq_16_np8": lambda: ivf_pq_topk(
                    emb, rq, k=10, nlist=16, nprobe=8),
                "pq_adc_m8": lambda: pq_adc_topk(enc, rq, books, k=10),
                # the rerank tail: ADC shortlists 40, ONLY those rows'
                # raw floats are fetched for the exact top-10 — lifts
                # ADC recall 0.68 -> 0.90 at sf0.1 for 40 float
                # fetches/query (the pq_rerank_topk catalog shape)
                "pq_adc_rerank40": lambda: _pq_rerank(emb, rq, enc, books),
            }
            rung_out = {}
            for rname, thunk in ladder.items():
                got = pairset(thunk())
                r = round(len(got & exact) / max(len(exact), 1), 3)
                floor = floors.get(rname)
                rung_out[rname] = {"recall_at_10": r, "floor": floor}
                if floor is not None:
                    passed = r >= floor
                    rung_out[rname]["pass"] = passed
                    recall_gate_failed |= not passed
                    print(
                        f"RECALLGATE {cond} {rname} recall@10={r} "
                        f"floor={floor} {'PASS' if passed else 'FAIL'}",
                        flush=True,
                    )
                else:
                    print(
                        f"RECALLGATE {cond} {rname} recall@10={r} "
                        "(ladder point, no floor)",
                        flush=True,
                    )
            recall_out[cond] = rung_out
        results["ann_recall"] = {
            "n_queries": 10, "k": 10, "corpus_multiplier": n,
            "conditions": recall_out,
        }

    rows = {t: df.count() for t, df in sorted(_big.items())}
    print(json.dumps({"multiplier": n, "scaled_rows": rows, "results": results}))
    if recall_gate_failed:
        raise SystemExit("RECALLGATE: at least one method below its floor")


if __name__ == "__main__":
    main()
