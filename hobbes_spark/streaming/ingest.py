"""Streaming near-duplicate ingest: MinHash signatures and LSH pairs
maintained incrementally as documents arrive.

The batch operators already split the work the right way
(:func:`hobbes_spark.functions.dedup.minhash_incremental_pairs`): a new
shard only shingles ITSELF and joins against the persisted signature
store — the corpus is never re-shingled, never re-paired. This module
turns that into a continuous pipeline with ``foreachBatch``:

    microbatch of documents
      → MinHash signatures (computed once)
      → incremental LSH pairs vs the signature store so far
      → append pairs    to  <store>/pairs/_batch_id=N/
      → append sigs     to  <store>/signatures/_batch_id=N/

Exactly-once: both writes are keyed by ``_batch_id`` with dynamic
partition overwrite (same recipe as ``streaming/sinks.py``), and the
"store so far" read **filters ``_batch_id < N``** — a replayed batch
sees exactly the store state of its first attempt, rewrites exactly its
own two partitions, and cannot pair against its own half-written
output. Union of all pair partitions after any number of replays ==
``minhash_pairs`` over everything ingested (asserted in tests).

State lives in parquet, not executor memory: restarts are free, the
store is directly queryable, and its size is docs × num_hashes longs —
the signature table IS the checkpointed state, which is why this scales
where an in-memory stateful operator would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "minhash_ingest_writer",
    "start_minhash_ingest",
    "read_signature_store",
    "hll_ingest_writer",
    "start_hll_ingest",
    "cms_ingest_writer",
    "start_cms_ingest",
    "cms_store_sketch",
]


def _sig_schema(id_type: T.DataType, hash_fn: str = "xxhash64") -> T.StructType:
    # md5 signatures are hex STRINGS, xxhash64 signatures are longs —
    # an empty base typed with the wrong element type poisons the
    # union inside the incremental join with a bigint cast
    elem = T.StringType() if hash_fn == "md5" else T.LongType()
    return T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("sig", T.ArrayType(elem)),
        ]
    )


def read_signature_store(
    spark: SparkSession, store_dir: str, before_batch: int | None = None
) -> DataFrame | None:
    """Signatures ingested so far (optionally only strictly before a
    batch id — the replay-safety filter). None if the store is empty."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(f"{store_dir}/signatures")
    except AnalysisException as e:
        # ONLY the first-batch missing-directory case may mean "empty
        # base". Any other failure (transient FS error, corrupt footer,
        # permissions) must raise: treating it as an empty corpus would
        # silently drop every new-vs-base pair for this batch, and the
        # checkpoint would commit the loss permanently.
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    if before_batch is not None:
        df = df.filter(F.col("_batch_id") < before_batch)
    return df.select("id", "sig")


def _check_store_meta(
    spark: SparkSession, store_dir: str, params: "dict[str, object]"
) -> None:
    """Pin the signature-store parameters on first write; refuse to mix.

    Signatures are only comparable when (num_hashes, hash_fn, k, bands)
    match: restarting the ingest with different parameters would silently
    interleave incompatible signature widths/hash families in
    ``<store>/signatures`` and every subsequent banding pass against the
    mixed base would emit garbage pairs. The metadata row is written
    through Spark (mode=ignore ⇒ first writer wins), so any filesystem
    the store itself lives on works — no local-FS assumption."""
    meta_path = f"{store_dir}/_meta"
    pinned = [(k, str(v)) for k, v in sorted(params.items())]
    from pyspark.errors import AnalysisException

    try:
        existing = {
            r["key"]: r["value"] for r in spark.read.json(meta_path).collect()
        }
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        existing = None
    if existing is None:
        (
            spark.createDataFrame(pinned, "key string, value string")
            .coalesce(1)
            .write.mode("ignore")
            .json(meta_path)
        )
        return
    mismatches = {
        k: (existing.get(k), v) for k, v in pinned if existing.get(k) != v
    }
    if mismatches:
        raise ValueError(
            f"ingest store {store_dir!r} was created with different "
            f"parameters; refusing to mix incompatible sketch/signature "
            f"state (stored vs requested): {mismatches}"
        )


def _assert_batch_monotonic(
    spark: SparkSession, store_dir: str, table: str, batch_id: int
) -> None:
    """Refuse a batch id that would REWIND the store. Micro-batch
    semantics only ever legitimately replay the LAST (possibly
    uncommitted) batch, so an incoming id strictly below the store's
    max means the query is running a FRESH checkpoint against an
    existing store: its epoch counter restarted at 0, its
    ``_batch_id < N`` base reads would hide the whole existing corpus,
    and its dynamic overwrites would silently clobber old partitions —
    permanent data loss with no error. Partition-column-only read (no
    row data); callers invoke this once per query run."""
    from pyspark.errors import AnalysisException

    try:
        row = (
            spark.read.parquet(f"{store_dir}/{table}")
            .agg(F.max("_batch_id").alias("m"))
            .first()
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return
        raise
    max_seen = row["m"] if row else None
    if max_seen is not None and batch_id < max_seen:
        raise ValueError(
            f"ingest store {store_dir!r} already holds batches up to "
            f"{max_seen} but this query is at batch {batch_id} — it is "
            "running a NEW checkpoint against an OLD store, which would "
            "hide the existing base and overwrite its partitions. Point "
            "the query at its original checkpoint, or start a fresh "
            "store directory."
        )


def minhash_ingest_writer(
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    k: int = 3,
    broadcast_new: bool = True,
):
    """``foreachBatch`` function implementing one ingest step; see the
    module docstring for the layout and the exactly-once argument.

    Document identity is FIRST-WRITE-WINS: a ``id_col`` value that was
    already ingested in an earlier batch is dropped from the new side
    (its signature is not rewritten and no new pairs are emitted for
    it) — the incremental join's base/new-disjointness precondition
    would otherwise be violated and every later batch would fan its
    pairs out across duplicate signature rows. Re-ingesting an UPDATED
    document therefore requires a fresh store (or an upstream
    tombstone pass); same-batch replays are unaffected."""
    from hobbes_spark.functions.dedup import (
        minhash_incremental_pairs,
        minhash_signatures_df,
    )

    run_state = {"validated": False}

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not run_state["validated"]:
            # once per query run: parameters and store identity cannot
            # change for the lifetime of the query, so re-reading _meta
            # and the partition listing per microbatch is pure overhead
            _check_store_meta(
                spark,
                store_dir,
                {"num_hashes": num_hashes, "hash_fn": hash_fn, "k": k,
                 "bands": bands},
            )
            _assert_batch_monotonic(spark, store_dir, "signatures", batch_id)
            run_state["validated"] = True
        new_sigs = minhash_signatures_df(
            batch_df, id_col, text_col, num_hashes, hash_fn, k
        )
        base = read_signature_store(spark, store_dir, before_batch=batch_id)
        if base is None:
            base = spark.createDataFrame(
                [], _sig_schema(batch_df.schema[id_col].dataType, hash_fn)
            )
        # first-write-wins (docstring): ids already in the base never
        # re-enter the new side
        new_sigs = new_sigs.join(
            base.select("id"), "id", "left_anti"
        ).localCheckpoint()  # three consumers: banding, estimate, store write
        pairs = minhash_incremental_pairs(
            batch_df,
            base,
            id_col,
            text_col,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            hash_fn=hash_fn,
            k=k,
            broadcast_new=broadcast_new,
            new_sigs=new_sigs,
        )
        for sub, df in (("pairs", pairs), ("signatures", new_sigs)):
            (
                df.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{store_dir}/{sub}")
            )

    return write


def start_minhash_ingest(
    stream_docs: DataFrame,
    store_dir: str,
    checkpoint: str,
    available_now: bool = True,
    **writer_kwargs,
):
    """Run the ingest over a streaming document DataFrame.
    ``available_now=True`` drains the backlog and stops (backfill);
    ``False`` keeps consuming. Pairs land under ``<store>/pairs``,
    signatures under ``<store>/signatures``."""
    writer = minhash_ingest_writer(store_dir, **writer_kwargs)
    builder = stream_docs.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        builder = builder.trigger(availableNow=True)
    return builder.start()


def hll_ingest_writer(
    store_dir: str,
    keys: "list[str]",
    col: str,
    lgk: int = 12,
):
    """``foreachBatch`` step maintaining a mergeable HLL sketch table:
    each microbatch appends one sketch row per group under its
    ``_batch_id`` partition (dynamic overwrite ⇒ replay-idempotent —
    and unlike the MinHash ingest, no read-back is needed at all:
    sketches merge at ROLLUP time, so the write path is stateless).
    Distinct-count rollups over any batch range then read the store
    and merge (functions.sketches.hll_rollup_estimate); merging daily
    parts is byte-identical to sketching the union, so streaming
    ingestion loses nothing versus a batch rebuild.

    ``lgk`` (and the key/column layout) is pinned in ``<store>/_meta``
    on first write, like the MinHash/CMS stores: a restart with a
    different ``lgk`` would append sketches ``hll_union_agg`` refuses
    to merge, silently mixing incompatible state until the first
    rollup spanning the change blows up."""
    from hobbes_spark.functions.sketches import hll_group_sketches

    run_state = {"validated": False}

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if not run_state["validated"]:
            _check_store_meta(
                batch_df.sparkSession,
                store_dir,
                {"kind": "hll", "keys": ",".join(keys), "col": col, "lgk": lgk},
            )
            _assert_batch_monotonic(
                batch_df.sparkSession, store_dir, "sketches", batch_id
            )
            run_state["validated"] = True
        (
            hll_group_sketches(batch_df, keys, col, lgk)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(f"{store_dir}/sketches")
        )

    return write


def start_hll_ingest(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint: str,
    keys: "list[str]",
    col: str,
    lgk: int = 12,
    available_now: bool = True,
):
    """Run the sketch ingest over a stream; see :func:`hll_ingest_writer`."""
    writer = hll_ingest_writer(store_dir, keys, col, lgk)
    builder = stream_df.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        builder = builder.trigger(availableNow=True)
    return builder.start()


def cms_ingest_writer(
    store_dir: str,
    col: str,
    depth: int = 4,
    width: int = 4096,
    hash_fn: str = "xxhash64",
):
    """``foreachBatch`` step maintaining a mergeable count-min sketch
    store: each microbatch writes its own (d, pos, cnt) cell table under
    its ``_batch_id`` partition (dynamic overwrite ⇒ replay-idempotent;
    stateless write path, same recipe as the HLL ingest). Frequency /
    heavy-hitter rollups over any batch range read the store and
    cell-sum (functions.sketches.cms_merge semantics) — summing per-batch
    cells is exactly the sketch of the union, so streaming ingestion
    loses nothing versus a batch rebuild. Parameters are pinned via the
    store _meta (mixed depth/width cells would silently mis-bucket)."""
    from hobbes_spark.functions.sketches import cms_build

    run_state = {"validated": False}

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if not run_state["validated"]:
            _check_store_meta(
                batch_df.sparkSession,
                store_dir,
                {"kind": "cms", "depth": depth, "width": width,
                 "hash_fn": hash_fn},
            )
            _assert_batch_monotonic(
                batch_df.sparkSession, store_dir, "cells", batch_id
            )
            run_state["validated"] = True
        (
            cms_build(batch_df, col, depth, width, hash_fn)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(f"{store_dir}/cells")
        )

    return write


def start_cms_ingest(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint: str,
    col: str,
    depth: int = 4,
    width: int = 4096,
    hash_fn: str = "xxhash64",
    available_now: bool = True,
):
    """Run the count-min ingest over a stream; see :func:`cms_ingest_writer`."""
    writer = cms_ingest_writer(store_dir, col, depth, width, hash_fn)
    builder = stream_df.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        builder = builder.trigger(availableNow=True)
    return builder.start()


def cms_store_sketch(spark: SparkSession, store_dir: str) -> DataFrame:
    """The merged (d, pos, cnt) sketch over every ingested batch —
    feed it to functions.sketches.cms_estimate / downstream rollups."""
    return (
        spark.read.parquet(f"{store_dir}/cells")
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
