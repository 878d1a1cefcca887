"""Streaming deduplication: the LLM-pipeline dedup operators applied to
unbounded input.

* :func:`stream_exact_dedup` — drop exact duplicates across microbatches
  with bounded state: ``dropDuplicatesWithinWatermark`` keeps each key
  only until the watermark passes it, so state size is O(arrival rate x
  watermark horizon) instead of O(stream length).
* :func:`stream_fingerprint_dedup` — same, but keyed on the normalized
  text fingerprint (``functions.text.fingerprint``), the streaming form
  of :func:`hobbes_spark.functions.dedup.exact_dedup`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from hobbes_spark.functions.text import fingerprint

__all__ = ["stream_exact_dedup", "stream_fingerprint_dedup"]


def stream_exact_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Keep the first row per key seen within the watermark horizon.

    A duplicate arriving within ``watermark`` of the original is
    dropped; one arriving later is treated as new (its state has been
    evicted) — the standard bounded-state contract.

    Pinned fine print (tests/test_streaming.py::
    test_stream_dedup_watermark_eviction_both_sides):

    * the operator does NOT watermark-filter its INPUT — it must see
      late rows to drop late duplicates — so a late-arriving NEW key
      is emitted, unlike an aggregation window which would discard it;
    * state removal applies the batch's watermark at batch END, so a
      re-delivery landing in the same micro-batch whose watermark
      crosses the key's expiry is still matched and dropped; eviction
      becomes observable from the NEXT micro-batch on;
    * keys with no beyond-horizon re-delivery agree exactly with the
      batch first-arrival (min event time per key) oracle.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_fingerprint_dedup(
    stream: DataFrame,
    text_col: str,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact-content dedup on a document stream: normalize-and-hash the
    text (casefold + whitespace collapse + md5, identical to the batch
    ``exact_dedup`` key) and keep the first arrival per fingerprint
    within the watermark horizon."""
    from pyspark.sql import functions as F

    # NULL text hashes to NULL, and dropDuplicatesWithinWatermark treats
    # NULL keys as equal — distinct NULL-text rows would silently
    # collapse to one. They are not duplicates of each other, so they
    # bypass the dedup entirely.
    fp = stream.withColumn("__fp", fingerprint(text_col))
    deduped = (
        fp.filter(F.col("__fp").isNotNull())
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
    )
    passthrough = fp.filter(F.col("__fp").isNull())
    return deduped.unionByName(passthrough).drop("__fp")
