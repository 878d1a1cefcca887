"""Bloom-prefiltered semi/anti joins — exact results, probabilistic
pruning.

The 100 TB decontamination problem: remove from a huge corpus every row
whose key appears in a filter set that is itself too large to broadcast
as an equi-join hash table everywhere, while the corpus is far too large
to shuffle in full. The classic answer (e.g. the runtime row-group
filters modern engines inject into joins) is a Bloom filter: build a
fixed-size bitmap over the filter set's keys, ship that one small
bitmap to every task, and let it split the corpus map-side into

* **definitely absent** — the overwhelming majority; they bypass the
  join entirely (anti-join keeps them, semi-join drops them), and
* **maybe present** — true matches plus a tunable false-positive
  fraction; only these enter the exact equi-join that makes the final
  result EXACT.

So the shuffle volume of the exact join drops from |corpus| to
|matches| + fpp·|corpus|, while the answer stays byte-identical to the
plain join (oracled as such).

Spark keeps its built-in ``BloomFilterAggregate`` internal (not in the
public function registry), so the bitmap here is built from public
primitives:

    keys → k probe positions (seeded xxhash64, pmod num_bits)
         → (word index, bit mask) pairs
         → groupBy(word) bit_or(mask)            -- one tiny shuffle
         → dense array<bigint> bitmap (one row; the set-word rows — the
           sketch, never the data — are laid out via the driver, exactly
           as built-in bloom-join runtime filters do)
         → broadcast-crossJoin onto the probe side, pure expression test

Everything is JVM expressions inside whole-stage codegen; no UDFs, no
collect. Sizing: ~10 bits/key gives fpp ≈ 1% with k=4 (m/n=10 optimum
k = 0.7·m/n ≈ 7, but 4 keeps probe cost low at <2% fpp); the default
2^23 bits = 1 MiB handles ~1M keys. The bitmap broadcast is one row of
``num_bits/64`` longs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_might_contain", "bloom_semi_join", "bloom_anti_join"]


def _probe_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """Bit positions key sets/tests: seeded rehashes of one base hash.

    Hash the key ONCE, derive the k probes by rehashing the 64-bit base
    with the seed (same trick as MinHash's per-seed hashes): per-probe
    work is an 8-byte hash, not a re-hash of the full key.
    """
    base = F.xxhash64(key)
    return [
        F.pmod(F.xxhash64(F.lit(i), base), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> DataFrame:
    """ONE-ROW DataFrame ``(bf: array<bigint>)`` — the Bloom bitmap over
    ``keys[key_col]`` (NULL keys contribute nothing).

    One tiny aggregation — explode each key to its probe words, bit_or
    per word (map-side combine collapses repeats before the shuffle, at
    most ``num_bits/64`` rows survive) — then the surviving (word,
    bits) rows are collected and laid into the dense array on the
    driver. Collecting here is deliberate and scale-safe: it is the
    SKETCH (≤ ``num_bits/64`` longs, e.g. 128 KiB at 2^23 bits), never
    the data, and it is exactly what engines' built-in bloom-join
    runtime filters do before re-broadcasting. The expression-only
    densification this replaced (per-position lookup into a word→bits
    map) was O(words²) inside one row — 50+ seconds at 2^22 bits.
    """
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    # Fail FAST, not at collect time: the bitmap lives on the driver and
    # is re-broadcast, so its size is a hard design bound, not a knob to
    # crank with the corpus. 2^28 bits = 32 MiB (4M longs) already
    # supports ~19M keys at 1% FPR; beyond that, shard the key space
    # into several filters instead of OOMing the driver at 100 TB.
    if num_bits > (1 << 28):
        raise ValueError(
            f"bloom_build: num_bits={num_bits} exceeds the 2^28 driver "
            "bitmap cap (32 MiB); shard the key space into multiple "
            "filters instead"
        )
    n_words = num_bits // 64
    pos = _probe_positions(F.col(key_col), num_bits, num_hashes)
    probes = keys.filter(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*pos)).alias("p")
    )
    # shiftleft via expr: the PySpark wrapper only takes a literal int
    # shift amount, the SQL function takes expressions for both args
    words = probes.select(
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
    ).groupBy("w").agg(F.bit_or("m").alias("bits"))
    bitmap = [0] * n_words
    for row in words.collect():
        bitmap[row["w"]] = row["bits"]
    spark = keys.sparkSession
    return spark.createDataFrame([(bitmap,)], "bf: array<bigint>")


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
    out_col: str = "__maybe",
) -> DataFrame:
    """Attach ``out_col``: true iff every probe bit for ``key_col`` is
    set in the bitmap (no false negatives; false positives at the
    configured rate). The one-row bitmap rides a broadcast cross join —
    every task gets the array once, the test is a pure expression."""
    pos = _probe_positions(F.col(key_col), num_bits, num_hashes)
    # column-valued shift amounts need the SQL function (the PySpark
    # shiftright wrapper only takes a literal int), so the probe array
    # becomes a named column the expr can reference
    test = F.expr(
        "forall(transform(__pp, p -> "
        "(shiftright(element_at(__bf, CAST(p DIV 64 AS INT) + 1), "
        "CAST(p % 64 AS INT)) & 1) = 1), x -> x)"
    )
    return (
        df.crossJoin(F.broadcast(bloom.select(F.col("bf").alias("__bf"))))
        .withColumn("__pp", F.array(*pos))
        .withColumn(out_col, F.col(key_col).isNotNull() & test)
        .drop("__bf", "__pp")
    )


def _bloom_split(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_bits: int,
    num_hashes: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(definitely-absent rows, maybe rows, right keys) split of left.

    The two sides' key types must be identical: ``xxhash64`` hashes the
    BYTES of the value, so int-vs-bigint (or any width-differing pair)
    hash the same logical key to different probe positions — the Bloom
    filter then reports false NEGATIVES, which the exact join afterwards
    can never repair (the plain join would coerce and match). Raising
    here is the only behavior that keeps the documented byte-identity
    with a plain semi/anti join."""
    ltype = dict(left.dtypes).get(on)
    rtype = dict(right.dtypes).get(on)
    if ltype != rtype:
        raise ValueError(
            f"bloom join key {on!r} type mismatch: left={ltype} right={rtype}; "
            "cast both sides to a common type before the bloom join "
            "(xxhash64 is width-sensitive, a mismatch causes false negatives)"
        )
    rkeys = right.select(F.col(on)).distinct()
    bf = bloom_build(rkeys, on, num_bits, num_hashes)
    tagged = bloom_might_contain(left, bf, on, num_bits, num_hashes)
    no = tagged.filter(~F.col("__maybe") | F.col(on).isNull()).drop("__maybe")
    maybe = tagged.filter(F.col("__maybe") & F.col(on).isNotNull()).drop("__maybe")
    return no, maybe, rkeys


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> DataFrame:
    """EXACT ``left SEMI JOIN right ON on`` with a Bloom prefilter:
    definitely-absent left rows never reach the join; only the maybe
    fraction shuffles, and the exact semi join removes the false
    positives."""
    _, maybe, rkeys = _bloom_split(left, right, on, num_bits, num_hashes)
    return maybe.join(rkeys, on, "left_semi")


def bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> DataFrame:
    """EXACT ``left ANTI JOIN right ON on`` (the decontamination shape):
    definitely-absent rows are kept outright (union, no shuffle); the
    maybe fraction goes through the exact anti join, which strips the
    true matches and readmits the false positives. NULL-key rows are
    kept, matching SQL LEFT ANTI semantics (NULL never equals)."""
    no, maybe, rkeys = _bloom_split(left, right, on, num_bits, num_hashes)
    return no.unionByName(maybe.join(rkeys, on, "left_anti"))
