"""Task-retry determinism gate (r8 verdict item 2).

Spark re-executes failed (and speculated) tasks; a recomputed attempt
that produces DIFFERENT rows than the first attempt silently corrupts
results at cluster scale — the classic victims are arbitrary tie-breaks
(group-by-maxby "one arbitrary row", SURVEY §2.4), iterative init
(k-means), and anything that leans on partition-internal row order
(systematic samplers, keep-best canonical picks).

This gate runs the flagship tie-sensitive catalog queries twice:

* CLEAN:  unmodified, on a fresh ``local[8, 3]`` session
  (``maxFailures=3`` — plain ``local[8]`` never retries, which is why
  this cannot live inside the shared pytest session and runs as its own
  process).
* CHAOS:  with every table scan wrapped in a ``mapInPandas`` stage that
  (a) RAISES on ``TaskContext.attemptNumber() == 0`` — every task of
  the scan stage really fails once and is re-executed by Spark's retry
  machinery — and (b) on the retried attempt yields the partition's
  rows in REVERSED order.  The reversal is the sharp edge: a retried
  attempt is allowed to see rows in a different order than the attempt
  it replaced (different spill merge order, different upstream fetch
  interleaving on a real cluster), so any query whose values depend on
  that order diverges here.

The gate asserts the CHAOS snapshot (sorted stringified rows, same
normalization as tools/gate_check.py) is byte-identical to CLEAN.

Usage: python tools/retry_gate.py [sf_dir] [query ...]
Exit 0 = all identical; prints one "RETRYGATE <name> PASS|FAIL" line
per query (leading newline so Spark's \r progress fragments can't glue
to it).
"""

from __future__ import annotations

import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# The flagship tie-sensitive shapes named by the r8 verdict.
DEFAULT_TARGETS = [
    "group_maxby",          # whole-row maxby: the §2.4 "arbitrary row" fold
    "flowerpot",            # maxby + regex/int derive golden pipeline
    "kmeans_clusters",      # iterative init + assignment ties
    "weighted_sample_docs", # systematic sampler over hash order
    "dedup_keep_best",      # canonical keep-best pick within dup clusters
]


def _chaos_wrap(df):
    """Wrap a DataFrame so every scan task fails once, then replays its
    rows reversed on the retried attempt (see module docstring)."""
    schema = df.schema

    def fn(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None and tc.attemptNumber() == 0:
            raise RuntimeError(
                "retry-gate: injected transient failure (attempt 0)"
            )
        pdfs = list(batches)
        for pdf in reversed(pdfs):
            yield pdf.iloc[::-1]

    return df.mapInPandas(fn, schema=schema)


def _cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    return str(v)


def _snapshot(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)
    )
    return cols, rows


def main():
    args = sys.argv[1:]
    if args and not args[0].startswith("--") and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    else:
        sf_dir = os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
        )
    targets = args or DEFAULT_TARGETS

    from hobbes_spark.pipeline import Pipeline
    from hobbes_spark.session import get_spark

    # local[8, 3]: 8 threads, tasks retried up to 3 attempts — the ONLY
    # local master that exercises the retry scheduler path.
    spark = get_spark("retry_gate", master="local[8, 3]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from hobbes_spark.queries import QUERIES

    unknown = [t for t in targets if t not in QUERIES]
    if unknown:
        raise SystemExit(f"RETRYGATE: unknown query names {unknown}")

    orig_from_parquet = Pipeline.from_parquet.__func__

    def chaotic_from_parquet(cls, spark_, path):
        p = orig_from_parquet(cls, spark_, path)
        return cls(
            _chaos_wrap(p.df),
            key_cols=p.key_cols,
            order=p.order,
            lineage=p.lineage,
        )

    # Negative control: PROVE the harness detects order-sensitivity.
    # ``F.first`` with no ordering is exactly the bug class this gate
    # hunts (its value is whatever row arrives first); under the chaos
    # wrapper the retried attempt streams rows reversed, so the control
    # MUST diverge from its clean run — if it matches, the injection
    # never fired and every PASS above would be vacuous.
    if "--no-control" not in args:
        from pyspark.sql import functions as F

        # coalesce(1) first so "first" is the deterministic global
        # stream order (clean: file order; chaos: reversed) rather than
        # a per-shuffle-partition race that could flap run-to-run.
        base = orig_from_parquet(Pipeline, spark, f"{sf_dir}/orders.parquet").df
        clean_ctl = _snapshot(
            base.coalesce(1)
            .groupBy("o_custkey")
            .agg(F.expr("first(o_orderkey)").alias("first_key"))
            .toPandas()
        )
        chaos_ctl = _snapshot(
            _chaos_wrap(base)
            .coalesce(1)
            .groupBy("o_custkey")
            .agg(F.expr("first(o_orderkey)").alias("first_key"))
            .toPandas()
        )
        if clean_ctl == chaos_ctl:
            print("\nRETRYGATE control FAIL: order-sensitive probe did not "
                  "diverge — injection never fired, gate is vacuous")
            sys.exit(1)
        print("\nRETRYGATE control PASS (order-sensitive probe diverged as designed)")

    failures = []
    for name in targets:
        spec = QUERIES[name]
        clean = _snapshot(spec.spark(spark, sf_dir).toPandas())
        Pipeline.from_parquet = classmethod(chaotic_from_parquet)
        try:
            chaos = _snapshot(spec.spark(spark, sf_dir).toPandas())
        finally:
            Pipeline.from_parquet = classmethod(orig_from_parquet)
        ok = clean == chaos
        if not ok:
            failures.append(name)
            # first differing row, for the regression fixture
            c_cols, c_rows = clean
            h_cols, h_rows = chaos
            detail = (
                f"cols {c_cols} vs {h_cols}"
                if c_cols != h_cols
                else f"rows {len(c_rows)} vs {len(h_rows)}"
                if len(c_rows) != len(h_rows)
                else next(
                    f"row[{i}] clean={a} chaos={b}"
                    for i, (a, b) in enumerate(zip(c_rows, h_rows))
                    if a != b
                )
            )
            print(f"\nRETRYGATE {name} FAIL: {detail}")
        else:
            print(f"\nRETRYGATE {name} PASS ({len(clean[1])} rows)")

    print(f"\nRETRYGATE: {len(failures)} failures of {len(targets)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
