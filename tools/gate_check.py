"""Strict local mirror of the driver's correctness gate.

Differences from tests/test_oracle_parity.py (the fast dev loop):
- STOCK SparkSession — no hobbes_spark.session confs. Any conf a query
  needs (nanos parquet, session tz) must be set by the query path
  itself, exactly as the driver requires (see ADVICE round 1).
- sf0.01 by default (the driver's gate scale).
- STRICT cell compare: str(v) with no int/float collapsing, so a
  DuckDB HUGEINT surfacing as pandas float64 ("42.0") mismatches a
  Spark BIGINT ("42") — the exact class of bug the driver's value hash
  catches and the lenient snapshot masked (group_all_sum, round 1).

Usage: python tools/gate_check.py [sf_dir] [query ...|--window]
"""

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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


def _check_window_rotation():
    """Rotation-due enforcement (r8 verdict item 1): `pytest tests/`
    pins the window against queries.WINDOW_FROZEN_AT and stays green
    across round boundaries; the LOUD "a newer record landed, rotate
    the window" signal lives HERE, where the builder runs it every
    round as part of the gate sweep.  --allow-stale-window overrides
    (e.g. to re-verify an old window mid-rotation)."""
    import glob
    import re

    from hobbes_spark.queries import WINDOW_FROZEN_AT

    frozen = int(re.fullmatch(r"CORRECTNESS_r(\d+)", WINDOW_FROZEN_AT).group(1))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    newest = max(rounds, default=0)
    if newest > frozen:
        raise SystemExit(
            f"GATE: WINDOW ROTATION DUE — CORRECTNESS_r{newest:02d}.json "
            f"landed but queries.WINDOW_FROZEN_AT is still "
            f"{WINDOW_FROZEN_AT!r}.  Rotate _DRIVER_WINDOW_PRIORITY to "
            f"`python tools/window_cohort.py --as-of {newest}` and bump "
            f"the stamp (or pass --allow-stale-window to override)."
        )


def main():
    args = sys.argv[1:]
    # sf_dir is optional: `gate_check.py --window` / `gate_check.py q1`
    # must not eat the first operand as a directory
    if args and not args[0].startswith("--") and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    else:
        sf_dir = "/root/testdata/sf0.01"
    only = set(args)
    if "--allow-stale-window" in only:
        only -= {"--allow-stale-window"}
    else:
        _check_window_rotation()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("gate_check")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hobbes_spark.queries import QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # --window: the exact 50 entries the driver will sign this round
    # (combinable with explicit names)
    if "--window" in only:
        only = (only - {"--window"}) | set(list(QUERIES)[:50])
        print(f"gate: --window -> {len(only)} entries")

    # a typo'd filter name must not produce a false green: a gate that
    # "passes" having checked nothing is worse than one that fails
    unknown = only - set(QUERIES)
    if unknown:
        raise SystemExit(f"GATE: unknown query names {sorted(unknown)}")

    bad = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            got = spec.spark(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001 - report, keep going
            bad.append((name, f"SPARK ERR {type(e).__name__}: {str(e)[:160]}"))
            print(f"\n{name}: SPARK ERROR {str(e)[:160]}")
            continue
        if spec.oracle is None:
            print(f"\n{name}: rows-only ({len(got)} rows) OK")
            continue
        try:
            # record-and-continue like the Spark side: one bad oracle
            # must not abort the gate and discard the other results
            exp = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ORACLE ERR {type(e).__name__}: {str(e)[:160]}"))
            print(f"\n{name}: ORACLE ERROR {str(e)[:160]}")
            continue
        g_cols, g_rows = _snapshot(got)
        e_cols, e_rows = _snapshot(exp)
        if g_cols != e_cols:
            bad.append((name, f"cols {g_cols} vs {e_cols}"))
        elif len(g_rows) != len(e_rows):
            bad.append((name, f"rows {len(g_rows)} vs {len(e_rows)}"))
        elif g_rows != e_rows:
            i = next(i for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b)
            bad.append((name, f"values: spark={g_rows[i]} oracle={e_rows[i]}"))
        status = "MATCH" if not bad or bad[-1][0] != name else "MISMATCH"
        print(f"\n{name}: {status} ({len(g_rows)} rows)")

    print(f"\nGATE: {len(bad)} failures")
    for n, why in bad:
        print(f"\n  FAIL {n}: {why}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
