"""CLI runner for ``.hb`` programs: the reference user's entry point.

    python -m hobbes_spark.hb program.hb --table name=path.parquet \
        [--source path.parquet] [--format json|csv|table|parquet] [--out PATH]

The provider header resolves as in :mod:`hobbes_spark.hb.providers`
(odata/rest need network, so those programs take ``--source`` pointing
at already-collected data — the reference likewise separates collection
from calculation).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m hobbes_spark.hb", description=__doc__.split("\n")[0]
    )
    ap.add_argument("program", help=".hb program file")
    ap.add_argument(
        "--source",
        help="parquet path used as the data source (overrides the provider header)",
    )
    ap.add_argument(
        "--table",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="named parquet table for provider: localdata (repeatable)",
    )
    ap.add_argument("--format", default="table",
                    choices=["table", "json", "csv", "parquet"])
    ap.add_argument("--out", help="output path (for csv/parquet formats)")
    ap.add_argument("--limit", type=int, default=20,
                    help="rows shown for --format table (default 20)")
    args = ap.parse_args(argv)

    from hobbes_spark.session import get_spark

    spark = get_spark("hb-run")
    spark.sparkContext.setLogLevel("ERROR")

    tables = {}
    for spec in args.table:
        name, _, path = spec.partition("=")
        if not path:
            ap.error(f"--table needs NAME=PATH, got {spec!r}")
        from hobbes_spark.pipeline import read_parquet_any_ts

        tables[name] = read_parquet_any_ts(spark, path)

    text = open(args.program, encoding="utf-8").read()
    from hobbes_spark.hb import run_hb, run_hb_program
    from hobbes_spark.pipeline import Pipeline

    if args.source:
        out = run_hb(text, Pipeline.from_parquet(spark, args.source))
    else:
        out = run_hb_program(spark, text, tables=tables)

    df = out.df
    if args.format == "table":
        df.show(args.limit, truncate=False)
    elif args.format == "json":
        from hobbes_spark.sources.sinks import to_data_result_json

        print(to_data_result_json(df))
    elif args.format == "csv":
        if not args.out:
            ap.error("--format csv needs --out")
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(args.out)
    elif args.format == "parquet":
        if not args.out:
            ap.error("--format parquet needs --out")
        df.write.mode("overwrite").parquet(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
