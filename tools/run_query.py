"""Run any registered query by name — the engine's query CLI (the
user-facing analog of the reference's job submission client,
reference clientsdk/submit_map_reduce.py:22-34, minus the blob upload and
HTTP hop: here the "job" is a Catalyst plan executed in-process).

Usage:
    python tools/run_query.py <name> [--sf-dir DIR] [--limit N] [--explain]
    python tools/run_query.py --list
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdc_mapreduce_spark.queries import REGISTRY
from sdc_mapreduce_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true", help="print the formatted plan")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    if args.list or not args.name:
        for name, spec in sorted(REGISTRY.items()):
            marker = "" if spec.oracle else "  (rows-only)"
            print(f"{name}{marker}")
        return

    if args.name not in REGISTRY:
        sys.exit(f"unknown query {args.name!r} — use --list")

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
