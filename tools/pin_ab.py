"""On/off A/B for the r12 reuse pins (VERDICT r12 ask #4).

5c26173 pinned jaccard-prefix's prefix frame (MEMORY_AND_DISK) and
checkpointed SNM's global-rank frame citing a 30x profile that was never
committed, and the only subsequent scale evidence (the contended r12 10x
bench) left both ops looking like possible regressions. This tool
measures each op at a given corpus with its pin ON and OFF under the
same settle protocol as bench.py, interleaved (on, off, on, off per
pass would couple arms through page cache — instead each arm runs as a
full settled measurement with its own warm-up, pins drained between
every sample), and prints a JSON table.

Usage:
    python tools/pin_ab.py [--sf-dir /tmp/sdcms_sfscale10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (settle protocol + median helpers)
from sdc_mapreduce_spark.cache import drain_pins  # noqa: E402
from sdc_mapreduce_spark.catalog import load_table  # noqa: E402
from sdc_mapreduce_spark.functions import dedup as D  # noqa: E402
from sdc_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sdcms_sfscale10")
    args = ap.parse_args()

    spark = get_spark("pin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")

    # Same parameters as the registry queries (queries/dedup_queries.py)
    cases = {
        "dedup_jaccard_prefix": {
            "on": lambda: D.jaccard_prefix_pairs(
                docs, n=3, threshold=0.8, pin_prefix=True
            ),
            "off": lambda: D.jaccard_prefix_pairs(
                docs, n=3, threshold=0.8, pin_prefix=False
            ),
        },
        "dedup_sorted_neighborhood": {
            "on": lambda: D.sorted_neighborhood_pairs(
                docs, window=10, threshold=0.5, key_chars=24,
                checkpoint_ranked=True,
            ),
            "off": lambda: D.sorted_neighborhood_pairs(
                docs, window=10, threshold=0.5, key_chars=24,
                checkpoint_ranked=False,
            ),
        },
    }

    # JVM / Arrow warm-up (mirrors bench.py main)
    docs.limit(1).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict = {"sf_dir": args.sf_dir, "cases": {}}
    for name, arms in cases.items():
        out["cases"][name] = {}
        for arm, build in arms.items():
            build().write.format("noop").mode("overwrite").save()  # warm-up
            drain_pins(spark)
            stalls: list = []
            samples, settled, passes = bench._settled_runs(
                lambda: build()
                .write.format("noop")
                .mode("overwrite")
                .save(),
                name=f"{name}:{arm}",
                stalls=stalls,
                after_run=lambda: drain_pins(spark),
            )
            out["cases"][name][arm] = {
                "median": round(bench._median(samples), 3),
                "samples": samples,
                "settled": settled,
                "passes": passes,
            }
        on = out["cases"][name]["on"]["median"]
        off = out["cases"][name]["off"]["median"]
        out["cases"][name]["winner"] = "on" if on <= off else "off"
        out["cases"][name]["speedup_on_vs_off"] = round(off / max(on, 1e-9), 3)
    spark.stop()
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
