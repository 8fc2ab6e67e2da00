"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec, ...}, "runs": {name: [sec, ...]}, "sf": ...}.

Each query is executed to completion (noop sink — forces the full plan)
REPEATS times back-to-back after a session warm-up; the reported per-query
number is the median, which makes a single noisy/contended run invisible
in the headline while the raw runs stay inspectable under "runs".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sdc_mapreduce_spark import queries as qreg
from sdc_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    spark = get_spark("sdc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench = qreg.bench_queries()
    # Warm up the JVM/session so the first measured query doesn't pay
    # executor/codegen startup.
    next(iter(bench.values()))(spark, SF_DIR).limit(1).collect()
    # ...and the Python/Arrow worker pool (mapInPandas/pandas-UDF queries
    # would otherwise pay daemon fork + Arrow init inside their timing).
    # A trivial kernel over unrelated data — no query-specific caches warm.
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    runs: dict[str, list[float]] = {}
    for name, fn in bench.items():
        samples = []
        for _ in range(REPEATS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        runs[name] = samples

    timings = {name: round(_median(s), 3) for name, s in runs.items()}
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("/")[-1].replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
