"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() action — forces the full
plan including sinks' upstream work) after a warm-up of the session.
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

    timings: dict[str, float] = {}
    for name, fn in bench.items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("/")[-1].replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_query_set_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
