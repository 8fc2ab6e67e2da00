"""Measure batched-vs-sequential BPE merge learning on a corpus
(VERDICT r10 ask #2 refresh: after the skip-and-continue selection the
batched learner must fill >= 0.8*m merges per pass on natural text).

    python tools/measure_bpe_batched.py [sf_dir] [k] [passes] [m]

Prints the artifact block written to CHECKS_r{N}/bpe_batched_speedup.txt
in rounds 10/11: sequential merges+wall, batched merges+wall per pass,
utilization (merges/pass vs m), and both merge tables for the parity
audit (batched tables may legitimately diverge from sequential AFTER the
point where a merge creates a new outranking pair — the standard batched
trade; the audit shows where)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdc_mapreduce_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdcms_sfscale10"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from sdc_mapreduce_spark.catalog import load_table
    from sdc_mapreduce_spark.functions.text import bpe_merges, bpe_merges_batched

    spark = get_spark("bpe-measure")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    t0 = time.time()
    seq = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges(docs, k=k).orderBy("merge_rank").collect()
    ]
    t_seq = time.time() - t0

    t0 = time.time()
    bat = [
        (r["pass_id"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_merges_batched(docs, passes=passes, m=m)
        .orderBy("merge_rank")
        .collect()
    ]
    t_bat = time.time() - t0

    n_passes = len({p for p, *_ in bat}) or 1
    util = len(bat) / n_passes
    print(f"# batched-vs-sequential BPE merge learning, corpus {sf_dir}")
    print(
        f"# sequential k={k} (one Spark job chain per merge): "
        f"{len(seq)} merges in {t_seq:.1f}s"
    )
    print(
        f"# batched passes={passes} m={m} (one candidate agg + one rewrite "
        f"per pass): {len(bat)} merges in {t_bat:.1f}s"
    )
    print(
        f"# utilization: {util:.2f} merges/pass vs m={m} "
        f"({util / m:.0%}; skip-and-continue target >= 80%)"
    )
    print(
        f"# wall-clock ratio seq/batched = {t_seq / t_bat:.2f}x at merge "
        f"parity ({len(seq)} vs {len(bat)} merges; job count {len(seq)} vs "
        f"{n_passes} state rewrites)"
    )
    print(f"# seq    : {seq}")
    print(f"# batched: {bat}")


if __name__ == "__main__":
    main()
