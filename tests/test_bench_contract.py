"""The driver parses only the LAST 2,000 bytes of bench stdout and reads
the final JSON line — round 6 lost its bench signal when the payload
outgrew that window. These tests pin the emission contract without
running the bench."""

from __future__ import annotations

import json


def test_bench_compact_line_fits_driver_tail_window():
    """A compact line built from the CURRENT bench query set with
    worst-case-width timings must stay well inside the 2,000-byte tail
    window (budget 1,500, the bench.py guard threshold)."""
    from sdc_mapreduce_spark.queries import bench_queries

    names = list(bench_queries())
    compact = json.dumps(
        {
            "metric": "headline_query_set_wall_clock",
            "value": 99999.999,
            "unit": "sec",
            "queries": {n: 99999.999 for n in names},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(compact) <= 1500, (
        f"compact bench line is {len(compact)} bytes for {len(names)} "
        "queries — trim the bench set or the emission before the driver "
        "window overflows again"
    )


def test_bench_compact_payload_is_last_print_in_source():
    """bench.py must print the compact summary LAST (after the detail
    line) — the driver parses the final JSON line of the stdout tail."""
    with open("bench.py") as fh:
        src = fh.read()
    assert src.rindex("print(compact)") > src.rindex("print(detail)")


def test_bench_order_is_pinned_canonical():
    """The bench execution order must NOT track the registry's rotating
    priority order (VERDICT r9 ask #2: r9's rotation moved the warm-up
    neighborhood and produced a phantom 11-35% 'regression' of five
    queries with unchanged plans). bench.py pins _BENCH_ORDER; new
    bench-flagged queries append at the END."""
    import bench as benchmod
    from sdc_mapreduce_spark.queries import bench_queries

    flagged = set(bench_queries())
    ordered = list(benchmod._ordered_bench())
    pinned = [n for n in benchmod._BENCH_ORDER if n in flagged]
    assert ordered[: len(pinned)] == pinned
    assert set(ordered) == flagged
    # the pinned list should not name queries that no longer exist
    assert set(benchmod._BENCH_ORDER) <= flagged
