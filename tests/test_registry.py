"""Registry health: pure-import tests that need no SparkSession.

Round-7 postmortem coverage: a module-level error in one query module
(e.g. an f-string using a constant defined below it) used to raise at
``import sdc_mapreduce_spark.queries`` and zero the whole driver contract.
The package now quarantines bad modules instead of dying; these tests make
the quarantine loud in CI while the driver keeps its window.
"""

from __future__ import annotations

import subprocess
import sys


def test_queries_package_imports_cleanly():
    """The canonical smoke: a fresh interpreter must import the registry
    (module-level f-strings evaluate here, so use-before-definition bugs
    surface even when this pytest process already holds a cached import)."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sdc_mapreduce_spark.queries as q; "
            "assert not q.IMPORT_QUARANTINE, q.IMPORT_QUARANTINE; "
            "print(len(q.REGISTRY))",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert int(proc.stdout.strip()) >= 200


def test_import_quarantine_is_empty():
    import sdc_mapreduce_spark.queries as q

    assert q.IMPORT_QUARANTINE == {}, list(q.IMPORT_QUARANTINE)


def test_every_registered_query_is_prioritized():
    """The rotation plan must stay total: every registry entry appears in
    the priority tuples exactly once, so window re-sequencing can never
    silently drop or duplicate a query."""
    import sdc_mapreduce_spark.queries as q

    planned = list(q._PRIORITY)
    assert len(planned) == len(set(planned)), "duplicate names in plan"
    assert set(planned) == set(q.REGISTRY), (
        set(planned) ^ set(q.REGISTRY)
    )


def test_window_head_is_the_r12_plan():
    """First 50 registry entries are the driver's certification sample —
    pin the r12 head so an accidental reorder is caught before the round
    ends (r12 new/changed queries first, then the r11 block, then the
    stalest rotation entries)."""
    import sdc_mapreduce_spark.queries as q

    head = list(q.REGISTRY)[:50]
    # plan item 0: round-12 additions and changes lead (newest certs first)
    assert head[:5] == [
        "simsearch_mmr_indexed",
        "text_unigram_lm",
        "table_psi_drift",
        "simsearch_mmr",
        "kvtext_streaming_restart_certified",
    ]
    # plan item 1: the r11 window block (minus entries promoted to R12)
    assert head[5:9] == [
        "dedup_jaccard_prefix",
        "events_streaming_sliding_certified",
        "dedup_sorted_neighborhood",
        "text_heavy_hitters",
    ]
    assert "q22_global_sales_opportunity" in head
    assert len(head) == 50


def test_entrypoint_contract():
    """__spark_entry__ exposes queries()/oracle_sql() with aligned keys."""
    import __spark_entry__ as e

    queries = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(queries)
    assert all(callable(f) for f in queries.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
