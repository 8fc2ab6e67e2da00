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


def test_window_head_is_the_r13_plan():
    """First 50 registry entries are the driver's certification sample —
    pin the r13 head so an accidental reorder is caught before the round
    ends (r13 new/changed queries first, then the r12-changed CC family
    that missed official certification — ADVICE r12 medium — then the
    r11 tail squeezed out of the r12 head, then the stalest rotation
    entries)."""
    import sdc_mapreduce_spark.queries as q

    head = list(q.REGISTRY)[:50]
    r13_new = list(q._WINDOW_R13)[: len(q._WINDOW_R13) - 17]
    # plan item 0: round-13 additions/changes lead (newest certs first)
    assert head[: len(r13_new)] == r13_new
    # plan item 1: the r12-changed connected-components family, whose
    # rewritten oracle + pointer-jumping path were outside the r12 window
    cc = [
        "dedup_embedding_clusters",
        "dedup_clusters",
        "dedup_cluster_labels",
        "dedup_cluster_sizes",
        "dedup_cluster_safe_split",
        "dedup_keep_best",
        "dedup_source_leakage_matrix",
        "graph_pagerank_neardup",
        "graph_triangle_stats",
    ]
    assert head[len(r13_new) : len(r13_new) + 9] == cc
    # plan item 2: the r11 tail squeezed out of the r12 50-entry head
    assert head[len(r13_new) + 9 : len(r13_new) + 12] == [
        "corpus_shuffle_shards",
        "embedding_quantize_audit",
        "dedup_incremental",
    ]
    # plan item 3: the stalest old-rotation entries fill the remainder
    assert "events_sessionize_salted" in head
    assert len(head) == 50


def test_entrypoint_contract():
    """__spark_entry__ exposes queries()/oracle_sql() with aligned keys."""
    import __spark_entry__ as e

    queries = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(queries)
    assert all(callable(f) for f in queries.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
