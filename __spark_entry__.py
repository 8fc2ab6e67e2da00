"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q3 shape: filtered star
join → grouped revenue → top-k) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator inventory from
``sdc_mapreduce_spark.queries`` (SURVEY.md §2 + §2.2 + the training-data
pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sdc_mapreduce_spark import queries as qreg

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sdc_mapreduce_spark.queries.relational_queries import q3_shipping_priority

    return q3_shipping_priority(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.2 plus the
    training-data-pipeline extensions (dedup, simsearch, text analysis,
    multimodal plumbing)."""
    return qreg.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for EVERY registered query (no
    rows-only entries since round 8, when simsearch_ann_ivf switched to
    the deterministic seeded-centroid quantizer and gained a full oracle;
    tests/test_00_import_integrity.py pins the live count). Approximate
    queries carry full-result or bounds oracles: simsearch_ann_srp and the
    SRP-blocked dedup family replay their plan-literal hyperplanes
    end-to-end, and agg_approx_sketches asserts each sketch inside its
    published error.
    """
    return qreg.oracle_sql()
