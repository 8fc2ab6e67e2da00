"""Query registry: every implemented operator exposed as a named
(spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, a
DuckDB oracle string — the driver's correctness contract
(__spark_entry__.queries / oracle_sql).
"""

from __future__ import annotations

from sdc_mapreduce_spark.queries.base import QuerySpec
from sdc_mapreduce_spark.queries import (
    dedup_queries,
    events_queries,
    mapreduce_queries,
    relational_queries,
    simsearch_queries,
    surface_queries,
    text_queries,
    tpch_queries,
)

REGISTRY: dict[str, QuerySpec] = {}
for mod in (
    mapreduce_queries,
    relational_queries,
    events_queries,
    text_queries,
    dedup_queries,
    simsearch_queries,
    tpch_queries,
    surface_queries,
):
    overlap = REGISTRY.keys() & mod.QUERIES.keys()
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    REGISTRY.update(mod.QUERIES)


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def bench_queries():
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.bench}
