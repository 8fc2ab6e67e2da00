"""Relational operators the reference lacks (SURVEY.md §2.2), declared
Spark-first so Catalyst picks the physical strategy."""

from sdc_mapreduce_spark.operators.relational import (
    asof_join,
    range_join_time,
    top_k,
    top_k_per_group,
)
from sdc_mapreduce_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)

__all__ = [
    "asof_join",
    "range_join_time",
    "salted_distinct_count",
    "salted_join",
    "top_k",
    "top_k_per_group",
]
