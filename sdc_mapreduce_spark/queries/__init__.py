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

_ALL: dict[str, QuerySpec] = {}
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
    overlap = _ALL.keys() & mod.QUERIES.keys()
    if overlap:
        raise RuntimeError(f"duplicate query names: {overlap}")
    _ALL.update(mod.QUERIES)

# Registration order is the driver's check order, and the driver's
# correctness window is bounded (each round records exactly the first 50
# entries). The window therefore ROTATES per round so every query earns a
# driver-green row over time:
#   round 1 window: flagship + LLM-pipeline + TPC-H head + surface head
#   rounds 2-3 window: same set (registry was frozen — wasted rounds)
#   round 4 window (this order): the 24 queries never driver-sampled in
#     r1-r3, followed by 26 of the 46 queries last sampled in round 1.
#   round 5 plan: rotate the remaining 20 r1-only queries plus the oldest
#     of the r2/r3 window back to the front.
_NEVER_SAMPLED_R1_R3: tuple[str, ...] = (
    # TPC-H tail that fell outside every prior window
    "q12_late_shipments",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    # join surface
    "join_cross",
    "join_full_outer_coalesce",
    "join_null_safe",
    "join_skew_salted",
    # aggregation surface
    "agg_collect_sets",
    "agg_minmax_by",
    "agg_salted_distinct",
    "agg_stats_moments",
    "agg_unpivot",
    # window / set / scalar surface
    "window_distribution_fns",
    "set_except_all",
    "set_intersect_all",
    "scalar_regex_fns",
    "table_profile",
    # events suite tail
    "events_cohort_retention",
    "events_dedup_windowed",
    "events_from_json_struct",
    "events_funnel",
    "events_monthly_rollup",
    "events_range_join",
    "latest_event_per_user",
)
# Queries whose oracle is NEW in round 4 (previously rows-only): no driver
# hash row exists yet, so they outrank the r1-verified tail below.
_NEW_ORACLES_R4: tuple[str, ...] = (
    "multimodal_decode_profile",
    "multimodal_embed_search",
    "simsearch_ann_ivf_recall",
    "events_sessionize_salted",
    "multimodal_resize_audit",
    "window_rank_topn_salted",
)
_R1_ONLY: tuple[str, ...] = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_share",
    "q18_large_volume",
    "q19_disjunctive_filters",
    "q22_global_sales_opportunity",
    "agg_pivot",
    "agg_percentiles",
    "agg_approx_sketches",
    "udaf_geomean_pandas",
    "grouped_zscore_pandas",
    "subquery_above_nation_avg",
    "sql_surface_correlated",
    "join_inner",
    "join_left_agg",
    "join_semi",
    "join_anti",
    "join_broadcast_dim",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "window_rank_topn",
    "window_running_sum",
    "window_lag_delta",
    "window_range_frame",
    "sort_limit_topk",
    "set_intersect",
    "set_except",
    "set_union",
    "scalar_string_fns",
    "scalar_datetime_fns",
    "scalar_math_case",
    "scalar_array_fns",
    "scalar_null_fns",
    "filter_project_pushdown",
    "events_tumbling",
    "events_sliding",
    "events_json_extract",
    "events_map_fns",
    "events_asof_join",
)
_PRIORITY: tuple[str, ...] = (*_NEVER_SAMPLED_R1_R3, *_NEW_ORACLES_R4, *_R1_ONLY)
assert set(_PRIORITY) <= _ALL.keys(), set(_PRIORITY) - _ALL.keys()

REGISTRY: dict[str, QuerySpec] = {name: _ALL[name] for name in _PRIORITY}
REGISTRY.update({name: spec for name, spec in _ALL.items() if name not in REGISTRY})


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def bench_queries():
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.bench}
