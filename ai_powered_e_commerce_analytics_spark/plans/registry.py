"""Assembled correctness-query registry (driver contract surface)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .analytics import ANALYTICS_SPECS
from .approx import APPROX_SPECS
from .multimodal import MULTIMODAL_SPECS
from .pretrain import PRETRAIN_SPECS
from .relational import RELATIONAL_SPECS
from .relational_tpch import RELATIONAL_TPCH_SPECS
from .relational_tpch2 import RELATIONAL_TPCH2_SPECS
from .sampling import SAMPLING_SPECS
from .simsearch import SIMSEARCH_SPECS
from .spec import QuerySpec
from .temporal import TEMPORAL_SPECS
from .textops import TEXTOPS_SPECS

_ALL_SPECS: list[QuerySpec] = (
    RELATIONAL_SPECS
    + TEXTOPS_SPECS
    + SIMSEARCH_SPECS
    + APPROX_SPECS
    + SAMPLING_SPECS
    + PRETRAIN_SPECS
    + MULTIMODAL_SPECS
    + ANALYTICS_SPECS
    + TEMPORAL_SPECS
    + RELATIONAL_TPCH_SPECS
    + RELATIONAL_TPCH2_SPECS
)

# Queries with a green rows/schema/hash row in round 1's driver run
# (CORRECTNESS_r01.json) — that evidence is permanent, so they yield their
# slot in the driver's 50-query window to queries that have none yet.
_R1_DRIVER_VERIFIED = {
    "user_kpis", "shop_kpis", "date_kpis", "gold_enrichment_join",
    "customers_without_orders", "acctbal_minmax_normalized",
    "item_id_assignment", "item_id_assignment_ranged", "batch_assignment",
    "pool_assignment", "union_all_orders", "top100_orders",
    "top3_orders_per_customer", "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume",
    "events_hourly_rollup", "events_user_sessions", "events_props_extract",
    "salted_skew_join_brand_revenue", "tpch_q4_late_shipment_semi",
    "tpch_q6_forecast_revenue", "tpch_q10_returned_revenue",
    "tpch_q12_priority_pivot", "tpch_q14_promo_revenue",
    "tpch_q16_supplier_variety", "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders", "tpch_q19_disjunctive_revenue",
    "tpch_q22_idle_wealthy_customers", "running_revenue_per_customer",
    "tpch_q2_min_cost_supplier", "tpch_q7_nation_volume",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q11_important_parts", "tpch_q13_order_count_distribution",
    "tpch_q15_top_supplier", "tpch_q20_excess_share_suppliers",
    "tpch_q21_sole_late_supplier", "rollup_revenue_by_flag_status",
    "cube_orders_by_status_priority", "order_value_percentiles",
    "asof_last_click_before_purchase", "range_join_clicks_before_purchase",
    "order_gaps_lag_lead", "customer_rank_battery", "rolling_weekly_revenue",
    "customers_both_years", "customers_1996_only",
}

# Order matters: the external driver verifies the FIRST 50 entries against
# the DuckDB oracle each round. Stable partition: queries that still lack
# any driver CORRECTNESS row (the north-star textops / dedup / ANN /
# multimodal families plus everything added after round 1) come first;
# round-1-verified queries fill the remaining window slots and beyond.
QUERIES: list[QuerySpec] = (
    [q for q in _ALL_SPECS if q.name not in _R1_DRIVER_VERIFIED]
    + [q for q in _ALL_SPECS if q.name in _R1_DRIVER_VERIFIED]
)

_names = [q.name for q in QUERIES]
assert len(_names) == len(set(_names)), "duplicate query names in registry"


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in QUERIES}


def oracle_sql_map() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES if q.oracle is not None}
