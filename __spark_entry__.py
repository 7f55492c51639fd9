"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``ai_powered_e_commerce_analytics_spark.plans``
— one QuerySpec per implemented operator family from SURVEY.md §2 plus
the beyond-reference training-data ops (dedup / similarity search / text
analysis), each with a committed DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ai_powered_e_commerce_analytics_spark.plans import (
    oracle_sql_map,
    query_map,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's per-user KPI table (avg spend +
    sentiment counts + likeness + global min-max normalize) — the full
    relational surface of the reference in one fused plan."""
    from ai_powered_e_commerce_analytics_spark.plans.relational import user_kpis

    return user_kpis(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
