"""Assembled correctness-query registry (driver contract surface)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .analytics import ANALYTICS_SPECS
from .multimodal import MULTIMODAL_SPECS
from .relational import RELATIONAL_SPECS
from .relational_tpch import RELATIONAL_TPCH_SPECS
from .relational_tpch2 import RELATIONAL_TPCH2_SPECS
from .simsearch import SIMSEARCH_SPECS
from .spec import QuerySpec
from .temporal import TEMPORAL_SPECS
from .textops import TEXTOPS_SPECS

# Order matters: the external driver verifies the FIRST 50 entries against the
# DuckDB oracle each round. Reference-parity relational queries and the
# LLM-data-pipeline north-star families (textops / simsearch / multimodal) are
# placed first so they all receive driver evidence; the TPC-H battery (fully
# driver-verified in round 1, see CORRECTNESS_r01.json) sits last.
QUERIES: list[QuerySpec] = (
    RELATIONAL_SPECS
    + TEXTOPS_SPECS
    + SIMSEARCH_SPECS
    + MULTIMODAL_SPECS
    + ANALYTICS_SPECS
    + TEMPORAL_SPECS
    + RELATIONAL_TPCH_SPECS
    + RELATIONAL_TPCH2_SPECS
)

_names = [q.name for q in QUERIES]
assert len(_names) == len(set(_names)), "duplicate query names in registry"


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in QUERIES}


def oracle_sql_map() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES if q.oracle is not None}
