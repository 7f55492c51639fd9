from .registry import QUERIES, QuerySpec, oracle_sql_map, query_map

__all__ = ["QUERIES", "QuerySpec", "oracle_sql_map", "query_map"]
