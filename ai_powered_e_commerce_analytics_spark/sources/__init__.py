from .bucketing import bucketed_join, write_bucketed
from .readers import (
    load_table,
    load_tables,
    read_csv_dir,
    read_json_dir,
    read_orc_dir,
    register_views,
)

__all__ = [
    "bucketed_join",
    "load_table",
    "load_tables",
    "read_csv_dir",
    "read_json_dir",
    "read_orc_dir",
    "register_views",
    "write_bucketed",
]
