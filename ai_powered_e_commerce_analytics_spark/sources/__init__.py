from .readers import load_table, load_tables, read_json_dir, register_views

__all__ = ["load_table", "load_tables", "read_json_dir", "register_views"]
