from .readers import TPCH_TABLES, load_table, read_any, read_csv, read_parquet  # noqa: F401
