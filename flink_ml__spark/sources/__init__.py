from flink_ml__spark.sources.registry import (
    TABLES,
    load_table,
    read_csv,
    read_stream,
    register_tables,
)

__all__ = ["TABLES", "load_table", "read_csv", "read_stream",
           "register_tables"]
