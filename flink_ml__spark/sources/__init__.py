from flink_ml__spark.sources.registry import (
    TABLES,
    load_table,
    read_csv,
    read_json,
    read_orc,
    read_text,
    read_jsonl_stream,
    read_kafka_json,
    read_stream,
    register_tables,
    write_bucketed_table,
    write_jsonl,
    write_orc,
    write_parquet,
    write_zorder_parquet,
    zorder_key,
)

__all__ = ["TABLES", "load_table", "read_csv", "read_json",
           "read_jsonl_stream", "read_kafka_json", "read_orc",
           "read_stream", "read_text", "write_jsonl", "write_orc",
           "register_tables", "write_bucketed_table", "write_parquet",
           "write_zorder_parquet", "zorder_key"]
