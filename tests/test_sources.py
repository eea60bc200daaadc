"""Source helpers: CSV (reference fixture format) and streaming factory."""

import shutil
import tempfile

from flink_ml__spark.sources import load_table, read_csv, read_stream


def test_read_csv_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="csv_src_")
    try:
        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        (docs.select("doc_id", "lang", "n_chars").coalesce(1)
         .write.mode("overwrite").option("header", True).csv(d))
        back = read_csv(spark, d, schema="doc_id long, lang string, "
                                         "n_chars long")
        assert back.count() == docs.count()
        assert back.columns == ["doc_id", "lang", "n_chars"]
        inferred = read_csv(spark, d)
        assert dict(inferred.dtypes)["doc_id"] in ("int", "bigint")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_read_stream_rate(spark):
    stream = read_stream(spark, "rate", rowsPerSecond=10)
    assert stream.isStreaming
    assert set(stream.columns) == {"timestamp", "value"}


def test_read_stream_parquet_with_schema(spark):
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    stream = read_stream(
        spark, "parquet", path="/root/testdata/sf0.001/documents.parquet",
        schema=docs.schema.simpleString()[7:-1].replace(":", " "))
    assert stream.isStreaming


def test_read_json_roundtrip(spark, tmp_path):
    from flink_ml__spark.sources import read_json

    p = str(tmp_path / "j")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string")
    df.write.mode("overwrite").json(p)
    back = read_json(spark, p, schema="id long, name string")
    assert {(r["id"], r["name"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_write_parquet_partition_pruning(spark, tmp_path):
    """Partition directories must prune: a filter on the partition
    column reads only the matching directory."""
    from flink_ml__spark.sources import write_parquet

    p = str(tmp_path / "pp")
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(30)],
        "id long, bucket int, payload string")
    write_parquet(df, p, partition_by=["bucket"])
    back = spark.read.parquet(p).filter("bucket = 1")
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    # pruned scan: partition count recorded in the FileScan metadata
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_write_bucketed_table_no_shuffle_join(spark, tmp_path):
    """Two tables bucketed identically must sort-merge join with NO
    exchange on either side — the co-located-join contract."""
    import uuid

    from flink_ml__spark.sources import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).withColumnRenamed("id", "k")
        b = spark.range(0, 1000).withColumnRenamed("id", "k")
        ta, tb = f"ba_{uuid.uuid4().hex[:8]}", f"bb_{uuid.uuid4().hex[:8]}"
        write_bucketed_table(a, ta, ["k"], 4,
                             path=str(tmp_path / "ta"))
        write_bucketed_table(b, tb, ["k"], 4,
                             path=str(tmp_path / "tb"))
        j = spark.table(ta).join(spark.table(tb), "k")
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
