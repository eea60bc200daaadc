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
