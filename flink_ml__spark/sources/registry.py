"""Table loading for the synthetic TPC-H-ish test datasets.

The reference reads its fixtures driver-side (BufferedReader →
``env.fromCollection``, ``example/AHPExample.java:52-72``); here sources
are real distributed parquet scans with predicate pushdown and column
pruning via the DataFrame reader.

One environment quirk handled centrally: ``events.parquet`` stores ``ts``
as parquet TIMESTAMP(NANOS), which Spark's reader only accepts as int64
via ``spark.sql.legacy.parquet.nanosAsLong``; we set that at read time and
convert back to a proper timestamp column (microsecond precision).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # the driver may hand us a foreign session: the engine's operators
    # assume non-ANSI (Java-like NULL-propagating) arithmetic, and the
    # event-time window boundaries must be epoch-aligned in UTC to match
    # the DuckDB oracles (F.window buckets shift with the session tz)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: `/` goes through double and epoch-nanos
            # (~1.7e18) exceed double's 2^53 exact range, silently
            # perturbing ~12% of timestamps by 1 µs
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, *, header: bool = True,
             infer_schema: bool = True, schema: str | None = None,
             sep: str = ",") -> DataFrame:
    """CSV source — the reference's fixtures are CSVs read driver-side
    (``example/AHPExample.java:52-72``); here it is a distributed scan
    with column pruning (schema inference runs one extra pass, so pass an
    explicit ``schema`` for large inputs)."""
    reader = (spark.read.option("header", header).option("sep", sep))
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_stream(spark: SparkSession, fmt: str, **options) -> DataFrame:
    """Streaming source factory (``pom.xml:69-77`` declares Kafka/JSON
    connectors the reference never exercises). ``fmt``: 'kafka', 'rate',
    'parquet', ... — options passed through to ``readStream``; file
    formats require a ``schema`` option (DDL string)."""
    reader = spark.readStream.format(fmt)
    schema = options.pop("schema", None)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def register_tables(spark: SparkSession, sf_dir: str | None = None,
                    tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Load + register each table as a temp view; returns the DataFrames."""
    out = {}
    for name in tables or TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
