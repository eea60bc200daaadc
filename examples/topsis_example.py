"""TOPSIS multi-criteria scoring over part (mirrors TopsisExample.java:
criteria types max/min, weighted closeness to the ideal solution)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.operators import Topsis
    from flink_ml__spark.sources import load_table

    spark = get_session("topsis-example")
    part = load_table(spark, "part", SF_DIR).withColumn(
        "features", F.array("p_retailprice", F.col("p_size").cast("double")))
    op = (Topsis().setCriteriaTypes([1, 2]).setWeights([0.6, 0.4])
          .setPredictionCol("score"))
    op.transform(part).select("p_partkey", "score") \
        .orderBy(F.desc("score")).show(5)


if __name__ == "__main__":
    main()
