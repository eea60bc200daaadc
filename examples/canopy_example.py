"""Canopy clustering over customer features (mirrors CanopyExample.java;
deterministic here thanks to seeded center selection)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.operators import Canopy
    from flink_ml__spark.sources import load_table

    spark = get_session("canopy-example")
    cust = load_table(spark, "customer", SF_DIR).withColumn(
        "features", F.array(F.col("c_acctbal") / 1000.0,
                            F.col("c_nationkey").cast("double")))
    flat = (Canopy().setT1(8.0).setT2(4.0).setSeed(42).setMaxIter(30)
            .assign(cust))
    flat.groupBy("canopy_id").count().orderBy("canopy_id").show()


if __name__ == "__main__":
    main()
