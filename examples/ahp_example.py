"""AHP entropy-weight scoring over lineitem (mirrors AHPExample.java:
judgment matrix + indicator types -> per-row score appended)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.operators import AHP
    from flink_ml__spark.sources import load_table

    spark = get_session("ahp-example")
    li = load_table(spark, "lineitem", SF_DIR)
    op = (AHP()
          .setInputCols(["l_quantity", "l_extendedprice",
                         "l_discount", "l_tax"])
          .setJudgmentMatrix([[1.0, 0.5, 2.0, 2.0],
                              [2.0, 1.0, 3.0, 3.0],
                              [0.5, 1 / 3, 1.0, 1.0],
                              [0.5, 1 / 3, 1.0, 1.0]])
          .setIndicatorType([1, 1, 0, 0])
          .setOutputCol("score"))
    out = op.transform(li).select("l_orderkey", "l_linenumber", "score")
    out.orderBy(F.desc("score")).show(5)


if __name__ == "__main__":
    main()
