"""Apriori association rules over event property baskets (mirrors
AprioriExample.java: frequent itemsets -> rules with the reference's
confidence/lift direction)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.operators import Apriori
    from flink_ml__spark.sources import load_table

    spark = get_session("apriori-example")
    ev = load_table(spark, "events", SF_DIR)
    baskets = (ev.groupBy("user_id")
               .agg(F.array_join(F.array_sort(F.collect_set("event_type")),
                                 "/").alias("basket")))
    op = (Apriori().setInputCols(["basket"]).setItemSeparator("/")
          .setMinSupport(0.2).setMinConfidence(0.3).setLift(1.0))
    op.transform(baskets).orderBy(F.desc("lift")).show(10, truncate=False)


if __name__ == "__main__":
    main()
