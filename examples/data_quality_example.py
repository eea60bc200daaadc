"""Warehouse-hygiene tour: declarative data-quality expectations over
orders (clean pass + a dirtied frame with real violations), a
streaming-shaped windowed quality monitor on events, a keyed snapshot
CDC diff with payload + exact reconstruction, and blocked fuzzy
entity resolution on part names — the structured-data half of the
curation engine (each stage mirrors one of the gate queries)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.linkage import (
        ExpectationValidator,
        FuzzyRecordLinker,
        SnapshotDiffer,
    )
    from flink_ml__spark.sources import load_table
    from flink_ml__spark.streaming import stream_expectation_monitor

    spark = get_session("data-quality-example")
    orders = load_table(spark, "orders", SF_DIR)
    cust = load_table(spark, "customer", SF_DIR)

    print("== expectations on the clean table: every rule passes ==")
    validator = (ExpectationValidator()
                 .expect_not_null("custkey_present", "o_custkey")
                 .expect_unique("orderkey_unique", "o_orderkey")
                 .expect_range("price_sane", "o_totalprice", 0.0, 1e7)
                 .expect_regex("status_enum", "o_orderstatus", "^[OFP]$")
                 .expect_referential("custkey_fk", "o_custkey",
                                     cust, "c_custkey"))
    validator.validate(orders).show()

    print("== the same rules catch injected dirt ==")
    k = F.col("o_orderkey")
    dirty = (orders
             .withColumn("o_custkey", F.when(k % 50 == 1, F.lit(None))
                         .otherwise(F.col("o_custkey")))
             .withColumn("o_totalprice",
                         F.when(k % 70 == 2, -F.col("o_totalprice"))
                         .otherwise(F.col("o_totalprice"))))
    validator.validate(dirty).show()

    print("== windowed quality monitor on events (same rules object "
          "runs on an unbounded stream) ==")
    ev = load_table(spark, "events", SF_DIR)
    mon_rules = (ExpectationValidator()
                 .expect_not_null("user_present", "user_id")
                 .expect_range("value_sane", "value", 0.0, 1e6))
    (stream_expectation_monitor(ev, "ts", mon_rules, window="1 day")
     .orderBy("window_start", "rule").show(8, truncate=False))

    print("== snapshot CDC: churn the orders table, diff, reconstruct ==")
    new = (orders.filter(k % 13 != 3)
           .withColumn("o_totalprice",
                       F.when(k % 7 == 0, F.col("o_totalprice") + 10.0)
                       .otherwise(F.col("o_totalprice"))))
    differ = SnapshotDiffer().setKeyCols("o_orderkey").setEmitPayload(True)
    diff = differ.diff(orders, new)
    diff.groupBy("op").count().orderBy("op").show()
    rebuilt = differ.apply(orders, diff)
    mismatch = (rebuilt.exceptAll(new.select(*rebuilt.columns)).count()
                + new.select(*rebuilt.columns).exceptAll(rebuilt).count())
    print(f"reconstruction mismatches (expect 0): {mismatch}")

    print("== PSI distribution drift between order snapshots ==")
    from flink_ml__spark.functions.drift import DriftMonitor

    ref = orders.filter(k % 2 == 0)
    shifted = (orders.filter(k % 2 == 1)
               .withColumn("o_totalprice", F.col("o_totalprice") * 1.2))
    (DriftMonitor().setInputCols("o_totalprice", "o_custkey")
     .summary(ref, shifted).show())

    print("== categorical drift: event-type mix between halves ==")
    from flink_ml__spark.functions.drift import CategoricalDriftMonitor

    ke = F.col("event_id")
    churned = (ev.filter(ke % 2 == 1)
               .withColumn("event_type",
                           F.when(ke % 5 == 0, F.lit("scroll"))
                            .otherwise(F.col("event_type"))))
    (CategoricalDriftMonitor().setInputCols("event_type")
     .report(ev.filter(ke % 2 == 0), churned)
     .orderBy("category")
     .select("category", "n_ref", "n_cur",
             F.round("psi_term", 4).alias("psi_term")).show())

    print("== fuzzy entity resolution on part names ==")
    part = load_table(spark, "part", SF_DIR)
    ents = part.groupBy("p_name").agg(F.min("p_partkey").alias("ent_id"))
    pairs = (FuzzyRecordLinker().setInputCol("p_name").setIdCol("ent_id")
             .setMaxDistance(3).link(ents))
    named = (pairs
             .join(ents.select(F.col("ent_id").alias("a_id"),
                               F.col("p_name").alias("name_a")), "a_id")
             .join(ents.select(F.col("ent_id").alias("b_id"),
                               F.col("p_name").alias("name_b")), "b_id"))
    named.select("name_a", "name_b", "distance",
                 F.round("similarity", 3).alias("similarity")) \
         .orderBy("distance", "name_a").show(10, truncate=False)

    print("== which categorical columns move together (chi² / V / MI) ==")
    from flink_ml__spark.functions.stats import (
        CategoricalAssociation,
        CooccurrencePMI,
        CorrelationMatrix,
    )

    li = load_table(spark, "lineitem", SF_DIR)
    (CategoricalAssociation()
     .setPairs("l_returnflag:l_linestatus")
     .transform(li)
     .select("pair", "n", F.round("chi2", 2).alias("chi2"), "dof",
             F.round("cramers_v", 4).alias("cramers_v"),
             F.round("mutual_info", 5).alias("mutual_info")).show())

    print("== numeric collinearity pre-flight ==")
    (CorrelationMatrix()
     .setInputCols("l_quantity", "l_extendedprice", "l_discount")
     .transform(li)
     .select("col_x", "col_y", "n",
             F.round("corr", 4).alias("corr")).show())

    print("== part co-occurrence PMI over order baskets ==")
    baskets = li.select(F.col("l_orderkey").alias("basket"),
                        (F.col("l_partkey") % 199).alias("item"))
    (CooccurrencePMI().setGroupCol("basket").setItemCol("item")
     .setMinCount(3).transform(baskets)
     .orderBy(F.desc("pmi")).show(5))

    spark.stop()


if __name__ == "__main__":
    main()
