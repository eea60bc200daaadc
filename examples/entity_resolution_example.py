"""End-to-end entity resolution on part names: blocked fuzzy matching
(FuzzyRecordLinker) -> transitive duplicate clusters
(DuplicateClusterer) -> one golden record per entity with modal
attribute survivorship (GoldenRecordBuilder) — the composed form of
the fuzzy_link_part, dup_clusters_* and golden_records_orders
gates."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.curation import DuplicateClusterer
    from flink_ml__spark.functions.linkage import (
        FuzzyRecordLinker,
        GoldenRecordBuilder,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("entity-resolution-example")
    part = load_table(spark, "part", SF_DIR)

    print("== fuzzy near-name pairs (blocked, never all-pairs) ==")
    pairs = (FuzzyRecordLinker().setIdCol("p_partkey")
             .setInputCol("p_name").setMaxDistance(8)
             .link(part))
    pairs.orderBy("distance", "a_id").show(5, truncate=False)

    print("== transitive closure -> entity clusters ==")
    labels = (DuplicateClusterer().setIdCol("p_partkey")
              .cluster(pairs, nodes=part.select("p_partkey"),
                       id_a="a_id", id_b="b_id"))
    clustered = part.join(labels, "p_partkey")\
        .withColumnRenamed("cluster_id", "cluster")
    sizes = (clustered.groupBy("cluster")
             .agg(F.count(F.lit(1)).alias("n"))
             .filter("n > 1"))
    print("multi-record entities:", sizes.count())

    print("== golden records: modal attribute survivorship ==")
    golden = (GoldenRecordBuilder().setClusterCol("cluster")
              .setValueCols("p_brand", "p_type", "p_size")
              .transform(clustered))
    golden.orderBy(F.desc("n_members")).show(5, truncate=False)


if __name__ == "__main__":
    main()
