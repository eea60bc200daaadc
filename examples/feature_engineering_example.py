"""Tabular feature-engineering tour: the scaler family (min-max,
max-abs, robust, winsorize, quantile binning), the categorical
encoders (frequency indexing, smoothed target encoding, the
vocabulary-free hashing trick), statistical feature diagnostics
(one-way ANOVA, two-sample KS / Mann-Whitney), and k-means +
silhouette on the embeddings table — each stage mirrors one of the
gate queries, composed here the way a feature pipeline would run."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions import (
        AnovaFTest,
        ClusteringEvaluator,
        FeatureHasher,
        KolmogorovSmirnovTest,
        MannWhitneyUTest,
        MinMaxScaler,
        QuantileDiscretizer,
        RobustScaler,
        StringIndexer,
        TargetEncoder,
    )
    from flink_ml__spark.operators import KMeans
    from flink_ml__spark.pipeline import Pipeline
    from flink_ml__spark.sources import load_table

    spark = get_session("feature-engineering-example")
    orders = load_table(spark, "orders", SF_DIR)
    events = load_table(spark, "events", SF_DIR)

    print("== one persistable Pipeline: index -> target-encode -> "
          "scale -> bin ==")
    pipe = Pipeline([
        StringIndexer().setInputCol("o_orderpriority")
        .setOutputCol("prio_idx"),
        TargetEncoder().setInputCol("o_orderpriority")
        .setTargetCol("o_totalprice").setOutputCol("prio_enc"),
        RobustScaler().setInputCol("o_totalprice")
        .setOutputCol("price_robust"),
        MinMaxScaler().setInputCol("o_totalprice")
        .setOutputCol("price_01"),
        QuantileDiscretizer().setInputCol("o_totalprice")
        .setNumBuckets(4).setOutputCol("price_q4"),
    ])
    featurized = pipe.fit(orders).transform(orders)
    featurized.select("o_orderkey", "prio_idx", "prio_enc",
                      "price_robust", "price_01", "price_q4").show(5)

    print("== hashing trick for id-scale categoricals (no vocabulary, "
          "no fit) ==")
    (FeatureHasher().setInputCols("event_type", "user_id")
     .setNumFeatures(4096).transform(events)
     .select("event_id", "event_type_hash", "user_id_hash").show(5))

    print("== does the metric differ across event types? (one-way "
          "ANOVA, one aggregation) ==")
    (AnovaFTest().setValueCol("value").setGroupCol("event_type")
     .evaluate(events).show())

    print("== click-vs-purchase value distributions: binned KS + "
          "Mann-Whitney (sort-free) ==")
    two = (events.filter(F.col("event_type").isin("click", "purchase")))
    (KolmogorovSmirnovTest().setValueCol("value")
     .setGroupCol("event_type").setGroups("click", "purchase")
     .evaluate(two).show())
    (MannWhitneyUTest().setValueCol("value")
     .setGroupCol("event_type").setGroups("click", "purchase")
     .evaluate(two).show())

    print("== k-means on embeddings + centroid silhouette quality ==")
    emb = load_table(spark, "embeddings", SF_DIR)
    km = (KMeans().setK(4).setSeed(42).setMaxIter(10)
          .setFeaturesCol("embedding").fit(emb))
    clustered = km.transform(emb)
    clustered.groupBy("prediction").count().orderBy("prediction").show()
    print(f"wssse = {km.wssse(emb):.3f}")
    # silhouette over the first two embedding dims (the evaluator takes
    # plain numeric columns; slice them out of the array)
    flat = clustered.select(
        "prediction",
        F.col("embedding")[0].cast("double").alias("e0"),
        F.col("embedding")[1].cast("double").alias("e1"))
    (ClusteringEvaluator().setFeatureCols("e0", "e1")
     .setPredictionCol("prediction").evaluate(flat)
     .orderBy("cluster").show())

    spark.stop()


if __name__ == "__main__":
    main()
