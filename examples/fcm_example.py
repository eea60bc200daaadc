"""Fuzzy c-means over the embeddings table (mirrors FCMExample.java:
fit centroids, predict cluster ids)."""

from _common import SF_DIR, get_session


def main():
    from flink_ml__spark.operators import FCM
    from flink_ml__spark.sources import load_table

    spark = get_session("fcm-example")
    emb = load_table(spark, "embeddings", SF_DIR)
    model = (FCM().setK(4).setSeed(42).setMaxIter(10)
             .setFeaturesCol("embedding").fit(emb))
    model.transform(emb).groupBy("prediction").count() \
        .orderBy("prediction").show()


if __name__ == "__main__":
    main()
