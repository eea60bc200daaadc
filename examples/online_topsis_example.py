"""OnlineTopsis fit + model apply over events (mirrors
OnlineTopsisExample.java: per-window mean vectors scored by TOPSIS, rows
scored by the window model covering them)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.operators import OnlineTopsis
    from flink_ml__spark.sources import load_table

    spark = get_session("online-topsis-example")
    ev = load_table(spark, "events", SF_DIR).select(
        F.unix_millis("ts").alias("id"),
        F.array("value", F.length("props").cast("double")).alias("features"),
        F.col("ts").alias("rowtime"))
    model = (OnlineTopsis().setCriteriaTypes([1, 2]).setWeights([0.5, 0.5])
             .setWindows("1 day").setTimeCol("rowtime").setIdCol("id")
             .fit(ev).setPredictionCol("prediction"))
    print("window models:")
    model.getModelData().show(5)
    model.transform(ev).select("id", "prediction").show(5)


if __name__ == "__main__":
    main()
