"""Time-series monitoring tour: bucket a raw event stream, detect the
dominant seasonality with the ACF, remove it, and watch the residual
with CUSUM + rolling features — the composed telemetry pipeline each
gate query exercises in isolation (acf_events,
seasonal_decompose_events, cusum_events, rolling_features_events,
interval_merge_events)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_ml__spark.functions import RollingFeatureGenerator
    from flink_ml__spark.functions.sessions import IntervalMerger
    from flink_ml__spark.functions.timeseries import (
        AutocorrelationAnalyzer,
        CusumDetector,
        SeasonalDecomposer,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("timeseries-monitoring-example")
    ev = load_table(spark, "events", SF_DIR)

    print("== hourly per-user series ==")
    series = (ev.filter(F.col("user_id").isNotNull()
                        & F.col("ts").isNotNull())
              .groupBy("user_id",
                       F.date_trunc("hour", "ts").alias("bk"))
              .agg(F.sum(F.round(F.col("value") * 100)
                         .cast("bigint")).alias("x")))
    series.orderBy("user_id", "bk").show(5)

    print("== ACF: which lag dominates each user's series? ==")
    acf = (AutocorrelationAnalyzer().setKeyCol("user_id")
           .setTimeCol("bk").setValueCol("x").setMaxLag(6)
           .transform(series))
    (acf.withColumn("rn", F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("acf"))))
        .filter("rn = 1").drop("rn").orderBy("user_id").show(5))

    print("== remove the daily season, then CUSUM the residual ==")
    de = (SeasonalDecomposer().setKeyCol("user_id").setTimeCol("ts")
          .setValueCol("value").setBucketWidthSec(3600.0)
          .setPeriod(24).transform(ev))
    de.select("user_id", "ts", "value", "phase", "deseasonalized") \
        .show(5)
    cusum = (CusumDetector().setKeyCol("user_id").setTimeCol("bk")
             .setValueCol("x").setSlack(50.0).setThreshold(20000.0)
             .transform(series))
    cusum.filter("is_alarm").orderBy("user_id", "bk").show(5)

    print("== supervised-learning frame: lags + rolling stats ==")
    feats = (RollingFeatureGenerator().setKeyCol("user_id")
             .setTimeCol("bk").setValueCol("x").setLags([1, 2])
             .setWindows([3]).transform(series))
    feats.orderBy("user_id", "bk").show(5)

    print("== exposure spans: merge per-event intervals ==")
    iv = ev.select("user_id", F.col("ts").alias("s"),
                   F.timestamp_micros(
                       F.unix_micros("ts")
                       + (F.col("event_id") % 120) * 1_000_000)
                   .alias("e"))
    spans = (IntervalMerger().setKeyCol("user_id").setStartCol("s")
             .setEndCol("e").transform(iv))
    spans.orderBy("user_id", "span_start").show(5)
    print("rows:", spans.count())


if __name__ == "__main__":
    main()
