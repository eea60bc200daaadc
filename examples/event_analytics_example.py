"""End-to-end event-analytics tour over the events table: gap
sessionization -> as-of feature lookup (backward/forward/nearest) ->
point-in-interval attribution -> gap-filled rollups with locf ->
rolling anomaly flags -> per-day trending event types -> weekly cohort
retention -> ordered funnel conversion -> PageRank over the
interaction graph — the telemetry/clickstream capabilities that sit
beside the training-data curation chain (each stage is one of the
gate queries)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.graph import PageRank
    from flink_ml__spark.functions.joins import AsOfJoiner, RangeJoiner
    from flink_ml__spark.functions.sessions import Sessionizer
    from flink_ml__spark.functions.timeseries import (
        CohortRetention,
        FunnelAnalyzer,
        RollingAnomalyDetector,
        TimeBucketRollup,
        TrendingItems,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("event-analytics-example")
    ev = load_table(spark, "events", SF_DIR)

    print("== 30-minute-gap sessions per user ==")
    sessions = Sessionizer().setGap("30 minutes").transform(ev)
    sessions.orderBy(F.desc("n_events")).show(5)

    print("== nearest as-of: odd events pick up the closest even-id "
          "event's value ==")
    left = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "ts")
    right = ev.filter(F.col("event_id") % 2 == 0).select(
        "user_id", "ts", "value")
    AsOfJoiner().setDirection("nearest").join(left, right, ["value"]) \
        .show(5)

    print("== range join: events attributed to 2-hour windows ==")
    ivs = (ev.filter(F.col("event_id") % 7 == 0)
           .select("user_id", F.col("ts").alias("range_start"),
                   (F.col("ts") + F.expr("INTERVAL 2 HOURS"))
                   .alias("range_end"), F.col("value").alias("iv_value")))
    RangeJoiner().setBucketWidthSec(3600.0).join(
        ev.select("event_id", "user_id", "ts"), ivs, ["iv_value"]) \
        .show(5)

    print("== gap-filled 6h rollup (locf) + rolling anomaly flags ==")
    roll = (TimeBucketRollup().setBucketWidthSec(6 * 3600.0)
            .setFill("locf").transform(ev))
    flags = (RollingAnomalyDetector().setWindow(8).setMinPeriods(4)
             .setThreshold(2.5).transform(roll))
    flags.filter("is_anomaly").orderBy(F.desc(F.abs("zscore"))).show(5)

    print("== per-day trending event types ==")
    TrendingItems().setItemCol("event_type").setTopK(3).transform(ev) \
        .orderBy("bucket_start", "rank").show(6)

    print("== weekly cohort retention ==")
    CohortRetention().transform(ev).orderBy("cohort_start", "age").show(6)

    print("== view -> click -> purchase funnel ==")
    FunnelAnalyzer().setSteps("view", "click", "purchase").summary(ev) \
        .show()

    print("== PageRank over the interaction graph ==")
    edges = ev.select(F.col("user_id").alias("src"),
                      (F.col("event_id") % 150).alias("dst"))
    PageRank().setMaxIter(5).transform(edges) \
        .orderBy(F.desc("rank")).show(5)

    print("== distinct users per event type: exact vs HLL++ sketch ==")
    from flink_ml__spark.functions.sketches import (
        DistinctCounter,
        SkewProfiler,
    )

    (DistinctCounter().setKeyCol("user_id").setGroupCols("event_type")
     .setRelativeSD(0.05).error_report(ev)
     .orderBy("event_type").show())

    print("== shuffle-key skew pre-flight: hottest (type, user) keys ==")
    (SkewProfiler().setKeyCols("event_type", "user_id").setTopN(5)
     .transform(ev).orderBy(F.desc("cnt")).show())
    SkewProfiler().setKeyCols("event_type").summary(ev).show()

    print("== triangle counting / clustering over the mod-97 graph ==")
    from flink_ml__spark.functions.graph import TriangleCounter

    tri_edges = ev.select((F.col("user_id") % 97).alias("src"),
                          (F.col("event_id") % 97).alias("dst"))
    TriangleCounter().transform(tri_edges) \
        .orderBy(F.desc("triangles")).show(5)

    print("== mean-shift change points on the hourly value series ==")
    from flink_ml__spark.functions.timeseries import MeanShiftDetector

    hour_us = 3600 * 1_000_000
    series = (ev.filter("ts IS NOT NULL AND event_type IS NOT NULL")
              .groupBy("event_type",
                       (F.floor(F.unix_micros("ts") / hour_us)
                        * hour_us).cast("bigint").alias("t_us"))
              .agg(F.avg("value").alias("v")))
    (MeanShiftDetector().setKeyCol("event_type").setTimeCol("t_us")
     .setValueCol("v").setWindow(6).setThreshold(3.0)
     .transform(series)
     .orderBy(F.desc_nulls_last("shift")).show(5))

    print("== windowed correlation: value vs user id per day ==")
    from flink_ml__spark.streaming import stream_correlation_monitor

    (stream_correlation_monitor(ev.filter("ts IS NOT NULL"), "ts",
                                [("value", "user_id")], window="1 day")
     .orderBy("window_start").show(5))

    print("== EWMA smoothing + one-step forecast of the value series ==")
    from flink_ml__spark.functions.timeseries import ExponentialSmoother

    (ExponentialSmoother().setKeyCol("user_id").setTimeCol("event_id")
     .setValueCol("value").setAlpha(0.3)
     .transform(ev)
     .select("event_id", "user_id", "value",
             F.round("ewma", 3).alias("ewma"),
             F.round("residual", 3).alias("residual"))
     .orderBy("user_id", "event_id").show(6))

    print("== count-min frequency sketch: per-user event rates in "
          "O(depth*width) memory ==")
    from flink_ml__spark.functions.sketches import CountMinSketch

    cms = (CountMinSketch().setInputCol("user_id")
           .setDepth(5).setWidth(2048).build(ev))
    (cms.transform(ev).groupBy("user_id")
     .agg(F.first("cms_est").alias("cms_est"),
          F.count(F.lit(1)).alias("exact"))
     .orderBy(F.desc("exact")).show(5))

    print("== daily OHLC candles per event type (order stats inside "
          "one hash aggregate) ==")
    from flink_ml__spark.functions.timeseries import OhlcRollup

    (OhlcRollup().setBucketWidthSec(86400.0).transform(ev)
     .orderBy("event_type", "bucket_start").show(6))

    print("== what do users do next? first-order Markov transitions ==")
    from flink_ml__spark.functions.timeseries import TransitionMatrix

    (TransitionMatrix().transform(ev)
     .orderBy(F.desc("prob")).show(8))

    print("== windowed KS drift vs the full-table reference "
          "(distribution-shape twin of the PSI monitor) ==")
    from flink_ml__spark.streaming import stream_ks_monitor

    (stream_ks_monitor(ev.filter("ts IS NOT NULL"), "ts", "value",
                       reference=ev.filter("ts IS NOT NULL"),
                       num_buckets=8, window="7 days")
     .orderBy("window_start").show(5))


if __name__ == "__main__":
    main()
