"""Experimentation-analytics tour of the round-9 second-wave
operators: a windowed Welch A/B guardrail, CUPED variance reduction
from a pre-period covariate, a deterministic Poisson-bootstrap CI for
the metric, split-conformal intervals around a per-segment predictor,
Kaplan-Meier time-to-purchase with censoring, and bounded-grid
Theil-Sen / Mann-Kendall trend readouts (gate queries:
welch_ttest_events, welch_window_events, cuped_events,
bootstrap_ci_events, conformal_events, kaplan_meier_events,
theilsen_events, mann_kendall_events)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions import (
        CupedAdjuster,
        KaplanMeierEstimator,
        MannKendallTrendTest,
        PoissonBootstrapper,
        TheilSenTrendEstimator,
        WelchTTest,
    )
    from flink_ml__spark.functions.evaluation import SplitConformalRegressor
    from flink_ml__spark.sources import load_table
    from flink_ml__spark.streaming.online import stream_welch_monitor

    spark = get_session("experimentation-example")
    ev = load_table(spark, "events", SF_DIR).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull())

    print("== A/B readout: Welch t (purchase vs click values) ==")
    (WelchTTest().setValueCol("value").setGroupCol("event_type")
     .setGroups("purchase", "click").evaluate(ev).show())

    print("== the same guardrail per day (streaming twin code path) ==")
    (stream_welch_monitor(ev, "ts", "value", "event_type",
                          "purchase", "click", window="1 day")
     .orderBy("window_start").show(5))

    print("== CUPED: pre-period covariate shrinks metric variance ==")
    day = F.expr("unix_micros(ts) div 86400000000")
    units = (ev.groupBy("user_id")
             .agg(F.avg(F.when(day < 19738, F.col("value"))).alias("x"),
                  F.avg(F.when(day >= 19738, F.col("value"))).alias("y"))
             .filter("x IS NOT NULL AND y IS NOT NULL")
             .selectExpr("CASE WHEN user_id % 2 = 0 THEN 't' "
                         "ELSE 'c' END AS variant", "x", "y"))
    (CupedAdjuster().setMetricCol("y").setCovariateCol("x")
     .setVariants("t", "c").evaluate(units).show())

    print("== Poisson-bootstrap 95% CI for the mean event value ==")
    (PoissonBootstrapper().setIdCol("event_id").setValueCol("value")
     .setNumReplicas(64).evaluate(ev).show())

    print("== split-conformal intervals around a per-type predictor ==")
    preds = ev.groupBy("event_type").agg(
        F.avg("value").alias("prediction"))
    cal = ev.filter("event_id % 2 = 1").join(preds, "event_type")
    model = (SplitConformalRegressor().setPredCol("prediction")
             .setLabelCol("value").setGroupCols("event_type")
             .setAlpha(0.1).fit(cal))
    test = ev.filter("event_id % 2 = 0").join(preds, "event_type")
    model.evaluate(test, "value").show()

    print("== Kaplan-Meier: days to first purchase (censored) ==")
    per = ev.groupBy("user_id").agg(
        F.min("ts").alias("f"),
        F.min(F.when(F.col("event_type") == "purchase",
                     F.col("ts"))).alias("p"),
        F.max("ts").alias("l"))
    subj = per.select(
        F.floor((F.unix_micros(F.coalesce("p", "l"))
                 - F.unix_micros("f")) / 86400000000.0)
        .cast("double").alias("duration"),
        F.col("p").isNotNull().alias("event"))
    (KaplanMeierEstimator().evaluate(subj).orderBy("t").show(8))

    print("== robust trend: Theil-Sen slope + Mann-Kendall verdict ==")
    ts_est = (TheilSenTrendEstimator().setKeyCol("event_type")
              .setTimeCol("ts").setValueCol("value").setMaxBuckets(16))
    mk = (MannKendallTrendTest().setKeyCol("event_type")
          .setTimeCol("ts").setValueCol("value").setMaxBuckets(16))
    (ts_est.transform(ev).join(
        mk.transform(ev).select("event_type", "z_stat", "trend"),
        "event_type").orderBy("event_type").show())

    spark.stop()
    print("experimentation example: OK")


if __name__ == "__main__":
    main()
