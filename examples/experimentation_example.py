"""Experimentation-analytics tour of the round-9 second-wave
operators — the full A/B readout chain: validity first (SRM split
check, covariate balance), then power (MDE), the metric readout
(Welch + windowed guardrail, CUPED variance reduction, DiD), honest
uncertainty (Poisson-bootstrap CI, split-conformal intervals),
multiplicity control (BH FDR over the windowed battery), and the
time-to-event view (Kaplan-Meier, log-rank, Weibull) with robust
trend readouts (Theil-Sen / Mann-Kendall). Gate queries:
srm_window_events, covariate_balance_events, mde_events,
welch_ttest_events, welch_window_events, cuped_events, did_events,
bootstrap_ci_events, conformal_events, fdr_events,
kaplan_meier_events, logrank_events, weibull_events,
theilsen_events, mann_kendall_events."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions import (
        CovariateBalanceChecker,
        CupedAdjuster,
        DiffInDiffAnalyzer,
        KaplanMeierEstimator,
        LogRankTest,
        MannKendallTrendTest,
        MdeCalculator,
        PoissonBootstrapper,
        SrmChecker,
        TheilSenTrendEstimator,
        WeibullFitter,
        WelchTTest,
    )
    from flink_ml__spark.functions.evaluation import SplitConformalRegressor
    from flink_ml__spark.sources import load_table
    from flink_ml__spark.streaming.online import stream_welch_monitor

    spark = get_session("experimentation-example")
    ev = load_table(spark, "events", SF_DIR).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull())

    print("== validity: SRM split check + covariate balance ==")
    units_v = (ev.groupBy("user_id")
               .agg(F.avg("value").alias("pre_mean"),
                    F.count(F.lit(1)).cast("double").alias("pre_n"))
               .selectExpr("CASE WHEN user_id % 2 = 0 THEN 'even' "
                           "ELSE 'odd' END AS variant",
                           "pre_mean", "pre_n"))
    (SrmChecker().setVariants("even", "odd").setRatioA(0.5)
     .evaluate(units_v).show())
    (CovariateBalanceChecker().setInputCols("pre_mean", "pre_n")
     .setVariantCol("variant").setLabels("even", "odd")
     .evaluate(units_v).show())

    print("== power: minimum detectable effect at this traffic ==")
    (MdeCalculator().setMetricCol("pre_mean")
     .setVariants("even", "odd").evaluate(units_v).show())

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

    print("== DiD: change beyond the control group's change ==")
    day2 = F.expr("unix_micros(ts) div 86400000000")
    pre2 = ev.select(
        F.when(F.col("user_id") % 2 == 0, "t").otherwise("c")
        .alias("variant"), (day2 >= 19738).alias("post"),
        F.col("value").alias("y"))
    (DiffInDiffAnalyzer().setMetricCol("y").setGroupCol("variant")
     .setTreatedLabel("t").setPostCol("post").evaluate(pre2).show())

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

    print("== log-rank + Weibull over the same subjects ==")
    subj2 = per.select(
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd")
        .alias("grp"),
        F.floor((F.unix_micros(F.coalesce("p", "l"))
                 - F.unix_micros("f")) / 86400000000.0)
        .cast("double").alias("duration"),
        F.col("p").isNotNull().alias("event"))
    (LogRankTest().setGroupCol("grp").setGroups("even", "odd")
     .evaluate(subj2).show())
    WeibullFitter().evaluate(subj2).show()

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
