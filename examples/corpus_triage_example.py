"""Corpus-triage tour of the round-9 operators: corpus health via the
Zipf rank-frequency fit, per-document lexical-diversity and
code-density signals, one-pass Naive Bayes routing, contrastive
hard-negative mining over embeddings, and Holt + inter-arrival
telemetry on the event feed (gate queries: zipf_documents,
lexical_diversity_documents, code_density_documents,
nb_lang_documents, hard_negatives_embeddings, holt_forecast_events,
interarrival_events)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions import NaiveBayesTextClassifier
    from flink_ml__spark.functions.curation import ZipfProfiler
    from flink_ml__spark.functions.similarity import HardNegativeMiner
    from flink_ml__spark.functions.text import (
        CodeDensityProfiler,
        LexicalDiversityScorer,
    )
    from flink_ml__spark.functions.timeseries import (
        HoltForecaster,
        InterArrivalProfiler,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("corpus-triage-example")
    docs = load_table(spark, "documents", SF_DIR)

    print("== corpus health: Zipf rank-frequency fit ==")
    ZipfProfiler().setMaxRank(128).transform(docs).show()

    print("== per-doc diversity + code-density signals ==")
    scored = CodeDensityProfiler().transform(
        LexicalDiversityScorer().transform(docs))
    (scored.select("doc_id", "ttr", "shannon_entropy", "code_score",
                   "is_code")
     .orderBy(F.desc("code_score")).show(5))

    print("== one-pass NB language routing (fit + apply) ==")
    nb = NaiveBayesTextClassifier().setLabelCol("lang").fit(docs)
    out = nb.transform(docs)
    (out.groupBy("lang", "nb_pred").count()
     .orderBy(F.desc("count")).show(8))

    print("== contrastive hard negatives over embeddings ==")
    emb = load_table(spark, "embeddings", SF_DIR)
    anchors = emb.filter(F.col("vec_id") % 100 == 0)
    (HardNegativeMiner().setK(3).setLabelCol("label")
     .setSimLo(0.0).setSimHi(0.95).mine(anchors, emb)
     .orderBy("query_id", "rank").show(6))

    print("== composition: Gini concentration + temperature remix ==")
    from flink_ml__spark.functions.curation import TemperatureMixer
    from flink_ml__spark.functions.stats import (
        GiniConcentration,
        OtsuThreshold,
        SpearmanCorrelation,
    )

    GiniConcentration().setGroupCol("lang").setWeightCol("n_chars") \
        .transform(docs).show()
    TemperatureMixer().setGroupCol("lang").setTemperature(0.7) \
        .setTokenBudget(1_000_000).transform(docs).show()

    print("== auto threshold over the size distribution (Otsu) ==")
    OtsuThreshold().setInputCol("n_chars").transform(docs).show()

    print("== monotone association screen (Spearman) ==")
    li = load_table(spark, "lineitem", SF_DIR)
    (SpearmanCorrelation()
     .setInputCols("l_quantity", "l_extendedprice", "l_discount")
     .transform(li).show())

    print("== event-feed telemetry: Holt trend + burstiness ==")
    ev = load_table(spark, "events", SF_DIR)
    (HoltForecaster().setKeyCol("event_type").setTimeCol("ts")
     .setValueCol("value").setHorizon(3).transform(ev).show())
    (InterArrivalProfiler().setKeyCol("event_type").setTimeCol("ts")
     .setTieCol("event_id").transform(ev).show())

    print("corpus-triage example: OK")


if __name__ == "__main__":
    main()
