"""End-to-end training-data pipeline over the documents table:
metadata triage -> exact dedup -> MinHash near-dedup -> quality filter
-> language ID + token counts — the LLM-data-curation chain the engine's
north-star operators compose into (each stage is one of the gate
queries; chained here as a single lazy plan)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.dedup import (
        ExactDeduplicator,
        MinHashDeduplicator,
    )
    from flink_ml__spark.functions.text import (
        LanguageIdentifier,
        QualityFilter,
        TokenCounter,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("training-pipeline-example")
    docs = load_table(spark, "documents", SF_DIR)
    n0 = docs.count()

    exact = ExactDeduplicator().transform(docs)
    n1 = exact.count()

    near = MinHashDeduplicator().setSeed(42).setThreshold(0.7) \
        .transform(exact)
    n2 = near.count()

    quality = QualityFilter().setMinScore(0.5).transform(near)
    n3 = quality.count()

    final = TokenCounter().transform(
        LanguageIdentifier().transform(quality))
    print(f"documents: {n0} -> exact-dedup {n1} -> near-dedup {n2} "
          f"-> quality {n3}")
    (final.groupBy("lang_pred")
     .agg(F.count(F.lit(1)).alias("docs"),
          F.sum("n_tokens").alias("tokens"))
     .orderBy(F.desc("docs"))
     .show())


if __name__ == "__main__":
    main()
