"""Data-selection tour of the round-11 operators: greedy k-center
coreset selection over embeddings (diversity hull), length-bucketed
padding-waste audit for batch building, and the per-language tokenizer
fertility audit — composed with SemDeDup to show the select-for-
training workflow: dedup the redundant mass, pick the diverse hull,
then check what the surviving mix costs to batch and tokenize (gate
queries: kcenter_coreset_embeddings, padding_waste_documents,
tokenizer_fertility_documents, semdedup_embeddings)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.curation import PaddingWasteProfiler
    from flink_ml__spark.functions.similarity import (
        KCenterCoreset,
        SemDeDup,
    )
    from flink_ml__spark.functions.text import (
        TokenCounter,
        TokenizerFertilityProfiler,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("data-selection-example")
    emb = load_table(spark, "embeddings", SF_DIR)
    docs = load_table(spark, "documents", SF_DIR)

    print("== 1. semantic dedup: drop the redundant mass ==")
    kept = SemDeDup().setNList(8).setThreshold(0.95).transform(emb)
    print(f"kept {kept.count()} of {emb.count()} embeddings")

    print("== 2. k-center coreset: the diversity hull of what's left ==")
    coreset = (KCenterCoreset().setNumCenters(10)
               .select_centers(kept))
    coreset.show()
    print("(max dist2 of the last pick = coverage radius² of the"
          " first 9 centers)")

    print("== 3. padding-waste audit: what the batch builder pays ==")
    counted = TokenCounter().transform(docs)
    (PaddingWasteProfiler().setNumBuckets(4).transform(counted)
     .orderBy("bucket").show())
    baseline = (PaddingWasteProfiler().setNumBuckets(1)
                .transform(counted).first()["padding_frac"])
    print(f"unsorted-batching baseline waste: {baseline:.3f} "
          f"(compare per-bucket padding_frac above)")

    print("== 4. tokenizer fertility: which languages overpay ==")
    (TokenizerFertilityProfiler().setGroupCol("lang").transform(docs)
     .orderBy(F.desc("rel_fertility")).show())


if __name__ == "__main__":
    main()
