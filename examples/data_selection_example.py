"""Data-selection tour: greedy k-center coreset selection over
embeddings (diversity hull), greedy max-coverage selection over text
(lexical hull), UniMax budget allocation across sources, the
length-bucketed padding-waste audit and the per-language tokenizer
fertility audit — composed with SemDeDup to show the select-for-
training workflow: dedup the redundant mass, pick the diverse hull in
BOTH embedding and token space, water-fill the token budget over
domains, then check what the surviving mix costs to batch and
tokenize (gate queries: kcenter_coreset_embeddings,
coverage_coreset_documents, unimax_alloc_documents,
padding_waste_documents, tokenizer_fertility_documents,
semdedup_embeddings)."""

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

    print("== 3. max-coverage coreset: the lexical hull ==")
    from flink_ml__spark.functions.curation import (
        GreedyCoverageSelector,
        UniMaxAllocator,
    )

    lex = (GreedyCoverageSelector().setNumDocs(6)
           .select_docs(docs))
    lex.show()
    print("(gain = new distinct shingles each pick adds — the"
          " token-space complement of step 2's dist2)")

    print("== 4. UniMax: water-fill the token budget over sources ==")
    total = (docs.filter(F.col("source").isNotNull())
             .agg(F.sum("n_chars")).first()[0])
    (UniMaxAllocator().setGroupCol("source").setTokenCol("n_chars")
     .setMaxEpochs(1.2).setBudget(int(1.15 * float(total)))
     .transform(docs)
     .orderBy(F.desc("epochs")).show(8))
    print("(capped domains sit at maxEpochs; the rest share the"
          " water level — no domain is over-epoched to burn budget)")

    print("== 5. padding-waste audit: what the batch builder pays ==")
    counted = TokenCounter().transform(docs)
    (PaddingWasteProfiler().setNumBuckets(4).transform(counted)
     .orderBy("bucket").show())
    baseline = (PaddingWasteProfiler().setNumBuckets(1)
                .transform(counted).first()["padding_frac"])
    print(f"unsorted-batching baseline waste: {baseline:.3f} "
          f"(compare per-bucket padding_frac above)")

    print("== 6. tokenizer fertility: which languages overpay ==")
    (TokenizerFertilityProfiler().setGroupCol("lang").transform(docs)
     .orderBy(F.desc("rel_fertility")).show())


if __name__ == "__main__":
    main()
