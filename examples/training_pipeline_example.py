"""End-to-end training-data pipeline over the documents table:
metadata triage -> text normalization -> PII redaction -> repetition +
quality + Gopher-rule filtering -> exact dedup -> Bloom membership
filter vs an external corpus -> MinHash near-dedup -> substring span
dedup -> benchmark decontamination (whole-doc flag + span scrub) ->
language ID + token counts -> CCNet unigram-LM scoring + perplexity
bucketing -> DSIR target-corpus weighting -> train/val/test split ->
temperature-based domain balancing -> sequence packing -> epoch
shuffle -> corpus profile + domain-drift report — the LLM-data-
curation chain the engine's north-star operators compose into (each
stage is one of the gate queries; chained here as a single lazy plan
until the reports)."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.curation import (
        ContaminationChecker,
        CorpusProfiler,
        DeterministicSplitter,
        DomainBalancer,
        RepetitionScorer,
        SequencePacker,
    )
    from flink_ml__spark.functions.dedup import (
        ExactDeduplicator,
        MinHashDeduplicator,
    )
    from flink_ml__spark.functions.text import (
        LanguageIdentifier,
        PiiRedactor,
        QualityFilter,
        TokenCounter,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("training-pipeline-example")
    docs = load_table(spark, "documents", SF_DIR)
    n0 = docs.count()

    # 1. canonicalize (case/whitespace) then scrub PII before anything
    #    else touches the text
    from flink_ml__spark.functions.text import TextNormalizer

    norm = (TextNormalizer().transform(docs)
            .drop("text", "text_norm_chars")
            .withColumnRenamed("text_norm", "text"))
    red = (PiiRedactor().transform(norm)
           .drop("text").withColumnRenamed("text_redacted", "text"))

    # 2. heuristic quality: repetition signals, composite score, and the
    #    Gopher rule set (relaxed stop-word floor: synthetic vocabulary)
    from flink_ml__spark.functions.text import GopherQualityFilter

    rep = RepetitionScorer().setLineSep(r"\.").transform(red)
    filtered = QualityFilter().setMinScore(0.5).transform(
        rep.filter(F.col("top_word_frac") < 0.5))
    filtered = (GopherQualityFilter().setMinWords(20).setMinStopHits(1)
                .transform(filtered).filter(F.col("gopher_pass")))
    n1 = filtered.count()

    # 3. dedup: exact, MinHash near-duplicates, then duplicated >=8-token
    #    spans inside the survivors (Lee et al. 2022)
    from flink_ml__spark.functions.dedup import SubstringDeduplicator

    exact = ExactDeduplicator().transform(filtered)
    # drop anything already present in a previously-shipped corpus
    # (here: the even doc_ids) via the map-only Bloom membership probe
    from flink_ml__spark.functions.dedup import BloomCorpusDeduplicator

    shipped = docs.filter(F.col("doc_id") % 2 == 0)
    fresh = (BloomCorpusDeduplicator().setNumBits(1 << 18)
             .transform_against(exact.filter(F.col("doc_id") % 2 == 1),
                                shipped))
    near = (MinHashDeduplicator().setSeed(42).setThreshold(0.7)
            .transform(fresh))
    span = (SubstringDeduplicator().setSpanTokens(8).transform(near)
            .drop("text").withColumnRenamed("text_deduped", "text")
            .drop("n_tokens", "n_removed"))
    n2 = span.count()

    # 4. decontaminate against a benchmark corpus (every 97th doc here):
    #    drop heavily-overlapping documents, then scrub any surviving
    #    >=6-token benchmark span out of the text
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    checked = (ContaminationChecker().setShingleSize(5).setThreshold(0.2)
               .transform_against(span, benchmark)
               .filter(~F.col("is_contaminated")))
    scrubbed = (SubstringDeduplicator().setSpanTokens(6)
                .transform_against(checked, benchmark)
                .drop("text").withColumnRenamed("text_deduped", "text")
                .drop("n_tokens", "n_removed"))
    n3 = scrubbed.count()

    # 5. annotate: language + token counts; CCNet fluency scoring with
    #    head/middle/tail buckets (drop the tail); DSIR weighting toward
    #    the corpus's English slice; deterministic split
    from flink_ml__spark.functions.curation import (
        DSIRSelector,
        PerplexityBucketer,
        UnigramLM,
    )

    ann = TokenCounter().transform(
        LanguageIdentifier().transform(scrubbed))
    lm = UnigramLM().setMaxVocab(2000).fit(ann)
    scored = PerplexityBucketer().transform(lm.transform(ann))
    kept = scored.filter(F.col("ppl_bucket") != "tail")
    dsir = DSIRSelector().setNumBuckets(512).fit(
        ann.filter(F.col("lang") == "en"), ann)
    weighted = dsir.transform(kept)
    split = DeterministicSplitter().setTrainFrac(0.9).setValFrac(0.05) \
        .transform(weighted)

    # 6. rebalance the train split: flatten the language mix with a
    #    sampling temperature instead of a hand-written target map
    train = split.filter(F.col("split") == "train")
    balanced = (DomainBalancer().setGroupCol("lang")
                .with_temperature(train, 3.0)
                .transform(train))

    # 7. pack into fixed token windows, then assign the deterministic
    #    epoch-0 training order (shard, position)
    from flink_ml__spark.functions.curation import EpochShuffler

    packed = (SequencePacker().setWindowSize(2048).setNumShards(16)
              .transform(balanced))
    ordered = EpochShuffler().setNumShards(16).setEpoch(0) \
        .transform(packed)
    n4 = ordered.count()

    print(f"documents: {n0} -> quality {n1} -> dedup+span {n2} "
          f"-> decontaminated+scrubbed {n3} -> packed train rows {n4}")

    # 8. profile what ships + check no language drifted from the corpus
    from flink_ml__spark.functions.curation import DomainDivergence

    (CorpusProfiler().setGroupCols("lang").setValueCol("n_tokens")
     .transform(ordered)
     .orderBy(F.desc("n_docs"))
     .show())
    (DomainDivergence().setGroupCol("lang").setVocabSize(300)
     .transform(ordered)
     .orderBy(F.desc("kl_to_corpus"))
     .show())


if __name__ == "__main__":
    main()
