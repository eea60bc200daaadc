"""Crawl-ingest curation tour: URL parse → domain gate → canonical-URL
dedup → near-dedup against a persisted corpus signature index — the
first stages of a C4/RefinedWeb-style web pipeline, on the synthetic
documents table (URLs derived deterministically per doc)."""

import tempfile

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.dedup import MinHashDeduplicator
    from flink_ml__spark.functions.web import (
        DomainFilter,
        UrlDeduplicator,
        UrlParser,
    )
    from flink_ml__spark.sources import load_table

    spark = get_session("web-curation-example")
    docs = load_table(spark, "documents", SF_DIR)

    # the testdata ships no URL column — derive one per document the
    # way the gate queries do
    urls = docs.select(
        "doc_id", "text",
        F.concat(F.lit("https://www."), F.col("source"),
                 F.lit(".example"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".com/docs/"),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit("?utm_source=crawl&id="),
                 F.col("doc_id").cast("string")).alias("url"))

    parsed = UrlParser().setInputCol("url").transform(urls)
    print("== parsed URL parts ==")
    parsed.select("doc_id", "url_host", "url_domain", "url_path") \
        .show(5, truncate=False)

    gated = (DomainFilter().setInputCol("url")
             .setBlocklist("example0.com").transform(parsed))
    print(f"domain gate: {urls.count()} -> {gated.count()} rows "
          "(example0.com blocked, subdomains included)")

    unique = UrlDeduplicator().setInputCol("url").transform(gated)
    print(f"canonical-URL dedup: {gated.count()} -> {unique.count()}")

    # near-dedup the survivors against a persisted corpus index —
    # the cross-session shape: the corpus text is scanned ONCE,
    # later ingests load the parquet signature index
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    op = MinHashDeduplicator().setSeed(42).setThreshold(0.7)
    with tempfile.TemporaryDirectory(prefix="mh_index_") as d:
        op.save_index(d, corpus)
        idx = (MinHashDeduplicator().setSeed(42).setThreshold(0.7)
               .load_index(spark, d))
        clean = op.transform_against(unique, corpus_hashed=idx)
        print(f"near-dedup vs persisted index: {unique.count()} -> "
              f"{clean.count()}")
        clean.select("doc_id", "url_canonical").show(5, truncate=False)

        # the docs that survive near-dedup can still be MOSTLY made of
        # corpus-common boilerplate (navigation chrome, legal footers)
        # — compose the incremental boilerplate scorer on the same
        # corpus: fit the common-shingle statistic once, score the
        # crawl against it, drop the template-heavy tail. Same
        # "statistic fit on the curated side, applied to the incoming
        # side" shape as the signature index above; the streaming twin
        # (streaming.stream_boilerplate_score) replays exactly this
        # per micro-batch.
        from flink_ml__spark.functions.curation import (
            BoilerplateFractionScorer,
        )

        sc = BoilerplateFractionScorer().setShingleSize(3).setMinDf(2)
        common = sc.common_table(corpus).persist()
        scored = sc.transform_against(clean, common)
        kept = scored.filter(
            F.col("boilerplate_frac").isNull()
            | (F.col("boilerplate_frac") <= 0.5))
        print(f"boilerplate gate (frac <= 0.5): {clean.count()} -> "
              f"{kept.count()}")
        (scored.orderBy(F.desc_nulls_last("boilerplate_frac"))
         .select("doc_id", "n_shingles", "n_common", "boilerplate_frac")
         .show(5, truncate=False))
        common.unpersist()


if __name__ == "__main__":
    main()
