"""Corpus retrieval tour: BM25 keyword search over an inverted
postings index, exact embedding-cosine search, and reciprocal-rank
fusion of the two — the targeted-curation loop ("pull the documents
most relevant to each seed prompt") plus heavy-hitter and weighted-
sample profiling of what came back."""

from _common import SF_DIR, get_session


def main():
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.curation import WeightedSampler
    from flink_ml__spark.functions.retrieval import (
        BM25Retriever,
        ReciprocalRankFusion,
    )
    from flink_ml__spark.functions.similarity import CosineTopK
    from flink_ml__spark.functions.sketches import HeavyHitters
    from flink_ml__spark.functions.text import TOKEN_SPLIT
    from flink_ml__spark.sources import load_table

    spark = get_session("retrieval-example")
    docs = load_table(spark, "documents", SF_DIR)
    emb = load_table(spark, "embeddings", SF_DIR)

    # seed queries: the first six tokens of every 29th document
    toks = F.filter(F.split(F.lower(F.coalesce("text", F.lit(""))),
                            TOKEN_SPLIT), lambda t: t != "")
    queries = (docs.filter(F.col("doc_id") % 29 == 0)
               .select(F.col("doc_id").alias("query_id"),
                       F.array_join(F.slice(toks, 1, 6), " ")
                       .alias("query_text")))

    print("== BM25 lexical top-5 (reusable postings index) ==")
    bm25 = BM25Retriever().setTopK(5)
    index = bm25.postings(docs)
    lex = bm25.retrieve(docs, queries, postings=index)
    lex.orderBy("query_id", "rank").show(6)

    print("== exact cosine top-5 over the embeddings ==")
    sem = (CosineTopK().setK(5)
           .topk(emb.filter(F.col("vec_id") % 29 == 0), emb)
           .select("query_id", F.col("neighbor_id").alias("doc_id"),
                   "rank"))
    sem.orderBy("query_id", "rank").show(6)

    print("== hybrid: reciprocal rank fusion of both rankers ==")
    fused = (ReciprocalRankFusion().setTopK(5)
             .fuse([lex.select("query_id", "doc_id", "rank"), sem]))
    fused.orderBy("query_id", "rank").show(6)

    print("== heavy-hitter tokens across the retrieved documents ==")
    hits = (fused.select(F.col("doc_id")).distinct()
            .join(docs, "doc_id"))
    (HeavyHitters().setMinShare(0.01).setNumCounters(256)
     .transform(hits).orderBy(F.desc("count")).show(5))

    print("== length-weighted sample of the corpus for inspection ==")
    (WeightedSampler().setWeightCol("n_chars").setN(5)
     .transform(docs).select("doc_id", "n_chars", "sample_key").show())

    print("== ranking quality: IVF ANN scored against the exact "
          "cosine ground truth ==")
    from flink_ml__spark.functions.retrieval import RankingEvaluator
    from flink_ml__spark.functions.similarity import IVFCosineTopK

    queries_emb = emb.filter(F.col("vec_id") % 29 == 0)
    truth = sem.select("query_id", "doc_id")
    approx = (IVFCosineTopK().setK(5).setNList(8).setNProbe(2)
              .setSeed(42).topk(queries_emb, emb)
              .select("query_id", F.col("neighbor_id").alias("doc_id"),
                      "rank"))
    (RankingEvaluator().setK(5).evaluate(approx, truth)
     .agg(F.round(F.avg("recall_at_k"), 3).alias("mean_recall@5"),
          F.round(F.avg("mrr"), 3).alias("mean_mrr"),
          F.round(F.avg("ndcg_at_k"), 3).alias("mean_ndcg@5"))
     .show())

    print("== compressed ANN: IVF-PQ (cells + residual codes + refine) ==")
    from flink_ml__spark.functions.similarity import IVFPQTopK

    ivfpq = (IVFPQTopK().setK(5).setNList(8).setNProbe(4)
             .setNumSubspaces(8).setBitsPerCode(6).setSeed(42)
             .setRefineFactor(4).train(emb))
    approx_pq = (ivfpq.topk(queries_emb, emb)
                 .select("query_id", F.col("neighbor_id").alias("doc_id"),
                         "rank"))
    (RankingEvaluator().setK(5).evaluate(approx_pq, truth)
     .agg(F.round(F.avg("recall_at_k"), 3).alias("mean_recall@5"),
          F.round(F.avg("mrr"), 3).alias("mean_mrr"))
     .show())


if __name__ == "__main__":
    main()
