"""Tests for the deduplication operators."""

from pyspark.sql import functions as F

from flink_ml__spark.functions.dedup import (
    EmbeddingCosineDeduplicator,
    ExactDeduplicator,
    MinHashDeduplicator,
    NgramJaccardDeduplicator,
    SimHashDeduplicator,
)

BASE = ("the quick brown fox jumps over the lazy dog while the cat sleeps "
        "in the warm sun near the old wooden fence")
DOCS = [
    (1, BASE),
    (2, BASE),                                     # exact dup of 1
    (3, "The  Quick brown fox jumps over the lazy dog while the cat sleeps "
        "in the warm sun near the old wooden fence"),   # case/ws variant
    (4, BASE.replace("warm sun", "bright sun")),   # near dup of 1
    (5, "completely different content about spark sql engines and query "
        "optimization with catalyst and tungsten runtime layers"),
    (6, "another unrelated document mentioning flink streaming watermarks "
        "state backends and exactly once processing guarantees"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark):
    out = ExactDeduplicator().transform(_df(spark))
    kept = sorted(r["doc_id"] for r in out.collect())
    # 2 and 3 are exact (normalized) dups of 1; 4/5/6 survive
    assert kept == [1, 4, 5, 6]


def test_minhash_dedup(spark):
    op = MinHashDeduplicator().setSeed(42).setThreshold(0.7)
    pairs = op.duplicate_pairs(_df(spark)).collect()
    dup_edges = {(r["id_keep"], r["id_dup"]) for r in pairs}
    assert (1, 2) in dup_edges and (1, 3) in dup_edges
    assert (1, 4) in dup_edges  # near dup caught
    assert not any(5 in e or 6 in e for e in dup_edges)
    kept = sorted(r["doc_id"] for r in op.transform(_df(spark)).collect())
    assert kept == [1, 5, 6]


def test_simhash_dedup(spark):
    op = SimHashDeduplicator().setHammingThreshold(6)
    kept = sorted(r["doc_id"] for r in op.transform(_df(spark)).collect())
    assert 1 in kept and 5 in kept and 6 in kept
    assert 2 not in kept and 3 not in kept  # identical token sets


def test_ngram_jaccard_dedup(spark):
    op = NgramJaccardDeduplicator().setThreshold(0.7)
    kept = sorted(r["doc_id"] for r in op.transform(_df(spark)).collect())
    assert kept == [1, 5, 6]


def test_embedding_cosine_dedup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    op = EmbeddingCosineDeduplicator().setSeed(7).setThreshold(0.99)
    kept = sorted(r["vec_id"] for r in op.transform(df).collect())
    assert kept == [1, 3, 4]


def test_dedup_on_documents_table(spark):
    from flink_ml__spark.sources import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    n = docs.count()
    out = ExactDeduplicator().transform(docs)
    assert 0 < out.count() <= n
    out2 = MinHashDeduplicator().setSeed(42).transform(docs)
    assert 0 < out2.count() <= n


def test_minhash_transform_star_pairing_mega_cluster(spark):
    """transform() must stay linear in duplicate-cluster size: a
    planted cluster of C identical docs (they share EVERY band key —
    the 100 TB boilerplate case) generates exactly C−1 star candidates
    (each member vs the bucket min-id), never C²/2 all-pairs, and the
    kept set is the cluster min plus all non-duplicates."""
    rows = [(i, "boilerplate page text repeated everywhere exactly "
                "the same way across mirrored sites")
            for i in range(100, 140)]
    rows.append((1, "a genuinely unique document about spark engines"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    op = MinHashDeduplicator().setSeed(42).setThreshold(0.7)
    kept = sorted(r["doc_id"] for r in op.transform(df).collect())
    assert kept == [1, 100]
    # star candidate volume: C−1 dominated ids for the 40-copy cluster
    assert op.dominated_ids(df).count() == 39


def test_minhash_transform_against_corpus(spark):
    """Incremental dedup: new docs near-duplicating ANY corpus doc drop;
    novel docs survive; intra-batch duplicates are untouched."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "an entirely different corpus document about spark engines")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),  # dup of 1
         (11, "completely novel text that matches nothing else at all"),
         (12, "completely novel text that matches nothing else at all")],  # intra-batch dup: kept
        ["doc_id", "text"])
    op = MinHashDeduplicator().setSeed(42).setThreshold(0.7)
    kept = sorted(r["doc_id"]
                  for r in op.transform_against(new, corpus).collect())
    assert kept == [11, 12]
    # precomputed corpus signatures give the same answer
    kept2 = sorted(r["doc_id"] for r in op.transform_against(
        new, corpus_hashed=op.hashed_table(corpus)).collect())
    assert kept2 == [11, 12]


def test_ngram_transform_against_corpus(spark):
    """Exact incremental dedup: prefix-filter join across two tables
    (zero false negatives, unlike the MinHash variant)."""
    from flink_ml__spark.functions.dedup import NgramJaccardDeduplicator

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "an entirely different corpus document about spark engines")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),
         (11, "completely novel text that matches nothing else at all"),
         (12, "completely novel text that matches nothing else at all")],
        ["doc_id", "text"])
    op = NgramJaccardDeduplicator().setThreshold(0.7)
    kept = sorted(r["doc_id"]
                  for r in op.transform_against(new, corpus).collect())
    assert kept == [11, 12]
    kept2 = sorted(r["doc_id"] for r in op.transform_against(
        new, corpus_hashed=op.hashed_table(corpus)).collect())
    assert kept2 == [11, 12]


def test_stream_minhash_dedup_against_corpus(spark):
    import shutil
    import tempfile

    from flink_ml__spark.streaming import (
        stream_minhash_dedup_against_corpus,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),
         (11, "completely novel text that matches nothing else at all")],
        ["doc_id", "text"])
    op = MinHashDeduplicator().setSeed(42).setThreshold(0.7)

    survived = []

    def emit(clean_df, batch_id):
        survived.extend(r["doc_id"] for r in clean_df.collect())

    d = tempfile.mkdtemp(prefix="smh_")
    try:
        new.coalesce(1).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(new.schema).parquet(d)
        q = (stream.writeStream
             .foreachBatch(stream_minhash_dedup_against_corpus(
                 corpus, op, emit))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert sorted(survived) == [11]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_minhash_against_matches_batch(spark):
    """Stream==batch parity on the real documents table: the
    foreachBatch streaming path over the odd-id crawl half must keep
    exactly the ids that batch ``transform_against`` keeps — the gate
    (``dedup_minhash_against_documents``) and its streaming twin are
    the same computation."""
    import shutil
    import tempfile

    from flink_ml__spark.sources import load_table
    from flink_ml__spark.streaming import (
        stream_minhash_dedup_against_corpus,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    crawl = docs.filter(F.col("doc_id") % 2 == 1)
    op = MinHashDeduplicator().setSeed(42).setThreshold(0.7)
    batch_kept = sorted(
        r["doc_id"]
        for r in op.transform_against(crawl, corpus).collect())

    survived = []

    def emit(clean_df, batch_id):
        survived.extend(r["doc_id"] for r in clean_df.collect())

    d = tempfile.mkdtemp(prefix="smhp_")
    try:
        # two files → at least two micro-batches with maxFilesPerTrigger
        crawl.filter(F.col("doc_id") % 4 == 1).coalesce(1) \
            .write.mode("overwrite").parquet(d + "/a")
        crawl.filter(F.col("doc_id") % 4 == 3).coalesce(1) \
            .write.mode("append").parquet(d + "/a")
        stream = (spark.readStream.schema(crawl.schema)
                  .option("maxFilesPerTrigger", 1).parquet(d + "/a"))
        q = (stream.writeStream
             .foreachBatch(stream_minhash_dedup_against_corpus(
                 corpus, op, emit))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        assert sorted(survived) == batch_kept
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_embedding_transform_against_corpus(spark):
    """Incremental vector dedup: new embeddings near a corpus vector
    drop; novel directions survive; intra-batch dups untouched."""
    from flink_ml__spark.functions.dedup import EmbeddingCosineDeduplicator

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], ["vec_id", "embedding"])
    new = spark.createDataFrame(
        [(10, [0.999, 0.01, 0.0, 0.0]),   # near-dup of corpus 1
         (11, [0.0, 1.0, 0.0, 0.0]),
         (12, [0.0, 1.0, 0.0, 0.0])],     # intra-batch dup: kept
        ["vec_id", "embedding"])
    op = EmbeddingCosineDeduplicator().setSeed(7).setThreshold(0.99)
    kept = sorted(r["vec_id"]
                  for r in op.transform_against(new, corpus).collect())
    assert kept == [11, 12]
    kept2 = sorted(r["vec_id"] for r in op.transform_against(
        new, corpus_keyed=op.keyed_table(corpus)).collect())
    assert kept2 == [11, 12]


def test_simhash_transform_against_corpus(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),
         (11, "completely novel text that matches nothing else at all")],
        ["doc_id", "text"])
    op = SimHashDeduplicator().setHammingThreshold(3)
    kept = sorted(r["doc_id"]
                  for r in op.transform_against(new, corpus).collect())
    assert kept == [11]


def test_substring_dedup_golden(spark):
    from flink_ml__spark.functions.dedup import SubstringDeduplicator

    span = "alpha beta gamma delta epsilon"  # the planted 5-token span
    docs = spark.createDataFrame(
        [(1, f"unique opening words here {span} and a unique tail one"),
         (2, f"totally different start text {span} plus another ending"),
         (3, "no shared span in this document at all whatsoever today")],
        ["doc_id", "text"])
    op = SubstringDeduplicator().setSpanTokens(5)
    out = {r["doc_id"]: r for r in op.transform(docs).collect()}

    # doc 1 holds the first occurrence: untouched
    assert out[1]["n_removed"] == 0
    assert out[1]["text_deduped"] == (
        "unique opening words here alpha beta gamma delta epsilon "
        "and a unique tail one")
    # doc 2 loses exactly the 5 planted tokens, nothing else
    assert out[2]["n_removed"] == 5
    assert out[2]["text_deduped"] == (
        "totally different start text plus another ending")
    # doc 3 shares nothing: untouched
    assert out[3]["n_removed"] == 0
    assert out[3]["n_tokens"] == 10


def test_substring_dedup_self_repetition_and_short_docs(spark):
    from flink_ml__spark.functions.dedup import SubstringDeduplicator

    docs = spark.createDataFrame(
        [(1, "one two three four one two three four"),  # span repeats in-doc
         (2, "tiny doc"),                               # < k tokens: no grams
         (3, None)],                                    # NULL text → empty
        ["doc_id", "text"])
    op = SubstringDeduplicator().setSpanTokens(4)
    out = {r["doc_id"]: r for r in op.transform(docs).collect()}
    assert out[1]["text_deduped"] == "one two three four"
    assert out[1]["n_removed"] == 4
    assert out[2] and out[2]["n_removed"] == 0
    assert out[2]["text_deduped"] == "tiny doc"
    assert out[3]["n_tokens"] == 0 and out[3]["n_removed"] == 0
    assert out[3]["text_deduped"] == ""


def test_dedup_cache_lifecycle_bounded_and_released(spark):
    """Signature tables persist for plan-partitioning reuse (a local
    checkpoint loses the repartition's output partitioning and forces
    downstream re-shuffles), with a process-wide bounded registry:
    repeated calls and throwaway instances can never hold more than
    _MAX_LIVE_CACHES entries, a query in flight actually READS the
    cache (InMemoryTableScan), and release_dedup_caches() drops
    everything immediately."""
    import flink_ml__spark.functions.dedup as dd
    from flink_ml__spark.functions.dedup import SubstringDeduplicator

    spark.catalog.clearCache()
    dd._LIVE_CACHES.clear()
    df = _df(spark)
    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.0]) for i in range(8)],
        ["vec_id", "embedding"])

    # the cache must be READ by the query built on it, even when the
    # operator instance is inline and the result frame is derived
    plan = (MinHashDeduplicator().setSeed(42).transform(df)
            .select("doc_id")._jdf.queryExecution().executedPlan()
            .toString())
    assert "InMemoryTableScan" in plan

    for _ in range(2):
        MinHashDeduplicator().setSeed(42).transform(df).collect()
        SimHashDeduplicator().transform(df).collect()
        NgramJaccardDeduplicator().transform(df).collect()
        SubstringDeduplicator().setSpanTokens(4).transform(df).collect()
        EmbeddingCosineDeduplicator().setSeed(7).transform(emb).collect()
        SimHashDeduplicator().transform_against(df, df).collect()
    assert len(dd._LIVE_CACHES) <= dd._MAX_LIVE_CACHES

    dd.release_dedup_caches()
    assert len(dd._LIVE_CACHES) == 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_substring_transform_against_corpus(spark):
    """Decontamination semantics: spans present in the corpus are masked
    EVERYWHERE in df (first occurrences included); spans df shares only
    with itself are untouched."""
    from flink_ml__spark.functions.dedup import SubstringDeduplicator

    bench = spark.createDataFrame(
        [(100, "the forbidden benchmark phrase lives here")],
        ["doc_id", "text"])
    df = spark.createDataFrame(
        [(1, "intro words the forbidden benchmark phrase lives here tail"),
         (2, "shared inside df only span alpha beta gamma delta epsilon x"),
         (3, "shared inside df only span alpha beta gamma delta epsilon y")],
        ["doc_id", "text"])
    op = SubstringDeduplicator().setSpanTokens(6)
    out = {r["doc_id"]: r for r in op.transform_against(df, bench).collect()}
    assert out[1]["n_removed"] == 6
    assert out[1]["text_deduped"] == "intro words tail"
    # intra-df duplicates untouched by transform_against
    assert out[2]["n_removed"] == 0 and out[3]["n_removed"] == 0
    # amortized corpus_hashed path matches
    hashed = op.hashed_table(bench)
    out2 = {r["doc_id"]: r
            for r in op.transform_against(df, corpus_hashed=hashed).collect()}
    assert out2[1]["text_deduped"] == "intro words tail"


def test_exact_transform_against_corpus(spark):
    """Corpus fingerprints always win; normalization (case/whitespace)
    applies on both sides; intra-df duplicates are untouched."""
    corpus = spark.createDataFrame(
        [(100, "The  QUICK brown fox")], ["doc_id", "text"])
    df = spark.createDataFrame(
        [(1, "the quick brown fox"),      # normalized match → dropped
         (2, "something else entirely"),
         (3, "something else entirely")], # intra-df dup stays
        ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in ExactDeduplicator()
                  .transform_against(df, corpus).collect())
    assert kept == [2, 3]


def test_bloom_corpus_dedup_no_false_negatives(spark):
    from flink_ml__spark.functions.dedup import (
        BloomCorpusDeduplicator,
        ExactDeduplicator,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i}") for i in range(100)],
        ["doc_id", "text"])
    new = spark.createDataFrame(
        # 0-19 duplicate corpus texts (one via case/whitespace noise),
        # 100+ unique
        [(1000 + i, f"corpus  DOCUMENT number {i}") for i in range(20)]
        + [(2000 + i, f"fresh text {i}") for i in range(80)]
        + [(3000, None)],
        ["doc_id", "text"])
    op = BloomCorpusDeduplicator().setNumBits(1 << 16).setNumHashes(4)
    kept = {r["doc_id"] for r in
            op.transform_against(new, corpus).select("doc_id").collect()}
    # no false negatives: every normalized duplicate is gone
    assert not (kept & {1000 + i for i in range(20)})
    # NULL text can never match
    assert 3000 in kept
    # kept is a subset of the exact anti-join's kept set
    exact_kept = {r["doc_id"] for r in
                  ExactDeduplicator().transform_against(new, corpus)
                  .select("doc_id").collect()}
    assert kept <= exact_kept
    # at m=65536, n=100, k=4 the FP odds are ~1e-11: no unique row lost
    assert kept == exact_kept

    # a deliberately tiny filter trades unique rows, never dup rows
    tiny = BloomCorpusDeduplicator().setNumBits(256).setNumHashes(4)
    kept_tiny = {r["doc_id"] for r in
                 tiny.transform_against(new, corpus)
                 .select("doc_id").collect()}
    assert not (kept_tiny & {1000 + i for i in range(20)})
    assert kept_tiny <= exact_kept

    import pytest as _pytest
    with _pytest.raises(ValueError):
        BloomCorpusDeduplicator().transform(new)


def test_bloom_save_load_roundtrip(spark, tmp_path):
    from flink_ml__spark.functions.dedup import BloomCorpusDeduplicator

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(100 + i, f"doc {i}") for i in range(10)]      # dups
        + [(200 + i, f"other {i}") for i in range(10)],  # unique
        ["doc_id", "text"])
    op = (BloomCorpusDeduplicator().setNumBits(1 << 15).setNumHashes(4)
          .fit(corpus))
    p = str(tmp_path / "bloom_model")
    op.save(p)
    back = BloomCorpusDeduplicator.load(spark, p)
    assert back.getNumBits() == 1 << 15 and back.getNumHashes() == 4
    a = {r["doc_id"] for r in op.transform(new).collect()}
    b = {r["doc_id"] for r in back.transform(new).collect()}
    assert a == b
    assert not (b & {100 + i for i in range(10)})


def test_exact_dedup_keeps_one_null_text_representative(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text"), (4, "real text")],
        "doc_id long, text string")
    out = ExactDeduplicator().transform(df)
    kept = sorted(r["doc_id"] for r in out.collect())
    # min-id representative of the NULL group survives, like any group
    assert kept == [1, 3]


def test_simhash_token_free_docs_never_pair(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "???"), (3, "!!!"), (4, "actual words here"),
         (5, "actual words here")],
        "doc_id long, text string")
    op = SimHashDeduplicator().setHammingThreshold(3)
    kept = sorted(r["doc_id"] for r in op.transform(df).collect())
    # token-free docs 1-3 all survive (no shared 0 fingerprint);
    # the real duplicate pair still collapses
    assert kept == [1, 2, 3, 4]
    assert op.duplicate_pairs(df).count() == 1


def test_embedding_dedup_null_embedding_survives(spark):
    from flink_ml__spark.functions.dedup import EmbeddingCosineDeduplicator

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>")
    out = (EmbeddingCosineDeduplicator().setThreshold(0.99).setSeed(1)
           .transform(df))
    kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == [1, 3]          # NULL row kept, duplicate dropped


def test_touch_dedup_cache_keeps_handle_young():
    """touch moves a handle to the young end WITHOUT leaving a stale
    duplicate (eviction would otherwise unpersist the refreshed
    table), so a streaming loop's corpus table survives any number of
    per-batch signature tables."""
    from flink_ml__spark.functions import dedup as D

    class H:
        def __init__(self):
            self.dead = False

        def unpersist(self, _=False):
            self.dead = True

    saved = list(D._LIVE_CACHES)
    D._LIVE_CACHES.clear()
    try:
        corpus = H()
        D._LIVE_CACHES.append(corpus)
        for round_ in range(3):
            # a full registry's worth of per-batch handles arrives...
            for _ in range(D._MAX_LIVE_CACHES - 1):
                D._LIVE_CACHES.append(H())
                while len(D._LIVE_CACHES) > D._MAX_LIVE_CACHES:
                    D._LIVE_CACHES.popleft().unpersist(False)
            # ...but a touched corpus handle stays young and alive
            D.touch_dedup_cache(corpus)
            assert not corpus.dead
            assert list(D._LIVE_CACHES).count(corpus) == 1
    finally:
        D._LIVE_CACHES.clear()
        D._LIVE_CACHES.extend(saved)


def test_persistable_index_round_trip(spark, tmp_path):
    """save_index → new operator instance → load_index →
    transform_against equals the direct corpus run; param mismatch
    (other than verification thresholds) is rejected; append mode
    extends the index exactly."""
    from flink_ml__spark.functions.dedup import MinHashDeduplicator

    corpus = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog number {i % 3}")
         for i in range(10)], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over dog number 1"),
         (101, "completely different text about spark engines here")],
        ["doc_id", "text"])

    op = MinHashDeduplicator().setSeed(11).setThreshold(0.8)
    direct = sorted(r["doc_id"] for r in
                    op.transform_against(new, corpus).collect())

    p = str(tmp_path / "mh_index")
    op.save_index(p, corpus)
    fresh = MinHashDeduplicator().setSeed(11).setThreshold(0.8)
    idx = fresh.load_index(spark, p)
    via_index = sorted(r["doc_id"] for r in
                       fresh.transform_against(new, corpus_hashed=idx)
                       .collect())
    assert via_index == direct == [101]

    # threshold changes don't invalidate the index...
    MinHashDeduplicator().setSeed(11).setThreshold(0.5).load_index(spark, p)
    # ...signature-relevant params do
    import pytest as _pytest
    with _pytest.raises(ValueError, match="seed"):
        MinHashDeduplicator().setSeed(99).load_index(spark, p)
    # wrong operator class rejected
    from flink_ml__spark.functions.dedup import SimHashDeduplicator
    with _pytest.raises(ValueError, match="built by"):
        SimHashDeduplicator().load_index(spark, p)

    # append a second corpus batch: new doc 100's duplicate source
    batch2 = spark.createDataFrame(
        [(50, "completely different text about spark engines here")],
        ["doc_id", "text"])
    op.save_index(p, batch2, mode="append")
    idx2 = fresh.load_index(spark, p)
    kept = sorted(r["doc_id"] for r in
                  fresh.transform_against(new, corpus_hashed=idx2)
                  .collect())
    assert kept == []  # both new docs now duplicate some corpus row


def test_persistable_index_embedding_variant(spark, tmp_path):
    """The embedding deduplicator persists its keyed_table the same
    way (corpus_keyed=), with the same param validation."""
    from flink_ml__spark.functions.dedup import EmbeddingCosineDeduplicator

    corpus = spark.createDataFrame(
        [(i, [float(i % 4), 1.0, 0.5]) for i in range(8)],
        "doc_id long, embedding array<double>")
    new = spark.createDataFrame(
        [(100, [2.0, 1.0, 0.5]), (101, [9.0, -3.0, 7.0])],
        "doc_id long, embedding array<double>")
    op = (EmbeddingCosineDeduplicator().setSeed(5).setThreshold(0.999)
          .setIdCol("doc_id"))
    direct = sorted(r["doc_id"] for r in
                    op.transform_against(new, corpus).collect())
    p = str(tmp_path / "emb_idx")
    op.save_index(p, corpus)
    fresh = (EmbeddingCosineDeduplicator().setSeed(5)
             .setThreshold(0.999).setIdCol("doc_id"))
    idx = fresh.load_index(spark, p)
    via = sorted(r["doc_id"] for r in
                 fresh.transform_against(new, corpus_keyed=idx).collect())
    assert via == direct

    import pytest as _pytest
    with _pytest.raises(ValueError, match="seed"):
        (EmbeddingCosineDeduplicator().setSeed(6).setIdCol("doc_id")
         .load_index(spark, p))


def test_minhash_topk_search(spark):
    """Ranked search: query 1's neighbours are its exact/near dups in
    similarity order; self-match excluded; k and minJaccard cut."""
    from flink_ml__spark.functions.dedup import MinHashTopK

    df = _df(spark)
    op = MinHashTopK().setSeed(42).setK(3).setBands(12)
    out = (op.topk(df.filter("doc_id = 1"), df)
           .orderBy("rank").collect())
    assert [r["doc_id"] for r in out] == [2, 3, 4]
    assert out[0]["jaccard"] == 1.0          # exact dup
    assert out[1]["jaccard"] == 1.0          # case/ws variant, same set
    assert 0.5 < out[2]["jaccard"] < 1.0     # near dup
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert all(r["query_id"] == 1 for r in out)

    # k cuts; minJaccard drops the tail
    one = op.setK(1).topk(df.filter("doc_id = 1"), df).collect()
    assert len(one) == 1 and one[0]["doc_id"] == 2
    high = (op.setK(3).setMinJaccard(0.99)
            .topk(df.filter("doc_id = 1"), df).collect())
    assert {r["doc_id"] for r in high} == {2, 3}


def test_minhash_topk_self_transform(spark):
    """transform = self-search: unrelated docs (5, 6) find nothing at
    a 0.3 floor; every doc_id 1-4 finds its dup group."""
    from flink_ml__spark.functions.dedup import MinHashTopK

    op = (MinHashTopK().setSeed(42).setK(5).setBands(12)
          .setMinJaccard(0.3))
    got = {}
    for r in op.transform(_df(spark)).collect():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert got.get(1) == {2, 3, 4}
    assert got.get(4) == {1, 2, 3}
    assert 5 not in got and 6 not in got


def test_minhash_topk_validates_k(spark):
    import pytest as _pytest

    from flink_ml__spark.functions.dedup import MinHashTopK

    with _pytest.raises(ValueError):
        MinHashTopK().setK(0)


def test_minhash_topk_band_bucket_cap(spark):
    from flink_ml__spark.functions.dedup import MinHashTopK

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again with words ")
    rows = [(i, base + f"tail {i % 2}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    op = MinHashTopK().setSeed(7).setK(3).setBands(12)
    uncapped = op.topk(df, df)
    assert uncapped.count() > 0
    # every doc shares the same minima -> every band bucket holds all
    # 12 docs; a cap below that kills every candidate
    capped = (MinHashTopK().setSeed(7).setK(3).setBands(12)
              .setMaxBandBucket(4).topk(df, df))
    assert capped.count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        MinHashTopK().setMaxBandBucket(-1)


def test_ngram_similar_pairs_band(spark):
    """similar_pairs returns exactly the [lo, hi) Jaccard band: the
    paraphrase survives, the exact duplicate (J=1) and the unrelated
    doc (J~0) are cut."""
    from flink_ml__spark.functions.dedup import NgramJaccardDeduplicator

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight ok"),
        (2, "the quick brown fox jumps over the lazy dog tonight ok"),
        (3, "the quick brown fox jumps over the fence"),
        (4, "an entirely different corpus document about spark"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    op = NgramJaccardDeduplicator().setShingleSize(2)
    got = {(r["id_keep"], r["id_dup"]): r["jaccard"]
           for r in op.similar_pairs(df, lo=0.2, hi=0.99).collect()}
    assert (1, 2) not in got            # exact dup: J = 1 >= hi
    assert (1, 3) in got and (2, 3) in got
    assert 0.2 <= got[(1, 3)] < 0.99
    assert not any(4 in p for p in got)
    # the full band [0.2, 1.0] readmits the exact duplicate
    full = {(r["id_keep"], r["id_dup"])
            for r in op.similar_pairs(df, lo=0.2, hi=1.0).collect()}
    assert (1, 2) not in full           # hi=1.0 still excludes J=1
    import pytest as _pt
    with _pt.raises(ValueError):
        op.similar_pairs(df, lo=0.9, hi=0.5)


def test_suggest_band_cap_tracks_duplication_depth(spark):
    """The cap estimator sizes maxBandBucket from the corpus's own
    band-bucket distribution: a planted 40-copy cluster pushes the
    P99 bucket size to ~40 so the suggestion clears the cluster
    depth; a healthy corpus stays at the floor (SCALE.md r12: a cap
    below cluster depth silently drops true-duplicate buckets)."""
    import pytest as _pt

    from flink_ml__spark.functions.dedup import MinHashTopK

    dup_rows = [(i, "boilerplate page text repeated everywhere exactly "
                    "the same way across mirrored sites")
                for i in range(100, 140)]
    dup_rows += [(i, f"unique document number {i} about topic {i * 7}")
                 for i in range(10)]
    dups = spark.createDataFrame(dup_rows, "doc_id long, text string")
    op = MinHashTopK().setSeed(42).setBands(12)
    cap = op.suggest_band_cap(dups, floor=8)
    assert cap >= 40

    healthy = spark.createDataFrame(
        [(i, f"entirely distinct text {i} talking about {i * 31}"
             f" and {i * 17}") for i in range(60)],
        "doc_id long, text string")
    assert op.suggest_band_cap(healthy, floor=64) == 64
    with _pt.raises(ValueError, match="quantile"):
        op.suggest_band_cap(healthy, quantile=0.0)
