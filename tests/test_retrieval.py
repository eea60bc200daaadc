"""BM25Retriever: exact golden recomputation, edge semantics, and
index-reuse/plan shape."""

import math
import re

import pytest
from pyspark.sql import functions as F

from flink_ml__spark.functions.retrieval import BM25Retriever

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sleeps"),
    (3, "foxes and dogs are common animals"),
    (4, "completely unrelated text about spark sql engines"),
    (5, None),
    (6, ""),
]
QUERIES = [(100, "quick fox"), (101, "spark engines"), (102, "zzz missing")]


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    """Straight-line BM25 (Lucene idf) for the golden check."""
    tok = lambda s: [w for w in re.split(r"[^a-zA-Z0-9']+", (s or "").lower()) if w]
    toks = {d: tok(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    out = {}
    for qid, qt in queries:
        scores = {}
        for term in set(tok(qt)):
            if term not in df:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, ws in toks.items():
                tf = ws.count(term)
                if tf:
                    s = idf * tf * (k1 + 1) / (
                        tf + k1 * (1 - b + b * len(ws) / avgdl))
                    scores[d] = scores.get(d, 0.0) + s
        out[qid] = scores
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    return docs, qs


def test_bm25_matches_reference_exactly(spark, frames):
    docs, qs = frames
    got = BM25Retriever().retrieve(docs, qs).collect()
    want = _bm25_reference(DOCS, QUERIES)
    assert {(r["query_id"], r["doc_id"]) for r in got} == \
        {(q, d) for q, sc in want.items() for d in sc}
    for r in got:
        assert r["score"] == pytest.approx(
            want[r["query_id"]][r["doc_id"]], rel=1e-12)


def test_bm25_ranking_and_edges(spark, frames):
    docs, qs = frames
    out = BM25Retriever().setTopK(2).retrieve(docs, qs)
    rows = sorted(out.collect(), key=lambda r: (r["query_id"], r["rank"]))
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # "quick fox": doc 1 holds both terms -> rank 1; topK=2 truncates
    assert [r["doc_id"] for r in by_q[100]][0] == 1
    assert all(len(v) <= 2 for v in by_q.values())
    assert all(v[0]["score"] >= v[-1]["score"] for v in by_q.values())
    # no-hit query vanishes; NULL/empty docs never appear
    assert 102 not in by_q
    assert not [r for r in rows if r["doc_id"] in (5, 6)]


def test_bm25_repeated_query_terms_count_once(spark, frames):
    docs, _ = frames
    q1 = spark.createDataFrame([(1, "fox")], "query_id long, query_text string")
    q2 = spark.createDataFrame([(1, "fox fox fox")],
                               "query_id long, query_text string")
    op = BM25Retriever()
    a = {(r["doc_id"], round(r["score"], 10)) for r in op.retrieve(docs, q1).collect()}
    b = {(r["doc_id"], round(r["score"], 10)) for r in op.retrieve(docs, q2).collect()}
    assert a == b


def test_bm25_postings_reuse_and_broadcast_probe(spark, frames):
    docs, qs = frames
    op = BM25Retriever()
    idx = op.postings(docs)
    direct = {(r["query_id"], r["doc_id"], round(r["score"], 9))
              for r in op.retrieve(docs, qs).collect()}
    reused = {(r["query_id"], r["doc_id"], round(r["score"], 9))
              for r in op.retrieve(docs, qs, postings=idx).collect()}
    assert direct == reused
    # the query-term probe broadcasts; the postings table must never
    # hit a nested-loop or cartesian fallback
    plan = (op.retrieve(docs, qs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_df_pruning_drops_common_terms(spark):
    rows = [(i, f"common rare{i}" if i < 2 else "common filler")
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "common rare0")],
                               "query_id long, query_text string")
    full = BM25Retriever().retrieve(docs, qs)
    pruned = (BM25Retriever().setMaxDfFraction(0.5)
              .retrieve(docs, qs))
    # unpruned: every doc matches via "common"; pruned: only doc 0
    # (the sole holder of "rare0") remains a candidate
    assert full.count() == 10
    got = pruned.collect()
    assert [r["doc_id"] for r in got] == [0]
    # the surviving doc's score now counts only the rare term
    want = _bm25_reference([(d, t) for d, t in rows], [(1, "rare0")])
    assert got[0]["score"] == pytest.approx(want[1][0], rel=1e-12)

    with pytest.raises(ValueError):
        BM25Retriever().setMaxDfFraction(0.0)


def test_rrf_fusion_goldens(spark):
    from flink_ml__spark.functions.retrieval import ReciprocalRankFusion

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long")
    sem = spark.createDataFrame(
        [(1, 12, 1), (1, 13, 2), (1, 10, 3)],
        "query_id long, doc_id long, rank long")
    op = ReciprocalRankFusion().setK0(60.0).setTopK(3)
    rows = {r["doc_id"]: r for r in op.fuse([lex, sem]).collect()}
    # doc 12: 1/63 + 1/61; doc 10: 1/61 + 1/63 -> tie, doc 10 wins by id
    assert rows[10]["rrf_score"] == pytest.approx(1 / 61 + 1 / 63)
    assert rows[12]["rrf_score"] == pytest.approx(1 / 63 + 1 / 61)
    assert rows[10]["rank"] == 1 and rows[12]["rank"] == 2
    assert rows[10]["n_lists"] == 2
    assert 13 not in rows or rows[13]["rank"] == 3   # single-list item
    assert rows[11 in rows and 11 or 13]["n_lists"] == 1

    with pytest.raises(ValueError):
        op.fuse([])


def test_rrf_end_to_end_hybrid(spark):
    """BM25 lexical + embedding-cosine rankings fused over the real
    tables (doc_id and vec_id share the id space at every SF)."""
    from flink_ml__spark.functions.retrieval import (
        BM25Retriever,
        ReciprocalRankFusion,
    )
    from flink_ml__spark.functions.similarity import CosineTopK
    from flink_ml__spark.sources import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    toks = F.split(F.lower(F.coalesce("text", F.lit(""))), "[^a-z0-9']+")
    qs = (docs.filter(F.col("doc_id") % 29 == 0)
          .select(F.col("doc_id").alias("query_id"),
                  F.array_join(F.slice(toks, 1, 6), " ")
                  .alias("query_text")))
    lex = BM25Retriever().setTopK(5).retrieve(docs, qs)
    qe = (emb.join(qs.select(F.col("query_id").alias("vec_id")), "vec_id"))
    sem = (CosineTopK().setK(5).topk(qe, emb)
           .select(F.col("query_id"), F.col("neighbor_id").alias("doc_id"),
                   F.col("rank")))
    fused = ReciprocalRankFusion().setTopK(5).fuse([lex, sem])
    n_q = qs.count()
    assert fused.count() == n_q * 5
    assert fused.filter(F.col("n_lists") > 2).count() == 0


def test_ranking_evaluator_hand_computed(spark):
    import math

    from flink_ml__spark.functions.retrieval import RankingEvaluator

    # query 1: rel docs {10, 20, 30}; ranking top-5 = [10, 99, 20, 98, 97]
    ranking = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 20, 3), (1, 98, 4), (1, 97, 5),
         (2, 50, 1), (2, 51, 2)],              # query 2: no rel in top-k
        "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 77)],
        "query_id long, doc_id long")
    got = {r["query_id"]: r for r in
           (RankingEvaluator().setK(5).evaluate(ranking, qrels)
            .collect())}
    r1 = got[1]
    assert r1["n_rel"] == 3 and r1["hits"] == 2
    assert abs(r1["precision_at_k"] - 2 / 5) < 1e-12
    assert abs(r1["recall_at_k"] - 2 / 3) < 1e-12
    assert r1["mrr"] == 1.0                    # first rel at rank 1
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert abs(r1["ndcg_at_k"] - dcg / idcg) < 1e-12
    r2 = got[2]
    assert r2["hits"] == 0 and r2["mrr"] == 0.0
    assert r2["recall_at_k"] == 0.0 and r2["ndcg_at_k"] == 0.0


def test_ranking_evaluator_no_qrels_query_null_metrics(spark):
    from flink_ml__spark.functions.retrieval import RankingEvaluator

    ranking = spark.createDataFrame([(9, 1, 1)],
                                    "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame([], "query_id long, doc_id long")
    r = RankingEvaluator().setK(10).evaluate(ranking, qrels).first()
    assert r["n_rel"] == 0 and r["hits"] == 0
    assert r["recall_at_k"] is None and r["ndcg_at_k"] is None
    assert r["mrr"] == 0.0


def test_ranking_evaluator_validation(spark):
    import pytest

    from flink_ml__spark.functions.retrieval import RankingEvaluator

    with pytest.raises(ValueError, match="k must"):
        RankingEvaluator().setK(0)
    df = spark.createDataFrame([(1, 1, 1)],
                               "query_id long, doc_id long, rank int")
    with pytest.raises(TypeError, match="binary"):
        RankingEvaluator().transform(df)


def test_ranking_evaluator_keeps_beyond_cutoff_queries(spark):
    """A query whose surviving rows all sit beyond k still gets a
    zero-score row — silently dropping it would inflate averages."""
    from flink_ml__spark.functions.retrieval import RankingEvaluator

    ranking = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 7), (2, 21, 8)],    # q2 only ranks 7-8
        "query_id long, doc_id long, rank int")
    qrels = spark.createDataFrame([(1, 10), (2, 20)],
                                  "query_id long, doc_id long")
    got = {r["query_id"]: r for r in
           (RankingEvaluator().setK(5).evaluate(ranking, qrels)
            .collect())}
    assert set(got) == {1, 2}
    assert got[2]["hits"] == 0 and got[2]["mrr"] == 0.0
    assert got[2]["recall_at_k"] == 0.0 and got[2]["n_rel"] == 1


def test_query_likelihood_retrieval(spark):
    """Dirichlet QL: the doc containing the query terms most densely
    ranks first; longer docs with the same tf rank lower (length
    normalization); OOV query terms drop cleanly."""
    import math

    from flink_ml__spark.functions.retrieval import (
        QueryLikelihoodRetriever,
    )

    docs = spark.createDataFrame(
        [(1, "apple banana apple"),
         (2, "apple banana apple " + "filler " * 40),
         (3, "cherry date elderberry fig grape")],
        ["doc_id", "text"])
    queries = spark.createDataFrame(
        [(100, "apple apple zzz_oov")], ["query_id", "query_text"])
    op = QueryLikelihoodRetriever().setTopK(3).setMu(10.0)
    out = op.retrieve(docs, queries).collect()
    got = [(r["doc_id"], r["rank"]) for r in out]
    assert got[0] == (1, 1) and got[1] == (2, 2)
    assert all(r["doc_id"] != 3 for r in out)  # no shared term: no row
    # hand-check doc 1: tf(apple)=2, dl=3, cf(apple)=4/48, mu=10
    total = 3 + 43 + 5
    pc = 4 / total
    want = 2 * math.log(1 + 2 / (10 * pc)) + 2 * math.log(10 / (3 + 10))
    r1 = [r for r in out if r["doc_id"] == 1][0]
    assert abs(r1["score"] - want) < 1e-9
    import pytest as _pt
    with _pt.raises(ValueError):
        QueryLikelihoodRetriever().setMu(0)


# ---------------------------------------------------------------------------
# RankingOverlapEvaluator
# ---------------------------------------------------------------------------

def _rank_df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long,"
                                       " rank int")


def test_rbo_identical_and_disjoint(spark):
    import pytest as _pt
    from flink_ml__spark.functions.retrieval import RankingOverlapEvaluator
    a = _rank_df(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3),
                         (2, 20, 1), (2, 21, 2), (2, 22, 3)])
    b = _rank_df(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3),
                         (2, 30, 1), (2, 31, 2), (2, 32, 3)])
    op = RankingOverlapEvaluator().setPersistence(0.5).setDepth(3)
    out = {r["query_id"]: r for r in op.evaluate(a, b).collect()}
    # identical prefix at depth k: rbo = 1 - p^k
    assert abs(out[1]["rbo"] - (1 - 0.5 ** 3)) < 1e-12
    assert out[1]["n_common"] == 3 and out[1]["overlap_k"] == 1.0
    # disjoint prefixes: explicit zero row
    assert out[2]["rbo"] == 0.0 and out[2]["n_common"] == 0
    with _pt.raises(ValueError, match="persistence"):
        RankingOverlapEvaluator().setPersistence(1.0)
    with _pt.raises(ValueError, match="depth"):
        RankingOverlapEvaluator().setDepth(0)


def test_rbo_partial_overlap_hand_value(spark):
    from flink_ml__spark.functions.retrieval import RankingOverlapEvaluator
    # A = [x, y], B = [y, x] at p=0.5, depth 2:
    # d=1: prefixes {x},{y} -> 0; d=2: both {x,y} -> A_2 = 2/2 = 1
    # rbo = (1-p) * (p^1 * 1) = 0.25
    a = _rank_df(spark, [(1, 1, 1), (1, 2, 2)])
    b = _rank_df(spark, [(1, 2, 1), (1, 1, 2)])
    r = (RankingOverlapEvaluator().setPersistence(0.5).setDepth(2)
         .evaluate(a, b).first())
    assert abs(r["rbo"] - 0.25) < 1e-12
    assert r["n_common"] == 2
    # rows past depth are ignored
    a2 = _rank_df(spark, [(1, 1, 1), (1, 9, 5)])
    b2 = _rank_df(spark, [(1, 1, 1), (1, 9, 6)])
    r = (RankingOverlapEvaluator().setPersistence(0.5).setDepth(2)
         .evaluate(a2, b2).first())
    assert r["n_common"] == 1
