"""PageRank: reference recomputation, mass conservation, dangling and
multi-edge semantics."""

import pytest
from pyspark.sql import functions as F

from flink_ml__spark.functions.graph import PageRank


def _pagerank_reference(edges, d=0.85, iters=5):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    w = {}
    for s, t in edges:
        w[(s, t)] = w.get((s, t), 0.0) + 1.0
    W = {}
    for (s, _), x in w.items():
        W[s] = W.get(s, 0.0) + x
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in W)
        nr = {v: (1 - d) / n + d * dangling / n for v in nodes}
        for (s, t), x in w.items():
            nr[t] += d * (x / W[s]) * r[s]
        r = nr
    return r


EDGES = [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
# node 5 appears only as a destination -> dangling
EDGES_D = EDGES + [(3, 5)]


@pytest.mark.parametrize("edges", [EDGES, EDGES_D])
def test_pagerank_matches_reference(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in PageRank().setMaxIter(5).transform(df).collect()}
    want = _pagerank_reference(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_multi_edge_weighting(spark):
    # 1 -> 2 twice and 1 -> 3 once: 2 receives twice 3's share from 1
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in (PageRank().setMaxIter(1).transform(df)).collect()}
    n, d = 4, 0.85
    base = (1 - d) / n
    assert got[2] == pytest.approx(base + d * (2 / 3) * 0.25)


def test_pagerank_empty_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (None, 2)], "src long, dst long")
    assert PageRank().transform(df).count() == 0


def test_triangles_golden(spark):
    from flink_ml__spark.functions.graph import TriangleCounter

    # triangle 1-2-3 plus pendant edge 3-4; direction, parallel
    # edges, and self-loops must not matter
    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (1, 1), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in
           TriangleCounter().transform(df).collect()}
    assert {n: out[n]["degree"] for n in out} == {1: 2, 2: 2, 3: 3,
                                                 4: 1}
    assert {n: out[n]["triangles"] for n in out} == {1: 1, 2: 1,
                                                     3: 1, 4: 0}
    assert out[1]["clustering"] == pytest.approx(1.0)
    assert out[3]["clustering"] == pytest.approx(1 / 3)
    assert out[4]["clustering"] == 0.0


def test_triangles_k4(spark):
    from flink_ml__spark.functions.graph import TriangleCounter

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = TriangleCounter().transform(
        spark.createDataFrame(k4, "src long, dst long")).collect()
    assert len(out) == 4
    for r in out:
        assert r["degree"] == 3 and r["triangles"] == 3
        assert r["clustering"] == pytest.approx(1.0)


def test_triangles_no_triangle_and_empty(spark):
    from flink_ml__spark.functions.graph import TriangleCounter

    # path graph: no triangles anywhere
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                 "src long, dst long")
    out = TriangleCounter().transform(path).collect()
    assert all(r["triangles"] == 0 for r in out)
    empty = spark.createDataFrame([(1, None)], "src long, dst long")
    assert TriangleCounter().transform(empty).count() == 0


def test_connected_components_golden(spark):
    from flink_ml__spark.functions.graph import ConnectedComponents

    edges = [(1, 2), (2, 3), (5, 6), (9, 9)]
    out = {r["node"]: r["component"] for r in
           ConnectedComponents().transform(
               spark.createDataFrame(edges, "src long, dst long"))
           .collect()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def _lpa_reference(edges, iters):
    """Pure-python synchronous LPA with the operator's exact
    semantics: weighted neighbor votes, ties to the smaller label."""
    from collections import defaultdict
    nb = defaultdict(lambda: defaultdict(int))
    for a, b in edges:
        if a != b:
            nb[a][b] += 1
            nb[b][a] += 1
    labels = {v: v for v in nb}
    for _ in range(iters):
        new = {}
        for v in nb:
            votes = defaultdict(int)
            for u, w in nb[v].items():
                votes[labels[u]] += w
            new[v] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    return labels


@pytest.mark.parametrize("iters", [1, 3, 5])
def test_label_propagation_matches_reference(spark, iters):
    from flink_ml__spark.functions.graph import LabelPropagation

    # two triangles bridged by one edge + a parallel-edge pair
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4),
             (3, 4), (7, 8), (7, 8), (8, 1), (2, 2)]
    got = {r["node"]: r["label"] for r in
           LabelPropagation().setMaxIter(iters).transform(
               spark.createDataFrame(edges, "src long, dst long"))
           .collect()}
    assert got == _lpa_reference(edges, iters)


# ------------------------------------------------------ link prediction

def test_common_neighbors_square_graph(spark):
    from flink_ml__spark.functions.graph import (
        CommonNeighborsLinkPredictor,
    )

    # square 1-2-3-4-1: the two diagonals are the only candidates,
    # each with both opposite corners as common neighbors
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = CommonNeighborsLinkPredictor().transform(df)
    got = {(r["u"], r["v"]): r for r in out.collect()}
    assert set(got) == {(1, 3), (2, 4)}
    import math
    for r in got.values():
        assert r["common_neighbors"] == 2
        assert abs(r["jaccard"] - 2 / (2 + 2 - 2)) < 1e-12
        assert abs(r["adamic_adar"] - 2 / math.log(2)) < 1e-12


def test_common_neighbors_excludes_existing_edges(spark):
    from flink_ml__spark.functions.graph import (
        CommonNeighborsLinkPredictor,
    )

    # triangle + pendant: every 2-hop pair is already an edge except
    # (1, 4) via 3 -- wait: 4-3, 3-1 => candidate (1, 4); 4-3, 3-2 =>
    # candidate (2, 4)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = CommonNeighborsLinkPredictor().transform(df)
    pairs = {(r["u"], r["v"]) for r in out.collect()}
    assert pairs == {(1, 4), (2, 4)}   # (1,2),(1,3),(2,3) are edges


def test_common_neighbors_pivot_cap_drops_hub_wedges(spark):
    from flink_ml__spark.functions.graph import (
        CommonNeighborsLinkPredictor,
    )

    # star: hub 0 with leaves 1..5 — uncapped, every leaf pair is a
    # candidate through the hub; capping the pivot degree below 5
    # removes them all
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert CommonNeighborsLinkPredictor().transform(df).count() == 10
    capped = (CommonNeighborsLinkPredictor().setMaxPivotDegree(4)
              .transform(df))
    assert capped.count() == 0


def test_common_neighbors_ignores_direction_and_self_loops(spark):
    from flink_ml__spark.functions.graph import (
        CommonNeighborsLinkPredictor,
    )

    edges = [(2, 1), (1, 2), (2, 3), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = CommonNeighborsLinkPredictor().transform(df)
    got = {(r["u"], r["v"]): r["common_neighbors"]
           for r in out.collect()}
    assert got == {(1, 3): 1}


# --------------------------------------------------------------- k-core

def test_kcore_peels_tail_keeps_triangle(spark):
    from flink_ml__spark.functions.graph import KCoreExtractor

    # triangle 1-2-3 with a path 3-4-5 hanging off: 2-core = triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = KCoreExtractor().setK(2).transform(df)
    got = {r["node"]: r["core_degree"] for r in out.collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_cascading_peel(spark):
    from flink_ml__spark.functions.graph import KCoreExtractor

    # K4 plus a chain that only dies after repeated peeling rounds
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6), (6, 7)]
    df = spark.createDataFrame(k4 + chain, "src long, dst long")
    out = KCoreExtractor().setK(3).transform(df)
    assert {r["node"] for r in out.collect()} == {1, 2, 3, 4}


def test_kcore_empty_when_k_too_large(spark):
    from flink_ml__spark.functions.graph import KCoreExtractor

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = KCoreExtractor().setK(5).transform(df)
    assert out.count() == 0
    assert out.columns == ["node", "core_degree"]


def test_kcore_bad_params(spark):
    import pytest as _pt

    from flink_ml__spark.functions.graph import KCoreExtractor

    with _pt.raises(ValueError):
        KCoreExtractor().setK(0)
    with _pt.raises(ValueError):
        KCoreExtractor().setMaxIter(0)


# ------------------------------------------------- personalized pagerank

def test_personalized_pagerank_matches_reference_loop(spark):
    from flink_ml__spark.functions.graph import PageRank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]   # 4 dangles
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = [1]
    got = {r["node"]: r["rank"]
           for r in (PageRank().setMaxIter(4).setSeedNodes(seeds)
                     .transform(df).collect())}

    # reference loop with identical semantics
    d = 0.85
    nodes = [1, 2, 3, 4]
    out = {1: [(2, 1.0)], 2: [(3, 1.0)], 3: [(1, 0.5), (4, 0.5)]}
    tele = {n: (1.0 / len(seeds) if n in seeds else 0.0)
            for n in nodes}
    rank = dict(tele)
    for _ in range(4):
        dang = sum(rank[n] for n in nodes if n not in out)
        contrib = {n: 0.0 for n in nodes}
        for u, targets in out.items():
            for v, p in targets:
                contrib[v] += p * rank[u]
        rank = {n: (1.0 - d + d * dang) * tele[n] + d * contrib[n]
                for n in nodes}
    for n in nodes:
        assert abs(got[n] - rank[n]) < 1e-12, (n, got[n], rank[n])
    # mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_empty_seeds_is_standard(spark):
    from flink_ml__spark.functions.graph import PageRank

    edges = [(1, 2), (2, 1), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    std = {r["node"]: r["rank"]
           for r in PageRank().setMaxIter(3).transform(df).collect()}
    via_empty = {r["node"]: r["rank"]
                 for r in (PageRank().setMaxIter(3).setSeedNodes([])
                           .transform(df).collect())}
    assert std == via_empty


def test_personalized_pagerank_absent_seeds_raise(spark):
    import pytest as _pt

    from flink_ml__spark.functions.graph import PageRank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pt.raises(ValueError):
        (PageRank().setSeedNodes([99]).transform(df))


def test_weighted_pagerank_weight_column(spark):
    from flink_ml__spark.functions.graph import PageRank

    # weight 3 on 1->2 must equal three parallel 1->2 edges
    weighted = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 1.0), (1, 4, None),
         (1, 4, 0.0)],
        "src long, dst long, w double")
    parallel = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (1, 3), (2, 3)],
        "src long, dst long")
    a = {r["node"]: r["rank"]
         for r in (PageRank().setMaxIter(4).setWeightCol("w")
                   .transform(weighted).collect())}
    b = {r["node"]: r["rank"]
         for r in PageRank().setMaxIter(4).transform(parallel).collect()}
    assert set(a) == set(b) == {1, 2, 3}   # zero/null-weight edge gone
    for n in a:
        assert abs(a[n] - b[n]) < 1e-12


# ---------------------------------------------------------------------------
# DegreeAssortativity
# ---------------------------------------------------------------------------

def test_assortativity_path_graph(spark):
    # networkx degree_assortativity_coefficient(path_graph(4)) == -0.5
    from flink_ml__spark.functions.graph import DegreeAssortativity
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint")
    r = DegreeAssortativity().evaluate(edges).first()
    assert r["n_nodes"] == 4 and r["n_edges"] == 3
    assert abs(r["avg_degree"] - 1.5) < 1e-12
    assert abs(r["assortativity"] - (-0.5)) < 1e-12


def test_assortativity_star_regular_and_hygiene(spark):
    from flink_ml__spark.functions.graph import DegreeAssortativity
    # star K1,3 -> perfectly disassortative
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src bigint, dst bigint")
    r = DegreeAssortativity().evaluate(star).first()
    assert abs(r["assortativity"] - (-1.0)) < 1e-12
    # regular graph (triangle): zero degree variance -> NULL, not NaN
    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src bigint, dst bigint")
    r = DegreeAssortativity().evaluate(tri).first()
    assert r["assortativity"] is None
    assert r["n_edges"] == 3 and r["n_nodes"] == 3
    # self-loops, duplicates and reversed duplicates collapse
    noisy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2), (2, 3)],
        "src bigint, dst bigint")
    r = DegreeAssortativity().evaluate(noisy).first()
    assert r["n_edges"] == 3 and r["n_nodes"] == 4
    assert abs(r["assortativity"] - (-0.5)) < 1e-12  # it's P4
