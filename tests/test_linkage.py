"""FuzzyRecordLinker / SnapshotDiffer / ExpectationValidator: golden
cases, NULL semantics, blocking guarantees and plan-shape checks."""

from pyspark.sql import functions as F

from flink_ml__spark.functions.linkage import (
    ExpectationValidator,
    FuzzyRecordLinker,
    SnapshotDiffer,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


# ---------------------------------------------------------------- linker

def test_linker_goldens(spark):
    df = _names(spark, [
        (1, "acme corp"), (2, "acme corp."),     # dist 1, same block
        (3, "acme inc"),                         # dist 4 vs corp -> out
        (4, "zeta corp"),                        # different block
        (5, "acme corp"),                        # exact dup of 1
    ])
    out = (FuzzyRecordLinker().setInputCol("name").setIdCol("id")
           .setMaxDistance(2).link(df)
           .orderBy("a_id", "b_id").collect())
    pairs = {(r["a_id"], r["b_id"]): r for r in out}
    assert set(pairs) == {(1, 2), (1, 5), (2, 5)}
    assert pairs[(1, 2)]["distance"] == 1
    assert pairs[(1, 5)]["distance"] == 0
    assert pairs[(1, 5)]["similarity"] == 1.0
    # similarity = 1 - d / max(len): 1 - 1/10
    assert abs(pairs[(1, 2)]["similarity"] - 0.9) < 1e-9


def test_linker_blocking_never_crosses_blocks(spark):
    # identical strings except the first token -> never compared
    df = _names(spark, [(1, "aa x"), (2, "ab x")])
    assert (FuzzyRecordLinker().setInputCol("name").setIdCol("id")
            .setMaxDistance(5).link(df).count()) == 0


def test_linker_two_sided_and_nulls(spark):
    a = _names(spark, [(1, "blue bolt"), (2, None)])
    b = _names(spark, [(10, "blue bolts"), (11, "blue bolt"), (12, None)])
    out = (FuzzyRecordLinker().setInputCol("name").setIdCol("id")
           .setMaxDistance(1).link(a, b).collect())
    # two-sided: no a<b ordering constraint, NULL names never match
    assert {(r["a_id"], r["b_id"]) for r in out} == {(1, 10), (1, 11)}


def test_linker_prefix_and_length_blockers(spark):
    df = _names(spark, [(1, "abcdef"), (2, "abcdxx"), (3, "zzcdef")])
    by_prefix = (FuzzyRecordLinker().setInputCol("name").setIdCol("id")
                 .setBlocker("prefix").setBlockLen(4).setMaxDistance(2)
                 .link(df).collect())
    assert {(r["a_id"], r["b_id"]) for r in by_prefix} == {(1, 2)}
    by_len = (FuzzyRecordLinker().setInputCol("name").setIdCol("id")
              .setBlocker("length").setBlockLen(4).setMaxDistance(2)
              .link(df).collect())
    # same length band: all three; distance<=2 keeps (1,2) and (1,3)
    assert {(r["a_id"], r["b_id"]) for r in by_len} == {(1, 2), (1, 3)}


def test_linker_levenshtein_is_jvm_side(spark):
    df = _names(spark, [(1, "a b"), (2, "a c")])
    plan = (FuzzyRecordLinker().setInputCol("name").setIdCol("id")
            .link(df)._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- differ

def _snap(spark, rows):
    return spark.createDataFrame(rows, "id long, a string, b double")


def test_differ_goldens(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0),
                        (4, None, 4.0)])
    new = _snap(spark, [(1, "x", 1.0),          # unchanged -> no row
                        (2, "y2", 2.0),         # update: a
                        (5, "w", 5.0),          # insert
                        (4, None, 4.5)])        # update: b (NULL==NULL)
    out = (SnapshotDiffer().setKeyCols("id").diff(old, new)
           .orderBy("id").collect())
    got = {r["id"]: (r["op"], list(r["changed_cols"])) for r in out}
    assert got == {2: ("update", ["a"]),
                   3: ("delete", []),
                   4: ("update", ["b"]),
                   5: ("insert", [])}


def test_differ_null_transitions(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, None, 1.0)])
    out = SnapshotDiffer().setKeyCols("id").diff(old, new).collect()
    assert len(out) == 1 and list(out[0]["changed_cols"]) == ["a"]


def test_differ_compare_cols_subset(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "CHANGED", 1.0)])
    # comparing only b -> the a-change is invisible, no diff rows
    assert (SnapshotDiffer().setKeyCols("id").setCompareCols("b")
            .diff(old, new).count()) == 0


def test_differ_single_shuffle(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "y", 1.0)])
    plan = (SnapshotDiffer().setKeyCols("id").diff(old, new)
            ._jdf.queryExecution().executedPlan().toString())
    # one join, no Python, no cartesian
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------------- validator

def _orders(spark):
    return spark.createDataFrame(
        [(1, 10, "O", 5.0), (2, 10, "F", -1.0), (3, None, "X", 2.0),
         (3, 99, "P", 3.0)],
        "k long, fk long, st string, price double")


def test_validator_counts(spark):
    dim = spark.createDataFrame([(10,), (20,)], "dk long")
    out = (ExpectationValidator()
           .expect_not_null("fk_present", "fk")
           .expect_unique("k_unique", "k")
           .expect_range("price_pos", "price", 0.0, 100.0)
           .expect_regex("st_enum", "st", "^[OFP]$")
           .expect_referential("fk_ref", "fk", dim, "dk")
           .validate(_orders(spark)).collect())
    got = {r["rule"]: (r["rule_type"], r["n_violations"], r["passed"])
           for r in out}
    assert got == {
        "fk_present": ("not_null", 1, False),
        "k_unique": ("unique", 2, False),        # key 3 occurs twice
        "price_pos": ("range", 1, False),
        "st_enum": ("regex", 1, False),
        "fk_ref": ("referential", 1, False),     # fk=99 dangles, NULL ok
    }


def test_validator_all_pass_and_empty(spark):
    df = spark.createDataFrame([(1, "O")], "k long, st string")
    out = (ExpectationValidator()
           .expect_not_null("k_nn", "k")
           .expect_regex("st_enum", "st", "^[OFP]$")
           .validate(df).collect())
    assert all(r["passed"] for r in out)
    empty = ExpectationValidator().validate(df)
    assert empty.count() == 0
    assert empty.columns == ["rule", "rule_type", "n_violations", "passed"]


def test_validator_row_rules_single_pass(spark):
    """All row-local rules fold into ONE aggregate over one scan."""
    df = _orders(spark)
    plan = (ExpectationValidator()
            .expect_not_null("a", "fk")
            .expect_range("b", "price", 0.0, 1.0)
            .expect_regex("c", "st", "^[OFP]$")
            .validate(df)._jdf.queryExecution().executedPlan().toString())
    # row rules share one HashAggregate pair (partial+final); a scan
    # per rule would show up as multiple aggregates / unions of scans
    assert plan.count("Union") == 0


def test_differ_payload_and_apply_roundtrip(spark):
    """apply(old, diff(old, new)) reconstructs new exactly."""
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0),
                        (4, None, 4.0)])
    new = _snap(spark, [(1, "x", 1.0), (2, "y2", 2.0), (5, "w", 5.0),
                        (4, None, 4.5)])
    d = SnapshotDiffer().setKeyCols("id").setEmitPayload(True)
    diff = d.diff(old, new)
    # payload columns present; delete rows carry NULL payload
    by_id = {r["id"]: r for r in diff.collect()}
    assert by_id[5]["a"] == "w" and by_id[5]["b"] == 5.0
    assert by_id[3]["a"] is None and by_id[3]["b"] is None
    got = {tuple(r) for r in d.apply(old, diff)
           .select("id", "a", "b").collect()}
    want = {tuple(r) for r in new.select("id", "a", "b").collect()}
    assert got == want


def test_differ_apply_requires_payload(spark):
    import pytest

    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "y", 1.0)])
    d = SnapshotDiffer().setKeyCols("id")
    with pytest.raises(ValueError, match="payload"):
        d.apply(old, d.diff(old, new))


def test_validator_regex_full_match(spark):
    """expect_regex enforces FULL-match semantics: an unanchored
    pattern must not pass on substring hits."""
    df = spark.createDataFrame([(1, "XOX"), (2, "O")],
                               "k long, st string")
    out = (ExpectationValidator()
           .expect_regex("enum", "st", "[OFP]")   # unanchored
           .validate(df).collect())
    assert out[0]["n_violations"] == 1            # XOX violates


def test_differ_setters_accept_lists(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "y", 1.0)])
    out = (SnapshotDiffer().setKeyCols(["id"]).setCompareCols(["a", "b"])
           .diff(old, new).collect())
    assert len(out) == 1 and list(out[0]["changed_cols"]) == ["a"]


def test_differ_apply_refuses_column_loss(spark):
    import pytest

    old = spark.createDataFrame([(1, "x", "keepme")],
                                "id long, a string, extra string")
    new = spark.createDataFrame([(1, "y", "keepme")],
                                "id long, a string, extra string")
    d = SnapshotDiffer().setKeyCols("id").setCompareCols("a") \
        .setEmitPayload(True)
    diff = d.diff(old, new)
    with pytest.raises(ValueError, match="extra"):
        d.apply(old, diff)


def test_differ_reserved_name_collision_raises(spark):
    import pytest

    old = spark.createDataFrame([(1, "x")], "id long, op string")
    new = spark.createDataFrame([(1, "y")], "id long, op string")
    d = SnapshotDiffer().setKeyCols("id").setEmitPayload(True)
    with pytest.raises(ValueError, match="op"):
        d.diff(old, new)
    # without payload the 'op' data column never reaches the output
    got = SnapshotDiffer().setKeyCols("id").diff(old, new).collect()
    assert len(got) == 1 and list(got[0]["changed_cols"]) == ["op"]


def test_dataset_fingerprint_layout_invariant(spark):
    """Same rows, different order/partitioning → identical
    fingerprint; one changed row → different checksum."""
    from flink_ml__spark.functions.linkage import DatasetFingerprint

    rows = [(i, f"v{i}", float(i) / 3) for i in range(200)]
    a = spark.createDataFrame(rows, ["k", "s", "x"])
    b = (spark.createDataFrame(list(reversed(rows)), ["k", "s", "x"])
         .repartition(7))
    op = DatasetFingerprint()
    fa = op.transform(a).collect()[0]
    fb = op.transform(b).collect()[0]
    assert fa == fb
    assert fa["n_rows"] == 200 and fa["n_distinct"] == 200
    changed = rows[:100] + [(100, "CHANGED", 100 / 3)] + rows[101:]
    fc = (op.transform(spark.createDataFrame(changed, ["k", "s", "x"]))
          .collect()[0])
    assert fc["checksum"] != fa["checksum"]
    assert fc["n_rows"] == fa["n_rows"]


def test_dataset_fingerprint_shards_add(spark):
    """Mergeable: shard checksums sum (mod 2^61) to the whole-set
    checksum — fingerprint shards independently, combine driver-side."""
    from flink_ml__spark.functions.linkage import DatasetFingerprint

    rows = [(i, f"d{i}") for i in range(100)]
    df = spark.createDataFrame(rows, ["k", "s"])
    op = DatasetFingerprint()
    whole = int(op.transform(df).collect()[0]["checksum"], 16)
    h1 = int(op.transform(df.filter("k < 50")).collect()[0]["checksum"],
             16)
    h2 = int(op.transform(df.filter("k >= 50")).collect()[0]["checksum"],
             16)
    assert (h1 + h2) % (1 << 61) == whole


def test_dataset_fingerprint_null_vs_empty_and_cols(spark):
    from flink_ml__spark.functions.linkage import DatasetFingerprint

    a = spark.createDataFrame([(1, None)], "k int, s string")
    b = spark.createDataFrame([(1, "")], "k int, s string")
    op = DatasetFingerprint()
    assert (op.transform(a).collect()[0]["checksum"]
            != op.transform(b).collect()[0]["checksum"])
    # restricting columns makes differing rows collide deliberately
    c = spark.createDataFrame([(1, "x"), (1, "y")], "k int, s string")
    fp = DatasetFingerprint().setInputCols("k").transform(c).collect()[0]
    assert fp["n_distinct"] == 1 and fp["n_rows"] == 2


# ----------------------------------------------------- golden records

def test_golden_record_modal_values_and_ties(spark):
    from flink_ml__spark.functions.linkage import GoldenRecordBuilder

    rows = [
        (1, "Acme Corp", "NYC"), (1, "Acme Corp", "NYC"),
        (1, "ACME", None),
        (2, "Globex", "LA"), (2, "Initech", "SF"),   # 1-1 tie
        (3, None, None),
        (None, "noise", "noise"),
    ]
    df = spark.createDataFrame(rows, "cluster long, name string, city string")
    out = (GoldenRecordBuilder().setClusterCol("cluster")
           .setValueCols("name", "city").transform(df))
    got = {r["cluster"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_members"] == 3
    assert got[1]["name"] == "Acme Corp" and got[1]["city"] == "NYC"
    # tie -> lexicographically smallest
    assert got[2]["name"] == "Globex" and got[2]["city"] == "LA"
    # all-NULL attribute survives as NULL
    assert got[3]["name"] is None and got[3]["city"] is None
    assert got[3]["n_members"] == 1


def test_golden_record_bad_params(spark):
    import pytest as _pt

    from flink_ml__spark.functions.linkage import GoldenRecordBuilder

    with _pt.raises(ValueError):
        GoldenRecordBuilder().setValueCols([])


def test_functional_dependency_profiler(spark):
    from flink_ml__spark.functions.linkage import (
        FunctionalDependencyProfiler,
    )

    df = spark.createDataFrame(
        [(1, "x", 10), (1, "x", 11), (2, "y", 10), (2, "z", 10),
         (3, None, 10), (None, "q", 10)],
        ["a", "b", "c"])
    got = {r["rule"]: r for r in
           (FunctionalDependencyProfiler().setRules("a->b", "a->c")
            .transform(df).collect())}
    ab = got["a->b"]
    assert (ab["n_keys"], ab["n_violating_keys"]) == (3, 1)
    assert ab["violation_rate"] == 0.333333 and ab["max_fanout"] == 2
    ac = got["a->c"]
    assert (ac["n_keys"], ac["n_violating_keys"]) == (3, 1)  # a=1 -> 10,11
    import pytest as _pt
    with _pt.raises(ValueError):
        FunctionalDependencyProfiler().setRules("a=b")
    with _pt.raises(ValueError):
        FunctionalDependencyProfiler().transform(df)


def test_partition_health_auditor(spark):
    from flink_ml__spark.functions.linkage import PartitionHealthAuditor

    rows = [("2024-01-01", 1.0, "a")] * 10 \
        + [("2024-01-02", None, "b")] * 5 \
        + [("2024-01-02", 2.0, None)] * 5 \
        + [("2024-01-03", 3.0, "c")] * 2  # 80% drop
    df = spark.createDataFrame(rows, "ds string, v double, s string")
    got = {(r["ds"], r["column"]): r
           for r in (PartitionHealthAuditor().setPartitionCol("ds")
                     .setCheckCols("v", "s").transform(df).collect())}
    assert got[("2024-01-01", "v")]["prev_n_rows"] is None
    d2v = got[("2024-01-02", "v")]
    assert (d2v["n_rows"], d2v["n_null"], d2v["null_frac"]) == (10, 5, 0.5)
    assert d2v["row_delta_frac"] == 0.0
    d3 = got[("2024-01-03", "s")]
    assert d3["row_delta_frac"] == -0.8  # the half-loaded partition
    import pytest as _pt
    with _pt.raises(ValueError):
        PartitionHealthAuditor().transform(df)
    with _pt.raises(ValueError):
        PartitionHealthAuditor().setCheckCols()


# ---------------------------------------------------------------------------
# CompactionPlanner
# ---------------------------------------------------------------------------

def test_compaction_planner_first_fit_golden(spark):
    from flink_ml__spark.functions.linkage import CompactionPlanner
    df = spark.createDataFrame(
        [("p", 1, 60), ("p", 2, 60), ("p", 3, 60), ("p", 4, 40),
         ("p", 5, 100)],
        "k string, id bigint, size bigint")
    out = {r["file_seq"]: r for r in
           (CompactionPlanner().setKeyCols("k").setSizeCol("size")
            .setOrderCol("id").setTargetSize(100).transform(df)
            .collect())}
    # cum_before = 0,60,120,180,220 -> groups 0,0,1,1,2
    assert out[0]["n_items"] == 2 and out[0]["total_size"] == 120
    assert out[0]["first_id"] == 1 and out[0]["last_id"] == 2
    assert out[1]["n_items"] == 2 and out[1]["total_size"] == 100
    assert out[2]["n_items"] == 1 and out[2]["last_id"] == 5
    # conservation: every byte lands in exactly one group
    assert sum(r["total_size"] for r in out.values()) == 320


def test_compaction_planner_partitions_and_validation(spark):
    import pytest as _pt
    from flink_ml__spark.functions.linkage import CompactionPlanner
    df = spark.createDataFrame(
        [("a", 1, 50), ("a", 2, 70), ("b", 1, 10), ("b", 2, None),
         ("b", None, 5)],
        "k string, id bigint, size bigint")
    rows = (CompactionPlanner().setKeyCols("k").setSizeCol("size")
            .setOrderCol("id").setTargetSize(100).transform(df)
            .collect())
    by = {(r["k"], r["file_seq"]): r for r in rows}
    # partition a: cum_before 0,50 -> one group of 120
    assert by[("a", 0)]["n_items"] == 2
    # partition b: null size / null order rows drop; one 10-byte group
    assert by[("b", 0)]["n_items"] == 1 and by[("b", 0)]["total_size"] == 10
    with _pt.raises(ValueError, match="positive"):
        CompactionPlanner().setTargetSize(0)


# ---------------------------------------------------------------------------
# UpsertMerger / ReferentialIntegrityChecker
# ---------------------------------------------------------------------------

def test_upsert_merge_golden(spark):
    from flink_ml__spark.functions.linkage import UpsertMerger
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    updates = spark.createDataFrame(
        [(2, "b", 20.0, False),     # identical -> no-op
         (3, "c2", 31.0, False),    # changed -> update
         (4, "d", 40.0, False),     # new -> insert
         (1, None, None, True)],    # delete
        "k long, s string, v double, del boolean")
    op = UpsertMerger().setKeyCols("k").setDeleteCol("del")
    merged = {r["k"]: r for r in op.merge(target, updates).collect()}
    assert set(merged) == {2, 3, 4}
    assert merged[3]["s"] == "c2" and merged[3]["v"] == 31.0
    assert merged[2]["s"] == "b"
    assert merged[4]["v"] == 40.0
    st = op.merge_stats(target, updates).first()
    assert st["n_target"] == 3 and st["n_updates"] == 4
    assert st["n_inserted"] == 1 and st["n_updated"] == 1
    assert st["n_unchanged_matched"] == 1 and st["n_deleted"] == 1
    assert st["n_carried"] == 0 and st["n_result"] == 3


def test_upsert_duplicate_updates_and_carry(spark):
    from flink_ml__spark.functions.linkage import UpsertMerger
    target = spark.createDataFrame(
        [(1, 1.0), (9, 9.0)], "k long, v double")
    updates = spark.createDataFrame(
        [(1, 5.0, 1), (1, 7.0, 2)], "k long, v double, seq int")
    op = UpsertMerger().setKeyCols("k").setOrderCol("seq")
    merged = {r["k"]: r["v"] for r in
              op.merge(target, updates).collect()}
    # last-by-seq wins; untouched key carries
    assert merged == {1: 7.0, 9: 9.0}
    st = op.merge_stats(target, updates).first()
    assert st["n_carried"] == 1 and st["n_updates"] == 1


def test_referential_integrity_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.linkage import (
        ReferentialIntegrityChecker,
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (5,), (None,)], "fk long")
    out = {r["fk"]: r for r in ReferentialIntegrityChecker().check(
        {"child->parent": (child, "fk", parent, "pk")}).collect()}
    r = out["child->parent"]
    assert r["n_rows"] == 4 and r["n_null"] == 1
    assert r["n_orphans"] == 1
    assert abs(r["orphan_rate"] - 0.25) < 1e-12
    with _pt.raises(ValueError, match="foreign"):
        ReferentialIntegrityChecker().check({})


# ---------------------------------------------------------------------------
# KAnonymityAuditor
# ---------------------------------------------------------------------------

def test_k_anonymity_golden(spark):
    import pytest as _pt
    from flink_ml__spark.functions.linkage import KAnonymityAuditor
    df = spark.createDataFrame(
        [("90210", 30), ("90210", 30), ("90210", 30),   # class of 3
         ("10001", 40), ("10001", 40),                  # class of 2
         ("60601", 50),                                 # unique!
         (None, 50), (None, 50)],                       # NULL is a value
        "zip string, age int")
    op = KAnonymityAuditor().setQuasiCols("zip", "age").setK(3)
    r = op.evaluate(df).first()
    assert r["n_rows"] == 8 and r["n_combos"] == 4
    assert r["n_violating"] == 3 and r["rows_at_risk"] == 5
    assert abs(r["risk_share"] - 5 / 8) < 1e-12
    assert r["min_class"] == 1 and r["k"] == 3
    v = {(x["zip"], x["age"]): x["class_size"]
         for x in op.violations(df).collect()}
    assert v == {("10001", 40): 2, ("60601", 50): 1, (None, 50): 2}
    with _pt.raises(ValueError, match="k must"):
        KAnonymityAuditor().setK(1)
    with _pt.raises(ValueError, match="quasiCols"):
        KAnonymityAuditor().setQuasiCols()
