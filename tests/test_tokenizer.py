"""BPE tokenizer: classic goldens, determinism, roundtrip property,
model table round-trip, plan shape."""

from pyspark.sql import functions as F

from flink_ml__spark.functions.tokenizer import (
    EOW,
    BpeTokenizer,
    BpeTokenizerModel,
    encode_word,
    learn_merges,
)


def test_learn_merges_classic_golden():
    """Sennrich et al. running example: 'es' then 'est' merge first."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_merges(counts, 4, min_pair_count=2)
    assert merges[0] == ("e", "s")       # freq 9
    assert merges[1] == ("es", "t")      # freq 9
    assert merges[2] == ("est", EOW)     # freq 9
    assert merges[3] == ("l", "o")       # freq 7
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]


def test_learn_merges_deterministic_ties():
    # every pair occurs once -> lexicographic tie-break, stable order
    m1 = learn_merges({"ab": 1, "cd": 1}, 5, min_pair_count=1)
    m2 = learn_merges({"cd": 1, "ab": 1}, 5, min_pair_count=1)
    assert m1 == m2
    assert m1[0] == ("a", "b")


def test_learn_merges_min_pair_count_stops():
    merges = learn_merges({"abc": 1}, 100, min_pair_count=2)
    assert merges == []


def test_fit_transform_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "newest widest low"),
         (3, None), (4, "")],
        "doc_id long, text string")
    model = BpeTokenizer().setNumMerges(30).setMinPairCount(1).fit(docs)
    out = model.transform(docs)
    got = {r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
           for r in out.collect()}
    assert got[3] == ([], 0) and got[4] == ([], 0)
    # token stream detokenizes back to the normalized words
    for i, text in [(1, "low lower newest"), (2, "newest widest low")]:
        toks, n = got[i]
        assert n == len(toks)
        rejoined = "".join(toks).replace(EOW, " ").strip()
        assert rejoined == text


def test_fit_equals_wordcount_fit(spark):
    """Fitting on the corpus == running the driver trainer on its
    word counts (the property that justifies the aggregate-first
    design)."""
    rows = [(i, "the cat sat on the mat " * (i + 1)) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = BpeTokenizer().setNumMerges(20).setMinPairCount(1).fit(docs)

    from collections import Counter
    wc = Counter()
    for _i, t in rows:
        for w in t.lower().split():
            wc[w] += 1
    expect = learn_merges(dict(wc), 20, min_pair_count=1)
    assert model.merges == expect


def test_model_table_roundtrip(spark):
    counts = {"banana": 3, "bandana": 2}
    merges = learn_merges(counts, 10, min_pair_count=1)
    m = BpeTokenizerModel(merges)
    back = BpeTokenizerModel.from_merges_df(m.merges_df(spark))
    assert back.merges == merges


def test_transform_is_arrow_batched(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = BpeTokenizerModel([("a", EOW)])
    plan = (model.transform(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_num_merges_validation():
    import pytest

    with pytest.raises(ValueError, match="numMerges"):
        BpeTokenizer().setNumMerges(0)


def _naive_learn_merges(word_counts, num_merges, min_pair_count=2):
    """Reference Sennrich trainer: full recount + rewrite per merge."""
    from collections import Counter

    from flink_ml__spark.functions.tokenizer import _word_to_symbols

    seqs = {}
    for w, c in word_counts.items():
        if w:
            s = _word_to_symbols(w)
            seqs[s] = seqs.get(s, 0) + c
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for s, c in seqs.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        ab = a + b
        new_seqs = {}
        for s, c in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab); i += 2
                else:
                    out.append(s[i]); i += 1
            t = tuple(out)
            new_seqs[t] = new_seqs.get(t, 0) + c
        seqs = new_seqs
    return merges


def test_learn_merges_matches_naive_reference_fuzz():
    """The incremental heap trainer must select the EXACT merge
    sequence of the naive recount-everything reference on random
    corpora — this catches lazy-heap staleness bugs (a pair whose
    count only decreases must still be selectable at its live
    count)."""
    import random

    rng = random.Random(20260814)
    for trial in range(120):
        n_words = rng.randint(3, 14)
        wc = {}
        for _ in range(n_words):
            w = "".join(rng.choices("abcd", k=rng.randint(1, 6)))
            wc[w] = wc.get(w, 0) + rng.randint(1, 9)
        nm = rng.randint(1, 12)
        mp = rng.choice([1, 2])
        got = learn_merges(wc, nm, min_pair_count=mp)
        want = _naive_learn_merges(wc, nm, min_pair_count=mp)
        assert got == want, (trial, wc, nm, mp, got, want)
