"""Tests for text-analysis operators against the documents table."""

from flink_ml__spark.functions.text import (
    Fingerprinter,
    LanguageIdentifier,
    QualityScorer,
    TokenCounter,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog and it is fast for you"),
    (2, "Der Hund ist nicht zu Hause und ich gehe mit der Katze"),
    (3, "le chat est dans la maison et les enfants sont pour vous"),
    (4, "el perro y el gato son los animales de la casa para que"),
    (5, "zzz qqq xxx"),
    (6, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_language_identifier(spark):
    out = LanguageIdentifier().transform(_df(spark))
    got = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "und"
    assert got[6] == "und"


def test_quality_scorer(spark):
    out = QualityScorer().transform(_df(spark))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["quality_score"] > got[5]["quality_score"]
    assert 0.0 <= got[1]["quality_score"] <= 1.0
    assert got[1]["n_tokens_q"] == 15
    assert got[6]["n_tokens_q"] == 0


def test_token_counter(spark):
    df = spark.createDataFrame(
        [(1, "hello world, 42 tokens!")], ["doc_id", "text"])
    out = TokenCounter().transform(df).first()
    assert out["n_tokens"] == 4
    # BPE-ish: hello | world | , | 4 | 2 | tokens | !
    assert out["n_tokens_bpe"] == 7


def test_token_counter_null_text_counts_zero(spark):
    """NULL text is 0 tokens, not -1 (non-ANSI size(NULL)); a -1 would
    shift every later document's SequencePacker offset."""
    from flink_ml__spark.functions.curation import SequencePacker

    df = spark.createDataFrame(
        [(1, "three tokens here"), (2, None), (3, "two tokens")],
        "doc_id long, text string")
    counted = TokenCounter().transform(df)
    got = {r["doc_id"]: (r["n_tokens"], r["n_tokens_bpe"])
           for r in counted.collect()}
    assert got[2] == (0, 0)
    packed = {r["doc_id"]: r["offset"]
              for r in (SequencePacker().setWindowSize(256).setNumShards(1)
                        .transform(counted).collect())}
    # doc 2 occupies zero tokens: doc 3 starts where doc 2 started
    assert packed[1] == 0
    assert packed[2] == 3
    assert packed[3] == 3


def test_pii_redactor(spark):
    from flink_ml__spark.functions.text import PiiRedactor

    df = spark.createDataFrame(
        [(1, "mail a.b%x@foo-bar.co.uk, ip 10.0.255.7, "
             "call +1 (415) 555-0199, ref 123456789012"),
         (2, "no pii here at all")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in PiiRedactor().transform(df).collect()}
    r1 = got[1]
    assert r1["n_pii_emails"] == 1
    assert r1["n_pii_ips"] == 1
    assert r1["n_pii_ids"] == 1
    assert r1["n_pii_phones"] == 1
    assert r1["text_redacted"] == (
        "mail <EMAIL>, ip <IP>, call <PHONE>, ref <ID>")
    r2 = got[2]
    assert r2["text_redacted"] == "no pii here at all"
    assert (r2["n_pii_emails"], r2["n_pii_ips"],
            r2["n_pii_ids"], r2["n_pii_phones"]) == (0, 0, 0, 0)


def test_pii_redactor_null_text(spark):
    """NULL text: counts are 0 (TokenCounter contract), redacted NULL."""
    from flink_ml__spark.functions.text import PiiRedactor

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = PiiRedactor().transform(df).first()
    assert r["text_redacted"] is None
    assert (r["n_pii_emails"], r["n_pii_ips"],
            r["n_pii_ids"], r["n_pii_phones"]) == (0, 0, 0, 0)


def test_pii_redactor_no_double_count(spark):
    """Digits inside an already-redacted email must not count again as
    an id/phone — counts run sequentially on the partially redacted
    text."""
    from flink_ml__spark.functions.text import PiiRedactor

    df = spark.createDataFrame(
        [(1, "user123456789012@example.com")], ["doc_id", "text"])
    r = PiiRedactor().transform(df).first()
    assert r["n_pii_emails"] == 1
    assert r["n_pii_ids"] == 0
    assert r["n_pii_phones"] == 0
    assert r["text_redacted"] == "<EMAIL>"


def test_fingerprinter(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["fingerprint"]
           for r in Fingerprinter().transform(df).collect()}
    assert out[1] == out[2]  # case/whitespace-normalized
    assert out[1] != out[3]


def test_winnowing_fingerprints_locality(spark):
    """Winnowing property: a local edit changes only nearby fingerprints
    (the whole-document md5 flips entirely)."""
    from flink_ml__spark.functions.text import WinnowingFingerprinter

    a = "the quick brown fox jumps over the lazy dog near the fence"
    b = a.replace("lazy", "hazy")   # one local edit
    df = spark.createDataFrame([(1, a), (2, b), (3, a)],
                               ["doc_id", "text"])
    out = {r["doc_id"]: set(r["fingerprints"])
           for r in WinnowingFingerprinter().transform(df).collect()}
    assert out[1] == out[3]                       # deterministic
    assert out[1] != out[2]                       # edit detected
    shared = len(out[1] & out[2]) / len(out[1] | out[2])
    assert shared > 0.5                           # but mostly preserved


def test_winnowing_short_text(spark):
    from flink_ml__spark.functions.text import WinnowingFingerprinter

    df = spark.createDataFrame([(1, "ab"), (2, "")], ["doc_id", "text"])
    rows = {r["doc_id"]: r["fingerprints"]
            for r in WinnowingFingerprinter().transform(df).collect()}
    assert len(rows[1]) == 1 and len(rows[2]) == 1


def test_quality_filter(spark):
    from flink_ml__spark.functions.text import QualityFilter, QualityScorer

    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog and it is for "
             "you that the sun shines in the warm morning light today"),
         (2, "!!! ??? ;;; ,,,")],
        ["doc_id", "text"])
    scored = QualityScorer().transform(df)
    scores = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    thr = (scores[1] + scores[2]) / 2
    kept = [r["doc_id"] for r in
            QualityFilter().setMinScore(thr).transform(df).collect()]
    assert kept == [1]


def test_pii_redactor_custom_patterns(spark):
    """User-supplied (pattern, token, name) triples replace the default
    set under the same sequential-count contract: later categories see
    the text as already redacted by earlier ones."""
    from flink_ml__spark.functions.text import PiiRedactor

    df = spark.createDataFrame(
        [(1, "ssn 123-45-6789 key sk-abcdef 123-45-6789")],
        ["doc_id", "text"])
    op = PiiRedactor().setPatterns([
        (r"\d{3}-\d{2}-\d{4}", "<SSN>", "ssns"),
        # would match the digits inside an SSN too — but they are
        # already redacted when this pass runs
        (r"\b\d{2}-\d{4}\b", "<NUM>", "nums"),
        (r"sk-[a-z]+", "<KEY>", "keys"),
    ])
    r = op.transform(df).collect()[0]
    assert r["n_pii_ssns"] == 2
    assert r["n_pii_nums"] == 0      # sequential: consumed by <SSN>
    assert r["n_pii_keys"] == 1
    assert r["text_redacted"] == "ssn <SSN> key <KEY> <SSN>"
    # defaults unaffected on a fresh instance
    assert len(PiiRedactor().getPatterns()) == 4

    import pytest as _pytest
    with _pytest.raises(ValueError):
        PiiRedactor().setPatterns([("a", "b")])


def test_gopher_quality_filter_rules(spark):
    from flink_ml__spark.functions.text import GopherQualityFilter

    long_ok = ("the quick brown fox jumps over the lazy dog and keeps "
               "running through the field with steady measured strides "
               "while birds circle overhead in the warm afternoon air "
               "and the river flows quietly beside the old stone bridge "
               "carrying leaves downstream past the village mill") + \
              " more words here to cross fifty total easily done now yes"
    df = spark.createDataFrame(
        [(1, long_ok),                              # passes everything
         (2, "too short to pass the word floor"),   # < minWords
         (3, None),                                 # NULL ≡ empty → fail
         (4, " ".join(["#"] * 60))],                # symbols, no alpha
        ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in GopherQualityFilter().setMinStopHits(1)
           .transform(df).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[1]["gopher_n_words"] >= 50
    assert out[2]["gopher_pass"] is False
    assert out[3]["gopher_pass"] is False and out[3]["gopher_n_words"] == 0
    assert out[4]["gopher_pass"] is False
    assert out[4]["gopher_symbol_ratio"] == 1.0
    assert out[4]["gopher_alpha_word_frac"] == 0.0


def test_text_normalizer_goldens(spark):
    from flink_ml__spark.functions.text import TextNormalizer

    df = spark.createDataFrame(
        [(1, "  Hello\t\tWorld \r\n twice  "),
         (2, "Line one.\nLine two!"),
         (3, None),
         (4, "MiXeD'case, with-punct: 42")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TextNormalizer().transform(df).collect()}
    assert out[1]["text_norm"] == "hello world twice"
    assert out[1]["text_norm_chars"] == len("hello world twice")
    assert out[2]["text_norm"] == "line one. line two!"
    assert out[3]["text_norm"] is None
    assert out[3]["text_norm_chars"] == 0

    stripped = {r["doc_id"]: r for r in
                TextNormalizer().setStripPunct(True).transform(df).collect()}
    # whitespace collapses BEFORE punct strip: words stay separated
    assert stripped[2]["text_norm"] == "line one line two"
    assert stripped[4]["text_norm"] == "mixed'case withpunct 42"

    kept_case = (TextNormalizer().setLowercase(False)
                 .transform(df).collect())
    by_id = {r["doc_id"]: r for r in kept_case}
    assert by_id[4]["text_norm"] == "MiXeD'case, with-punct: 42"


def test_markup_stripper_goldens(spark):
    from flink_ml__spark.functions.text import MarkupStripper

    df = spark.createDataFrame([
        (1, "<p>Hello &amp; welcome</p><script>var a=1;</script>"
            "<!-- hid --><b>world</b>"),
        (2, "plain text, no tags"),
        (3, None),
        (4, "<style>p{color:red}</style>A &lt;tag&gt;"
            " &#39;q&#39;&nbsp;end"),
        (5, "<SCRIPT>\nmultiline();\n</SCRIPT>after"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: (r["text_clean"], r["n_tags_removed"])
           for r in MarkupStripper().transform(df).collect()}
    assert got[1] == ("Hello & welcome world", 4)  # <p> </p> <b> </b>
    assert got[2] == ("plain text, no tags", 0)
    assert got[3] == (None, 0)
    # entities unescape AFTER tag removal: "<tag>" survives as text
    assert got[4] == ("A <tag> 'q' end", 0)
    # (?i) case-insensitive element match, (?s) spans lines
    assert got[5] == ("after", 0)


def test_markup_stripper_amp_last(spark):
    """&amp;lt; must become the literal text '&lt;', not '<' —
    the classic double-unescape bug the entity order prevents."""
    from flink_ml__spark.functions.text import MarkupStripper

    df = spark.createDataFrame([(1, "x &amp;lt; y")],
                               "doc_id long, text string")
    assert (MarkupStripper().transform(df).first()["text_clean"]
            == "x &lt; y")


def test_markup_stripper_map_only(spark):
    from flink_ml__spark.functions.text import MarkupStripper

    df = spark.createDataFrame([(1, "<p>x</p>")],
                               "doc_id long, text string")
    plan = (MarkupStripper().transform(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_script_profiler_goldens(spark):
    from flink_ml__spark.functions.text import ScriptProfiler

    df = spark.createDataFrame([
        (1, "hello world 123"),
        (2, "привет мир"),
        (3, "日本語のテキスト"),
        (4, "نص عربي"),
        (5, ""),
        (6, None),
        (7, "!!! ???"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in ScriptProfiler().transform(df).collect()}
    assert got[1]["dominant"] == "latin"
    assert abs(got[1]["digit_frac"] - 3 / 13) < 1e-9
    assert got[2]["dominant"] == "cyrillic"
    assert got[2]["cyrillic_frac"] == 1.0
    assert got[3]["dominant"] == "cjk" and got[3]["cjk_frac"] == 1.0
    assert got[4]["dominant"] == "arabic"
    assert got[5]["dominant"] is None
    assert got[6]["dominant"] is None and got[6]["latin_frac"] == 0.0
    assert got[7]["dominant"] == "other" and got[7]["other_frac"] == 1.0
    # fractions partition the non-ws mass
    r = got[1]
    total = sum(r[f"{n}_frac"] for n in
                ["latin", "cyrillic", "cjk", "arabic", "digit", "other"])
    assert abs(total - 1.0) < 1e-9


def test_script_profiler_map_only(spark):
    from flink_ml__spark.functions.text import ScriptProfiler

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (ScriptProfiler().transform(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_script_profiler_pure_digits_not_latin(spark):
    """Digit-only text matches no script class — dominant must be
    NULL, not the latin tie-break."""
    from flink_ml__spark.functions.text import ScriptProfiler

    df = spark.createDataFrame([(1, "12345"), (2, "123 456")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["dominant"]
           for r in ScriptProfiler().transform(df).collect()}
    assert got == {1: None, 2: None}


def test_phrase_matcher_word_boundaries(spark):
    from flink_ml__spark.functions.text import PhraseMatcher

    df = spark.createDataFrame([
        (1, "The COOKIE policy applies; read the cookie Policy now"),
        (2, "boring rings are not blockings"),   # no boundary match
        (3, "block ring here"),
        (4, None),
    ], "doc_id long, text string")
    m = PhraseMatcher().setPhrases("cookie policy", "block ring", "ring")
    got = {(r["doc_id"], r["phrase"]): r["n_occurrences"]
           for r in m.match(df).collect()}
    assert got == {(1, "cookie policy"): 2,
                   (3, "block ring"): 1,
                   (3, "ring"): 1}
    kept = sorted(r["doc_id"] for r in m.transform(df).collect())
    assert kept == [2, 4]   # blocklist filter; NULL text never matches


def test_phrase_matcher_adjacent_repeats_str_count(spark):
    """Documented contract: back-to-back repeats share a delimiter and
    count once (str.count semantics), presence stays exact."""
    from flink_ml__spark.functions.text import PhraseMatcher

    df = spark.createDataFrame([(1, "a b a b"), (2, "a b x a b")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in PhraseMatcher().setPhrases("a b").match(df).collect()}
    assert got[1] == 1      # " a b a b ": second repeat shares the space
    assert got[2] == 2      # separated repeats count fully


def test_phrase_matcher_plan_no_python_no_cartesian(spark):
    from flink_ml__spark.functions.text import PhraseMatcher

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    plan = (PhraseMatcher().setPhrases("x y").match(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_phrase_matcher_validation(spark):
    import pytest

    from flink_ml__spark.functions.text import PhraseMatcher

    with pytest.raises(ValueError, match="phrases"):
        PhraseMatcher().match(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"))
    with pytest.raises(ValueError, match="non-empty"):
        PhraseMatcher().setPhrases()


def test_readability_hand_computed(spark):
    """'The cat sat. It ran!' — 5 words, 2 sentences, 5 vowel groups
    (e/a/a/i/a): ease = 206.835 − 1.015·2.5 − 84.6·1.0 = 119.6975;
    grade = 0.39·2.5 + 11.8·1.0 − 15.59 = −2.815."""
    import math

    from flink_ml__spark.functions.text import ReadabilityScorer

    df = spark.createDataFrame([(1, "The cat sat. It ran!")],
                               ["doc_id", "text"])
    r = ReadabilityScorer().transform(df).collect()[0]
    assert r["n_words_rd"] == 5
    assert r["n_sentences"] == 2
    assert r["n_syllables"] == 5
    assert math.isclose(r["flesch_ease"], 119.6975)
    assert math.isclose(r["fk_grade"], -2.815)


def test_readability_null_and_empty(spark):
    from flink_ml__spark.functions.text import ReadabilityScorer

    df = spark.createDataFrame([(1, None), (2, ""), (3, "...")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            ReadabilityScorer().transform(df).collect()}
    assert rows[1]["flesch_ease"] is None      # NULL text
    assert rows[2]["flesch_ease"] is None      # zero words
    assert rows[3]["flesch_ease"] is None      # punctuation only
    assert rows[2]["n_words_rd"] == 0
    assert rows[3]["n_sentences"] == 1         # floored


def test_readability_harder_text_scores_harder(spark):
    from flink_ml__spark.functions.text import ReadabilityScorer

    simple = "The dog ran. The cat sat. It was fun."
    complex_ = ("Notwithstanding considerable epistemological "
                "controversy, interdisciplinary collaboration "
                "facilitates comprehensive organizational synergy.")
    df = spark.createDataFrame([(1, simple), (2, complex_)],
                               ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            ReadabilityScorer().transform(df).collect()}
    assert rows[1]["flesch_ease"] > rows[2]["flesch_ease"]
    assert rows[1]["fk_grade"] < rows[2]["fk_grade"]


# ---------------------------------------------------- hashed-tf embedder

def test_hashed_tf_embedder_unit_norm_and_counts(spark):
    import math

    from flink_ml__spark.functions.text import HashedTfEmbedder

    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, None), (3, "!!! ---")],
        "id long, text string")
    out = {r["id"]: r["embedding"]
           for r in HashedTfEmbedder().setDim(8).transform(df).collect()}
    v = out[1]
    assert math.isclose(sum(x * x for x in v), 1.0)
    # tf 2 ('hello') vs 1 ('world'): weights 2/sqrt5, 1/sqrt5
    assert sorted(x for x in v if x > 0) == sorted(
        [1 / math.sqrt(5), 2 / math.sqrt(5)])
    assert out[2] is None and out[3] is None   # no tokens -> NULL


def test_hashed_tf_embedder_sublinear_and_identical_docs(spark):
    import math

    from flink_ml__spark.functions.text import HashedTfEmbedder

    df = spark.createDataFrame(
        [(1, "spark spark spark sql"), (2, "spark spark spark sql"),
         (3, "entirely different words here")],
        "id long, text string")
    op = HashedTfEmbedder().setDim(32).setSublinear(True)
    got = {r["id"]: r["embedding"] for r in op.transform(df).collect()}
    assert got[1] == got[2]            # deterministic
    # sublinear: ratio between buckets is ln(4)/ln(2), not 3/1
    pos = sorted((x for x in got[1] if x > 0), reverse=True)
    assert math.isclose(pos[0] / pos[1], math.log(4) / math.log(2))


def test_hashed_tf_feeds_cosine_topk_end_to_end(spark):
    """The embedder's contract: its output drives the ANN family
    unchanged — near-duplicate texts rank first by cosine."""
    from pyspark.sql import functions as F

    from flink_ml__spark.functions.similarity import CosineTopK
    from flink_ml__spark.functions.text import HashedTfEmbedder

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated text about query planners"),
            (4, "another unrelated doc on shuffle partitioning")]
    df = spark.createDataFrame(rows, "vec_id long, text string")
    emb = (HashedTfEmbedder().setDim(64).transform(df)
           .select("vec_id", "embedding"))
    got = (CosineTopK().setK(1)
           .topk(emb.filter(F.col("vec_id") == 1), emb.filter("vec_id != 1"))
           .collect())
    assert len(got) == 1 and got[0]["neighbor_id"] == 2


def test_hashed_tf_validates_dim(spark):
    import pytest as _pytest

    from flink_ml__spark.functions.text import HashedTfEmbedder

    with _pytest.raises(ValueError):
        HashedTfEmbedder().setDim(0)


# ------------------------------------------------- encoding corruption

def test_encoding_corruption_counts_and_flag(spark):
    from flink_ml__spark.functions.text import EncodingCorruptionDetector

    clean = "A perfectly ordinary sentence with caf\u00e9 accents."
    # mojibake of 'café "quoted"' read as cp1252: \xc3\xa9 -> 'caf\u00c3\u00a9',
    # \xe2\x80\x9c -> '\u00e2\u20ac\u0153', \xe2\x80\x9d -> '\u00e2\u20ac\u009d'
    mojibake = ("caf\u00c3\u00a9 \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d")
    replaced = "broken \ufffd decode"
    binary = "x" + "".join(chr(c) for c in (0, 1, 2, 3, 4)) + "y"
    df = spark.createDataFrame(
        [(1, clean), (2, mojibake), (3, replaced), (4, binary),
         (5, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in EncodingCorruptionDetector().transform(df).collect()}
    assert out[1]["n_replacement"] == 0 and out[1]["n_mojibake"] == 0
    assert out[1]["n_control"] == 0 and out[1]["is_corrupt"] is False
    # one 'caf\xc3\xa9' digraph + two '\xe2\u20ac' prefixes
    assert out[2]["n_mojibake"] == 3
    assert out[2]["n_control"] == 1          # trailing U+009D is C1
    assert out[2]["is_corrupt"] is True
    assert out[3]["n_replacement"] == 1 and out[3]["is_corrupt"] is True
    assert out[4]["n_control"] == 5 and out[4]["is_corrupt"] is True
    assert out[5]["n_mojibake"] is None
    assert out[5]["is_corrupt"] is False


def test_encoding_corruption_threshold(spark):
    from flink_ml__spark.functions.text import EncodingCorruptionDetector

    # one mojibake digraph in a long doc: under a loose threshold ok,
    # over a tight one corrupt
    text = ("clean text " * 50) + "caf\u00c3\u00a9"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    loose = (EncodingCorruptionDetector().setThreshold(0.5)
             .transform(df).first())
    tight = (EncodingCorruptionDetector().setThreshold(0.001)
             .transform(df).first())
    assert loose["is_corrupt"] is False
    assert tight["is_corrupt"] is True
    import pytest as _pt
    with _pt.raises(ValueError):
        EncodingCorruptionDetector().setThreshold(0.0)


def test_encoding_corruption_exempts_whitespace_controls(spark):
    from flink_ml__spark.functions.text import EncodingCorruptionDetector

    df = spark.createDataFrame(
        [(1, "line one\nline two\ttabbed\r\n")],
        "doc_id long, text string")
    r = EncodingCorruptionDetector().transform(df).first()
    assert r["n_control"] == 0 and r["is_corrupt"] is False


def test_sentence_splitter_basic(spark):
    from flink_ml__spark.functions.text import SentenceSplitter

    rows = [
        (1, "First one. Second!  Third?? And a tail without end"),
        (2, "... leading dots. ok."),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in SentenceSplitter().transform(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["sent_idx"], r["sentence"]))
    assert got[1] == [(0, "First one."), (1, "Second!"),
                      (2, "Third??"), (3, "And a tail without end")]
    assert got[2] == [(0, "leading dots."), (1, "ok.")]
    assert 3 not in got and 4 not in got


def test_hashed_tfidf_fit_and_apply(spark, tmp_path):
    import math

    import hashlib

    from flink_ml__spark.functions.text import (
        HashedTfIdfEmbedder,
        HashedTfIdfModel,
    )

    def PORTABLE_HASH60_PY(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "alpha alpha delta"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dim = 8
    model = HashedTfIdfEmbedder().setDim(dim).fit(df)

    def bucket(tok):
        return PORTABLE_HASH60_PY(tok) % dim

    n = 4
    dfreq = {}
    for _, t in docs:
        for b in {bucket(w) for w in (t or "").split() if w}:
            dfreq[b] = dfreq.get(b, 0) + 1
    idf = [math.log((n + 1) / (dfreq.get(b, 0) + 1)) + 1
           for b in range(dim)]
    assert all(abs(a - b) < 1e-12 for a, b in zip(model.idf, idf))

    got = {r["doc_id"]: r["embedding"]
           for r in model.transform(df).collect()}
    # doc 3: alpha x2 + delta x1, idf-weighted, L2-normalized
    w = [0.0] * dim
    w[bucket("alpha")] += 2 * idf[bucket("alpha")]
    w[bucket("delta")] += 1 * idf[bucket("delta")]
    nrm = math.sqrt(sum(x * x for x in w))
    for a, b in zip(got[3], [x / nrm for x in w]):
        assert abs(a - b) < 1e-12
    assert got[4] is None

    p = str(tmp_path / "tfidf")
    model.save(p)
    loaded = HashedTfIdfModel.load(spark, p)
    got2 = {r["doc_id"]: r["embedding"]
            for r in loaded.transform(df).collect()}
    assert got2[3] == got[3]


def test_lexical_diversity_golden(spark):
    from flink_ml__spark.functions.text import LexicalDiversityScorer

    rows = [(1, "the the the the"), (2, "alpha beta gamma delta"),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in LexicalDiversityScorer().transform(df).collect()}
    one, four = got[1], got[2]
    assert (one["n_tokens_ld"], one["n_types"]) == (4, 1)
    assert one["ttr"] == 0.25 and one["hapax_frac"] == 0.0
    assert one["shannon_entropy"] == 0.0 and one["simpson_index"] == 1.0
    assert (four["n_tokens_ld"], four["n_types"]) == (4, 4)
    assert four["ttr"] == 1.0 and four["hapax_frac"] == 1.0
    assert four["shannon_entropy"] == 2.0 and four["simpson_index"] == 0.25
    assert got[3]["n_tokens_ld"] == 0 and got[3]["ttr"] is None


def test_code_density_golden(spark):
    from flink_ml__spark.functions.text import CodeDensityProfiler

    rows = [(1, "def f(x):\n    return x + 1\n\nprint(f(2));"),
            (2, "Just a normal English sentence, nothing else."),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in CodeDensityProfiler().transform(df).collect()}
    code, prose = got[1], got[2]
    assert code["n_lines"] == 4
    assert code["indent_frac"] == 0.25        # the indented return
    assert code["symbol_line_frac"] == 0.5    # ':' and ';' line ends
    assert code["is_code"] is True
    assert prose["code_score"] == 0.0 and prose["is_code"] is False
    assert got[3]["code_score"] is None and got[3]["is_code"] is None


# ---------------------------------------------------------------------------
# NgramOverlapScorer (ROUGE-N)
# ---------------------------------------------------------------------------

def test_rouge_golden(spark):
    from flink_ml__spark.functions.text import NgramOverlapScorer
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat sat"),
         (3, "zzz qqq"), (4, "")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1)], "id_a long, id_b long")
    out = {(r["id_a"], r["n"]): r for r in
           (NgramOverlapScorer().setNgramOrders(1, 2)
            .score_pairs(pairs, docs).collect())}
    # candidate 2 vs reference 1: clipped unigram match 3 of 3/6
    r = out[(2, 1)]
    assert r["match_n"] == 3 and r["total_a"] == 3 and r["total_b"] == 6
    assert abs(r["precision"] - 1.0) < 1e-12
    assert abs(r["recall"] - 0.5) < 1e-12
    assert abs(r["f1"] - 2 / 3) < 1e-12
    # bigrams: "the cat","cat sat" of 2/5
    r = out[(2, 2)]
    assert r["match_n"] == 2 and r["total_b"] == 5
    assert abs(r["recall"] - 0.4) < 1e-12
    assert abs(r["f1"] - 2 * 1 * 0.4 / 1.4) < 1e-12
    # disjoint pair: explicit zeros
    r = out[(3, 1)]
    assert r["match_n"] == 0 and r["f1"] == 0.0
    # empty candidate: undefined precision -> NULL
    r = out[(4, 1)]
    assert r["total_a"] == 0 and r["precision"] is None


def test_rouge_clipping_and_validation(spark):
    import pytest as _pt
    from flink_ml__spark.functions.text import NgramOverlapScorer
    # clipped counts: candidate repeats "the" 4x, reference has 2
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "the mat the")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = (NgramOverlapScorer().setNgramOrders(1)
         .score_pairs(pairs, docs).first())
    assert r["match_n"] == 2          # min(4, 2) — clipped
    assert abs(r["precision"] - 0.5) < 1e-12
    with _pt.raises(ValueError, match="ngramOrders"):
        NgramOverlapScorer().setNgramOrders(0)


# ---------------------------------------------------------------------------
# TokenizerFertilityProfiler
# ---------------------------------------------------------------------------

def test_tokenizer_fertility_hand_checked(spark):
    """'ab cd' = 2 words / 2 BPE tokens (fertility 1); "it's ok!" =
    2 words / 5 BPE tokens (it, ', s, ok, !) -> fertility 2.5; null
    text counts 0/0 and the group's ratios go NULL-safe."""
    from flink_ml__spark.functions.text import TokenizerFertilityProfiler

    df = spark.createDataFrame(
        [("en", "ab cd"), ("fr", "it's ok!"), ("zz", None)],
        "lang string, text string")
    out = {r["lang"]: r for r in
           TokenizerFertilityProfiler().transform(df).collect()}
    en, fr, zz = out["en"], out["fr"], out["zz"]
    assert (en["n_docs"], en["n_words"], en["n_tokens"],
            en["n_chars"]) == (1, 2, 2, 5)
    assert abs(en["fertility"] - 1.0) < 1e-9
    assert abs(en["chars_per_token"] - 2.5) < 1e-9
    assert (fr["n_words"], fr["n_tokens"]) == (2, 5)
    assert abs(fr["fertility"] - 2.5) < 1e-9
    # corpus fertility = 7 tokens / 4 words = 1.75
    assert abs(en["rel_fertility"] - 1.0 / 1.75) < 1e-9
    assert abs(fr["rel_fertility"] - 2.5 / 1.75) < 1e-9
    assert (zz["n_words"], zz["n_tokens"], zz["n_chars"]) == (0, 0, 0)
    assert zz["fertility"] is None
    assert zz["chars_per_token"] is None
    assert zz["rel_fertility"] is None
