"""URL/web operators: hand-computed parse/canonicalize/dedup/filter
cases, NULL/malformed behavior, multi-part-suffix domains, plan shape
(no UDFs, no extra shuffles for the map-only operators)."""

import pytest

from flink_ml__spark.functions.web import (
    DomainFilter,
    UrlCanonicalizer,
    UrlDeduplicator,
    UrlParser,
)

URLS = [
    (1, "https://www.Example.co.uk:443/a/b/?utm_source=x&q=1#frag"),
    (2, "http://sub.site.com:80/path/"),
    (3, "http://site.com/path"),
    (4, "https://site.com/path?"),
    (5, "not a url"),
    (6, None),
    (7, "https://10.1.2.3:8080/x?b=2&a=1"),
    (8, "ftp://files.example.org/pub/"),
    (9, "https://www.example.co.uk/a/b?q=1"),
]


@pytest.fixture()
def urls_df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_url_parser_parts_and_domains(spark, urls_df):
    got = {r["doc_id"]: r for r in
           UrlParser().setInputCol("url").transform(urls_df).collect()}
    assert got[1]["url_scheme"] == "https"
    assert got[1]["url_host"] == "www.example.co.uk"   # lowercased
    assert got[1]["url_domain"] == "example.co.uk"     # 3-label eTLD+1
    assert got[1]["url_path"] == "/a/b/"
    assert got[1]["url_query"] == "utm_source=x&q=1"   # fragment cut
    assert got[2]["url_domain"] == "site.com"          # subdomain cut
    assert got[7]["url_domain"] == "10.1.2.3"          # IP passthrough
    assert got[8]["url_scheme"] == "ftp"
    # malformed and NULL → all parts NULL, no failed job
    for i in (5, 6):
        assert all(got[i][c] is None for c in
                   ("url_scheme", "url_host", "url_domain",
                    "url_path", "url_query"))


def test_url_canonicalizer(spark, urls_df):
    got = {r["doc_id"]: r["url_canonical"] for r in
           UrlCanonicalizer().setInputCol("url")
           .transform(urls_df).collect()}
    # tracking param dropped, default port dropped, host lowercased,
    # fragment cut, trailing slash trimmed
    assert got[1] == "https://www.example.co.uk/a/b?q=1"
    assert got[2] == "http://sub.site.com/path"
    assert got[4] == "https://site.com/path"            # empty query
    assert got[7] == "https://10.1.2.3:8080/x?a=1&b=2"  # sorted params
    assert got[8] == "ftp://files.example.org/pub"      # non-default port kept elsewhere
    assert got[5] is None and got[6] is None
    # variant forms of the same page collapse
    assert got[9] == got[1]


def test_url_deduplicator_keeps_min_id_and_null_urls(spark, urls_df):
    kept = sorted(r["doc_id"] for r in
                  UrlDeduplicator().setInputCol("url")
                  .transform(urls_df).collect())
    # 9 duplicates 1 (same canonical) and loses (larger id);
    # malformed/NULL rows (5, 6) are kept — no URL evidence
    assert kept == [1, 2, 3, 4, 5, 6, 7, 8]


def test_domain_filter_modes(spark, urls_df):
    block = DomainFilter().setInputCol("url").setBlocklist("example.co.uk")
    assert sorted(r["doc_id"] for r in block.transform(urls_df).collect()) \
        == [2, 3, 4, 5, 6, 7, 8]
    allow = DomainFilter().setInputCol("url").setAllowlist("site.com")
    assert sorted(r["doc_id"] for r in allow.transform(urls_df).collect()) \
        == [2, 3, 4]
    with pytest.raises(ValueError, match="no blocklist"):
        DomainFilter().transform(urls_df)

    doms = spark.createDataFrame([("example.org",)], "dom string")
    f = DomainFilter().setInputCol("url").setBlocklist("ignored.com")
    got = sorted(r["doc_id"] for r in
                 f.filter_against(urls_df, doms, "block").collect())
    assert got == [1, 2, 3, 4, 5, 6, 7, 9]
    got = sorted(r["doc_id"] for r in
                 f.filter_against(urls_df, doms, "allow").collect())
    assert got == [8]
    with pytest.raises(ValueError, match="mode"):
        f.filter_against(urls_df, doms, "drop")


def test_web_plan_shapes(spark, urls_df):
    """Parser/canonicalizer/filter are pure scan-stage projections:
    no Python evals, no exchanges; dedup has exactly one aggregate
    exchange pair."""
    for op in (UrlParser().setInputCol("url"),
               UrlCanonicalizer().setInputCol("url"),
               DomainFilter().setInputCol("url").setBlocklist("x.com")):
        plan = op.transform(urls_df)._jdf.queryExecution() \
                 .executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan
    plan = (UrlDeduplicator().setInputCol("url").transform(urls_df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan


# ------------------------------------------------------------ outlinks

def test_outlink_extractor_quotes_schemes_domains(spark):
    from flink_ml__spark.functions.web import OutlinkExtractor

    html = ('<a href="https://news.example.co.uk/a?x=1">one</a> '
            "<a href='http://blog.example.com/'>two</a> "
            '<img src="/static/logo.png"> '
            '<a href="ftp://files.example.com/f">three</a> '
            '<a HREF="HTTPS://CAPS.EXAMPLE.COM/P">four</a>')
    df = spark.createDataFrame(
        [(1, html), (2, "no links here"), (3, None)],
        "doc_id long, text string")
    out = OutlinkExtractor().transform(df)
    got = sorted((r["doc_id"], r["outlink"], r["out_domain"])
                 for r in out.collect())
    assert got == [
        (1, "/static/logo.png", None),
        (1, "HTTPS://CAPS.EXAMPLE.COM/P", "example.com"),
        (1, "ftp://files.example.com/f", None),
        (1, "http://blog.example.com/", "example.com"),
        (1, "https://news.example.co.uk/a?x=1", "example.co.uk"),
    ]


def test_outlink_extractor_composes_with_pagerank(spark):
    from flink_ml__spark.functions.graph import PageRank
    from flink_ml__spark.functions.web import OutlinkExtractor

    rows = [
        (10, '<a href="https://b.com/">x</a><a href="https://c.com/">y</a>'),
        (20, '<a href="https://c.com/">z</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    links = OutlinkExtractor().transform(df)
    edges = links.filter(links.out_domain.isNotNull()).selectExpr(
        "cast(doc_id as string) AS src", "out_domain AS dst")
    pr = PageRank().setMaxIter(5).transform(edges)
    ranks = {r["node"]: r["rank"] for r in pr.collect()}
    assert ranks["c.com"] > ranks["b.com"]   # two inlinks beat one
