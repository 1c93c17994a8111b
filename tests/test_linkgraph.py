"""Hyperlink extraction + URL canonicalization: each normalization rule is
pinned with hostile inputs the fixture corpus never produces (mailto/js
schemes, relative hrefs, non-default ports, mixed tracking params)."""

from pyspark.sql import functions as F

from jamie_spark import fixtures, linkgraph


def _one_page(spark, html):
    return spark.createDataFrame(
        [("https://src.test/p", bytearray(html.encode("utf-8")))],
        "url string, html binary",
    )


def _norm(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(linkgraph.normalize_url(F.col("u")).alias("n")).first()["n"]


def test_normalize_url_rule_table(spark):
    cases = {
        # rule 1: fragment
        "https://a.test/x#frag": "https://a.test/x",
        # rule 2: case
        "HTTPS://A.Test/Path": "https://a.test/Path",  # path case KEPT
        # rule 3: default ports dropped, explicit kept
        "https://a.test:443/x": "https://a.test/x",
        "http://a.test:80/x": "http://a.test/x",
        "http://a.test:8080/x": "http://a.test:8080/x",
        "https://a.test:80/x": "https://a.test:80/x",  # 80 not default for https
        # rule 4: tracking params out, others kept IN ORDER
        "https://a.test/x?utm_source=s&b=2&ref=r&a=1": "https://a.test/x?b=2&a=1",
        "https://a.test/x?utm_campaign=c&fbclid=f&gclid=g": "https://a.test/x",
        # rule 5: trailing slash / empty path
        "https://a.test/x/": "https://a.test/x",
        "https://a.test/": "https://a.test/",
        "https://a.test": "https://a.test/",
        "https://a.test/x///": "https://a.test/x",
    }
    for raw, want in cases.items():
        assert _norm(spark, raw) == want, raw


def test_extract_links_drops_non_web_targets(spark):
    html = (
        '<nav><a href="mailto:x@y.test">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="/relative/path">rel</a>'
        '<a href="ftp://files.test/a">ftp</a>'
        '<a href="https://keep.test/ok#f">keep</a></nav>'
    )
    rows = linkgraph.extract_links(_one_page(spark, html)).collect()
    assert [(r["dst_url"], r["anchor"]) for r in rows] == [
        ("https://keep.test/ok", "keep")
    ]


def test_extract_links_fixture_count_and_host_graph(spark):
    """Every fixture page emits exactly 3 nav links; the host rollup
    totals must equal the edge count."""
    pages = fixtures.pages_df(spark, 20, seed=7)
    links = linkgraph.extract_links(pages)
    assert links.count() == 60
    hg = linkgraph.host_graph(links)
    assert hg.agg(F.sum("n_links")).first()[0] == 60
    # mirror hosts fan out by doc_id % 5
    mirrors = {r["dst_host"] for r in hg.collect() if "mirror" in r["dst_host"]}
    assert mirrors == {f"mirror{k}.fixture.test" for k in range(5)}


def test_extracted_article_text_untouched_by_nav_links(spark):
    """The nav anchors must never leak into the boilerplate-stripped
    text — the N1 contract the pipeline golds depend on."""
    from jamie_spark.textnorm import extract_text

    page, _, _, _ = fixtures.gen_doc(3, seed=42)
    text = extract_text(page["html"])
    assert "関連記事" not in text and "ミラー" not in text
    assert text == page["text"]
