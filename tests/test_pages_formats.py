"""Microdata + RDFa extraction edge cases (sources/pages.py scanners).

The synth corpus exercises the happy path end-to-end (oracle
`pages_extract_triples`); these pin the scanner semantics on
handcrafted pages: format independence, blank-node numbering and
page-scoping, vocabulary resolution, verbatim RDFa names, literal
unescaping.
"""

from pyspark.sql import functions as F

from extract_cbd_shape_spark.sources.pages import (
    RDF_TYPE,
    extract_page_triples,
    scope_blank_label,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode("utf-8"))) for u, h in rows],
        "url string, html binary",
    ).withColumn("warc_ts", F.current_timestamp())


def _extract(spark, html, url="https://x.test/1"):
    df = extract_page_triples(_pages(spark, [(url, html)]))
    return {tuple(r) for r in df.drop("url").collect()}


def test_microdata_only_page_no_jsonld(spark):
    got = _extract(spark, (
        '<html><body><div itemscope itemtype="https://schema.org/Book" '
        'itemid="urn:b1"><span itemprop="name">T</span></div>'
        "</body></html>"
    ))
    assert got == {
        ("urn:b1", 0, RDF_TYPE, "https://schema.org/Book", 0),
        ("urn:b1", 0, "https://schema.org/name", "T", 2),
    }


def test_microdata_blank_numbering_and_page_scope(spark):
    html = (
        '<div itemscope><span itemprop="p">a</span></div>'
        '<div itemscope><span itemprop="p">b</span></div>'
    )
    u1, u2 = "https://x.test/1", "https://x.test/2"
    df = extract_page_triples(_pages(spark, [(u1, html), (u2, html)]))
    rows = {(r.url, r.subject, r.object_value)
            for r in df.filter(F.col("predicate") == "p").collect()}
    # two blank scopes per page, numbered in document order, labels
    # page-scoped so the two pages' items never merge
    assert rows == {
        (u1, scope_blank_label(u1, "_:md0"), "a"),
        (u1, scope_blank_label(u1, "_:md1"), "b"),
        (u2, scope_blank_label(u2, "_:md0"), "a"),
        (u2, scope_blank_label(u2, "_:md1"), "b"),
    }
    assert scope_blank_label(u1, "_:md0") != scope_blank_label(u2, "_:md0")


def test_microdata_without_itemtype_keeps_bare_predicate(spark):
    got = _extract(spark, (
        '<div itemscope itemid="urn:x"><span itemprop="weight">3</span>'
        "</div>"
    ))
    assert got == {("urn:x", 0, "weight", "3", 2)}


def test_microdata_absolute_itemprop_not_vocab_joined(spark):
    got = _extract(spark, (
        '<div itemscope itemtype="https://schema.org/Book" itemid="urn:x">'
        '<span itemprop="http://purl.org/dc/terms/title">T</span></div>'
    ))
    assert ("urn:x", 0, "http://purl.org/dc/terms/title", "T", 2) in got


def test_rdfa_prefixed_property_kept_verbatim(spark):
    got = _extract(spark, (
        '<div about="urn:s" typeof="schema:Thing">'
        '<span property="schema:name">N</span>'
        '<a property="schema:url" href="https://t.test/">x</a></div>'
    ))
    assert got == {
        ("urn:s", 0, RDF_TYPE, "schema:Thing", 0),
        ("urn:s", 0, "schema:name", "N", 2),
        ("urn:s", 0, "schema:url", "https://t.test/", 0),
    }


def test_literal_unescaping(spark):
    got = _extract(spark, (
        '<div itemscope itemid="urn:x">'
        '<span itemprop="t">a &lt;b&gt; &amp;c</span></div>'
    ))
    assert got == {("urn:x", 0, "t", "a <b> &c", 2)}
