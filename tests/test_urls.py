"""URL canonicalization / dedup (functions/urls.py).

The north-star input table is keyed by ``url`` (BASELINE.json
input_hint); crawl-equivalence normalization is the standard first
pass before URL-level dedup. No reference counterpart (the reference
dereferences IRIs but never normalizes them) — these pin the module's
own contract, mirrored by the DuckDB oracles ``url_canonical`` /
``url_dedup`` in __spark_entry__.py.
"""

import datetime

from pyspark.sql import functions as F

from extract_cbd_shape_spark.functions.urls import (
    canonical_url,
    registered_domain,
    url_dedup,
    url_host,
)

CASES = [
    # scheme/host case + fragment
    ("HTTP://WWW.Example.COM/a#frag", "http://www.example.com/a"),
    # default ports stripped (scheme-matched only)
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # tracking params out, remaining params sorted
    ("http://e.com/p?utm_source=x&b=2&a=1", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?fbclid=zz", "http://e.com/p"),
    ("http://e.com/p?gclid=1&ref=home", "http://e.com/p"),
    # empty path -> '/', non-root trailing slash stripped
    ("http://e.com", "http://e.com/"),
    ("http://e.com/", "http://e.com/"),
    ("http://e.com/a/b/", "http://e.com/a/b"),
    # path case preserved (paths are case-sensitive)
    ("http://e.com/CaseSensitive", "http://e.com/CaseSensitive"),
    # unparseable input returned unchanged
    ("not a url", "not a url"),
    ("mailto:x@example.com", "mailto:x@example.com"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [want for _, want in CASES]


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [("HTTP://Sub.News.Example.Co:8080/x?q=1",)], "url string"
    )
    row = df.select(
        url_host(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()[0]
    assert row["h"] == "sub.news.example.co"
    assert row["d"] == "example.co"


def test_url_dedup_latest_crawl_wins(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # one canonical group, three crawls — latest must win
        ("http://e.com/a?utm_source=x", ts(1), "old"),
        ("HTTP://E.COM/a", ts(3), "newest"),
        ("http://e.com:80/a/", ts(2), "mid"),
        # a second, unrelated group
        ("http://e.com/b", ts(5), "only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, body string")
    out = url_dedup(df).orderBy("canonical_url").collect()
    assert [(r["canonical_url"], r["url"], r["body"]) for r in out] == [
        ("http://e.com/a", "HTTP://E.COM/a", "newest"),
        ("http://e.com/b", "http://e.com/b", "only"),
    ]
    # all original columns survive
    assert set(out[0].asDict()) == {"canonical_url", "url", "warc_ts", "body"}


def test_url_oracle_parity(spark):
    """Spark url_canonical/url_dedup vs the DuckDB oracles at sf0.001
    (the driver's gate, run locally)."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    name = "url_canonical_dedup"
    sdf = qs[name](spark, sf)
    srows = sorted(tuple(r) for r in sdf.collect())
    orows = sorted(tuple(r) for r in con.execute(oracles[name]).fetchall())
    assert srows == orows, name
    # dedup must actually merge variants at this sf
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    kept = {r.kept_url for r in sdf.collect()}
    assert len(kept) < n_docs
