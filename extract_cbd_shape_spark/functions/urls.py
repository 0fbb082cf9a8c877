"""URL canonicalization column functions (JVM-side, no Python UDFs).

A web-corpus pipeline dedups and groups by URL constantly (the
north-star input table is keyed by ``url``); raw crawl URLs differ in
ways that never change the fetched resource. ``canonical_url``
normalizes the standard equivalence classes:

- scheme and host lower-cased;
- default ports stripped (``:80`` for http, ``:443`` for https);
- tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining parameters sorted by name so parameter order
  never splits a group;
- empty query (``?`` or all params stripped) removed;
- fragment (``#...``) removed — never sent to the server;
- trailing slash on a non-root path stripped.

All pure ``pyspark.sql.functions`` column expressions (regex + array
ops), so the whole computation stays inside whole-stage codegen — at
10^12 rows this is a map-only pass with no Python surface. The DuckDB
oracle in __spark_entry__.py mirrors the same contract symbol by
symbol (shared regexes below).

Reference scope note: the reference engine dereferences entity IRIs
over HTTP (lib/CBDShapeExtractor.ts dereference path) but does no URL
normalization itself; this module is part of the north-star
LLM-pipeline surface (BASELINE.json input_hint: pages keyed by url),
not a reference-parity operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared with the DuckDB oracle (keep in sync with __spark_entry__.py).
# The split regex must match RAW urls (scheme/host case not yet
# normalized), so its classes accept uppercase.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|ref)="
URL_SPLIT_RE = (
    r"^([A-Za-z][A-Za-z0-9+.-]*):\/\/([^\/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
)


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` (see module docstring for the rules).

    Inputs that don't parse as ``scheme://authority...`` are returned
    unchanged (surfacing them beats silently mangling them)."""
    scheme = F.lower(F.regexp_extract(url, URL_SPLIT_RE, 1))
    host = F.lower(F.regexp_extract(url, URL_SPLIT_RE, 2))
    path = F.regexp_extract(url, URL_SPLIT_RE, 3)
    query = F.regexp_extract(url, URL_SPLIT_RE, 4)

    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)

    # non-root trailing slash: /a/b/ -> /a/b ; bare authority -> /
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        path != "/", F.regexp_replace(path, "/$", "")
    ).otherwise(path)

    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))

    parsed = F.concat(scheme, F.lit("://"), host, path, canon_query)
    return F.when(scheme == "", url).otherwise(parsed)


def url_host(url: Column) -> Column:
    """Lower-cased host (authority without port)."""
    return F.lower(
        F.regexp_extract(
            F.regexp_extract(url, URL_SPLIT_RE, 2), r"^([^:]*)", 1
        )
    )


def registered_domain(url: Column, tld_levels: int = 2) -> Column:
    """Last ``tld_levels`` host labels — the grouping key for per-site
    quotas/rate caps. A production swap point for a public-suffix-list
    lookup (the PSL is data, not code: broadcast it and join)."""
    labels = F.split(url_host(url), r"\.")
    return F.array_join(
        F.slice(labels, -tld_levels, tld_levels), "."
    )


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per canonical URL: the LATEST crawl wins (``warc_ts``
    descending, raw url as the deterministic tie-break).

    Scale shape: one hash-partition shuffle on ``canonical_url`` and a
    map-side-combinable ``max_by`` per group — the same plan as exact
    text dedup (operators/dedup.py). No window function (a window would
    sort whole partitions; the agg keeps only one row per key in the
    combiner)."""
    cu = canonical_url(F.col(url_col)).alias("canonical_url")
    others = [c for c in pages.columns if c not in (url_col, "warc_ts")]
    wide = pages.select(
        cu,
        F.struct("warc_ts", url_col, *others).alias("_row"),
    )
    return (
        wide.groupBy("canonical_url")
        .agg(F.max("_row").alias("_row"))
        .select("canonical_url", "_row.*")
    )
