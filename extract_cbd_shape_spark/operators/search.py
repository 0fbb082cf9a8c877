"""Corpus keyword search: BM25 inverted index + scorer.

The document-side consumption surface (the KG side has `operators/
bgp.py`): build a term->document inverted index once as a DataFrame
and answer keyword queries with the standard Okapi BM25 ranking —
the retrieval half of corpus tooling (inspecting a crawl, pulling
training-data slices by topic, grounding entity mentions).

Physical shape at 100 TB:

* index build = one tokenize+explode pass over the corpus, a
  (term, doc) count aggregate, and a term document-frequency aggregate
  joined back — all map-side combinable; the two scalars BM25 needs
  (corpus size, average document length) are one tiny aggregate and
  are BAKED into the index as columns, so searching needs no side
  state.
* a query filters the index with `term IN (...)` — write the index
  range-partitioned AND sorted by term
  (``index.repartitionByRange(N, "term").sortWithinPartitions("term")``
  to parquet) and that filter prunes files/row groups from their
  footer min/max stats before any data pages are read
  (test_bm25_index_term_pruning_materialized pins the PushedFilters
  line and the footer-level byte shrink vs an unsorted layout; BENCH.md
  carries the measured numbers) — then one groupBy(doc) sum and a
  global top-k (`orderBy.limit` = TakeOrdered, never a full sort).
  (`materialize_table(bucket_by="term")` gives hash-bucket locality —
  one file per term group — useful for co-located joins, but an IN
  filter cannot prune hash buckets from stats; range+sort is the
  pruning layout.)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from extract_cbd_shape_spark.functions.text import tokens


def bm25_index(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Inverted index: one row per (term, doc) —

    ``term, <id>, tf, dl, df, idf, avgdl, n_docs``

    tf = term count in the doc, dl = doc token length, df = number of
    docs containing the term, idf = ln(1 + (N - df + .5)/(df + .5))
    (the BM25+ variant that never goes negative), avgdl/n_docs =
    corpus scalars carried as columns (constant-folded by Catalyst,
    negligible storage after parquet RLE)."""
    # Persisted: the stats .first() below is an action, and without the
    # persist the postings/dl join plan would re-run the tokenize pass
    # over the full corpus a second time — on a large corpus the
    # tokenize scan is the dominant build cost.
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")).persist()
    dl = toks.select(id_col, F.size("_t").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).first()
    postings = (
        toks.select(id_col, F.explode("_t").alias("term"))
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )
    df_ = postings.groupBy("term").agg(
        F.count("*").alias("df"))
    return (
        postings.join(df_, "term")
        .join(dl, id_col)
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(stats.n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn("avgdl", F.lit(float(stats.avgdl or 0.0)))
        .withColumn("n_docs", F.lit(int(stats.n_docs)))
    )


def bm25_search(index: DataFrame, query: str, k: int = 10,
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id",
                query_terms: Optional[list] = None) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25: (<id>, score, rank).

    The query is tokenized with the SAME tokenizer as the index
    (driver-side — queries are tiny); duplicate query terms count
    once, as in standard BM25. Ties break by ascending id for
    determinism."""
    if query_terms is None:
        import re as _re

        from extract_cbd_shape_spark.functions.text import TOKEN_SPLIT_RE

        query_terms = [t for t in _re.split(TOKEN_SPLIT_RE, query.lower())
                       if t]
    terms = sorted(set(query_terms))
    if not terms:
        return (index.select(id_col).limit(0)
                .withColumn("score", F.lit(0.0))
                .withColumn("rank", F.lit(0)))
    hits = index.filter(F.col("term").isin(terms))
    scored = (
        hits.withColumn(
            "_s",
            F.col("idf") * F.col("tf") * (k1 + 1)
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.sum("_s").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w))
