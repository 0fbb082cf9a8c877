"""Benchmark decontamination: flag / drop training documents that share
verbatim k-token n-grams with a held-out evaluation set.

Not a reference operator (the reference is a KG-traversal engine); this
is part of the training-data-pipeline surface alongside the dedup
family (operators/dedup.py). Standard practice is k in [8, 13]
whitespace-token grams: one shared k-gram marks a document as
contaminated.

100 TB shape: grams are a map-side explode of the token array (no
pre-shuffle), the benchmark gram set is DISTINCT and — eval suites
being MBs, not TBs — ends up broadcast by AQE, so the flagging pass is
scan -> explode -> broadcast-semi-join -> partial count aggregate: one
shuffle of (doc_id, n_hits) pairs only, never of the corpus text. With
a huge benchmark side the same plan degrades gracefully to a hash
equi-join on the gram. At production scale join on ``xxhash64(gram)``
(8-byte keys, false-positive rate 2^-64 per gram — acceptable for a
DROP decision); the string join here keeps the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from extract_cbd_shape_spark.operators.dedup import shingle_sets


def benchmark_overlap(docs: DataFrame, benchmark: DataFrame, k: int = 8,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc_id, n_hits): documents sharing at least one k-token gram
    with ``benchmark``, with the count of distinct shared grams.
    Documents shorter than k tokens can never be flagged."""
    dg = shingle_sets(docs, id_col, text_col, k=k)
    bg = shingle_sets(benchmark, id_col, text_col, k=k).select(
        "shingle").distinct()
    return (
        dg.join(bg, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, k: int = 8,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """``docs`` minus every document flagged by ``benchmark_overlap``
    (left_anti on the flagged id set — the corpus never re-shuffles)."""
    hits = benchmark_overlap(docs, benchmark, k, id_col, text_col)
    return docs.join(
        hits.withColumnRenamed("doc_id", id_col).select(id_col),
        id_col, "left_anti",
    )
