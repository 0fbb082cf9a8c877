"""Repetition-based quality metrics (Gopher-style rules).

Two of the strongest web-text quality signals are intra-document
repetition measures: the fraction of duplicate lines and the fraction
of all word bigrams taken by the single most frequent bigram
(Rae et al. 2021, "Scaling Language Models" — the Gopher rules; public
reproductions in Dolma/RedPajama use the same thresholds).

Scale shape:

* ``line_stats`` is a pure column projection (split + array_distinct),
  fused into the scan — free at 100 TB.
* ``top_bigram_stats`` reuses the relational shingler
  (``dedup.shingle_rows``): one hash shuffle on doc_id; the per-doc
  count/max/sum aggregations all land in that same exchange, so the
  whole metric costs one shuffle of the tokenized corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows

# Gopher keeps documents with duplicate-line fraction <= 0.30 and
# top-2-gram fraction <= 0.20.
MAX_DUP_LINE_FRAC = 0.30
MAX_TOP_BIGRAM_FRAC = 0.20


def line_stats(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, n_lines, dup_line_frac): fraction of lines that are
    repeats of an earlier line (1 - distinct/total)."""
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)
    return docs.select(
        F.col(id_col),
        n.alias("n_lines"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(lines))
            / F.greatest(n, F.lit(1)),
            4,
        ).alias("dup_line_frac"),
    )


def top_bigram_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_bigrams, top_bigram_frac): share of all token bigrams
    held by the most frequent one. Documents with < 2 tokens have no
    bigrams and are omitted (no signal)."""
    grams = shingle_rows(docs, id_col=id_col, text_col=text_col, k=2)
    per_gram = grams.groupBy("doc_id", "shingle").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"),
    )


def repetition_keep(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_dup_line_frac: float = MAX_DUP_LINE_FRAC,
                    max_top_bigram_frac: float = MAX_TOP_BIGRAM_FRAC,
                    ) -> DataFrame:
    """(id, keep): Gopher repetition filter verdict per document."""
    ls = line_stats(docs, id_col, text_col)
    bg = top_bigram_stats(docs, id_col, text_col)
    joined = ls.join(bg, ls[id_col] == bg["doc_id"], "left").select(
        ls[id_col],
        (
            (F.col("dup_line_frac") <= max_dup_line_frac)
            & (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
               <= max_top_bigram_frac)
        ).alias("keep"),
    )
    return joined
