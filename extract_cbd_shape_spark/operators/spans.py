"""Corpus-level verbatim-span detection (exact substring dedup).

The within-corpus counterpart of `operators/decontaminate.py`: find
token spans that appear VERBATIM in many documents (boilerplate
licenses, chrome, templated paragraphs — the spans Lee et al.'s
"Deduplicating Training Data Makes Language Models Better" removes
with a suffix array) and mask them per document. A distributed suffix
array is not the Spark-shaped solution; the standard cluster
formulation is the K-gram pass below — every repeated substring of
length >= K contains a repeated K-gram, so flagging hot K-grams and
merging their overlapping positions recovers every such span (with
span boundaries quantized to tokens, and spans of frequency >= min_df).

Physical shape at 100 TB:

1. one map-side pass tokenizes and explodes (position, xxhash64(gram))
   pairs — gram TEXT never leaves the executor, only 8-byte hashes;
2. gram document-frequency is one hash-aggregate on the gram hash
   (map-side partial combine does most of the work — hot grams are
   hot precisely because they repeat within partitions too);
3. hot grams (df >= min_df) semi-join back against the position rows —
   AQE broadcasts the hot set when it is small (the common case:
   boilerplate is a tiny fraction of distinct grams);
4. per-doc span assembly is one groupBy(doc) over flagged POSITIONS
   (ints), interval-merged JVM-side with an array fold — no window
   function, no per-row Python anywhere.

The corpus text is touched only in stages 1 and in `strip_repeated_
spans` (a map-side rebuild); neither shuffles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_positions(docs: DataFrame, k: int, id_col: str,
                    text_col: str) -> DataFrame:
    """(id, pos, gram_hash) for every K-token gram; docs shorter than
    k tokens emit nothing."""
    toks = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), r"\s+").alias("toks"),
    ).filter(F.size("toks") >= k)
    return toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (k - 1)),
                lambda i: F.xxhash64(F.array_join(
                    F.slice(F.col("toks"), i, k), "\x1f")),
            )
        ).alias("pos", "gram_hash"),
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per input document:

    ``<id>, spans array<struct<start int, end int>>,
    repeated_token_frac double``

    ``spans`` are merged half-open token intervals ``[start, end)``
    (0-based) covering every K-gram of the document that occurs in at
    least ``min_df`` distinct documents; overlapping/adjacent flagged
    grams coalesce into one span, so a paragraph duplicated across the
    corpus comes back as a single interval, not n-k+1 fragments.
    Documents with no repeated gram (or fewer than k tokens) get an
    empty array and fraction 0.0.
    """
    grams = _gram_positions(docs, k, id_col, text_col)
    hot = (
        grams.groupBy("gram_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram_hash")
    )
    flagged = grams.join(hot, "gram_hash", "left_semi")
    empty_spans = F.expr("array()").cast("array<struct<start:int,end:int>>")
    merged = (
        flagged.groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("_ps"))
        .select(
            F.col(id_col),
            F.aggregate(
                "_ps",
                empty_spans,
                # positions are sorted: either extend the last interval
                # (the new gram [p, p+k) overlaps or touches it — with
                # half-open spans that is end >= p) or open a new one.
                # posexplode positions are 0-based token indices.
                lambda acc, p: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1)["end"] >= p),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.struct(
                            F.element_at(acc, -1)["start"].alias("start"),
                            (p + k).cast("int").alias("end"),
                        )),
                    ),
                ).otherwise(
                    F.concat(acc, F.array(F.struct(
                        p.cast("int").alias("start"),
                        (p + k).cast("int").alias("end"),
                    )))
                ),
            ).alias("spans"),
        )
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), r"\s+")).alias("_n"),
    )
    return (
        base.join(merged, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("spans", empty_spans).alias("spans"),
            F.coalesce(
                F.aggregate(
                    "spans", F.lit(0),
                    lambda acc, s: acc + (s["end"] - s["start"]),
                ) / F.col("_n"),
                F.lit(0.0),
            ).alias("repeated_token_frac"),
        )
    )


def strip_repeated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rewrite ``text_col`` with every repeated span's tokens removed
    (``spans`` = `repeated_spans` output). Pure map-side after the
    id-keyed join: tokens are index-filtered against the span list and
    re-joined with single spaces (the tokenizer's whitespace classes
    collapse — same contract as `operators/boilerplate.py` reassembly).
    Rows are preserved: a fully-repeated document survives with empty
    text."""
    joined = docs.join(spans.select(id_col, "spans"), id_col, "left")
    toks = F.split(F.col(text_col), r"\s+")
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.coalesce(
            F.exists(
                "spans",
                lambda sp: (sp["start"] <= s["i"]) & (s["i"] < sp["end"]),
            ),
            F.lit(False),
        ),
    )
    return joined.withColumn(
        text_col,
        F.array_join(F.transform(kept, lambda s: s["t"]), " "),
    ).drop("spans")
