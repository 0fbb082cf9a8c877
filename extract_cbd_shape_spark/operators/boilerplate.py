"""Host-level boilerplate line removal for web-text curation.

Crawled pages of one site share navigation/footer/cookie-banner lines
that carry no training signal; the standard curation move (CCNet,
RefinedWeb) drops lines whose *document frequency within the host* is
high — a line repeated on (say) half the host's pages is template, not
content.

Everything here is a pure DataFrame program:

* ``line_document_frequency`` — posexplode lines (map-side), drop
  within-doc repeats with a combinable hash aggregate, then one shuffle
  keyed by ``(host, line)`` for the frequency count. Keying by host
  keeps globally common lines (e.g. empty separators) from becoming a
  hot key: the shuffle key cardinality scales with the corpus.
* ``strip_boilerplate`` — anti-join the exploded lines against the
  boilerplate set (AQE broadcasts it when small — it is bounded by
  distinct template lines per host, not by corpus size), then
  reassemble each document with ``array_sort(collect_list(struct(pos,
  line)))``; no window function, so reassembly is a plain combinable
  aggregation.

Thresholds are integer-exact (``line_df * ratio_den >= ratio_num *
host_docs``) so the DuckDB oracle in __spark_entry__.py mirrors the
decision bit-for-bit with no float drift.

Scale shape at 100 TB: two shuffles total — the (host, line) frequency
aggregate and the per-doc reassembly — plus one anti-join whose build
side is the (small) boilerplate line set. The corpus text crosses the
wire once per shuffle in line-sized rows; nothing is collected to the
driver.

Reference scope note: the reference engine (TREEcg/extract-cbd-shape)
has no text-curation surface; this module is part of the north-star
LLM-pipeline operators (BASELINE.json tier kg_construct x webtext),
alongside operators/dedup.py and operators/repetition.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(docs: DataFrame, id_col: str, host_col: str,
           text_col: str) -> DataFrame:
    """(id, host, pos, line) — one row per physical line, map-side."""
    return docs.select(
        F.col(id_col),
        F.col(host_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def line_document_frequency(docs: DataFrame, id_col: str = "doc_id",
                            host_col: str = "host",
                            text_col: str = "text") -> DataFrame:
    """(host, line, line_df): number of DISTINCT documents of ``host``
    containing ``line``. Blank lines are excluded (they are structure,
    not template text). Within-doc repeats are collapsed by a hash
    aggregate (map-side combinable) instead of count(DISTINCT), which
    would expand every row."""
    return (
        _lines(docs, id_col, host_col, text_col)
        .filter(F.trim(F.col("line")) != "")
        .dropDuplicates([id_col, host_col, "line"])
        .groupBy(host_col, "line")
        .agg(F.count("*").alias("line_df"))
    )


def host_doc_counts(docs: DataFrame, id_col: str = "doc_id",
                    host_col: str = "host") -> DataFrame:
    return docs.groupBy(host_col).agg(
        F.countDistinct(id_col).alias("host_docs")
    )


def boilerplate_lines(docs: DataFrame, id_col: str = "doc_id",
                      host_col: str = "host", text_col: str = "text",
                      min_df: int = 2, ratio_num: int = 1,
                      ratio_den: int = 2) -> DataFrame:
    """(host, line, line_df, host_docs) for lines classified as
    boilerplate: seen in >= min_df docs AND in >= ratio_num/ratio_den
    of the host's docs. Integer-exact threshold (no float compare)."""
    df = line_document_frequency(docs, id_col, host_col, text_col)
    hd = host_doc_counts(docs, id_col, host_col)
    return (
        df.join(hd, host_col)
        .filter(
            (F.col("line_df") >= F.lit(min_df))
            & (F.col("line_df") * ratio_den >= F.lit(ratio_num) * F.col("host_docs"))
        )
    )


def strip_boilerplate(docs: DataFrame, id_col: str = "doc_id",
                      host_col: str = "host", text_col: str = "text",
                      min_df: int = 2, ratio_num: int = 1,
                      ratio_den: int = 2) -> DataFrame:
    """Documents with boilerplate lines removed: (id, host, text) where
    ``text`` is the surviving lines joined by \\n in original order.
    Documents whose every line was template survive with text = ''
    (dropping them is a separate quality decision — see
    operators/repetition.py / functions/text.quality_score)."""
    boiler = boilerplate_lines(
        docs, id_col, host_col, text_col, min_df, ratio_num, ratio_den
    ).select(host_col, "line")
    kept = _lines(docs, id_col, host_col, text_col).join(
        boiler, [host_col, "line"], "left_anti"
    )
    rebuilt = (
        kept.groupBy(id_col, host_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    # a doc whose EVERY line is boilerplate has no kept rows: restore it
    # with empty text so the operator is row-preserving.
    return (
        docs.select(id_col, host_col)
        .join(rebuilt, [id_col, host_col], "left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    )
