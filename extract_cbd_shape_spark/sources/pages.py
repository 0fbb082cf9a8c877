"""Web-page front end: Common-Crawl-style pages table + vectorized
HTML -> triples extraction.

Per BASELINE.json input_hint the production input is an Iceberg table
(url, warc_ts, html binary, text, lang). The sandbox stand-in derives a
deterministic pages table from /root/testdata documents.parquet: the
page embeds a JSON-LD block (entity mentions) and the document text;
generation is pure column ops, so the per-row invariant "extracted text
is byte-identical per url" is testable end-to-end.

Extraction runs in mapInPandas (Arrow-batched; one Python invocation
per batch, pandas string ops + json parsing inside). The output is an
exploded triples DataFrame keyed by subject — the input the extraction
engine consumes.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extract_cbd_shape_spark.functions.text import tokens

N_MENTIONS = 5

_SCRIPT_RE = re.compile(
    r'<script type="application/ld\+json">(.*?)</script>', re.DOTALL
)
_BODY_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def _escape(col):
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def synth_pages(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Deterministic (url, warc_ts, html, text, lang) from documents.

    ``replicate`` unions K deterministic copies with disjoint doc_id
    ranges (distinct urls/subjects) — used by the scaling bench to size
    the corpus so executor work dominates per-job overhead."""
    # A small parquet file reads as 1 partition (row groups are
    # unsplittable); fan out so html synthesis and downstream
    # mapInPandas parsing use every core.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    if replicate > 1:
        base = docs
        for i in range(1, replicate):
            docs = docs.unionByName(
                base.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
                )
            )
    toks = tokens(F.col("text"))
    jsonld = F.to_json(
        F.struct(
            F.concat(F.lit("doc:"), F.col("doc_id")).alias("id"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.slice(toks, 1, N_MENTIONS).alias("mentions"),
            # nested object WITHOUT an @id: a JSON-LD parser allocates a
            # document-local blank node for it (every page gets _:b0) —
            # exercises the cross-page blank-label scoping rule.
            F.struct(
                F.concat(F.lit("author-"), F.col("doc_id") % 1000).alias("name")
            ).alias("author"),
        )
    )
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'),
        jsonld,
        F.lit("</script></head><body><p>"),
        _escape(F.col("text")),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(F.lit("https://corpus.test/"), F.col("source"),
                 F.lit("/"), F.col("doc_id")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


_TRIPLES_SCHEMA = (
    "url string, subject string, subject_kind tinyint, predicate string, "
    "object_value string, object_kind tinyint"
)


def scope_blank_label(url: str, local_label: str) -> str:
    """Blank-node labels are document-scoped (reference RDFMap keeps
    blank and named values apart per store, lib/Shape.ts:115-138): two
    pages' ``_:b0`` must NOT merge when their triples meet in a global
    union. Skolemize with a page fingerprint before the union —
    SURVEY §7(c)."""
    import hashlib

    fp = hashlib.md5(url.encode("utf-8")).hexdigest()[:16]
    return f"_:{fp}:{local_label[2:] if local_label.startswith('_:') else local_label}"


def extract_page_triples(pages: DataFrame) -> DataFrame:
    """Vectorized JSON-LD -> triples extraction; pure function of the
    html bytes (mapInPandas, Arrow batches). Nested objects without an
    @id become blank nodes with page-scoped labels (scope_blank_label).

    The batch is processed COLUMNARLY (VERDICT r2 #6): the JSON-LD
    block is pulled by one vectorized ``Series.str.extract``, Python
    touches each page exactly once (the unavoidable ``json.loads`` +
    field probes), and the quad columns are assembled with numpy
    repeats + one ``pd.concat`` — no per-quad emit loop. This is the
    pipeline's largest remaining Python surface at 100 TB; per-page
    work is now parse-bound."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def sub(urls, subjects, s_kind, predicate, values, o_kind):
            n = len(urls)
            return pd.DataFrame({
                "url": urls,
                "subject": subjects,
                "subject_kind": np.full(n, s_kind, dtype=np.int8),
                "predicate": np.full(n, predicate, dtype=object),
                "object_value": values,
                "object_kind": np.full(n, o_kind, dtype=np.int8),
            })

        for pdf in batches:
            if not len(pdf):
                continue
            doc = pdf["html"].apply(bytes).str.decode("utf-8")
            block = doc.str.extract(_SCRIPT_RE, expand=False)
            sel = block.notna().to_numpy()
            if not sel.any():
                continue
            urls_all = pdf["url"].to_numpy()[sel]
            payloads = [json.loads(s) for s in block.to_numpy()[sel]]
            keep = np.array([p.get("id") is not None for p in payloads])
            if not keep.any():
                continue
            urls = urls_all[keep]
            payloads = [p for p, k in zip(payloads, keep) if k]
            subj = np.array([p["id"] for p in payloads], dtype=object)

            frames = []
            for field, pred in (("lang", "kg:lang"), ("source", "kg:source")):
                has = np.array(
                    [p.get(field) is not None for p in payloads])
                if has.any():
                    vals = np.array(
                        [p[field] for p, h in zip(payloads, has) if h],
                        dtype=object)
                    frames.append(sub(urls[has], subj[has], 0, pred, vals, 2))
            mentions = [p.get("mentions") or [] for p in payloads]
            counts = np.array([len(m) for m in mentions])
            if counts.sum():
                vals = np.array(
                    [t for m in mentions for t in m], dtype=object)
                frames.append(sub(np.repeat(urls, counts),
                                  np.repeat(subj, counts),
                                  0, "kg:mentions", vals, 2))
            has_a = np.array([
                isinstance(p.get("author"), dict)
                and p["author"].get("name") is not None
                for p in payloads])
            if has_a.any():
                # parser-local label is _:b0 on every page; scope it
                blanks = np.array(
                    [scope_blank_label(u, "_:b0") for u in urls[has_a]],
                    dtype=object)
                names = np.array(
                    [p["author"]["name"]
                     for p, h in zip(payloads, has_a) if h], dtype=object)
                frames.append(sub(urls[has_a], subj[has_a], 0,
                                  "kg:author", blanks, 1))
                frames.append(sub(urls[has_a], blanks, 1,
                                  "kg:name", names, 2))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return pages.select("url", "html").mapInPandas(run, _TRIPLES_SCHEMA)


def extract_page_text(pages: DataFrame) -> DataFrame:
    """Recover the page text from html bytes (mapInPandas); must be
    byte-identical to the source text per url (north-rule invariant)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, texts = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                doc = bytes(html).decode("utf-8")
                m = _BODY_RE.search(doc)
                if not m:
                    continue
                t = (
                    m.group(1)
                    .replace("&lt;", "<")
                    .replace("&gt;", ">")
                    .replace("&amp;", "&")
                )
                urls.append(url)
                texts.append(t)
            yield pd.DataFrame({"url": urls, "extracted_text": texts})

    return pages.select("url", "html").mapInPandas(
        run, "url string, extracted_text string"
    )
