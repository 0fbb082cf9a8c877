"""Web-page front end: Common-Crawl-style pages table + vectorized
HTML -> triples extraction.

Per BASELINE.json input_hint the production input is an Iceberg table
(url, warc_ts, html binary, text, lang). The sandbox stand-in derives a
deterministic pages table from /root/testdata documents.parquet: the
page embeds a JSON-LD block (entity mentions), a microdata section, an
RDFa section, and the document text; generation is pure column ops, so
the per-row invariant "extracted text is byte-identical per url" is
testable end-to-end.

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

# Microdata (https://html.spec.whatwg.org/multipage/microdata.html),
# flat (non-nested) itemscope blocks: one regex pulls every block with
# its attribute string and inner html; properties resolve against the
# itemtype's vocabulary base unless already absolute IRIs.
_ITEMSCOPE_RE = re.compile(
    r"<(?:div|section|article)(?P<attrs>[^>]*\bitemscope\b[^>]*)>"
    r"(?P<inner>.*?)</(?:div|section|article)>",
    re.DOTALL,
)
_ITEMID_RE = re.compile(r'\bitemid="([^"]+)"')
_ITEMTYPE_RE = re.compile(r'\bitemtype="([^"]+)"')
_MD_LIT_RE = re.compile(
    r'<(?:span|meta)[^>]*\bitemprop="(?P<prop>[^"]+)"[^>]*>'
    r"(?P<text>[^<]*)", re.DOTALL)
_MD_IRI_RE = re.compile(
    r'<(?:a|link)[^>]*\bitemprop="(?P<prop>[^"]+)"[^>]*'
    r'\bhref="(?P<href>[^"]+)"')

# RDFa Lite (https://www.w3.org/TR/rdfa-lite/), subject-scoped blocks:
# an element carrying @about opens a subject scope; @typeof emits
# rdf:type; @property on inner elements emits literals (element text)
# or IRIs (@href). Prefixed names are kept verbatim (no @prefix
# expansion — the synth corpus uses absolute IRIs).
_RDFA_SCOPE_RE = re.compile(
    r'<(?:div|section|p)(?P<attrs>[^>]*\babout="[^"]+"[^>]*)>'
    r"(?P<inner>.*?)</(?:div|section|p)>",
    re.DOTALL,
)
_ABOUT_RE = re.compile(r'\babout="([^"]+)"')
_TYPEOF_RE = re.compile(r'\btypeof="([^"]+)"')
_RDFA_LIT_RE = re.compile(
    r'<(?:span|meta)[^>]*\bproperty="(?P<prop>[^"]+)"[^>]*>'
    r"(?P<text>[^<]*)", re.DOTALL)
_RDFA_IRI_RE = re.compile(
    r'<(?:a|link)[^>]*\bproperty="(?P<prop>[^"]+)"[^>]*'
    r'\bhref="(?P<href>[^"]+)"')

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


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
    # Embedded structured data in all three north-star formats
    # (JSON-LD above; microdata + RDFa below), all deterministic column
    # functions of the documents row so the DuckDB oracle can mirror
    # the extraction exactly. The second itemscope carries NO itemid —
    # a microdata item without a global identifier is a blank node
    # (page-scoped label, scope_blank_label), like the JSON-LD author.
    microdata = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/Article" '
              'itemid="doc:'),
        F.col("doc_id").cast("string"),
        F.lit('#article"><span itemprop="name">doc-'),
        F.col("doc_id").cast("string"),
        F.lit('</span><link itemprop="isPartOf" href="https://corpus.test/'),
        F.col("source"),
        F.lit('"/></div><div itemscope '
              'itemtype="https://schema.org/Person">'
              '<span itemprop="name">author-'),
        (F.col("doc_id") % 1000).cast("string"),
        F.lit("</span></div>"),
    )
    rdfa = F.concat(
        F.lit('<div about="doc:'),
        F.col("doc_id").cast("string"),
        F.lit('" typeof="https://schema.org/WebPage">'
              '<span property="https://schema.org/inLanguage">'),
        F.col("lang"),
        F.lit('</span><a property="https://schema.org/publisher" '
              'href="https://corpus.test/'),
        F.col("source"),
        F.lit('">'),
        F.col("source"),
        F.lit("</a></div>"),
    )
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'),
        jsonld,
        F.lit("</script></head><body>"),
        microdata,
        rdfa,
        F.lit("<p>"),
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
    """Vectorized embedded-structured-data -> triples extraction over
    all three north-star formats — JSON-LD, microdata (itemscope /
    itemprop, properties resolved against the itemtype vocabulary), and
    RDFa Lite (about / typeof / property) — as a pure function of the
    html bytes (mapInPandas, Arrow batches). Items without a global id
    (JSON-LD nested objects, itemscope without itemid) become blank
    nodes with page-scoped labels (scope_blank_label).

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

        def unescape(s: pd.Series) -> pd.Series:
            return (s.str.replace("&lt;", "<", regex=False)
                    .str.replace("&gt;", ">", regex=False)
                    .str.replace("&amp;", "&", regex=False))

        def scoped_scan(doc, urls_np, scope_re, id_re, type_re, lit_re,
                        iri_re, blank_prefix, vocab_from_type):
            """Generic attribute-scoped structured-data scan (microdata
            itemscope / RDFa about blocks). All heavy lifting is
            pandas ``str.extractall`` (vectorized regex); the only
            Python loops are per-SCOPE blank labels and per-property
            vocabulary joins — bounded by annotation count, not page
            size. Returns a list of triple frames."""
            out = []
            scopes = doc.str.extractall(scope_re)
            if not len(scopes):
                return out
            scopes = scopes.reset_index()
            page_i = scopes["level_0"].to_numpy()
            urls_s = urls_np[page_i]
            ids = scopes["attrs"].str.extract(id_re, expand=False)
            types = scopes["attrs"].str.extract(type_re, expand=False)
            sub = ids.to_numpy(dtype=object)
            is_blank = ids.isna().to_numpy()
            if is_blank.any():
                # items without a global id are blank nodes, numbered
                # per page in document order and page-scoped
                bi = pd.Series(page_i[is_blank])
                nth = bi.groupby(bi).cumcount().to_numpy()
                sub[is_blank] = [
                    scope_blank_label(u, f"_:{blank_prefix}{j}")
                    for u, j in zip(urls_s[is_blank], nth)
                ]
            skind = np.where(is_blank, 1, 0).astype(np.int8)
            has_t = types.notna().to_numpy()
            if has_t.any():
                n = int(has_t.sum())
                out.append(pd.DataFrame({
                    "url": urls_s[has_t],
                    "subject": sub[has_t],
                    "subject_kind": skind[has_t],
                    "predicate": np.full(n, RDF_TYPE, dtype=object),
                    "object_value": types.to_numpy(dtype=object)[has_t],
                    "object_kind": np.zeros(n, dtype=np.int8),
                }))
            # bare property names resolve against the itemtype's
            # vocabulary base (microdata); RDFa keeps names verbatim
            vocab = (types.str.replace(r"[^/#]*$", "", regex=True)
                     .to_numpy(dtype=object) if vocab_from_type else None)
            for prop_re, okind, is_iri in ((lit_re, 2, False),
                                           (iri_re, 0, True)):
                pr = scopes["inner"].str.extractall(prop_re)
                if not len(pr):
                    continue
                pr = pr.reset_index()
                si = pr["level_0"].to_numpy()
                pred = pr["prop"].to_numpy(dtype=object)
                if vocab is not None:
                    vb = vocab[si]
                    pred = np.array([
                        v + p if (isinstance(v, str)
                                  and not p.startswith("http")) else p
                        for p, v in zip(pred, vb)
                    ], dtype=object)
                vals = (pr["href"] if is_iri else unescape(pr["text"])
                        ).to_numpy(dtype=object)
                out.append(pd.DataFrame({
                    "url": urls_s[si],
                    "subject": sub[si],
                    "subject_kind": skind[si],
                    "predicate": pred,
                    "object_value": vals,
                    "object_kind": np.full(len(si), okind, dtype=np.int8),
                }))
            return out

        for pdf in batches:
            if not len(pdf):
                continue
            doc = pdf["html"].apply(bytes).str.decode("utf-8")
            urls_np = pdf["url"].to_numpy()
            frames = []
            frames.extend(scoped_scan(
                doc, urls_np, _ITEMSCOPE_RE, _ITEMID_RE, _ITEMTYPE_RE,
                _MD_LIT_RE, _MD_IRI_RE, "md", True))
            frames.extend(scoped_scan(
                doc, urls_np, _RDFA_SCOPE_RE, _ABOUT_RE, _TYPEOF_RE,
                _RDFA_LIT_RE, _RDFA_IRI_RE, "rdfa", False))

            block = doc.str.extract(_SCRIPT_RE, expand=False)
            sel = block.notna().to_numpy()
            if not sel.any():
                if frames:
                    yield pd.concat(frames, ignore_index=True)
                continue
            urls_all = urls_np[sel]
            payloads = [json.loads(s) for s in block.to_numpy()[sel]]
            keep = np.array([p.get("id") is not None for p in payloads])
            if not keep.any():
                if frames:
                    yield pd.concat(frames, ignore_index=True)
                continue
            urls = urls_all[keep]
            payloads = [p for p, k in zip(payloads, keep) if k]
            subj = np.array([p["id"] for p in payloads], dtype=object)
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
