"""Distributed Turtle/TriG source.

The reference's entire fixture corpus is Turtle — every extraction
test loads .ttl via a streaming parser (rdf-dereference with
localFiles, e.g. tests/03 - CBD tests without a shape/
without-shape.test.ts:58-66) — and a user coming from it holds .ttl /
.trig files, not parquet. Turtle is NOT line-splittable (statements
span lines, prefixes are document-scoped), so the scalable unit is the
FILE: Spark schedules one task per file (the same file-per-task
pattern as the python-native store scan, operators/local_extract.py
filescan), the worker parses the whole document with the package's
Turtle/TriG parser (rdf/trig.py), and quads stream out through Arrow
batches (mapInPandas). A corpus of many .ttl files therefore fans out
across the cluster with zero coordination; ONE giant .ttl file cannot
be split — shard upstream or convert once to N-Quads/parquet (this is
a format property, not an engine limit; the reference's single-process
streaming parser has the same serial bound).

Blank-node labels are DOCUMENT-scoped in Turtle: two files' ``_:b0``
must not merge when their quads meet in a global union (reference
RDFMap keeps per-store namespaces, lib/Shape.ts:115-138). Default
``blank_scope="file"`` skolemizes every blank label with an
md5(source)[:16] prefix — the same scheme as the page front end
(sources/pages.py::scope_blank_label). ``blank_scope="none"`` keeps
raw labels for single-document reads (e.g. fixture parity). Labels
embedded inside RDF-star quoted-triple encodings are not rescoped
(documented corner; quoted triples in multi-file unions need
parquet-native storage).

Malformed files: ``on_malformed="error"`` (default) raises with the
source path; ``"drop"`` skips the file (permissive crawl mode).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extract_cbd_shape_spark.model import (
    BLANK,
    Quad,
    Term,
    quad_schema,
    quad_to_row,
)


def _scope(term: Term, fp: str) -> Term:
    if term is not None and term.kind == BLANK:
        return Term(BLANK, f"{fp}:{term.value}", term.lang, term.datatype)
    return term


def _rescope_quad(q: Quad, fp: str) -> Quad:
    return Quad(
        _scope(q.subject, fp),
        q.predicate,
        _scope(q.object, fp),
        _scope(q.graph, fp) if q.graph is not None else None,
    )


def parse_turtle_documents(
    docs: DataFrame,
    src_col: str = "src",
    text_col: str = "text",
    base: Optional[str] = None,
    blank_scope: str = "file",
    on_malformed: str = "error",
) -> DataFrame:
    """Parse a DataFrame of whole Turtle/TriG documents
    ``(src string, text string)`` into the engine's flat quad layout
    (model.QUAD_COLS). One document is one parser call inside the
    worker (Turtle is not splittable below document level); output
    crosses back as Arrow batches. ``base`` defaults to each row's
    ``src`` for relative-IRI resolution."""
    if on_malformed not in ("error", "drop"):
        raise ValueError(f"on_malformed must be error|drop: {on_malformed}")
    if blank_scope not in ("file", "none"):
        raise ValueError(f"blank_scope must be file|none: {blank_scope}")

    schema = quad_schema()
    cols = [f.name for f in schema.fields]
    sel = docs.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(text_col).cast("string").alias("text"),
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # worker-side import: the parser module ships with --py-files
        from extract_cbd_shape_spark.rdf import parse_trig

        for pdf in batches:
            rows = []
            for src, text in zip(pdf["src"], pdf["text"]):
                try:
                    quads = parse_trig(text, base=base or src)
                except Exception as e:  # noqa: BLE001 — file-level gate
                    if on_malformed == "error":
                        raise ValueError(
                            f"malformed Turtle/TriG document {src}: {e}"
                        ) from e
                    continue
                if blank_scope == "file":
                    fp = hashlib.md5(str(src).encode("utf-8")).hexdigest()[:16]
                    quads = [_rescope_quad(q, fp) for q in quads]
                rows.extend(quad_to_row(q) for q in quads)
            yield pd.DataFrame(rows, columns=cols)

    return sel.mapInPandas(parse, schema)


def read_turtle(
    spark: SparkSession,
    path: str,
    base: Optional[str] = None,
    blank_scope: str = "file",
    on_malformed: str = "error",
) -> DataFrame:
    """Read .ttl/.trig files into a quad DataFrame — file-per-task:
    ``spark.read.text(wholetext=True)`` yields one row per file (the
    scheduler assigns whole files to tasks), ``input_file_name`` keys
    the blank-label scope and error messages."""
    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("src"),
        F.col("value").alias("text"),
    )
    return parse_turtle_documents(
        files, base=base, blank_scope=blank_scope, on_malformed=on_malformed
    )
