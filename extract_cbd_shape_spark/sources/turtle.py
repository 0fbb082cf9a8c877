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


# ------------------------------------------------------- giant-file sharding


def iter_turtle_statements(chunks):
    """Scan a Turtle/TriG character stream into top-level statements.

    Yields ``(statement_text, is_directive, blank_labels)`` where
    ``blank_labels`` is the set of NAMED blank labels (``_:x``) the
    statement references (anonymous ``[]`` blanks are statement-local
    and need no tracking; labels containing dots are truncated at the
    first dot — conservative for co-location, never unsafe). A
    statement ends at a ``.`` at bracket depth 0, outside strings/
    IRIs/comments, followed by whitespace, a comment, or EOF (PN_LOCAL
    dots and decimal literals never match that). Dotless SPARQL-style
    ``PREFIX``/``BASE`` directives end at their closing ``>``.

    Pure driver-side scanner over chunked reads — O(1) state, so a
    100 GB file streams without loading into memory.
    """
    buf: list = []
    labels: set = set()
    in_comment = False
    quote = None          # "'", '"', or a 3-char run
    in_iri = False
    escaped = False
    depth = 0
    label_cur: list = []  # collecting a _:label token (after the ':')
    head: list = []       # first token of the statement (directives)
    head_done = False
    dotless = False       # inside a dotless PREFIX/BASE directive
    prev2 = prev1 = ""

    stream = (c for chunk in chunks for c in chunk)
    lookahead: list = []

    def nxt():
        if lookahead:
            return lookahead.pop()
        return next(stream, None)

    def flush(is_directive: bool):
        nonlocal buf, labels, head, head_done, dotless, prev1, prev2
        text = "".join(buf).strip()
        out_labels = labels
        buf, labels = [], set()
        head, head_done, dotless = [], False, False
        prev1 = prev2 = ""
        if text:
            yield (text, is_directive, out_labels)

    def label_char(c: str) -> bool:
        return c.isalnum() or c in "_-"

    while True:
        c = nxt()
        if c is None:
            break
        buf.append(c)
        if label_cur:
            if label_char(c):
                label_cur.append(c)
                prev2, prev1 = prev1, c
                continue
            labels.add("".join(label_cur))
            label_cur = []
            # c falls through to normal handling
        if in_comment:
            if c == "\n":
                in_comment = False
            prev2, prev1 = prev1, c
            continue
        if quote is not None:
            if escaped:
                escaped = False
            elif c == "\\":
                escaped = True
            elif len(quote) == 1 and c == quote:
                quote = None
            elif (len(quote) == 3 and c == quote[0]
                  and prev1 == quote[0] and prev2 == quote[0]):
                quote = None
            prev2, prev1 = prev1, c
            continue
        if in_iri:
            if c == ">":
                in_iri = False
                if dotless:
                    yield from flush(True)
                    continue
            prev2, prev1 = prev1, c
            continue
        # --- outside strings/IRIs/comments ---
        if not head_done:
            if c.isspace() or c == "<":
                if head:
                    head_done = True
                    if "".join(head).lower() in ("prefix", "base"):
                        dotless = True
            elif len(head) < 8:
                head.append(c)
        if c == "#":
            in_comment = True
        elif c in "\"'":
            peek1 = nxt()
            if peek1 == c:
                peek2 = nxt()
                if peek2 == c:
                    buf.append(peek1)
                    buf.append(peek2)
                    quote = c * 3
                    prev2 = prev1 = ""
                    continue
                if peek2 is not None:
                    lookahead.append(peek2)
                # empty short string: "" — opening+closing pair
                buf.append(peek1)
                prev2, prev1 = c, peek1
                continue
            if peek1 is not None:
                lookahead.append(peek1)
            quote = c
        elif c == "<":
            in_iri = True
        elif c in "[(":
            depth += 1
        elif c in "])":
            depth -= 1
        elif c == "_" and (prev1 == "" or not (label_char(prev1)
                                               or prev1 == ":")):
            peek = nxt()
            if peek == ":":
                buf.append(peek)
                nxt2 = nxt()
                if nxt2 is not None and label_char(nxt2):
                    buf.append(nxt2)
                    label_cur = [nxt2]
                elif nxt2 is not None:
                    lookahead.append(nxt2)
                prev2, prev1 = ":", ":"
                continue
            if peek is not None:
                lookahead.append(peek)
        elif c == "." and depth == 0:
            peek = nxt()
            terminator = peek is None or peek.isspace() or peek == "#"
            if peek is not None:
                lookahead.append(peek)
            if terminator:
                h = "".join(head).lower()
                yield from flush(h in ("@prefix", "@base"))
                continue
        prev2, prev1 = prev1, c
    tail = "".join(buf).strip()
    if tail:
        raise ValueError(
            f"unterminated trailing statement in Turtle stream: {tail[:80]!r}")


def shard_turtle(src_path: str, out_dir: str,
                 target_bytes: int = 64 * 1024 * 1024,
                 prefix: str = "part-") -> list:
    """Split ONE giant .ttl/.trig file into N document-valid shards on
    statement boundaries — the documented upstream recipe for the
    format's not-splittable-below-document bound (module docstring;
    the reference's streaming parser has the same serial bound).
    Driver-side, one pass, O(1) state; run once, then `read_turtle`
    fans the shards out file-per-task.

    Every directive (``@prefix``/``@base``/``PREFIX``/``BASE``) seen so
    far is replicated into each subsequent shard (they are
    document-scoped in Turtle). NAMED blank labels are document-scoped
    too, so statements sharing a label must stay co-located: a shard
    stays open while the next statement reuses one of its labels, and
    a label that resurfaces after its shard closed raises (convert to
    N-Quads/parquet for such label topologies — sharding cannot
    preserve their identity).

    Returns the list of shard file paths written.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    directives: list = []
    cur: list = []
    cur_labels: set = set()
    cur_size = 0
    closed_labels: set = set()
    shards: list = []

    def close():
        nonlocal cur, cur_labels, cur_size
        if not cur:
            return
        p = os.path.join(out_dir, f"{prefix}{len(shards):05d}.ttl")
        with open(p, "w", encoding="utf-8") as f:
            for d in directives:
                f.write(d + "\n")
            for s in cur:
                f.write(s + "\n")
        shards.append(p)
        closed_labels.update(cur_labels)
        cur, cur_labels, cur_size = [], set(), 0

    def chunks():
        with open(src_path, "r", encoding="utf-8") as f:
            while True:
                c = f.read(1 << 20)
                if not c:
                    return
                yield c

    for text, is_directive, labels in iter_turtle_statements(chunks()):
        if is_directive:
            directives.append(text)
            continue
        reused = labels & closed_labels
        if reused:
            raise ValueError(
                "blank label(s) reused across a shard boundary: "
                f"{sorted(reused)[:5]} — this document's label topology "
                "cannot be sharded; convert to N-Quads or parquet instead")
        if cur_size >= target_bytes and not (labels & cur_labels):
            close()
        cur.append(text)
        cur_labels |= labels
        cur_size += len(text) + 1
    close()
    return shards
