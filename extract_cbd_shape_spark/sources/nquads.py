"""Distributed N-Quads source.

The reference ingests serialized RDF through a streaming parser
(rdf-dereference; e.g. tests/03 - CBD tests without a shape/
without-shape.test.ts:58-66 load fixture files by path) — its quads
arrive one process, one stream. At 100 TB the serialized-text corpus is
itself a distributed table: this module reads N-Quads/N-Triples with
``spark.read.text`` (line-splittable — every quad is one line, so any
byte-range split is safe) and parses lines with pure column expressions
(``regexp_extract`` / chained ``replace``), keeping the whole parse
inside whole-stage codegen. No Python touches the data path.

Supported surface = exactly what our own sink (`sinks/nquads.py`,
reference bin/extract.ts:61-64) emits plus comments/blank lines:

* IRI / blank-node subjects and graphs, IRI predicates;
* IRI / blank / literal objects with ``@lang`` or ``^^<datatype>``;
* string escapes ``\\\\ \\" \\n \\r \\t`` ONLY (the N-Triples ECHAR
  subset our serializer produces). Any other escape in a literal —
  spec-legal UCHAR ``\\uXXXX``/``\\UXXXXXXXX`` as well as ``\\b``/
  ``\\f`` — fails the line grammar and takes the malformed branch
  (raise by default, drop in permissive mode): surfaced loudly, never
  a silently-unescaped value (ADVICE r3).
* Comments/blank lines may be space- or tab-indented; trailing
  same-line comments after the terminating dot are NOT supported and
  hit the malformed branch.

RDF-star quoted-triple terms (``<< ... >>``, model.QUOTED — the sink
can emit them) are NOT parsed: grammar nesting is beyond a single
columnar regex, so such lines hit the malformed branch and RAISE under
the default mode — loud, never a silent mis-parse. Corpora with
RDF-star stay in parquet/Iceberg (the engine's native storage), where
QUOTED round-trips exactly; pinned by test.

Malformed lines: ``on_malformed="error"`` (default) raises at action
time via a JVM-side ``raise_error`` branch (zero cost on clean data —
the branch is dead in codegen until a bad line evaluates it);
``"drop"`` discards them (permissive web-crawl mode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from extract_cbd_shape_spark.model import (
    BLANK,
    IRI,
    LITERAL,
    RDF_LANGSTRING,
    XSD_STRING,
)

# One line = subject predicate object [graph] "."
# Term alternatives mirror the N-Quads grammar for the subset above.
_IRI = r"<[^<>\"{}|^`\\\x00-\x20]*>"
_BLANK = r"_:[^\s<>\"]+"
# Literal escapes restricted to the five ECHARs this reader decodes —
# any other backslash sequence makes the whole line fail LINE_RE and
# surface as malformed instead of parsing with the raw escape text
# left in object_value (ADVICE r3 medium).
_LIT = r'"(?:[^"\\\n\r]|\\["\\nrt])*"(?:@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*|\^\^<[^<>\"\s]*>)?'
_SUBJ = f"({_IRI}|{_BLANK})"
_PRED = f"({_IRI})"
_OBJ = f"({_IRI}|{_BLANK}|{_LIT})"
_GRAPH = f"(?:[ \\t]+({_IRI}|{_BLANK}))?"
LINE_RE = f"^[ \\t]*{_SUBJ}[ \\t]+{_PRED}[ \\t]+{_OBJ}{_GRAPH}[ \\t]*\\.[ \\t]*$"


def _unescape(c: Column) -> Column:
    """Reverse the ECHAR escapes our sink writes. ``\\\\`` is swapped to
    a NUL sentinel first so ``\\\\n`` (escaped backslash + n) is not
    misread as a newline; raw NUL cannot occur in a well-formed line
    (excluded from the IRI charset and from unescaped literal bytes by
    the serializers this reader is paired with)."""
    c = F.replace(c, F.lit("\\\\"), F.lit("\x00"))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    return F.replace(c, F.lit("\x00"), F.lit("\\"))


def _node(term: Column):
    """(value, kind) for an IRI-or-blank term spelling."""
    is_blank = term.startswith("_:")
    value = F.when(is_blank, F.substring(term, 3, 2147483647)).otherwise(
        # strip < >
        F.substring(term, 2, F.length(term) - 2)
    )
    kind = F.when(is_blank, F.lit(BLANK)).otherwise(F.lit(IRI)).cast("byte")
    return value, kind


def parse_nquads_lines(lines: DataFrame, col: str = "line",
                       on_malformed: str = "error") -> DataFrame:
    """Parse a DataFrame of N-Quads lines into the engine's flat quad
    layout (model.QUAD_COLS). Comments and blank lines are dropped;
    other non-matching lines raise (``on_malformed="error"``) or are
    dropped (``"drop"``)."""
    if on_malformed not in ("error", "drop"):
        raise ValueError(f"on_malformed must be error|drop: {on_malformed}")
    line = F.col(col)
    # Raw-line match, not ltrim: N-Quads whitespace is space OR tab,
    # and ltrim trims only spaces — a tab-indented comment or tab-only
    # line must not fall through to the malformed branch (ADVICE r3).
    src = lines.select(line.alias("line")).filter(
        ~F.regexp_like(F.col("line"), F.lit(r"^[ \t]*(#|$)"))
    )
    parts = src.select(
        F.col("line"),
        F.regexp_extract("line", LINE_RE, 1).alias("s_raw"),
        F.regexp_extract("line", LINE_RE, 2).alias("p_raw"),
        F.regexp_extract("line", LINE_RE, 3).alias("o_raw"),
        F.regexp_extract("line", LINE_RE, 4).alias("g_raw"),
    )
    ok = F.col("s_raw") != ""
    if on_malformed == "error":
        parts = parts.filter(
            F.when(ok, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(F.lit("malformed N-Quads line: "), F.col("line"))
                ).cast("boolean")
            )
        )
    else:
        parts = parts.filter(ok)

    s_val, s_kind = _node(F.col("s_raw"))
    p_val = F.substring(F.col("p_raw"), 2, F.length("p_raw") - 2)

    o = F.col("o_raw")
    o_is_lit = o.startswith('"')
    # Literal decomposition: body up to the closing quote, then suffix
    # (same ECHAR-only escape alternative as LINE_RE).
    lit_body = F.regexp_extract(o, r'^"((?:[^"\\]|\\["\\nrt])*)"', 1)
    lang = F.regexp_extract(o, r'"@([A-Za-z0-9-]+)$', 1)
    dtype = F.regexp_extract(o, r'"\^\^<([^<>]*)>$', 1)
    o_node_val, o_node_kind = _node(o)
    o_val = F.when(o_is_lit, _unescape(lit_body)).otherwise(o_node_val)
    o_kind = F.when(o_is_lit, F.lit(LITERAL)).otherwise(o_node_kind).cast("byte")
    o_lang = F.when(o_is_lit & (lang != ""), lang)
    o_dtype = F.when(
        o_is_lit,
        F.when(lang != "", F.lit(RDF_LANGSTRING))
        .when(dtype != "", dtype)
        .otherwise(F.lit(XSD_STRING)),
    )

    has_g = F.col("g_raw") != ""
    g_node_val, g_node_kind = _node(F.col("g_raw"))
    g_val = F.when(has_g, g_node_val)
    g_kind = F.when(has_g, g_node_kind)

    return parts.select(
        s_val.alias("subject"),
        s_kind.alias("subject_kind"),
        p_val.alias("predicate"),
        o_val.alias("object_value"),
        o_kind.alias("object_kind"),
        o_lang.alias("object_lang"),
        o_dtype.alias("object_datatype"),
        g_val.alias("graph"),
        g_kind.alias("graph_kind"),
    )


def read_nquads(spark: SparkSession, path: str,
                on_malformed: str = "error") -> DataFrame:
    """Read N-Quads/N-Triples files into a quad DataFrame. Splittable:
    ``text`` splits on line boundaries, so a 1 TB .nq file fans out
    across the cluster with no coordination."""
    return parse_nquads_lines(
        spark.read.text(path), "value", on_malformed=on_malformed
    )
