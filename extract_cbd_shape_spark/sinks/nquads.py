"""N-Quads serialization sink (reference: rdf-serialize writer at
bin/extract.ts:61-64). Pure column expressions — formatting stays
JVM-side; one output line per quad, deterministic escaping per the
N-Triples grammar (backslash, quote, LF, CR, TAB)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from extract_cbd_shape_spark.model import BLANK, LITERAL, QUOTED, XSD_STRING


def _escape_literal(c: Column) -> Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def _term(value: Column, kind: Column, lang: Column = None,
          datatype: Column = None) -> Column:
    iri = F.concat(F.lit("<"), value, F.lit(">"))
    blank = F.concat(F.lit("_:"), value)
    if lang is None:
        # QUOTED values are already canonical << ... >> spellings
        return (
            F.when(kind == BLANK, blank)
            .when(kind == QUOTED, value)
            .otherwise(iri)
        )
    lit = F.concat(F.lit('"'), _escape_literal(value), F.lit('"'))
    lit = F.when(
        lang.isNotNull(), F.concat(lit, F.lit("@"), lang)
    ).otherwise(
        F.when(
            datatype.isNotNull() & (datatype != XSD_STRING),
            F.concat(lit, F.lit("^^<"), datatype, F.lit(">")),
        ).otherwise(lit)
    )
    return (
        F.when(kind == LITERAL, lit)
        .when(kind == BLANK, blank)
        .when(kind == QUOTED, value)
        .otherwise(iri)
    )


def to_nquads(quads: DataFrame) -> DataFrame:
    """(quad columns) -> one `line` column in N-Quads syntax."""
    subj = _term(F.col("subject"), F.col("subject_kind"))
    pred = F.concat(F.lit("<"), F.col("predicate"), F.lit(">"))
    obj = _term(
        F.col("object_value"), F.col("object_kind"),
        F.col("object_lang"), F.col("object_datatype"),
    )
    graph = F.when(
        F.col("graph").isNotNull(),
        F.concat(F.lit(" "), _term(F.col("graph"), F.col("graph_kind"))),
    ).otherwise(F.lit(""))
    return quads.select(
        F.concat(subj, F.lit(" "), pred, F.lit(" "), obj, graph,
                 F.lit(" .")).alias("line")
    )
