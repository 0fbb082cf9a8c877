"""Parser tests over the reference fixture corpus (content only, no code)."""

import glob

import pytest

from extract_cbd_shape_spark.model import BLANK, IRI, LITERAL, XSD_INTEGER
from extract_cbd_shape_spark.rdf import parse_trig

from conftest import load_fixture


def test_basic_triples():
    quads = parse_trig(
        """
@prefix ex: <http://example.org/> .
ex:A ex:p1 ex:B .
ex:B ex:p2 "lit"@en, "42"^^<http://www.w3.org/2001/XMLSchema#int> ; ex:p3 12 .
"""
    )
    assert len(quads) == 4
    assert quads[0].subject.value == "http://example.org/A"
    assert quads[1].object.lang == "en"
    assert quads[2].object.datatype.endswith("#int")
    assert quads[3].object.datatype == XSD_INTEGER
    assert quads[3].object.kind == LITERAL


def test_blank_nodes_and_collections():
    quads = parse_trig(
        """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S sh:property [ sh:path (ex:p1 [sh:inversePath ex:p2]) ; sh:minCount 1 ] .
"""
    )
    preds = {q.predicate.value.split("#")[-1].split("/")[-1] for q in quads}
    assert "first" in preds and "rest" in preds and "inversePath" in preds
    blanks = [q for q in quads if q.subject.kind == BLANK]
    assert blanks


def test_named_graph_blocks_and_nquad_style():
    quads = parse_trig(load_fixture("03 - CBD tests without a shape/data.ttl"))
    assert len(quads) == 24
    graphs = {q.graph.value for q in quads if q.graph is not None}
    assert "http://example.org/C" in graphs
    assert "http://example.org/B" in graphs
    assert "http://example.org/Activity1" in graphs


def test_relative_iri_resolution():
    quads = parse_trig(
        "<./name.ttl> <http://example.org/name> \"Pieter\" .",
        base="https://test.com/name.ttl",
    )
    assert quads[0].subject.value == "https://test.com/name.ttl"


@pytest.mark.parametrize(
    "relpath,count",
    [
        ("01 - fetching a shacl shape/shacl-catalog.ttl", 16),
        ("05 - paths/data.ttl", 4),
        ("06 - shapes and named graphs/data-example.ttl", 6),
    ],
)
def test_fixture_counts(relpath, count):
    assert len(parse_trig(load_fixture(relpath))) == count


def test_all_reference_fixtures_parse():
    for f in glob.glob("/root/reference/tests/*/*.ttl") + glob.glob(
        "/root/reference/perf/resources/*.ttl"
    ):
        quads = parse_trig(open(f).read())
        assert quads, f


def test_rdf_star_quoted_triples_roundtrip(spark):
    """RDF-star: << s p o >> parses to an opaque QUOTED term whose
    identity is the canonical serialization (reference termType 'Quad',
    lib/Utils.ts:75-84); survives extraction and the N-Quads sink."""
    from extract_cbd_shape_spark.model import (
        IRI, QUOTED, Term, quad_to_row, quad_schema)
    from extract_cbd_shape_spark.operators import BulkCBDShapeExtractor
    from extract_cbd_shape_spark.rdf import parse_trig
    from extract_cbd_shape_spark.sinks.nquads import to_nquads

    src = """
@prefix ex: <http://example.org/> .
ex:x ex:says << ex:a ex:b "hi"@en >> .
<< ex:a ex:b "hi"@en >> ex:certainty "0.9" .
ex:x ex:name "X" .
"""
    quads = parse_trig(src)
    quoted = [q for q in quads if q.object.kind == QUOTED]
    assert len(quoted) == 1
    qsubj = [q for q in quads if q.subject.kind == QUOTED]
    assert len(qsubj) == 1
    # identical quoted triples must share one identity
    assert quoted[0].object.value == qsubj[0].subject.value

    df = spark.createDataFrame([quad_to_row(q) for q in quads], quad_schema())
    res, _ = BulkCBDShapeExtractor(spark).extract(
        df, [Term(IRI, "http://example.org/x")])
    got = {(r.predicate, r.object_value, r.object_kind) for r in res.collect()}
    assert ("http://example.org/says",
            '<< <http://example.org/a> <http://example.org/b> "hi"@en >>',
            QUOTED) in got

    # sink round-trip: serialize every quad, reparse, same multiset
    lines = [r.line for r in to_nquads(df).collect()]
    reparsed = parse_trig("\n".join(lines))
    assert sorted(map(str, reparsed)) == sorted(map(str, quads))
