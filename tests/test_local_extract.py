"""Store-local fast-path engine (operators/local_extract.py): the same
golden fixtures as the global DataFrame engine, plus engine parity."""

import pytest
from pyspark.sql import functions as F

from extract_cbd_shape_spark.model import IRI, Term, quad_to_row
from extract_cbd_shape_spark.operators import BulkCBDShapeExtractor
from extract_cbd_shape_spark.operators.local_extract import (
    extract_store,
    local_bulk_extract,
)
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import ShapesGraph

from conftest import load_fixture

EX = "http://example.org/"
SHSH = "http://www.w3.org/ns/shacl-shacl#"


def _quads(rel):
    return [quad_to_row(q) for q in parse_trig(load_fixture(rel))]


@pytest.fixture(scope="module")
def q03():
    return _quads("03 - CBD tests without a shape/data.ttl")


@pytest.mark.parametrize("entity,expected", [("A", 4), ("B", 8), ("C", 4)])
def test_local_cbd_counts(q03, entity, expected):
    rows = list(extract_store(q03, [(IRI, EX + entity)], None, None, bulk=False))
    assert len(rows) == expected


def test_local_shape_catalog():
    quads = _quads("01 - fetching a shacl shape/shacl-catalog.ttl")
    sg = ShapesGraph.from_quads(
        parse_trig(load_fixture("01 - fetching a shacl shape/shacl-shacl.ttl"))
    )
    shape = Term(IRI, SHSH + "NodeShapeShape")
    person = list(extract_store(quads, [(IRI, EX + "PersonShape")], sg, shape,
                                bulk=False))
    org = list(extract_store(quads, [(IRI, EX + "OrganizationShape")], sg,
                             shape, bulk=False))
    assert len(person) == 11
    assert len(org) == 16


@pytest.mark.parametrize(
    "entity,shape,expected",
    [
        ("B", "SequencePathShape", 3),
        ("C", "InversePathShape", 1),
        ("B", "DoubleInversePathShape", 1),
        ("C", "SequenceAndInversePathShape", 2),
        ("A", "ZeroOrMorePathShape", 2),
        ("B", "ZeroOrMorePathShape2", 3),
        ("A", "OneOrMorePathShape", 2),
        ("B", "AlternativePathShape", 2),
        ("B", "AllTogetherPathShape", 2),
    ],
)
def test_local_path_counts(entity, shape, expected):
    quads = _quads("05 - paths/data.ttl")
    sg = ShapesGraph.from_quads(parse_trig(load_fixture("05 - paths/shape.ttl")))
    rows = list(extract_store(quads, [(IRI, EX + entity)], sg,
                              Term(IRI, EX + shape), bulk=False))
    assert len(rows) == expected


@pytest.mark.parametrize(
    "entity,shape,expected",
    [
        ("Person1", "Shape", 7),
        ("Person2", "PersonShape", 7),
        ("Person3", "KnowsPieterShape", 4),
        ("Person4", "XoneWithNodeShape", 3),
        ("Person6", "CircularXoneShape", 7),
    ],
)
def test_local_logical_edge_cases(entity, shape, expected):
    data = parse_trig(load_fixture("04 - logical edge cases/data.ttl"))
    name = parse_trig(
        """
@prefix ex: <http://example.org/> .
<https://test.com/name.ttl> ex:name "Pieter" .
<https://test.com/name.ttl#Person1> ex:name "Peterson" .
""",
        base="https://test.com/name.ttl",
    )
    quads = [quad_to_row(q) for q in data + name]
    sg = ShapesGraph.from_quads(
        parse_trig(load_fixture("04 - logical edge cases/shape.ttl"))
    )
    rows = list(extract_store(quads, [(IRI, EX + entity)], sg,
                              Term(IRI, EX + shape), bulk=False))
    assert len(rows) == expected


def test_local_bulk_graph_isolation():
    quads = [quad_to_row(q) for q in parse_trig(
        """
@prefix ex: <http://example.org/> .
ex:M1 { ex:M1 ex:p "a" . }
ex:M2 { ex:M2 ex:p "b" . ex:M1 ex:q "leak" . }
"""
    )]
    rows = list(extract_store(quads, [(IRI, EX + "M1"), (IRI, EX + "M2")],
                              None, None, bulk=True))
    m1 = {(r[3]) for r in rows if r[0] == EX + "M1"}
    # M1 must NOT see its quad that lives in M2's named graph via CBD,
    # but named-graph pickup adds M1's own graph quads
    assert "a" in {r[4] for r in rows if r[0] == EX + "M1"}
    assert "leak" not in {r[4] for r in rows if r[0] == EX + "M1"}


def test_engine_parity_kbo(spark):
    from extract_cbd_shape_spark.operators.kgtriples import (
        KBO_SHAPE_IRI, KBO_SHAPE_TTL, kbo_members)

    triples, members = kbo_members(spark, "/root/testdata/sf0.001")
    shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
    shape = Term(IRI, KBO_SHAPE_IRI)

    ex = BulkCBDShapeExtractor(spark, shapes_graph=shapes)
    g, _ = ex.extract(triples, members, shape=shape)
    gset = {tuple(r) for r in
            g.select("entity", "subject", "predicate", "object_value").collect()}

    t2 = triples.withColumn("store_key", F.split(F.col("subject"), ":")[1])
    m2 = members.withColumn("store_key", F.split(F.col("entity"), ":")[1])
    l = local_bulk_extract(t2, m2, shapes_graph=shapes, shape=shape)
    lset = {tuple(r) for r in
            l.select("entity", "subject", "predicate", "object_value").collect()}
    assert gset == lset
