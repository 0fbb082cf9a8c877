"""Per-member SHACL conformance reports (operators/validate.py) —
the reference's requiredAreNotPresent evidence (lib/Shape.ts:92-112)
re-exposed as one report row per member."""

import pytest
from pyspark.sql import functions as F

from extract_cbd_shape_spark.model import IRI, Term
from extract_cbd_shape_spark.operators import BulkCBDShapeExtractor
from extract_cbd_shape_spark.operators.validate import shacl_report
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import ShapesGraph
from extract_cbd_shape_spark.sources import trig_to_df

SHAPE_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:property [ sh:path <p:req> ; sh:minCount 1 ] ;
  sh:property [ sh:path <p:opt> ] ;
  sh:property [ sh:path <p:addr> ; sh:node ex:A ] .
ex:A a sh:NodeShape ;
  sh:property [ sh:path <p:zip> ; sh:minCount 1 ] .
"""

DATA_TTL = """
<m:ok>   <p:req> "x" ; <p:opt> "y" .
<m:miss> <p:opt> "y" .
<m:sub>  <p:req> "x" ; <p:addr> <a:1> .
<a:1>    <p:other> "no zip" .
"""


@pytest.fixture(scope="module")
def env(spark):
    shapes = ShapesGraph.from_quads(parse_trig(SHAPE_TTL))
    data = trig_to_df(spark, DATA_TTL).cache()
    return BulkCBDShapeExtractor(spark, shapes_graph=shapes), data


def _members(spark, *entities):
    return spark.createDataFrame(
        [(e, 0, i) for i, e in enumerate(entities)],
        "entity string, entity_kind tinyint, input_idx long",
    )


def test_report_one_row_per_member(spark, env):
    ex, data = env
    rep = shacl_report(
        ex, data, _members(spark, "m:ok", "m:miss"),
        shape=Term(IRI, "http://example.org/S"),
    ).collect()
    rows = {r.entity: r for r in rep}
    assert len(rep) == 2
    assert rows["m:ok"].conforms and rows["m:ok"].missing is None
    assert not rows["m:miss"].conforms
    assert rows["m:miss"].missing == "<p:req>"


def test_report_flags_linked_shape_focus(spark, env):
    ex, data = env
    rep = {r.entity: r for r in shacl_report(
        ex, data, _members(spark, "m:sub"),
        shape=Term(IRI, "http://example.org/S"),
    ).collect()}
    # the IRI address node fails ex:A's required <p:zip>; the report
    # rolls the nested-focus flag up to the member row
    assert not rep["m:sub"].conforms
    assert "<p:zip>" in rep["m:sub"].missing


def test_report_empty_result_member(spark, env):
    ex, data = env
    rep = {r.entity: r for r in shacl_report(
        ex, data, _members(spark, "m:ok", "m:absent"),
        shape=Term(IRI, "http://example.org/S"),
    ).collect()}
    assert rep["m:ok"].conforms
    assert not rep["m:absent"].conforms
    # an absent member trips BOTH evidence sources: the unsatisfied
    # required path (processed with zero witnessed words) and the
    # empty-result dereference trigger (lib/CBDShapeExtractor.ts:326-338)
    assert rep["m:absent"].missing == "<p:req> && empty result"


def test_report_requires_input_idx(spark, env):
    ex, data = env
    bad = spark.createDataFrame(
        [("m:ok", 0)], "entity string, entity_kind tinyint")
    with pytest.raises(ValueError, match="input_idx"):
        shacl_report(ex, data, bad, shape=Term(IRI, "http://example.org/S"))


def test_report_on_kbo_incomplete_corpus(spark):
    """End-to-end over the synthetic KBO corpus with a planted
    non-conforming slice (incomplete_mod) — the shape of the
    shacl_report query/oracle pair."""
    from extract_cbd_shape_spark.operators.kgtriples import (
        KBO_SHAPE_IRI,
        KBO_SHAPE_TTL,
        kbo_members,
    )

    triples, members = kbo_members(
        spark, "/root/testdata/sf0.001", incomplete_mod=7)
    shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
    ex = BulkCBDShapeExtractor(spark, shapes_graph=shapes,
                               store_distinct=True)
    rep = shacl_report(ex, triples, members,
                       shape=Term(IRI, KBO_SHAPE_IRI))
    rows = rep.select(
        "entity", "conforms", "missing",
        (F.split(F.col("entity"), ":")[1].cast("long") % 7 == 0
         ).alias("planted"),
    ).collect()
    assert rows
    for r in rows:
        assert r.conforms == (not r.planted), r
        assert (r.missing == "<kbo:status>") == bool(r.planted), r
