"""Distributed Turtle/TriG source (sources/turtle.py): file-per-task
worker-side parse, fixture parity with the driver parser, file-scoped
blank labels, malformed-file contract."""

import glob

import pytest

from extract_cbd_shape_spark.model import BLANK, quad_to_row
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.sources.turtle import (
    parse_turtle_documents,
    read_turtle,
)

from conftest import REFERENCE_TESTS

EX = "http://example.org/"

TTL_A = """
@prefix ex: <http://example.org/> .
ex:A ex:p _:b0 .
_:b0 ex:name "alpha"@en ; ex:n 42 .
"""

TTL_B = """
@prefix ex: <http://example.org/> .
ex:B ex:p _:b0 .
_:b0 ex:name "beta" .
"""


def test_read_turtle_fixture_parity_with_driver_parser(spark):
    """Every reference .ttl fixture parses to the SAME quad multiset
    through the distributed source (blank_scope='none') as through the
    driver-side parser — the reference ingest surface (rdf-dereference
    localFiles, tests/03 .../without-shape.test.ts:58-66) reproduced
    distributed."""
    fixtures = sorted(glob.glob(f"{REFERENCE_TESTS}/**/*.ttl", recursive=True))
    assert fixtures, "reference fixture corpus missing"
    for path in fixtures[:12]:
        with open(path) as f:
            text = f.read()
        want = sorted(quad_to_row(q) for q in parse_trig(text, base=path))
        got = sorted(
            tuple(r)
            for r in read_turtle(
                spark, path, blank_scope="none", base=path
            ).collect()
        )
        assert got == want, path


def test_blank_labels_are_file_scoped(spark, tmp_path):
    """Two files' _:b0 must NOT merge in the union (document-scoped
    labels, reference RDFMap per-store namespaces lib/Shape.ts:115-138)."""
    (tmp_path / "a.ttl").write_text(TTL_A)
    (tmp_path / "b.ttl").write_text(TTL_B)
    rows = read_turtle(spark, str(tmp_path / "*.ttl")).collect()
    blank_subjects = {
        r.subject for r in rows if r.subject_kind == BLANK
    }
    assert len(blank_subjects) == 2  # one scoped label per file
    # scoped objects point at the scoped subjects
    blank_objects = {
        r.object_value for r in rows if r.object_kind == BLANK
    }
    assert blank_objects == blank_subjects


def test_blank_scope_none_keeps_labels(spark, tmp_path):
    (tmp_path / "a.ttl").write_text(TTL_A)
    rows = read_turtle(spark, str(tmp_path), blank_scope="none").collect()
    assert {r.object_value for r in rows if r.object_kind == BLANK} == {"b0"}


def test_malformed_file_raises_with_path_and_drop_skips(spark, tmp_path):
    (tmp_path / "good.ttl").write_text(TTL_A)
    (tmp_path / "bad.ttl").write_text("@prefix ex: <oops .")
    with pytest.raises(Exception, match="malformed Turtle/TriG document"):
        read_turtle(spark, str(tmp_path / "*.ttl")).collect()
    rows = read_turtle(
        spark, str(tmp_path / "*.ttl"), on_malformed="drop"
    ).collect()
    assert len(rows) == len(parse_trig(TTL_A))


def test_trig_named_graphs_survive(spark, tmp_path):
    (tmp_path / "g.trig").write_text(
        """
@prefix ex: <http://example.org/> .
ex:g1 { ex:s ex:p ex:o . }
_:bg { ex:s2 ex:p ex:o2 . }
"""
    )
    rows = read_turtle(spark, str(tmp_path / "g.trig")).collect()
    graphs = {(r.graph, r.graph_kind) for r in rows}
    assert any(g == (EX + "g1", 0) for g in graphs)
    # blank GRAPH label is file-scoped too
    assert any(k == BLANK and ":" in (g or "") for g, k in graphs)


def test_parse_turtle_documents_in_dataframe(spark):
    """The core parse works over any (src, text) DataFrame — no
    filesystem needed (the oracle pair uses this form)."""
    docs = spark.createDataFrame(
        [("doc:a", TTL_A), ("doc:b", TTL_B)], "src string, text string"
    )
    rows = parse_turtle_documents(docs).collect()
    assert len(rows) == len(parse_trig(TTL_A)) + len(parse_trig(TTL_B))
