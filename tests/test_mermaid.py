"""Golden-text mermaid tests against the reference's tests/07 fixtures."""

import os

import pytest

from extract_cbd_shape_spark.model import IRI, Term
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import ShapesGraph
from extract_cbd_shape_spark.shapes.mermaid import to_mermaid

from conftest import REFERENCE_TESTS, load_fixture

EX = "http://example.org/"
GOLDEN_DIR = os.path.join(REFERENCE_TESTS, "07 - mermaid")

CASES = [
    ("SequencePathShape", "sequence-path.txt"),
    ("OptionalSequencePathShape", "optional-sequence-path.txt"),
    ("InversePathShape", "inverse-path.txt"),
    ("OptionalInversePathShape", "optional-inverse-path.txt"),
    ("SequenceAndInversePathShape", "sequence-and-inverse-path.txt"),
    ("DoubleInversePathShape", "double-inverse-path.txt"),
    ("TripleInversePathShape", "triple-inverse-path.txt"),
    ("QuadrupleInversePathShape", "quadruple-inverse-path.txt"),
    ("ZeroOrMorePathShape", "zero-or-more-path.txt"),
    ("OneOrMorePathShape", "one-or-more-path.txt"),
    ("ZeroOrOnePathShape", "zero-or-one-path.txt"),
    ("AlternativePathShape", "alternative-path.txt"),
    ("AllTogetherPathShape", "all-together-path.txt"),
    ("NestedShape", "nested-shape.txt"),
    ("NestedWithOptionalShape", "nested-with-optional-shape.txt"),
    ("LabeledShape", "labeled-shape.txt"),
    ("XoneWithNodeShape", "xone-with-node-shape.txt"),
    ("XoneWithNodeShape2", "xone-with-node-shape-2.txt"),
]


@pytest.fixture(scope="module")
def sg():
    return ShapesGraph.from_quads(parse_trig(load_fixture("07 - mermaid/shape.ttl")))


@pytest.mark.parametrize("shape_name,golden", CASES)
def test_mermaid_golden(sg, shape_name, golden):
    path = os.path.join(GOLDEN_DIR, golden)
    if not os.path.exists(path):
        pytest.skip(f"golden {golden} not in reference snapshot")
    expected = open(path).read()
    actual = to_mermaid(sg, Term(IRI, EX + shape_name))
    assert actual == expected
