"""Shape-compiler tests mirroring the reference's template probes
(tests/04 testShapeTemplate.test.ts:24-35, tests/05 shapeTemplate.test.ts:26-28)
plus found()/word-trie unit tests."""

from extract_cbd_shape_spark.model import IRI, Term
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import (
    PredicatePath,
    SequencePath,
    ShapesGraph,
    ZeroOrOnePath,
    OneOrMorePath,
)
from extract_cbd_shape_spark.shapes.ast import ROOT_WORD, extend_word

from conftest import load_fixture

EX = "http://example.org/"


def _sg(relpath):
    return ShapesGraph.from_quads(parse_trig(load_fixture(relpath)))


def test_sequence_path_shape_compiles():
    sg = _sg("05 - paths/shape.ttl")
    shape = sg.get(Term(IRI, EX + "SequencePathShape"))
    assert shape is not None
    assert len(shape.required_paths) == 1
    assert shape.required_paths[0].to_string() == f"<{EX}p1>/<{EX}p2>"


def test_circular_xone_template():
    sg = _sg("04 - logical edge cases/shape.ttl")
    circ = sg.get(Term(IRI, EX + "CircularXoneShape"))
    assert len(circ.at_least_one_lists) == 1
    assert len(circ.at_least_one_lists[0]) == 2
    branch0 = circ.at_least_one_lists[0][0]
    assert [nl.link.value for nl in branch0.node_links] == [EX + "CircularXoneShape"]
    assert [p.to_string() for p in branch0.required_paths] == [f"<{EX}knows>"]


def test_triggers_http_template_two_levels():
    sg = _sg("04 - logical edge cases/shape.ttl")
    trig = sg.get(Term(IRI, EX + "TriggersHTTPShape"))
    assert len(trig.at_least_one_lists) == 1
    inner = trig.at_least_one_lists[0][0]
    assert len(inner.at_least_one_lists) == 1
    inner2 = inner.at_least_one_lists[0][0]
    assert [nl.link.value for nl in inner2.node_links] == [EX + "QualifiedNameShape"]


def test_closed_flags():
    sg = _sg("05 - paths/shape.ttl")
    assert sg.get(Term(IRI, EX + "ZeroOrMorePathShape")).closed
    assert not sg.get(Term(IRI, EX + "SequencePathShape")).closed


def test_word_reduction():
    # push forward p then inverse p pops back to the root
    w = extend_word(ROOT_WORD, "p", False)
    assert extend_word(w, "p", True) == ROOT_WORD
    # inverse then forward also cancels (lib/CBDShapeExtractor.ts:241-269)
    w = extend_word(ROOT_WORD, "p", True)
    assert extend_word(w, "p", False) == ROOT_WORD
    # same-direction repeats stack
    w = extend_word(extend_word(ROOT_WORD, "p", False), "p", False)
    assert w.count("p") == 2


def test_found_semantics():
    p1 = PredicatePath(EX + "p1")
    p2 = PredicatePath(EX + "p2")
    seq = SequencePath([p1, p2])
    w1 = extend_word(ROOT_WORD, EX + "p1", False)
    w12 = extend_word(w1, EX + "p2", False)
    words = frozenset({ROOT_WORD, w1, w12})
    assert seq.found(words, ROOT_WORD) == w12
    assert seq.found(frozenset({ROOT_WORD, w1}), ROOT_WORD) is None
    # zero-or-one is always found (lib/Path.ts:369-371)
    assert ZeroOrOnePath(p1).found(frozenset({ROOT_WORD}), ROOT_WORD) == ROOT_WORD
    # one-or-more needs at least one application
    assert OneOrMorePath(p1).found(frozenset({ROOT_WORD}), ROOT_WORD) is None
    assert OneOrMorePath(p1).found(words, ROOT_WORD) == w1


def test_required_are_not_present():
    sg = _sg("04 - logical edge cases/shape.ttl")
    person = sg.get(Term(IRI, EX + "PersonShape"))
    name_w = extend_word(ROOT_WORD, EX + "name", False)
    ok = person.required_are_not_present(frozenset({ROOT_WORD, name_w}))
    assert ok is None  # xone branch 0 (name) satisfied
    missing = person.required_are_not_present(frozenset({ROOT_WORD}))
    assert missing is not None
    assert "name" in missing.to_string()
