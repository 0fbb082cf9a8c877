"""Vectorized-kernel multipath semantics (r3 third pass).

The CSR kernel runs ``*``/``+``/``?`` paths (lib/Path.ts:212-287) as a
multi-source BFS whose member-level visited set computes the same
witness/target UNIONS as the reference's per-root visited
admit-but-don't-expand loop. Reference semantics under test:

* ZeroOrMore/ZeroOrOne.found is ALWAYS truthy (lib/Path.ts:346-371),
  so an open shape's whole-path ``*``/``?`` match is always
  found()-gated and emits nothing beyond CBD;
* OneOrMorePath.found gates iff ONE inner application is witnessed
  (lib/Path.ts:321-333) — from a fresh focus that is the blank-route
  (or, for single-hop inner, any edge) realization;
* multipath nodeLink targets are never gated and zero-admitting kinds
  (``*``/``?``) admit the ORIGIN focus itself
  (lib/CBDShapeExtractor.ts:421-428 + MultiPath.filter);
* closed shapes never gate (lib/CBDShapeExtractor.ts:408) — arbitrary
  multipath segment placement is exact, including cycles;
* a mid-application missing predicate truncates that application but
  keeps the reachable prefix's witnesses (SequencePath fold).

All probes assert vec == interpreter on the same store (both pure
Python — no Spark session needed).
"""

import sys

import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from extract_cbd_shape_spark.model import Term, IRI
from extract_cbd_shape_spark.operators.local_extract import (
    compile_single_hop_links,
)
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import ShapesGraph

from test_property_parity import _interp_rows, _vec_rows, stores

X = "http://x/"
PRE = "@prefix sh: <http://www.w3.org/ns/shacl#> .\n@prefix ex: <http://x/> .\n"
DPRE = "@prefix ex: <http://x/> .\n"


def _quads(data_ttl):
    return [
        (q.subject.value, q.subject.kind, q.predicate.value,
         q.object.value, q.object.kind, q.object.lang, q.object.datatype,
         q.graph.value if q.graph else None,
         q.graph.kind if q.graph else None)
        for q in parse_trig(data_ttl)
    ]


def _parity(shape_ttl, data_ttl, members=("M",), bulk=True):
    sg = ShapesGraph.from_quads(parse_trig(shape_ttl))
    shape = Term(IRI, X + "S")
    assert compile_single_hop_links(sg, shape) is not None, \
        "gate must accept this shape"
    quads = _quads(data_ttl)
    mem = [(IRI, X + m) for m in members]
    v = _vec_rows(quads, mem, sg, shape, bulk, set())
    i = _interp_rows(quads, mem, sg, shape, bulk, set())
    assert v == i, (sorted(v - i), sorted(i - v))
    return v


def test_open_star_match_always_gated():
    rows = _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:zeroOrMorePath ex:p ] ] .",
        DPRE + "ex:M ex:p ex:A . ex:A ex:p ex:B . ex:B ex:p ex:M .")
    # only the focus star: the gated closure is never emitted
    assert {r[1] for r in rows} == {X + "M"}


def test_open_zero_or_one_match_always_gated():
    rows = _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:zeroOrOnePath ex:p ] ] .",
        DPRE + "ex:M ex:p ex:A . ex:A ex:p ex:B .")
    assert {r[1] for r in rows} == {X + "M"}


def test_open_plus_single_hop_cycle():
    # single-hop inner: every focus with an edge is gated, every focus
    # without one has no first application -> closure never emitted
    rows = _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:oneOrMorePath ex:p ] ] .",
        DPRE + "ex:M ex:p ex:A . ex:A ex:p ex:B . ex:B ex:p ex:M . "
               "ex:M ex:q ex:C .")
    assert {r[1] for r in rows} == {X + "M"}


def test_open_plus_blank_route_gates():
    _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:oneOrMorePath (ex:p ex:q) ] ] .",
        DPRE + "ex:M ex:p _:b . _:b ex:q ex:Z . ex:Z ex:p ex:W . "
               "ex:W ex:q ex:V .")


def test_open_plus_iri_route_ungated_bfs_emits():
    rows = _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:oneOrMorePath (ex:p ex:q) ] ] .",
        DPRE + "ex:M ex:p ex:I . ex:I ex:q ex:Z . ex:Z ex:p ex:W . "
               "ex:W ex:q ex:V .")
    # the SECOND application's witnesses (Z-p-W, W-q-V) are emitted
    assert (X + "M", X + "W", IRI, X + "q", X + "V", IRI, None, None,
            None, None) in rows


def test_open_plus_inverse_inner_never_gated():
    rows = _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:oneOrMorePath [ sh:inversePath ex:p ] ] ] .",
        DPRE + "ex:A ex:p ex:M . ex:B ex:p ex:A . ex:C ex:p ex:B .")
    assert len(rows) == 3  # the whole inverse closure


def test_closed_embedded_multipath_cycle():
    _parity(
        PRE + "ex:S a sh:NodeShape ; sh:closed true ; sh:property "
              "[ sh:path (ex:p [ sh:zeroOrMorePath ex:q ] ex:r) ] .",
        DPRE + "ex:M ex:p ex:A . ex:A ex:q ex:B . ex:B ex:q ex:A . "
               "ex:B ex:r ex:Z . ex:A ex:r ex:Y .")


def test_link_star_self_referential_closure():
    # rdf-list-like: every next* target is extracted under ex:S,
    # including the ORIGIN (zero applications admit the focus)
    rows = _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property [ sh:path ex:name ] ; "
              "sh:property [ sh:path [ sh:zeroOrMorePath ex:next ] ; "
              "sh:node ex:S ] .",
        DPRE + 'ex:M ex:next ex:A . ex:A ex:next ex:B . '
               'ex:M ex:name "m" . ex:A ex:name "a" . ex:B ex:name "b" .')
    assert {r[1] for r in rows} == {X + "M", X + "A", X + "B"}


def test_link_plus_and_zero_or_one_children():
    _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:oneOrMorePath ex:knows ] ; sh:node ex:T ] ."
              "ex:T a sh:NodeShape ; sh:property [ sh:path ex:age ] .",
        DPRE + 'ex:M ex:knows ex:A . ex:A ex:knows ex:B . '
               'ex:A ex:age "3" . ex:B ex:age "4" .')
    _parity(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:zeroOrOnePath ex:knows ] ; sh:node ex:T ] ."
              "ex:T a sh:NodeShape ; sh:property [ sh:path ex:age ] .",
        DPRE + 'ex:M ex:knows ex:A . ex:A ex:knows ex:B . '
               'ex:A ex:age "3" . ex:B ex:age "4" . ex:M ex:age "9" .')


def test_bulk_isolation_through_multipath_hops():
    _parity(
        PRE + "ex:S a sh:NodeShape ; sh:closed true ; sh:property "
              "[ sh:path [ sh:oneOrMorePath ex:p ] ] .",
        DPRE + "ex:M ex:p ex:A . ex:M2 { ex:A ex:p ex:B . } "
               "ex:A ex:p ex:C .",
        members=("M", "M2"))


def test_truncated_inner_application_keeps_prefix():
    rows = _parity(
        PRE + "ex:S a sh:NodeShape ; sh:closed true ; sh:property "
              "[ sh:path [ sh:oneOrMorePath (ex:p ex:zz) ] ] .",
        DPRE + "ex:M ex:p ex:A . ex:A ex:q ex:B .")
    assert len(rows) == 1  # the reachable prefix (M p A), nothing else


def test_open_embedded_multipath_rejected():
    sg = ShapesGraph.from_quads(parse_trig(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path (ex:p [ sh:zeroOrMorePath ex:q ]) ] ."))
    assert compile_single_hop_links(sg, Term(IRI, X + "S")) is None


def test_literal_focus_caveat_through_passthrough_link():
    # Root's forward hop can land on a literal; Mid links onward via a
    # PURE zero-admitting inverse multipath, so ex:T's foci include
    # Mid's own (possibly literal) foci — T owning an inverse-FIRST
    # chain must reject (the kernel drops literal wave nodes).
    sg = ShapesGraph.from_quads(parse_trig(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path ex:tag ; sh:node ex:Mid ] ."
              "ex:Mid a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:zeroOrMorePath [ sh:inversePath ex:u ] ] ; "
              "sh:node ex:T ] ."
              "ex:T a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:inversePath ex:tag ] ] ."))
    assert compile_single_hop_links(sg, Term(IRI, X + "S")) is None


def test_open_plus_reducing_inner_rejected():
    # inner (p ^p) reduces to the root word -> the one-application gate
    # would be unsound; the per-member interpreter keeps it exact
    sg = ShapesGraph.from_quads(parse_trig(
        PRE + "ex:S a sh:NodeShape ; sh:property "
              "[ sh:path [ sh:oneOrMorePath (ex:p [ sh:inversePath ex:p ]) "
              "] ] ."))
    assert compile_single_hop_links(sg, Term(IRI, X + "S")) is None


MP_CLOSED_TTL = (
    PRE
    + "ex:S a sh:NodeShape ;\n"
      "  sh:closed true ;\n"
      "  sh:property [ sh:path [ sh:zeroOrMorePath ex:p ] ] ;\n"
      "  sh:property [ sh:path [ sh:oneOrMorePath [ sh:inversePath ex:q "
      "] ] ] ;\n"
      "  sh:property [ sh:path (ex:q [ sh:zeroOrOnePath ex:r ]) ] .\n"
)


@settings(max_examples=120, deadline=None)
@given(stores())
def test_prop_parity_closed_multipaths(store):
    """F6: CLOSED shape with ``*``/``+``/``?`` (incl. embedded) over
    random stores — closed shapes never gate, so vec == interpreter on
    ANY store, including cycles, blanks, named graphs and literals."""
    quads, members, bulk, ignore = store
    sg = ShapesGraph.from_quads(parse_trig(MP_CLOSED_TTL))
    shape = Term(IRI, X + "S")
    assert _vec_rows(quads, members, sg, shape, bulk, ignore) == \
        _interp_rows(quads, members, sg, shape, bulk, ignore)
