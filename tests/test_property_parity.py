"""Property-based parity: the CSR bucket kernel vs the per-member
interpreter on randomized stores and randomized vectorizable shapes.

Both engines are pure Python/numpy (no Spark), so hypothesis can sweep
thousands of store topologies cheaply. The families below are the ones
where the two engines' semantics are EXACTLY equal (the documented
bulk-engine contract divergences — multi-shape claim order, found()
gating of multi-hop match chains at shared trie positions — are pinned
separately by test_bfs_claim_contract_vec_matches_global and the
test_vec_parity_* goldens):

* F1  single-hop match paths + self-recursive nodeLinks (single-hop and
      chained) — one shape key, witnesses subset of the focus star;
* F2  multi-hop match chains at the ROOT focus only (no nodeLinks) —
      one focus per trie, no shared positions; blank objects are made
      single-parent constructively (multi-parent blanks are the
      documented word-claim divergence, test_vec_gating pins it);
* F3  pure CBD (no shape) with bulk isolation, graphs-to-ignore and
      cbd_default_graph;
* F4  CLOSED root shape with forward/inverse/mixed chains — closed
      shapes never found()-gate, so parity is exact on ANY store;
* F5  non-reducing inverse/mixed chains at the ROOT — their word walks
      contain a negative step no CBD word can witness, so they are
      never gated and parity is exact on ANY store.

Reference semantics under test: CBD star + blank closure
(lib/CBDShapeExtractor.ts:472-508), bulk member-graph isolation
(lib/CBDShapeExtractor.ts:79-99), named-graph pickup (:317-324),
graph-ignore filters (lib/Path.ts:5-7,66), forward path matching
(lib/Path.ts:42-138).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

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

MEMBERS = [X + "M1", X + "M2"]
IRIS = MEMBERS + [X + "A", X + "B", X + "C"]
BLANKS = ["b0", "b1", "b2"]
PREDS = [X + "p", X + "q", X + "r", X + "link", X + "next"]
LITS = [
    ("v1", None, None),
    ("v1", "en", None),
    ("2", None, "http://www.w3.org/2001/XMLSchema#integer"),
]

subjects = st.sampled_from(
    [(IRI, v) for v in IRIS] + [(BLANK, v) for v in BLANKS])
objects = st.sampled_from(
    [(IRI, v, None, None) for v in IRIS]
    + [(BLANK, v, None, None) for v in BLANKS]
    + [(LITERAL, v, lg, dt) for v, lg, dt in LITS])
graphs = st.sampled_from(
    [(None, None)]
    + [(IRI, v) for v in MEMBERS + [X + "G"]]
    + [(BLANK, "b0")])


@st.composite
def stores(draw):
    quads = []
    for _ in range(draw(st.integers(0, 28))):
        sk, sv = draw(subjects)
        pred = draw(st.sampled_from(PREDS))
        ok, ov, lg, dt = draw(objects)
        gk, gv = draw(graphs)
        quads.append((sv, sk, pred, ov, ok, lg, dt, gv, gk))
    members = draw(st.sampled_from([MEMBERS[:1], MEMBERS[1:], MEMBERS]))
    bulk = draw(st.booleans())
    ignore = draw(st.sampled_from(
        [(), ((IRI, X + "G"),), ((IRI, X + "M2"), (BLANK, "b0"))]))
    return quads, [(IRI, m) for m in members], bulk, set(ignore)


def _shape_ttl(single_p: bool, alt_pq: bool, self_link: bool,
               chain_link: bool) -> str:
    props = []
    if single_p:
        props.append("sh:property [ sh:path ex:p ]")
    if alt_pq:
        props.append(
            "sh:property [ sh:path [ sh:alternativePath (ex:p ex:q) ] ]")
    if self_link:
        props.append("sh:property [ sh:path ex:link ; sh:node ex:S ]")
    if chain_link:
        props.append(
            "sh:property [ sh:path (ex:link ex:next) ; sh:node ex:S ]")
    if not props:
        props.append("sh:property [ sh:path ex:r ]")
    return (
        "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "@prefix ex: <http://x/> .\n"
        "ex:S a sh:NodeShape ;\n  " + " ;\n  ".join(props) + " .\n"
    )


CHAIN_TTL = (
    "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
    "@prefix ex: <http://x/> .\n"
    "ex:S a sh:NodeShape ;\n"
    "  sh:property [ sh:path (ex:p ex:q) ] ;\n"
    "  sh:property [ sh:path [ sh:alternativePath (ex:q ex:r) ] ] .\n"
)


def _interp_rows(quads, members, sg, shape, bulk, ignore, cdg=False):
    return set(extract_store(
        quads, members, sg, shape, bulk=bulk,
        graphs_to_ignore=sorted(ignore), cbd_default_graph=cdg))


def _vec_rows(quads, members, sg, shape, bulk, ignore, cdg=False):
    vec_plan = compile_single_hop_links(sg, shape, cdg)
    assert vec_plan is not None, "gate must accept this family"
    tpdf = pd.DataFrame(
        [q + ("s1",) for q in quads],
        columns=["subject", "subject_kind", "predicate", "object_value",
                 "object_kind", "object_lang", "object_datatype",
                 "graph", "graph_kind", "store_key"])
    mpdf = pd.DataFrame({
        "_m_store": ["s1"] * len(members),
        "_m_entity": [v for _, v in members],
        "_m_kind": [k for k, _ in members],
    })
    out = _vec_extract_bucket(
        tpdf, mpdf, "store_key", vec_plan, bulk, cdg, ignore, OUT_COLS)
    out = out.astype(object).where(pd.notna(out), None)
    return {tuple(r) for r in out.itertuples(index=False, name=None)}


@settings(max_examples=150, deadline=None)
@given(stores(), st.booleans(), st.booleans(), st.booleans(), st.booleans())
def test_prop_parity_single_hop_and_self_links(
        store, single_p, alt_pq, self_link, chain_link):
    quads, members, bulk, ignore = store
    sg = ShapesGraph.from_quads(parse_trig(
        _shape_ttl(single_p, alt_pq, self_link, chain_link)))
    shape = Term(IRI, X + "S")
    assert _vec_rows(quads, members, sg, shape, bulk, ignore) == \
        _interp_rows(quads, members, sg, shape, bulk, ignore)


def _single_parent_blanks(quads):
    """Rename repeated blank OBJECT values to fresh labels: each blank
    is then reachable through at most one quad, removing the reference's
    traversal-order-dependent word-claim corner (pinned separately by
    test_vec_gating.test_multi_parent_blank_word_claim_divergence_pinned)."""
    seen = set()
    out = []
    for i, q in enumerate(quads):
        if q[4] == BLANK:
            if q[3] in seen:
                q = q[:3] + (f"{q[3]}~{i}",) + q[4:]
            else:
                seen.add(q[3])
        out.append(q)
    return out


@settings(max_examples=150, deadline=None)
@given(stores())
def test_prop_parity_root_chain_matches(store):
    quads, members, bulk, ignore = store
    quads = _single_parent_blanks(quads)
    sg = ShapesGraph.from_quads(parse_trig(CHAIN_TTL))
    shape = Term(IRI, X + "S")
    assert _vec_rows(quads, members, sg, shape, bulk, ignore) == \
        _interp_rows(quads, members, sg, shape, bulk, ignore)


CLOSED_TTL = (
    "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
    "@prefix ex: <http://x/> .\n"
    "ex:S a sh:NodeShape ;\n"
    "  sh:closed true ;\n"
    "  sh:property [ sh:path (ex:p ex:q) ] ;\n"
    "  sh:property [ sh:path [ sh:inversePath ex:p ] ] ;\n"
    "  sh:property [ sh:path (ex:q [ sh:inversePath ex:r ]) ] .\n"
)

INV_TTL = (
    "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
    "@prefix ex: <http://x/> .\n"
    "ex:S a sh:NodeShape ;\n"
    "  sh:property [ sh:path [ sh:inversePath ex:p ] ] ;\n"
    "  sh:property [ sh:path (ex:p [ sh:inversePath ex:q ]) ] ;\n"
    "  sh:property [ sh:path ex:r ] .\n"
)


@settings(max_examples=150, deadline=None)
@given(stores())
def test_prop_parity_closed_shape_chains(store):
    quads, members, bulk, ignore = store
    sg = ShapesGraph.from_quads(parse_trig(CLOSED_TTL))
    shape = Term(IRI, X + "S")
    assert _vec_rows(quads, members, sg, shape, bulk, ignore) == \
        _interp_rows(quads, members, sg, shape, bulk, ignore)


@settings(max_examples=150, deadline=None)
@given(stores())
def test_prop_parity_root_inverse_mixed_chains(store):
    quads, members, bulk, ignore = store
    sg = ShapesGraph.from_quads(parse_trig(INV_TTL))
    shape = Term(IRI, X + "S")
    assert _vec_rows(quads, members, sg, shape, bulk, ignore) == \
        _interp_rows(quads, members, sg, shape, bulk, ignore)


@settings(max_examples=150, deadline=None)
@given(stores(), st.booleans())
def test_prop_parity_pure_cbd(store, cdg):
    quads, members, bulk, ignore = store
    assert _vec_rows(quads, members, None, None, bulk, ignore, cdg) == \
        _interp_rows(quads, members, None, None, bulk, ignore, cdg)
