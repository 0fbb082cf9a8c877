"""BGP query operator (operators/bgp.py)."""

import pytest
from pyspark.sql import functions as F

from extract_cbd_shape_spark.operators.bgp import bgp_match

_T = [
    # s, sk, p, o, ok
    ("m:1", 0, "rdf:type", "kbo:Enterprise", 0),
    ("m:1", 0, "kbo:legalName", "Acme", 2),
    ("m:1", 0, "kbo:registeredAddress", "a:1", 1),
    ("a:1", 1, "kbo:postCode", "1000", 2),
    ("m:2", 0, "rdf:type", "kbo:Enterprise", 0),
    ("m:2", 0, "kbo:legalName", "Globex", 2),
    ("m:2", 0, "kbo:registeredAddress", "a:2", 1),
    ("a:2", 1, "kbo:postCode", "2000", 2),
    ("m:3", 0, "rdf:type", "other:Thing", 0),
    ("m:3", 0, "kbo:legalName", "NotACompany", 2),
    ("m:3", 0, "kbo:knows", "m:3", 0),  # self-loop
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        _T,
        "subject string, subject_kind tinyint, predicate string, "
        "object_value string, object_kind tinyint",
    ).cache()


def test_star_join(spark, triples):
    got = {tuple(r) for r in bgp_match(triples, [
        ("?m", "rdf:type", "kbo:Enterprise"),
        ("?m", "kbo:legalName", "?name"),
        ("?m", "kbo:registeredAddress", "?a"),
        ("?a", "kbo:postCode", "?pc"),
    ], select=["?m", "?name", "?pc"]).collect()}
    assert got == {("m:1", "Acme", "1000"), ("m:2", "Globex", "2000")}


def test_repeated_var_within_pattern_is_equality(spark, triples):
    got = {r.x for r in bgp_match(
        triples, [("?x", "kbo:knows", "?x")]).collect()}
    assert got == {"m:3"}


def test_variable_predicate(spark, triples):
    got = {(r.p, r.o) for r in bgp_match(
        triples, [("a:1", "?p", "?o")]).collect()}
    assert got == {("kbo:postCode", "1000")}


def test_cross_join_when_disconnected(spark, triples):
    n = bgp_match(triples, [
        ("?m", "rdf:type", "kbo:Enterprise"),
        ("?a", "kbo:postCode", "?pc"),
    ]).count()
    assert n == 4  # 2 enterprises x 2 postcodes


def test_distinct_and_kinds(spark, triples):
    got = bgp_match(
        triples, [("?m", "rdf:type", "?t")],
        distinct=True, with_kinds=True,
    )
    assert set(got.columns) == {"m", "m_kind", "t", "t_kind"}
    rows = {tuple(r) for r in got.collect()}
    assert ("m:1", 0, "kbo:Enterprise", 0) in rows


def test_empty_and_malformed_patterns_raise(spark, triples):
    with pytest.raises(ValueError):
        bgp_match(triples, [])
    with pytest.raises(ValueError):
        bgp_match(triples, [("?a", "?b")])
    with pytest.raises(ValueError):
        bgp_match(triples, [("?", "p", "o")])


def test_constant_filters_reach_scan(spark, triples, tmp_path):
    """Pattern constants must push into the parquet scan."""
    path = str(tmp_path / "t")
    triples.write.parquet(path)
    t = spark.read.parquet(path)
    plan = bgp_match(
        t, [("?m", "kbo:legalName", "?name")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(predicate), " \
           "EqualTo(predicate,kbo:legalName)" in plan


def test_optional_binds_where_present_null_elsewhere(spark, triples):
    # OPTIONAL { ?a kbo:postCode ?pc } over all legalName'd subjects:
    # m:3 has no registeredAddress row in the solution, so use the
    # address star with an optional SECOND attribute instead.
    got = {tuple(r) for r in bgp_match(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], optional=[[("?m", "rdf:type", "kbo:Enterprise"),
                  ("?m", "kbo:registeredAddress", "?a")]],
        select=["?name", "?a"]).collect()}
    assert got == {("Acme", "a:1"), ("Globex", "a:2"),
                   ("NotACompany", None)}


def test_optional_groups_apply_in_order(spark, triples):
    # second group joins on the first group's optional binding
    got = {tuple(r) for r in bgp_match(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], optional=[
        [("?m", "kbo:registeredAddress", "?a")],
        [("?a", "kbo:postCode", "?pc")],
    ], select=["?name", "?pc"]).collect()}
    assert got == {("Acme", "1000"), ("Globex", "2000"),
                   ("NotACompany", None)}


def test_filter_on_optional_var_drops_unbound(spark, triples):
    got = {r.name for r in bgp_match(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], optional=[[("?a", "kbo:postCode", "?pc"),
                  ("?m", "kbo:registeredAddress", "?a")]],
        filters=["pc >= '2000'"]).collect()}
    assert got == {"Globex"}


def test_disconnected_optional_raises(spark, triples):
    with pytest.raises(ValueError, match="OPTIONAL group shares no variable"):
        bgp_match(triples, [("?m", "kbo:legalName", "?name")],
                  optional=[[("?x", "kbo:postCode", "?pc")]])


# ---------------------------------------------------------- property paths


@pytest.fixture(scope="module")
def chain_triples(spark):
    rows = list(_T) + [
        ("n:1", 0, "kg:next", "n:2", 0),
        ("n:2", 0, "kg:next", "n:3", 0),
        ("n:3", 0, "kg:next", "n:4", 0),
        ("c:1", 0, "kg:next", "c:2", 0),   # cycle
        ("c:2", 0, "kg:next", "c:1", 0),
        ("n:1", 0, "kg:alt", "n:9", 0),
    ]
    return spark.createDataFrame(
        rows,
        "subject string, subject_kind tinyint, predicate string, "
        "object_value string, object_kind tinyint",
    ).cache()


def test_parse_path_grammar():
    from extract_cbd_shape_spark.operators.bgp import parse_path
    from extract_cbd_shape_spark.shapes.ast import (
        AlternativePath, InversePath, OneOrMorePath, PredicatePath,
        SequencePath, ZeroOrOnePath,
    )

    p = parse_path("a/b|^c+")
    assert isinstance(p, AlternativePath)
    assert isinstance(p.alternatives[0], SequencePath)
    inv = p.alternatives[1]
    assert isinstance(inv, InversePath)
    assert isinstance(inv.path, OneOrMorePath)
    q = parse_path("(a|b)/c?")
    assert isinstance(q, SequencePath)
    assert isinstance(q.sequence[1], ZeroOrOnePath)
    assert isinstance(parse_path("kbo:x"), PredicatePath)
    with pytest.raises(ValueError):
        parse_path("a//b")
    with pytest.raises(ValueError):
        parse_path("(a|b")


def test_path_sequence_and_inverse(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    got = {tuple(r) for r in bgp_match(triples, [
        ("?m", parse_path("kbo:registeredAddress/kbo:postCode"), "?pc"),
    ]).collect()}
    assert got == {("m:1", "1000"), ("m:2", "2000")}
    inv = {tuple(r) for r in bgp_match(triples, [
        ("?pc", parse_path("^kbo:postCode/^kbo:registeredAddress"), "?m"),
    ]).collect()}
    assert inv == {("1000", "m:1"), ("2000", "m:2")}


def test_path_alternative_bag_semantics(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    rows = bgp_match(triples, [
        ("m:1", parse_path("kbo:legalName|rdf:type"), "?v"),
    ]).collect()
    assert sorted(r.v for r in rows) == ["Acme", "kbo:Enterprise"]


def test_path_one_or_more_closure_and_cycle(spark, chain_triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    got = {tuple(r) for r in bgp_match(chain_triples, [
        ("n:1", parse_path("kg:next+"), "?x"),
    ]).collect()}
    assert got == {("n:2",), ("n:3",), ("n:4",)}
    # a cycle must include the self-pair through the loop, and terminate
    cyc = {tuple(r) for r in bgp_match(chain_triples, [
        ("c:1", parse_path("kg:next+"), "?x"),
    ]).collect()}
    assert cyc == {("c:1",), ("c:2",)}


def test_path_zero_or_more_and_zero_or_one(spark, chain_triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    star = {tuple(r) for r in bgp_match(chain_triples, [
        ("n:2", parse_path("kg:next*"), "?x"),
    ]).collect()}
    assert star == {("n:2",), ("n:3",), ("n:4",)}
    opt = {tuple(r) for r in bgp_match(chain_triples, [
        ("n:2", parse_path("kg:next?"), "?x"),
    ]).collect()}
    assert opt == {("n:2",), ("n:3",)}


def test_path_composes_with_plain_patterns(spark, chain_triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    got = {tuple(r) for r in bgp_match(chain_triples, [
        ("?m", "kbo:legalName", "?name"),
        ("?m", parse_path("kbo:registeredAddress/kbo:postCode"), "?pc"),
    ], select=["?name", "?pc"]).collect()}
    assert got == {("Acme", "1000"), ("Globex", "2000")}


def test_path_with_kinds_rejected(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    with pytest.raises(ValueError, match="with_kinds"):
        bgp_match(triples, [("?m", parse_path("a/b"), "?x")],
                  with_kinds=True)


# ----------------------------------------------------------------- CONSTRUCT


def test_construct_basic_with_kinds(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_construct

    got = {tuple(r) for r in bgp_construct(triples, [
        ("?m", "rdf:type", "kbo:Enterprise"),
        ("?m", "kbo:legalName", "?name"),
    ], template=[
        ("?m", "kg:label", "?name"),
        ("?m", "rdf:type", "kg:Company"),
    ]).select("subject", "subject_kind", "predicate",
              "object_value", "object_kind").collect()}
    assert got == {
        ("m:1", 0, "kg:label", "Acme", 2),
        ("m:2", 0, "kg:label", "Globex", 2),
        ("m:1", 0, "rdf:type", "kg:Company", 0),
        ("m:2", 0, "rdf:type", "kg:Company", 0),
    }


def test_construct_unbound_optional_omits_triple_only(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_construct

    # m:3 has no registeredAddress: the pc triple is omitted for it,
    # but its label triple still constructs (SPARQL 11.2).
    rows = bgp_construct(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], optional=[[
        ("?m", "kbo:registeredAddress", "?a"),
        ("?a", "kbo:postCode", "?pc"),
    ]], template=[
        ("?m", "kg:label", "?name"),
        ("?m", "kg:postCode", "?pc"),
    ]).select("subject", "predicate", "object_value").collect()
    got = {tuple(r) for r in rows}
    assert ("m:3", "kg:label", "NotACompany") in got
    assert not any(s == "m:3" and p == "kg:postCode" for s, p, _ in got)
    assert ("m:1", "kg:postCode", "1000") in got


def test_construct_drops_ill_formed(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_construct

    # literal subject (?name binds literals) -> instantiation dropped
    assert bgp_construct(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], template=[("?name", "kg:of", "?m")]).count() == 0


def test_construct_blank_fresh_per_solution_shared_in_template(spark, triples):
    from extract_cbd_shape_spark.model import BLANK, Term
    from extract_cbd_shape_spark.operators.bgp import bgp_construct

    rows = bgp_construct(triples, [
        ("?m", "rdf:type", "kbo:Enterprise"),
        ("?m", "kbo:legalName", "?name"),
    ], template=[
        (Term(BLANK, "b"), "kg:of", "?m"),
        (Term(BLANK, "b"), "kg:name", "?name"),
    ]).collect()
    assert len(rows) == 4
    by_blank = {}
    for r in rows:
        assert r.subject_kind == BLANK and r.subject.startswith("c")
        by_blank.setdefault(r.subject, set()).add(r.object_value)
    # 2 solutions -> 2 distinct blanks, each carrying its own (m, name)
    assert len(by_blank) == 2
    assert {frozenset(v) for v in by_blank.values()} == {
        frozenset({"m:1", "Acme"}), frozenset({"m:2", "Globex"})}


def test_construct_is_a_set(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_construct

    # two enterprises -> one identical constant triple, deduped
    assert bgp_construct(triples, [
        ("?m", "rdf:type", "kbo:Enterprise"),
    ], template=[("kg:corpus", "kg:hasType", "kg:Company")]).count() == 1


def test_construct_literal_identity_carries_lang_datatype(spark):
    from extract_cbd_shape_spark.operators.bgp import bgp_construct

    t = spark.createDataFrame(
        [("s:1", 0, "p:name", "chat", 2, "fr", None),
         ("s:1", 0, "p:name", "chat", 2, "en", None),
         ("s:2", 0, "p:age", "41", 2, None, "xsd:integer")],
        "subject string, subject_kind tinyint, predicate string, "
        "object_value string, object_kind tinyint, object_lang string, "
        "object_datatype string")
    got = {(r.object_value, r.object_lang, r.object_datatype)
           for r in bgp_construct(
               t, [("?s", "?p", "?o")],
               template=[("?s", "kg:val", "?o")]).collect()}
    assert got == {("chat", "fr", None), ("chat", "en", None),
                   ("41", None, "xsd:integer")}


def test_construct_kindless_value_space_fallback(spark, chain_triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_construct, parse_path

    got = {tuple(r) for r in bgp_construct(chain_triples, [
        ("?m", parse_path("kbo:registeredAddress/kbo:postCode"), "?pc"),
    ], template=[
        ("?m", "kg:pc", "?pc"),
    ], with_kinds=False).select(
        "subject", "subject_kind", "object_value", "object_kind").collect()}
    assert got == {("m:1", 0, "1000", 0), ("m:2", 0, "2000", 0)}


def test_construct_template_var_unbound_raises(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_construct

    with pytest.raises(ValueError, match="not bound"):
        bgp_construct(triples, [("?m", "rdf:type", "kbo:Enterprise")],
                      template=[("?m", "kg:x", "?nope")])


def test_parse_path_angle_bracketed_iris(spark, chain_triples):
    from extract_cbd_shape_spark.operators.bgp import parse_path
    from extract_cbd_shape_spark.shapes.ast import PredicatePath, SequencePath

    p = parse_path("<http://a/p>/<http://b/q>+")
    assert isinstance(p, SequencePath)
    assert isinstance(p.sequence[0], PredicatePath)
    assert p.sequence[0].predicate == "http://a/p"
    with pytest.raises(ValueError, match="unclosed"):
        parse_path("<http://a/p")


# ------------------------------------------------- round-4 review fixes


def test_literal_cols_shared_object_var_null_safe_join(spark):
    """A variable bound as object in two patterns must still join when
    its lang/datatype are NULL (IRIs/plain literals) — the shared
    lang/datatype columns join NULL-SAFELY (NULL lang == NULL lang is
    the same literal identity)."""
    from extract_cbd_shape_spark.operators.bgp import bgp_construct, bgp_match

    t = spark.createDataFrame(
        [("a:1", 0, "p", "x:1", 0, None, None),
         ("b:1", 0, "q", "x:1", 0, None, None)],
        "subject string, subject_kind tinyint, predicate string, "
        "object_value string, object_kind tinyint, object_lang string, "
        "object_datatype string")
    pats = [("?a", "p", "?x"), ("?b", "q", "?x")]
    assert bgp_match(t, pats, with_kinds=True,
                     literal_cols=True).count() == 1
    g = bgp_construct(t, pats, template=[("?a", "kg:co", "?b")])
    assert [(r.subject, r.object_value) for r in g.collect()] == \
        [("a:1", "b:1")]
    # and distinct langs still do NOT join (full literal identity)
    t2 = spark.createDataFrame(
        [("a:1", 0, "p", "chat", 2, "fr", None),
         ("b:1", 0, "q", "chat", 2, "en", None)],
        t.schema)
    assert bgp_match(t2, pats, with_kinds=True,
                     literal_cols=True).count() == 0


def test_term_constants_in_patterns(spark):
    """model.Term constants in pattern positions match full term
    identity instead of crashing in F.lit (the CLI's quoted-literal
    path)."""
    from extract_cbd_shape_spark.model import LITERAL, Term
    from extract_cbd_shape_spark.operators.bgp import bgp_match

    t = spark.createDataFrame(
        [("m:1", 0, "name", "Acme", 2, None, None),
         ("m:2", 0, "name", "Acme", 0, None, None),   # IRI, not literal
         ("m:3", 0, "name", "Acme", 2, "en", None)],
        "subject string, subject_kind tinyint, predicate string, "
        "object_value string, object_kind tinyint, object_lang string, "
        "object_datatype string")
    got = {r.m for r in bgp_match(
        t, [("?m", "name", Term(LITERAL, "Acme"))]).collect()}
    assert got == {"m:1"}  # kind + null-safe lang both discriminate
    got = {r.m for r in bgp_match(
        t, [("?m", "name", Term(LITERAL, "Acme", lang="en"))]).collect()}
    assert got == {"m:3"}


def test_construct_blank_values_are_bare_labels(spark, triples):
    """Template blanks carry BARE labels (engine storage convention —
    the N-Quads sink prepends '_:'); a baked-in prefix serialized as
    the grammar-invalid '_:_:c…'."""
    from extract_cbd_shape_spark.model import BLANK, Term
    from extract_cbd_shape_spark.operators.bgp import bgp_construct
    from extract_cbd_shape_spark.sinks.nquads import to_nquads

    g = bgp_construct(triples, [("?m", "kbo:legalName", "?n")],
                      template=[(Term(BLANK, "b"), "kg:of", "?m")])
    rows = g.collect()
    assert all(not r.subject.startswith("_:") for r in rows)
    lines = [r.line for r in to_nquads(g).collect()]
    assert lines and all(line.startswith("_:c") and "_:_:" not in line
                         for line in lines)


def test_zero_length_path_constant_endpoint_absent_from_graph(spark):
    """SPARQL ALP: a constant endpoint contributes its reflexive
    zero-length solution even when the term never occurs in the
    data."""
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    t = spark.createDataFrame(
        [("a:1", 0, "p", "b:1", 0)],
        "subject string, subject_kind tinyint, predicate string, "
        "object_value string, object_kind tinyint")
    got = {r.o for r in bgp_match(
        t, [("ghost:1", parse_path("p?"), "?o")]).collect()}
    assert got == {"ghost:1"}
    got = {r.s for r in bgp_match(
        t, [("?s", parse_path("p*"), "ghost:1")]).collect()}
    assert got == {"ghost:1"}
    # distinct constants on both ends: no zero-length escape hatch
    assert bgp_match(
        t, [("ghost:1", parse_path("p*"), "ghost:2")]).count() == 0
    # and a reachable pair still matches
    assert bgp_match(t, [("a:1", parse_path("p*"), "b:1")]).count() == 1


def test_zero_length_path_constant_through_nested_closures(spark):
    """ADVICE r4: endpoint constants must propagate through Inverse/
    Sequence/Alternative wrappers into nested closures, so the
    reflexive zero-length solution survives nesting."""
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path
    from extract_cbd_shape_spark.shapes.ast import (
        InversePath, PredicatePath, ZeroOrMorePath)

    t = spark.createDataFrame(
        [("a:1", 0, "p", "b:1", 0), ("a:1", 0, "q", "c:1", 0)],
        "subject string, subject_kind tinyint, predicate string, "
        "object_value string, object_kind tinyint")
    # inverse around a closure: ^(p*) from a ghost constant
    inv_closure = InversePath(ZeroOrMorePath(PredicatePath("p")))
    got = {r.o for r in bgp_match(
        t, [("ghost:1", inv_closure, "?o")]).collect()}
    assert got == {"ghost:1"}
    # alternative of a closure and a plain predicate
    got = {r.o for r in bgp_match(
        t, [("ghost:1", parse_path("(p)*|q"), "?o")]).collect()}
    assert got == {"ghost:1"}
    # sequence whose LAST step is a closure, bound object constant
    got = {r.s for r in bgp_match(
        t, [("?s", parse_path("q/(p)*"), "c:1")]).collect()}
    assert got == {"a:1"}  # q to c:1 then zero hops
    # single-element "sequence" keeps both constants
    got = bgp_match(t, [("ghost:1", parse_path("(p?)"), "ghost:1")]).count()
    assert got == 1


def test_negated_property_set(spark, triples):
    """SPARQL NPS: !p = any one forward hop whose predicate is not p;
    inverse members negate reversed edges; mixed sets union both."""
    from extract_cbd_shape_spark.operators.bgp import bgp_match, parse_path

    # everything m:1 links to by a predicate other than rdf:type
    got = {(r.o) for r in bgp_match(
        triples, [("m:1", parse_path("!<rdf:type>"), "?o")]).collect()}
    assert got == {"Acme", "a:1"}
    # negated set of two
    got = {r.o for r in bgp_match(
        triples,
        [("m:1", parse_path("!(<rdf:type>|<kbo:legalName>)"), "?o")]
    ).collect()}
    assert got == {"a:1"}
    # inverse-only member: ?s !(^p) o ranges over reversed edges, i.e.
    # o <non-p> ?s — m:1's own objects through non-knows predicates
    got = {r.s for r in bgp_match(
        triples, [("?s", parse_path("!(^<kbo:knows>)"), "m:1")]).collect()}
    assert got == {"Acme", "a:1", "kbo:Enterprise"}
    got = {r.s for r in bgp_match(
        triples, [("?s", parse_path("!(^<rdf:type>)"), "a:1")]).collect()}
    assert got == {"1000"}  # a:1's one non-type object (postCode)
    # mixed: union of both parts
    got = {(r.x, r.y) for r in bgp_match(
        triples,
        [("?x", parse_path("!(<kbo:postCode>|^<kbo:registeredAddress>)"),
          "?y")]).collect()}
    assert ("a:1", "1000") not in got        # forward pc negated
    assert ("a:1", "m:1") not in got         # reversed addr negated
    assert ("m:1", "Acme") in got            # other forward edges match
    assert ("Acme", "m:1") in got            # other reversed edges match
    # NPS composes with sequences
    got = {r.z for r in bgp_match(
        triples,
        [("m:2", parse_path("!<rdf:type>/<kbo:postCode>"), "?z")]).collect()}
    assert got == {"2000"}
    # query-side only: the extraction hooks raise
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        parse_path("!<rdf:type>").found(frozenset(), "")


def test_union_of_groups(spark, triples):
    """SPARQL UNION: bag union of branch solutions; branch-exclusive
    variables are NULL (unbound) in the other branches."""
    rows = bgp_match(triples, [], union=[
        [("?m", "rdf:type", "kbo:Enterprise"),
         ("?m", "kbo:legalName", "?name")],
        [("?m", "rdf:type", "other:Thing"),
         ("?m", "kbo:knows", "?k")],
    ], select=["?m", "?name", "?k"]).collect()
    got = {(r.m, r.name, r.k) for r in rows}
    assert got == {
        ("m:1", "Acme", None), ("m:2", "Globex", None),
        ("m:3", None, "m:3"),
    }
    # UNION joined with a main pattern on the shared variable
    got = {(r.m, r.pc) for r in bgp_match(triples, [
        ("?m", "kbo:registeredAddress", "?a"),
        ("?a", "kbo:postCode", "?pc"),
    ], union=[
        [("?m", "kbo:legalName", "Acme")],
        [("?m", "kbo:legalName", "Globex")],
    ]).collect()}
    assert got == {("m:1", "1000"), ("m:2", "2000")}


def test_union_bag_semantics_and_distinct(spark, triples):
    # same solution from both branches -> two rows (bag), one with
    # distinct=True (set)
    branches = [[("?m", "rdf:type", "kbo:Enterprise")]] * 2
    assert bgp_match(triples, [], union=branches).count() == 4
    assert bgp_match(triples, [], union=branches, distinct=True).count() == 2


def test_values_inline_data(spark, triples):
    got = {(r.m, r.name) for r in bgp_match(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], values=(["?m"], [("m:1",), ("m:3",)])).collect()}
    assert got == {("m:1", "Acme"), ("m:3", "NotACompany")}
    # multi-var VALUES rows must match as a whole row
    got = {r.m for r in bgp_match(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], values=(["?m", "?name"],
               [("m:1", "Acme"), ("m:2", "WrongName")])).collect()}
    assert got == {"m:1"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="UNDEF"):
        bgp_match(triples, [("?m", "kbo:legalName", "?name")],
                  values=(["?m"], [(None,)]))


def test_bind_expressions(spark, triples):
    """SPARQL BIND: new variables from SQL expressions, visible to
    FILTER/aggregates/modifiers; later binds see earlier ones."""
    got = {(r.m, r.tag) for r in bgp_match(triples, [
        ("?m", "kbo:registeredAddress", "?a"),
        ("?a", "kbo:postCode", "?pc"),
    ], bind={"num": "cast(pc as int)",
             "tag": "concat(m, '#', num * 2)"},
        filters=["num >= 1000"],
        select=["?m", "?tag"]).collect()}
    assert got == {("m:1", "m:1#2000"), ("m:2", "m:2#4000")}


def test_ask(spark, triples):
    from extract_cbd_shape_spark.operators.bgp import bgp_ask

    assert bgp_ask(triples, [("?m", "rdf:type", "kbo:Enterprise")])
    assert not bgp_ask(triples, [("?m", "rdf:type", "kbo:Nothing")])
    assert bgp_ask(triples, [("?m", "kbo:registeredAddress", "?a"),
                             ("?a", "kbo:postCode", "?pc")],
                   filters=["pc >= '2000'"])
    assert not bgp_ask(triples, [("?a", "kbo:postCode", "?pc")],
                       filters=["pc > '9999'"])


def test_describe_via_extraction_engine(spark):
    """DESCRIBE ?x = the extraction engine's CBD of each distinct
    binding — blank closure included, literals dropped."""
    from extract_cbd_shape_spark.model import BLANK, quad_schema
    from extract_cbd_shape_spark.operators.bgp import bgp_describe

    rows = [
        ("m:1", 0, "rdf:type", "kbo:Enterprise", 0, None, None, None, None),
        ("m:1", 0, "kbo:addr", "b0", 1, None, None, None, None),
        ("b0", 1, "kbo:zip", "1000", 2, None, None, None, None),
        ("m:2", 0, "rdf:type", "kbo:Enterprise", 0, None, None, None, None),
        ("m:3", 0, "rdf:type", "other:Thing", 0, None, None, None, None),
        ("m:3", 0, "kbo:name", "N", 2, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, quad_schema())
    res = bgp_describe(df, [("?m", "rdf:type", "kbo:Enterprise")], "?m")
    got = {(r.entity, r.subject, r.predicate, r.object_value)
           for r in res.collect()}
    assert got == {
        ("m:1", "m:1", "rdf:type", "kbo:Enterprise"),
        ("m:1", "m:1", "kbo:addr", "b0"),
        ("m:1", "b0", "kbo:zip", "1000"),   # blank closure
        ("m:2", "m:2", "rdf:type", "kbo:Enterprise"),
    }
    # literal bindings have no description
    res = bgp_describe(df, [("m:3", "kbo:name", "?n")], "?n")
    assert res.count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="variable"):
        bgp_describe(df, [("?m", "rdf:type", "kbo:Enterprise")], "m")


def test_group_by_aggregates(spark, triples):
    """SPARQL aggregation: GROUP BY + COUNT/MIN/GROUP_CONCAT compile to
    one hash aggregate; implicit single group without GROUP BY."""
    rows = {(r.m, r.n, r.first_pc) for r in bgp_match(triples, [
        ("?m", "kbo:registeredAddress", "?a"),
        ("?a", "kbo:postCode", "?pc"),
    ], group_by=["?m"], aggregates={
        "n": "count(?pc)", "first_pc": "min(?pc)",
    }).collect()}
    assert rows == {("m:1", 1, "1000"), ("m:2", 1, "2000")}

    # implicit group: one row, aggregates over every solution
    row = bgp_match(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], aggregates={
        "n": "count(*)",
        "names": "group_concat(?name)",
        "one": "sample(?name)",
    }).collect()
    assert len(row) == 1
    assert row[0].n == 3
    assert row[0].names == "Acme Globex NotACompany"
    assert row[0].one == "Acme"

    # numeric aggregates cast the lexical form
    row = bgp_match(triples, [
        ("?a", "kbo:postCode", "?pc"),
    ], aggregates={"total": "sum(?pc)", "mean": "avg(?pc)"}).collect()[0]
    assert row.total == 3000.0 and row.mean == 1500.0


def test_group_by_having_and_distinct_count(spark, triples):
    got = {r.t for r in bgp_match(triples, [
        ("?m", "rdf:type", "?t"),
    ], group_by=["?t"], aggregates={"n": "count(distinct ?m)"},
        having=["n >= 2"]).collect()}
    assert got == {"kbo:Enterprise"}
    # group_by alone = distinct groups
    got = {r.t for r in bgp_match(triples, [
        ("?m", "rdf:type", "?t"),
    ], group_by=["?t"]).collect()}
    assert got == {"kbo:Enterprise", "other:Thing"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported aggregate"):
        bgp_match(triples, [("?m", "rdf:type", "?t")],
                  group_by=["?t"], aggregates={"n": "median(?m)"})
    with _pytest.raises(ValueError, match="having requires"):
        bgp_match(triples, [("?m", "rdf:type", "?t")], having=["1=1"])


def test_order_by_limit_top_k(spark, triples):
    rows = bgp_match(triples, [
        ("?m", "kbo:legalName", "?name"),
    ], select=["?m", "?name"], order_by=["-?name"], limit=2).collect()
    assert [(r.m, r.name) for r in rows] == [
        ("m:3", "NotACompany"), ("m:2", "Globex")]
    # plan: ORDER BY + LIMIT compiles to TakeOrdered, not a global sort
    df = bgp_match(triples, [("?m", "kbo:legalName", "?name")],
                   order_by=["?name"], limit=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_random_bgp_parity_vs_bruteforce(spark):
    """Seeded-random BGPs (shared vars, constants, lang'd literals)
    against a brute-force Python evaluator — pins the solution-join
    semantics incl. the null-safe literal-identity columns."""
    import itertools
    import random

    from extract_cbd_shape_spark.operators.bgp import bgp_match

    rng = random.Random(42)
    subs = ["s:1", "s:2", "s:3"]
    preds = ["p", "q"]
    objs = [("o:1", 0, None), ("v", 2, None), ("v", 2, "en"), ("o:2", 0, None)]

    def brute(rows, pats):
        sols = [dict()]
        for (s, p, o) in pats:
            nxt = []
            for binding in sols:
                for (rs, rsk, rp, rov, rok, rol) in rows:
                    b = dict(binding)
                    ok = True
                    for term, val in ((s, (rs,)), (p, (rp,)),
                                      (o, (rov, rok, rol))):
                        if term.startswith("?"):
                            key = term[1:]
                            if key in b:
                                if b[key] != val:
                                    ok = False
                                    break
                            else:
                                b[key] = val
                        elif term != val[0]:
                            ok = False
                            break
                    if ok:
                        nxt.append(b)
            sols = nxt
        return sols

    for trial in range(6):
        rows = sorted(
            {(rng.choice(subs), 0, rng.choice(preds), *rng.choice(objs))
             for _ in range(rng.randint(4, 9))},
            key=lambda t: tuple("" if x is None else str(x) for x in t))
        pats = []
        for _ in range(2):
            pats.append((
                rng.choice(["?a", "?b", rng.choice(subs)]),
                rng.choice(["?p", rng.choice(preds)]),
                rng.choice(["?x", "?a", rng.choice([o[0] for o in objs])]),
            ))
        df = spark.createDataFrame(
            rows,
            "subject string, subject_kind tinyint, predicate string, "
            "object_value string, object_kind tinyint, object_lang string")
        got = bgp_match(df, pats, with_kinds=True, literal_cols=True)
        want = brute(rows, pats)
        # compare on the VALUE bindings (first tuple element per var)
        want_set = sorted(
            tuple(sorted((k, v[0]) for k, v in b.items())) for b in want)
        val_cols = [c for c in got.columns
                    if not c.endswith(("_kind", "_lang", "_datatype"))]
        got_set = sorted(
            tuple(sorted((c, r[c]) for c in val_cols))
            for r in got.collect())
        assert got_set == want_set, (trial, pats, rows)
