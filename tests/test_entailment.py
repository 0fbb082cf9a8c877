"""RDFS entailment materialization (operators/entailment.py)."""

import pytest

from extract_cbd_shape_spark.operators.entailment import (
    DOMAIN,
    RANGE,
    RDF_TYPE,
    SUBCLASS,
    SUBPROP,
    ontology_closures,
    rdfs_entail,
)

_SCHEMA = ("subject string, subject_kind tinyint, predicate string, "
           "object_value string, object_kind tinyint")


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture(scope="module")
def onto(spark):
    rows = [
        ("Enterprise", 0, SUBCLASS, "Org", 0),
        ("Org", 0, SUBCLASS, "Agent", 0),
        ("legalName", 0, SUBPROP, "label", 0),
        ("registeredAddress", 0, DOMAIN, "Org", 0),
        ("registeredAddress", 0, RANGE, "Address", 0),
        ("label", 0, DOMAIN, "Named", 0),
    ]
    return _df(spark, rows)


def test_full_rdfs_closure(spark, onto):
    data = _df(spark, [
        ("m1", 0, RDF_TYPE, "Enterprise", 0),
        ("m1", 0, "legalName", "Acme", 2),
        ("m1", 0, "registeredAddress", "a1", 1),
    ])
    got = {tuple(r) for r in rdfs_entail(data, onto).collect()}
    want = {
        # data
        ("m1", 0, RDF_TYPE, "Enterprise", 0),
        ("m1", 0, "legalName", "Acme", 2),
        ("m1", 0, "registeredAddress", "a1", 1),
        # rdfs7 via subPropertyOf
        ("m1", 0, "label", "Acme", 2),
        # rdfs9/11: transitive subclass of the explicit type
        ("m1", 0, RDF_TYPE, "Org", 0),
        ("m1", 0, RDF_TYPE, "Agent", 0),
        # rdfs2 domain (and its superclass closure)
        # (registeredAddress domain Org; Org subClassOf Agent)
        # rdfs3 range types the blank object, literals never typed
        ("a1", 1, RDF_TYPE, "Address", 0),
        # domain of the DERIVED label property (stratification order)
        ("m1", 0, RDF_TYPE, "Named", 0),
    }
    assert got == want


def test_range_never_types_literals(spark, onto):
    data = _df(spark, [("m1", 0, "registeredAddress", "lit", 2)])
    got = {tuple(r) for r in rdfs_entail(data, onto).collect()}
    assert ("lit", 2, RDF_TYPE, "Address", 0) not in got
    # domain still fires on the subject
    assert ("m1", 0, RDF_TYPE, "Org", 0) in got
    assert ("m1", 0, RDF_TYPE, "Agent", 0) in got


def test_cyclic_subclass_terminates(spark):
    onto = _df(spark, [
        ("A", 0, SUBCLASS, "B", 0),
        ("B", 0, SUBCLASS, "A", 0),
    ])
    data = _df(spark, [("x", 0, RDF_TYPE, "A", 0)])
    got = {r.object_value for r in rdfs_entail(data, onto)
           .filter(f"predicate = '{RDF_TYPE}'").collect()}
    assert got == {"A", "B"}


def test_closures_helper():
    sc, sp, dom, rng = ontology_closures([
        ("A", SUBCLASS, "B"), ("B", SUBCLASS, "C"),
        ("p", SUBPROP, "q"),
        ("p", DOMAIN, "A"), ("p", RANGE, "C"),
    ])
    assert set(sc) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert set(sp) == {("p", "q")}
    assert dom == [("p", "A")] and rng == [("p", "C")]


def test_entailment_is_idempotent(spark, onto):
    data = _df(spark, [
        ("m1", 0, RDF_TYPE, "Enterprise", 0),
        ("m1", 0, "legalName", "Acme", 2),
    ])
    once = rdfs_entail(data, onto)
    twice = rdfs_entail(once, onto)
    assert {tuple(r) for r in once.collect()} == \
        {tuple(r) for r in twice.collect()}


def test_distributed_closure_guard_parity(spark, onto):
    """VERDICT r3 #6: above collect_max the ontology is never collected
    — closures run through operators/closure.py pointer jumping — and
    the result is identical to the driver-side path, cycles included."""
    from extract_cbd_shape_spark.operators.entailment import (
        SUBCLASS,
        distributed_ontology_closures,
    )

    data = _df(spark, [
        ("m1", 0, RDF_TYPE, "Enterprise", 0),
        ("m1", 0, "legalName", "Acme", 2),
        ("m2", 0, RDF_TYPE, "X", 0),
    ])
    cyc = _df(spark, [
        ("X", 0, SUBCLASS, "Y", 0), ("Y", 0, SUBCLASS, "X", 0),
    ])
    big_onto = onto.unionByName(cyc)
    collected = {tuple(r) for r in rdfs_entail(data, big_onto).collect()}
    distributed = {tuple(r) for r in rdfs_entail(
        data, big_onto, collect_max=0).collect()}
    assert distributed == collected
    # the distributed closure itself is non-reflexive even through the cycle
    sc, _, _, _ = distributed_ontology_closures(big_onto)
    pairs = {(r.a, r.b) for r in sc.collect()}
    assert ("X", "Y") in pairs and ("Y", "X") in pairs
    assert ("X", "X") not in pairs and ("Y", "Y") not in pairs
