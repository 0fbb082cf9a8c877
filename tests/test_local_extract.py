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


# ---------------------------------------------------------------------------
# Vectorized bucket kernel parity (the single-hop fast path)
# ---------------------------------------------------------------------------

VEC_CORPUS = """
@prefix ex: <http://example.org/> .
ex:A ex:p ex:B ; ex:name "a" ; ex:addr _:a1 ; ex:link ex:Shared .
_:a1 ex:street "S1" ; ex:deep _:a2 .
_:a2 ex:zip "Z1" .
ex:B ex:name "b" ; ex:link ex:Shared .
ex:Shared ex:name "shared" ; ex:child _:s1 .
_:s1 ex:street "S9" .
ex:GA { ex:A ex:graphed "in-A-graph" . ex:B ex:other "in-A-graph-too" . }
ex:GB { ex:C ex:graphed "unrelated" . }
ex:A { ex:A ex:selfgraph "own graph quad" . }
ex:B { ex:A ex:leak "should not leak into A via CBD" . }
"""

VEC_SHAPE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:RootShape a sh:NodeShape ;
  sh:property [ sh:path <http://example.org/name> ; sh:minCount 1 ] ;
  sh:property [ sh:path <http://example.org/p> ; sh:node ex:RootShape ] ;
  sh:property [ sh:path <http://example.org/link> ; sh:node ex:LeafShape ] .
ex:LeafShape a sh:NodeShape ;
  sh:property [ sh:path <http://example.org/child> ; sh:minCount 1 ] .
"""


def _vec_vs_loop(spark, shape_ttl, shape_iri, bulk, ignore=()):
    quads = [quad_to_row(q) for q in parse_trig(VEC_CORPUS)]
    tdf = spark.createDataFrame(quads, schema=_QUAD_SCHEMA).withColumn(
        "store_key", F.lit("s1"))
    mem = spark.createDataFrame(
        [("http://example.org/A",), ("http://example.org/B",)], "entity string"
    ).withColumn("store_key", F.lit("s1"))
    sg = ShapesGraph.from_quads(parse_trig(shape_ttl)) if shape_ttl else None
    shape = Term(IRI, shape_iri) if shape_iri else None
    kw = dict(shapes_graph=sg, shape=shape, bulk=bulk,
              graphs_to_ignore=ignore, n_buckets=2)
    vec = local_bulk_extract(tdf, mem, vectorize=True, **kw)
    loop = local_bulk_extract(tdf, mem, vectorize=False, **kw)
    vrows = {tuple(r) for r in vec.collect()}
    lrows = {tuple(r) for r in loop.collect()}
    assert vrows == lrows
    assert len(vrows) > 0
    return vrows


_QUAD_SCHEMA = (
    "subject string, subject_kind tinyint, predicate string, "
    "object_value string, object_kind tinyint, object_lang string, "
    "object_datatype string, graph string, graph_kind tinyint"
)


def test_vec_parity_cbd_only(spark):
    _vec_vs_loop(spark, None, None, bulk=False)


def test_vec_parity_bulk_isolation_and_pickup(spark):
    rows = _vec_vs_loop(spark, None, None, bulk=True)
    a = {r[4] for r in rows if r[0] == "http://example.org/A"}
    assert "own graph quad" in a          # named-graph pickup
    assert "should not leak into A via CBD" not in a  # bulk isolation


def test_vec_parity_shape_links(spark):
    _vec_vs_loop(spark, VEC_SHAPE, "http://example.org/RootShape", bulk=False)
    _vec_vs_loop(spark, VEC_SHAPE, "http://example.org/RootShape", bulk=True)


def test_vec_parity_graphs_to_ignore(spark):
    from extract_cbd_shape_spark.model import Term as T
    rows = _vec_vs_loop(
        spark, None, None, bulk=False,
        ignore=(T(IRI, "http://example.org/GA"),))
    a = {r[4] for r in rows if r[0] == "http://example.org/A"}
    assert "in-A-graph" not in a


def test_vec_gate_rejects_complex_shapes():
    from extract_cbd_shape_spark.operators.local_extract import (
        compile_single_hop_links)
    sg = ShapesGraph.from_quads(parse_trig(load_fixture("05 - paths/shape.ttl")))
    assert compile_single_hop_links(
        sg, Term(IRI, EX + "SequencePathShape")) is None
    assert compile_single_hop_links(
        sg, Term(IRI, EX + "InversePathShape")) is None


def test_giant_store_fallback_parity(spark):
    """A store above giant_store_threshold routes through the global
    engine; results must equal the pure store-local run."""
    from extract_cbd_shape_spark.operators.kgtriples import (
        KBO_SHAPE_IRI, KBO_SHAPE_TTL, kbo_members)

    triples, members = kbo_members(spark, "/root/testdata/sf0.001")
    shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
    shape = Term(IRI, KBO_SHAPE_IRI)
    # two stores: one giant (every order with key < 1000), one normal
    giant_key = F.when(F.col("subject").rlike("^[ma]:[0-9]{1,3}$"),
                       F.lit("giant")).otherwise(F.split(F.col("subject"), ":")[1])
    t2 = triples.withColumn("store_key", giant_key)
    m2 = members.withColumn(
        "store_key",
        F.when(F.col("entity").rlike("^m:[0-9]{1,3}$"), F.lit("giant"))
        .otherwise(F.split(F.col("entity"), ":")[1]),
    )
    kw = dict(shapes_graph=shapes, shape=shape, n_buckets=8)
    plain = local_bulk_extract(t2, m2, **kw)
    routed = local_bulk_extract(t2, m2, giant_store_threshold=500, **kw)
    pset = {tuple(r) for r in
            plain.select("entity", "subject", "predicate", "object_value").collect()}
    rset = {tuple(r) for r in
            routed.select("entity", "subject", "predicate", "object_value").collect()}
    assert pset == rset
    assert len(pset) > 0


def test_prebucketed_store_parity(spark, tmp_path):
    """materialize_store + zero-shuffle extraction must equal the
    shuffling engine, both with marker members and with members derived
    from IRI subjects; the physical plan must contain no Exchange."""
    from extract_cbd_shape_spark.operators.kgtriples import (
        KBO_SHAPE_IRI, KBO_SHAPE_TTL, kbo_members)
    from extract_cbd_shape_spark.operators.local_extract import (
        local_bulk_extract_prebucketed, materialize_store, read_store)

    triples, members = kbo_members(spark, "/root/testdata/sf0.001")
    shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
    shape = Term(IRI, KBO_SHAPE_IRI)
    t2 = triples.withColumn("store_key", F.split(F.col("subject"), ":")[1])
    m2 = members.withColumn("store_key", F.split(F.col("entity"), ":")[1])

    base = local_bulk_extract(t2, m2, shapes_graph=shapes, shape=shape)
    bset = {tuple(r) for r in
            base.select("entity", "subject", "predicate", "object_value").collect()}

    cols = ["entity", "subject", "predicate", "object_value"]
    st = read_store(spark, materialize_store(
        t2, m2, str(tmp_path / "store"), n_buckets=8))
    pre = local_bulk_extract_prebucketed(st, shapes_graph=shapes, shape=shape)
    assert "Exchange" not in pre._jdf.queryExecution().executedPlan().toString()
    pset = {tuple(r) for r in pre.select(*cols).collect()}
    assert pset == bset and len(pset) > 0

    # quads-only store; members derived per store from IRI subjects
    # (KBO subjects are exactly the member IRIs + address blanks)
    st2 = read_store(spark, materialize_store(
        t2, None, str(tmp_path / "store2"), n_buckets=8))
    pre2 = local_bulk_extract_prebucketed(
        st2, shapes_graph=shapes, shape=shape, members_from_subjects=True)
    p2set = {tuple(r) for r in pre2.select(*cols).collect()}
    assert p2set == bset


def test_deep_nodelink_chain_no_recursion_error():
    """A nodeLink chain far deeper than CPython's recursion limit must
    extract completely (ADVICE r2: extract_recursively was recursive
    Python; now a generator trampoline)."""
    n = 5000
    shape_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:ChainShape a sh:NodeShape ;
      sh:property [ sh:path ex:next ; sh:node ex:ChainShape ] .
    """
    sg = ShapesGraph.from_quads(parse_trig(shape_ttl))
    quads = [
        (EX + f"n{i}", IRI, EX + "next", EX + f"n{i+1}", IRI,
         None, None, None, None)
        for i in range(n)
    ]
    rows = list(extract_store(
        quads, [(IRI, EX + "n0")], sg, Term(IRI, EX + "ChainShape")))
    assert len(rows) == n


def test_projected_columns_parity(spark, tmp_path):
    """columns= projection pushdown (kernel emits only the requested
    columns through Arrow) must equal the post-hoc .select, on the
    vectorized kernel, the per-member interpreter, and the zero-shuffle
    pre-bucketed store with a pruned input scan."""
    from extract_cbd_shape_spark.operators.kgtriples import (
        KBO_SHAPE_IRI, KBO_SHAPE_TTL, kbo_members)
    from extract_cbd_shape_spark.operators.local_extract import (
        local_bulk_extract_prebucketed, materialize_store, read_store)

    triples, members = kbo_members(spark, "/root/testdata/sf0.001")
    shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
    shape = Term(IRI, KBO_SHAPE_IRI)
    t2 = triples.withColumn("store_key", F.split(F.col("subject"), ":")[1])
    m2 = members.withColumn("store_key", F.split(F.col("entity"), ":")[1])
    cols = ["entity", "subject", "predicate", "object_value"]

    base = local_bulk_extract(t2, m2, shapes_graph=shapes, shape=shape)
    bset = {tuple(r) for r in base.select(*cols).collect()}
    assert len(bset) > 0

    for vec in (True, False):
        proj = local_bulk_extract(
            t2, m2, shapes_graph=shapes, shape=shape, vectorize=vec,
            columns=cols)
        assert [f.name for f in proj.schema.fields] == cols
        assert {tuple(r) for r in proj.collect()} == bset

    st = read_store(spark, materialize_store(
        t2, m2, str(tmp_path / "store"), n_buckets=8))
    pre = local_bulk_extract_prebucketed(
        st.drop("object_lang", "object_datatype"),
        shapes_graph=shapes, shape=shape, columns=cols)
    assert {tuple(r) for r in pre.collect()} == bset


def test_vec_cross_store_isolation_same_bucket(spark):
    """Two stores in ONE kernel bucket sharing node names (same blank
    label, same downstream IRI) must not leak quads across stores (the
    CSR kernel keys nodes by (store, value, kind)); vectorized ==
    interpreter on both the default and cbd_default_graph traversals."""
    rows = []
    for store, member in (("s1", "http://x/A1"), ("s2", "http://x/A2")):
        rows += [
            (member, 0, "http://x/child", "b0", 1,
             None, None, None, None, store),
            # same blank label b0 in BOTH stores, different payloads
            ("b0", 1, "http://x/street", f"st-{store}", 2,
             None, None, None, None, store),
            # same downstream IRI subject in both stores
            (member, 0, "http://x/link", "http://x/shared", 0,
             None, None, None, None, store),
            # a named-graph quad: dropped under cbd_default_graph
            (member, 0, "http://x/extra", f"x-{store}", 2,
             None, None, "http://x/G", 0, store),
        ]
    tdf = spark.createDataFrame(
        rows, _QUAD_SCHEMA + ", store_key string")
    mem = spark.createDataFrame(
        [("http://x/A1", "s1"), ("http://x/A2", "s2")],
        "entity string, store_key string")
    for cbd_dg in (False, True):
        kw = dict(bulk=False, cbd_default_graph=cbd_dg, n_buckets=1)
        vec = {tuple(r) for r in
               local_bulk_extract(tdf, mem, vectorize=True, **kw).collect()}
        loop = {tuple(r) for r in
                local_bulk_extract(tdf, mem, vectorize=False, **kw).collect()}
        assert vec == loop
        # A1 reaches b0 via blank closure: must see ONLY s1's street
        a1_streets = {r[4] for r in vec
                      if r[0] == "http://x/A1" and r[3] == "http://x/street"}
        assert a1_streets == {"st-s1"}
        a2_streets = {r[4] for r in vec
                      if r[0] == "http://x/A2" and r[3] == "http://x/street"}
        assert a2_streets == {"st-s2"}
        n_graph_quads = sum(1 for r in vec if r[3] == "http://x/extra")
        assert n_graph_quads == (0 if cbd_dg else 2)
