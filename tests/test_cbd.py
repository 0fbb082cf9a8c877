"""Plain-CBD golden-count tests mirroring the reference's
tests/03 - CBD tests without a shape/without-shape.test.ts and the
blank-node regression tests in tests/06 extraction.test.ts:46-109."""

import pytest

from extract_cbd_shape_spark.model import IRI, Quad, Term
from extract_cbd_shape_spark.operators import BulkCBDShapeExtractor, Member
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.sources import quads_to_df, trig_to_df

from conftest import load_fixture

EX = "http://example.org/"


def _extract_count(spark, triples_df, entity, **kw):
    ex = BulkCBDShapeExtractor(spark, **kw)
    results, _ = ex.extract(triples_df, [Term(IRI, entity)])
    return results.count()


@pytest.fixture(scope="module")
def data03(spark):
    return trig_to_df(
        spark, load_fixture("03 - CBD tests without a shape/data.ttl")
    ).cache()


def test_cbd_catalog_11(spark):
    df = trig_to_df(spark, load_fixture("01 - fetching a shacl shape/shacl-catalog.ttl"))
    assert _extract_count(spark, df, EX + "PersonShape") == 11


def test_cbd_mrg_2(spark):
    df = trig_to_df(spark, load_fixture("02 - marine regions LDES/data.ttl"))
    assert (
        _extract_count(
            spark, df, "http://marineregions.org/mrgid/24983?t=1690208097"
        )
        == 2
    )


def test_cbd_nested_blank_4(spark, data03):
    assert _extract_count(spark, data03, EX + "A") == 4


def test_cbd_named_graph_only_4(spark, data03):
    assert _extract_count(spark, data03, EX + "C") == 4


def test_cbd_graph_plus_star_8(spark, data03):
    assert _extract_count(spark, data03, EX + "B") == 8


def test_cbd_ldes_update_6(spark, data03):
    assert _extract_count(spark, data03, EX + "Activity1") == 6


def test_cbd_cyclic_blank_7(spark):
    # tests/03 without-shape.test.ts:77-124 — cyclic blank nodes with
    # cbdDefaultGraph=true; exact quad set.
    member = Term(IRI, "https://example.test/member/complex")
    payload = Term(IRI, "https://example.test/payload-part")
    value = Term(IRI, "https://example.test/vocab/value")
    detail = Term(IRI, "https://example.test/vocab/detail")
    nxt = Term(IRI, "https://example.test/vocab/next")
    first = Term.blank("first")
    second = Term.blank("second")
    quads = [
        Quad(member, value, Term.literal("default")),
        Quad(member, detail, first),
        Quad(first, nxt, second),
        Quad(second, nxt, first),
        Quad(second, value, Term.literal("nested")),
        Quad(member, value, Term.literal("named graph"), member),
        Quad(payload, value, Term.literal("all quads in the member graph"), member),
    ]
    df = quads_to_df(spark, quads)
    ex = BulkCBDShapeExtractor(spark, cbd_default_graph=True)
    results, _ = ex.extract(df, [member])
    rows = {
        (
            r.subject, r.subject_kind, r.predicate, r.object_value,
            r.object_kind, r.object_lang, r.object_datatype, r.graph,
        )
        for r in results.collect()
    }
    assert len(rows) == 7
    assert (
        member.value, IRI, value.value, "named graph", 2, None,
        "http://www.w3.org/2001/XMLSchema#string", member.value,
    ) in rows


@pytest.mark.parametrize(
    "n_actors,expected",
    [(4, 7), (3, 6)],
)
def test_blank_node_regressions(spark, n_actors, expected):
    # tests/06 extraction.test.ts:46-109
    actors = ", ".join(f"_:b1_n3-{i}" for i in range(n_actors))
    ttl = f"""
<https://example.com/ns#testing> a <http://schema.org/Movie>;
    <http://schema.org/actor> {actors};
    <http://purl.org/dc/terms/isVersionOf> <http://yikes.dog/namespaces/movies/Alien>;
    <http://www.w3.org/ns/prov#generatedAtTime> "2024-12-03T13:10:42.331Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>.
"""
    df = quads_to_df(spark, parse_trig(ttl))
    assert _extract_count(spark, df, "https://example.com/ns#testing") == expected


def test_bulk_two_members(spark, data03):
    ex = BulkCBDShapeExtractor(spark)
    results, _ = ex.extract(
        data03, [Term(IRI, EX + "A"), Term(IRI, EX + "B")], bulk=True
    )
    counts = {r.entity: r["count"] for r in results.groupBy("entity").count().collect()}
    assert counts[EX + "A"] == 4
    assert counts[EX + "B"] == 8


def _full_rows(results):
    return sorted(
        (
            r.entity, r.subject, r.subject_kind, r.predicate,
            r.object_value, r.object_kind, r.object_lang,
            r.object_datatype, r.graph, r.graph_kind,
        )
        for r in results.collect()
    )


@pytest.mark.parametrize("entity", ["A", "B", "C", "Activity1"])
def test_store_distinct_parity(spark, data03, entity):
    """store_distinct=True must match the default exactly on a
    duplicate-free store — including members whose named-graph pickup
    overlaps their CBD star (B: 8 quads, pickup ∩ star non-empty),
    which is the slice the contract still dedups."""
    base, _ = BulkCBDShapeExtractor(spark).extract(
        data03, [Term(IRI, EX + entity)]
    )
    fast, _ = BulkCBDShapeExtractor(spark, store_distinct=True).extract(
        data03, [Term(IRI, EX + entity)]
    )
    assert _full_rows(fast) == _full_rows(base)


def test_store_distinct_default_dedups_duplicated_store(spark, data03):
    """Default (store_distinct=False) keeps reference uniqueQuads
    semantics even when the input store repeats rows."""
    dup = data03.unionByName(data03)
    results, _ = BulkCBDShapeExtractor(spark).extract(
        dup, [Term(IRI, EX + "A")]
    )
    assert results.count() == 4
