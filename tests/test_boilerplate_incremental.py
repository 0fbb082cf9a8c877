"""Host-level boilerplate removal + incremental (new-vs-index) dedup."""

from pyspark.sql import functions as F

from extract_cbd_shape_spark.operators.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)
from extract_cbd_shape_spark.operators.dedup import (
    corpus_fingerprints,
    dedup_new_against_index,
    near_dups_against_index,
)


def _docs(spark):
    # host A: footer on all 3 docs, promo on 2/3; host B: 2 docs sharing
    # a nav line; content lines unique. Doc 4 is ONLY boilerplate.
    rows = [
        (1, "a", "alpha content one\nfooter a\npromo a"),
        (2, "a", "beta content two\nfooter a\npromo a"),
        (3, "a", "gamma content three\nfooter a"),
        (4, "b", "nav b\n\nnav b"),
        (5, "b", "delta content five\nnav b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_boilerplate_lines_threshold(spark):
    b = boilerplate_lines(_docs(spark))
    got = {(r["host"], r["line"]) for r in b.collect()}
    # footer a: df=3/3; promo a: df=2/3 >= 1/2; nav b: df=2/2.
    # content lines: df=1 (< min_df). blank line: excluded.
    assert got == {("a", "footer a"), ("a", "promo a"), ("b", "nav b")}


def test_strip_preserves_order_blanks_and_empty_docs(spark):
    out = {r["doc_id"]: r for r in strip_boilerplate(_docs(spark)).collect()}
    assert len(out) == 5  # row-preserving, even the all-template doc
    assert out[1]["text"] == "alpha content one"
    assert out[3]["text"] == "gamma content three"
    # blank line survives (structure, not template); both nav lines go
    assert out[4]["text"] == ""
    assert out[5]["text"] == "delta content five"


def test_strip_line_order_stable(spark):
    df = spark.createDataFrame(
        [(1, "h", "z last\nshared\na first"),
         (2, "h", "shared\nmid line")],
        "doc_id long, host string, text string",
    )
    out = {r["doc_id"]: r["text"] for r in strip_boilerplate(df).collect()}
    assert out[1] == "z last\na first"  # original order, not sorted text
    assert out[2] == "mid line"


def test_incremental_exact_dedup(spark):
    old = spark.createDataFrame(
        [(1, "the quick fox"), (2, "hello world")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "hello world"),      # already in index -> dropped
            (11, "brand new text"),   # novel
            (12, "brand new text"),   # batch-dup of 11 -> collapsed
            (13, "another novel"),
        ],
        "doc_id long, text string",
    )
    surv = dedup_new_against_index(new, corpus_fingerprints(old))
    assert {r["doc_id"] for r in surv.collect()} == {11, 13}


def test_incremental_near_dups_no_within_group_pairs(spark):
    base = "spark shuffle join agg window sort filter scan hash merge"
    old = spark.createDataFrame(
        [(1, base), (2, "totally different words entirely unrelated "
                        "content about gardening and cooking recipes")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # near-copy of old doc 1 (drop last token)
            (101, "spark shuffle join agg window sort filter scan hash"),
            # two identical NEW docs: must NOT pair with each other
            (102, "completely novel payload alpha beta gamma delta"),
            (103, "completely novel payload alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    pairs = near_dups_against_index(new, old, threshold=0.5).collect()
    assert {(r["doc_new"], r["doc_index"]) for r in pairs} == {(101, 1)}
    assert all(r["jaccard"] >= 0.5 for r in pairs)
