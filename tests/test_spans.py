"""Corpus-level verbatim-span detection (operators/spans.py)."""

import pytest

from extract_cbd_shape_spark.operators.spans import (
    repeated_spans,
    strip_repeated_spans,
)

BOILER = "this license text is repeated verbatim in many documents"  # 9 toks


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"unique alpha words {BOILER} more unique alpha tail"),
        (2, f"{BOILER} completely different body of text here"),
        (3, "no shared content at all in this document body whatsoever"),
        (4, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_repeated_spans_finds_merged_interval(spark, docs):
    out = {r.doc_id: r for r in repeated_spans(docs, k=8, min_df=2).collect()}
    assert len(out) == 4
    # doc 1: boilerplate at tokens [3, 12); two overlapping hot 8-grams
    # (positions 3 and 4) merge into ONE span
    assert [(s.start, s.end) for s in out[1].spans] == [(3, 12)]
    # doc 2: boilerplate at [0, 9)
    assert [(s.start, s.end) for s in out[2].spans] == [(0, 9)]
    assert out[3].spans == [] and out[3].repeated_token_frac == 0.0
    assert out[4].spans == []  # shorter than k: never flagged
    assert out[1].repeated_token_frac == pytest.approx(9 / 16)
    assert out[2].repeated_token_frac == pytest.approx(9 / 15)


def test_repeated_spans_distinct_docs_not_within_doc(spark):
    # the same 8-gram twice WITHIN one doc is df=1: not flagged
    # (min_df counts distinct documents, like Lee et al.'s cross-doc
    # duplication target)
    eight = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, f"{eight} x y z {eight}")], "doc_id long, text string")
    out = repeated_spans(docs, k=8, min_df=2).collect()[0]
    assert out.spans == []


def test_strip_repeated_spans_rebuilds_text(spark, docs):
    spans = repeated_spans(docs, k=8, min_df=2)
    got = {r.doc_id: r.text
           for r in strip_repeated_spans(docs, spans).collect()}
    assert got[1] == "unique alpha words more unique alpha tail"
    assert got[2] == "completely different body of text here"
    assert got[3].startswith("no shared content")
    assert got[4] == "tiny doc"


def test_strip_fully_repeated_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, BOILER), (2, BOILER)], "doc_id long, text string")
    spans = repeated_spans(docs, k=8, min_df=2)
    rows = strip_repeated_spans(docs, spans).collect()
    assert len(rows) == 2 and all(r.text == "" for r in rows)


def test_two_separate_spans_stay_separate(spark):
    s1 = "one two three four five six seven eight"
    s2 = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i + 1, f"{s1} FILLER-{i} {s2}") for i in range(2)]
        + [(9, "x " * 12)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in repeated_spans(docs, k=8, min_df=2).collect()}
    assert [(s.start, s.end) for s in out[1].spans] == [(0, 8), (9, 17)]
