"""Benchmark decontamination (operators/decontaminate.py): k-gram
overlap flagging against a held-out eval set."""

from extract_cbd_shape_spark.operators.decontaminate import (
    benchmark_overlap,
    decontaminate,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_flags_exact_and_partial_copies(spark):
    bench = _df(spark, [(1, "a b c d e f g h i j")])
    pool = _df(spark, [
        (10, "a b c d e f g h i j"),        # exact copy: 3 shared 8-grams
        (11, "x a b c d e f g h y"),        # one shared 8-gram (a..h)
        (12, "totally unrelated words with no overlap at all here"),
        (13, "a b c d e f g"),              # 7 tokens: too short to flag
    ])
    hits = {r.doc_id: r.n_hits for r in benchmark_overlap(pool, bench).collect()}
    assert hits == {10: 3, 11: 1}

    clean = {r.doc_id for r in decontaminate(pool, bench).collect()}
    assert clean == {12, 13}


def test_overlap_counts_distinct_grams_once(spark):
    # the same 8-gram appearing twice in a pool doc counts once
    bench = _df(spark, [(1, "a b c d e f g h")])
    pool = _df(spark, [(20, "a b c d e f g h z a b c d e f g h")])
    rows = benchmark_overlap(pool, bench).collect()
    assert [(r.doc_id, r.n_hits) for r in rows] == [(20, 1)]


def test_case_and_punctuation_normalized(spark):
    # tokenization is lower-cased alphanumeric: punctuation variants of
    # the same 8 tokens still collide
    bench = _df(spark, [(1, "The quick brown fox jumps over lazy dogs")])
    pool = _df(spark, [(30, "the QUICK, brown fox; jumps over (lazy) dogs!")])
    rows = benchmark_overlap(pool, bench).collect()
    assert [(r.doc_id, r.n_hits) for r in rows] == [(30, 1)]
