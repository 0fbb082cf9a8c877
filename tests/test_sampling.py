"""Deterministic split / stratified-sample operators
(operators/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from extract_cbd_shape_spark.operators.sampling import (
    _BUCKETS,
    split_assign,
    split_bounds,
    stratified_sample,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark, n=400, parts=1):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    ).repartition(parts)


def _expected_split(doc_id: int) -> str:
    bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    for name, bound in split_bounds(WEIGHTS):
        if bucket < bound:
            return name
    raise AssertionError


def test_split_bounds_cover_space():
    bounds = split_bounds(WEIGHTS)
    assert [n for n, _ in bounds] == ["test", "train", "val"]
    assert bounds[-1][1] == _BUCKETS
    assert all(b1 < b2 for (_, b1), (_, b2) in zip(bounds, bounds[1:]))


def test_split_assign_matches_reference_hash(spark):
    rows = split_assign(_docs(spark, 200), "doc_id", WEIGHTS).collect()
    assert len(rows) == 200
    for r in rows:
        assert r.split == _expected_split(r.doc_id)


def test_split_assign_stable_under_repartition(spark):
    a = {(r.doc_id, r.split)
         for r in split_assign(_docs(spark, 300, parts=1), "doc_id",
                               WEIGHTS).collect()}
    b = {(r.doc_id, r.split)
         for r in split_assign(_docs(spark, 300, parts=7), "doc_id",
                               WEIGHTS).collect()}
    assert a == b


def test_split_assign_proportions(spark):
    counts = dict(
        split_assign(_docs(spark, 4000), "doc_id", WEIGHTS)
        .groupBy("split").count().collect()
    )
    n = sum(counts.values())
    assert n == 4000
    # md5 is uniform: 3-sigma binomial tolerance at n=4000
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.015
    assert abs(counts["test"] / n - 0.1) < 0.015


def test_split_assign_is_map_side_only(spark):
    plan = split_assign(
        _docs(spark, 10), "doc_id", WEIGHTS
    )._jdf.queryExecution().executedPlan().toString()
    # the operator itself adds no exchange (the fixture repartition is
    # the only one in the plan)
    assert plan.count("Exchange") <= 1


def test_split_assign_validates_weights(spark):
    with pytest.raises(ValueError):
        split_assign(_docs(spark, 5), "doc_id", {})
    with pytest.raises(ValueError):
        split_assign(_docs(spark, 5), "doc_id", {"a": 0.0})


def test_stratified_sample_exact_k_per_stratum(spark):
    out = stratified_sample(_docs(spark, 300), ["lang"], 7, "doc_id")
    counts = dict(out.groupBy("lang").count().collect())
    assert counts == {"0": 7, "1": 7, "2": 7}


def test_stratified_sample_small_stratum_returns_all(spark):
    out = stratified_sample(_docs(spark, 4), ["lang"], 10, "doc_id")
    assert out.count() == 4


def test_stratified_sample_deterministic(spark):
    pick = lambda parts: sorted(
        (r.lang, r.doc_id)
        for r in stratified_sample(
            _docs(spark, 300, parts=parts), ["lang"], 5, "doc_id"
        ).collect()
    )
    assert pick(1) == pick(5)
    # matches the reference ordering: smallest md5 hex per stratum
    by_lang = {}
    for i in range(300):
        by_lang.setdefault(str(i % 3), []).append(
            (hashlib.md5(str(i).encode()).hexdigest(), i)
        )
    expected = sorted(
        (lang, i)
        for lang, xs in by_lang.items()
        for _, i in sorted(xs)[:5]
    )
    assert pick(1) == expected


def test_stratified_sample_validates_k(spark):
    with pytest.raises(ValueError):
        stratified_sample(_docs(spark, 5), ["lang"], 0, "doc_id")
