"""Distributed PageRank (operators/rank.py) against an exact
power-iteration computed with plain Python floats."""

import pytest
from pyspark.sql import functions as F

from extract_cbd_shape_spark.operators.rank import pagerank


def _exact(edges, iterations=20, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iterations):
        dangling = sum(r[x] for x in nodes if x not in out)
        nxt = {x: (1 - d) / n + d * dangling / n for x in nodes}
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * r[u] / len(vs)
        r = nxt
    return r


EDGES = [
    ("a", "b"), ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),          # d has no inlinks
    ("e", "e"),          # self-loop component
    ("f", "g"),          # g is dangling (no out-edges)
]


def test_pagerank_matches_exact_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=20).collect()}
    want = _exact(EDGES, iterations=20)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_hub_ranks_highest(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=20).collect()}
    # c receives links from a, b, d -> highest rank of the a/b/c/d part
    assert got["c"] > got["a"] > got["b"] > got["d"]


def test_pagerank_parallel_edges_carry_multiplicity(spark):
    simple = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string")
    doubled = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], "src string, dst string")
    r1 = {r.node: r.rank for r in pagerank(simple, iterations=5).collect()}
    r2 = {r.node: r.rank for r in pagerank(doubled, iterations=5).collect()}
    assert r2["b"] > r1["b"]


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iterations=3).count() == 0


def test_pagerank_one_action_per_round(spark, monkeypatch):
    """The dangling-mass scalar rides the round's one job (the
    localCheckpoint): no per-iteration .first()/.collect() driver
    round-trip remains (VERDICT r4 #7)."""
    try:
        import pyspark.sql.classic.dataframe as dfm
    except ImportError:  # pragma: no cover - older pyspark
        import pyspark.sql.dataframe as dfm

    calls = {"first": 0, "collect": 0, "localCheckpoint": 0}
    for name in calls:
        orig = getattr(dfm.DataFrame, name)

        def wrapped(self, *a, _orig=orig, _name=name, **kw):
            calls[_name] += 1
            return _orig(self, *a, **kw)

        monkeypatch.setattr(dfm.DataFrame, name, wrapped)

    df = spark.createDataFrame(EDGES, "src string, dst string")
    iters = 7
    pagerank(df, iterations=iters)
    # setup: nodes + contribs + initial ranks checkpoints, then exactly
    # one checkpoint per iteration — and zero scalar collections.
    assert calls["first"] == 0
    assert calls["collect"] == 0
    assert calls["localCheckpoint"] == 3 + iters
