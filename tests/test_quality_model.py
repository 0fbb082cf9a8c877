"""Model-based quality scoring/training (operators/quality_model.py)."""

from pyspark.sql import functions as F

from extract_cbd_shape_spark.operators.quality_model import (
    score_documents,
    sigmoid,
    stand_in_weights,
    train_logreg,
)


def test_score_matches_manual_fold(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "")],
        "doc_id long, text string")
    w = stand_in_weights()
    out = {r.doc_id: (r.margin, r.keep)
           for r in score_documents(docs).collect()}
    import hashlib

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % len(w)

    want = 1.0 / 1024 + w[bucket("alpha")] * 2 + w[bucket("beta")]
    assert out[1][0] == want            # exact: all terms are k/1024
    assert out[1][1] == (want > 0)
    assert out[2][0] == 1.0 / 1024      # empty text -> bias only


def test_score_plan_is_map_only(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = score_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_train_logreg_separates_planted_labels(spark):
    rows = []
    for i in range(200):
        good = i % 2 == 0
        filler = f"tok{i % 7} tok{i % 13}"
        rows.append((i, 1 if good else 0,
                     ("excellent prose " if good else "spam junk ") + filler))
    docs = spark.createDataFrame(rows, "doc_id long, label int, text string")
    w, b = train_logreg(docs, "label", iters=40, lr=2.0)
    scored = score_documents(docs, weights=w, bias=b)
    acc = scored.filter(
        (F.col("label") == 1) == F.col("keep")).count() / 200
    assert acc >= 0.95, acc
    # and the probability view is calibrated in direction
    m_good = scored.filter("label = 1").agg(F.avg("margin")).first()[0]
    m_bad = scored.filter("label = 0").agg(F.avg("margin")).first()[0]
    assert sigmoid(m_good) > 0.5 > sigmoid(m_bad)
