"""Model-based document quality scoring and filtering.

The heuristic quality signals (functions/text.py::quality_score) are
rule-based; production corpora (CCNet, DCLM, FineWeb-Edu) additionally
run a LEARNED quality model over every document. This module provides
both halves as pure DataFrame programs:

- ``score_documents``: hashed-bag-of-tokens linear scorer. The margin
  ``bias + sum_t w[bucket(t)]`` needs NO feature vector: each token
  maps to its weight via an md5 bucket and a literal weight array
  (broadcast to every task as part of the plan), and ``F.aggregate``
  folds the sum JVM-side — zero shuffles, zero UDFs, one scan. At
  100 TB this is a map-only pass, exactly as cheap as the heuristic
  scorer.
- ``train_logreg``: distributed logistic-regression trainer (batch
  gradient descent). Feature rows ``(doc, bucket, count)`` are built
  once (one map-side-combinable aggregation) and cached; each
  iteration is two shuffles over that cached set (per-doc margin, then
  per-bucket gradient) plus a ``dim``-row collect — the classic
  data-parallel GD layout where the MODEL (dim ~ 2^8..2^20 weights)
  lives on the driver/broadcast and the DATA never leaves the cluster.

Exactness contract for the oracle: stand-in weights are rationals with
denominator 1024 and magnitude <= 10/1024, token counts are bounded
ints, so every partial sum in the margin fold is exactly representable
in a double — the fold order (Spark's array order vs DuckDB's
list_sum) cannot change the result bit-for-bit.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from extract_cbd_shape_spark.functions.text import tokens

DIM = 256


def _bucket(tok: Column, dim: int) -> Column:
    """md5-based feature hashing, reproducible in ANSI SQL:
    int(md5(token)[:8], 16) % dim."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim


def stand_in_weights(dim: int = DIM) -> List[float]:
    """Deterministic stand-in model (documented production swap: ship
    ``train_logreg`` output instead). Values are k/1024 with
    |k| <= 10 — see the module exactness contract."""
    return [(((j * 37 + 11) % 21) - 10) / 1024.0 for j in range(dim)]


STAND_IN_BIAS = 1.0 / 1024.0


def score_documents(
    docs: DataFrame,
    weights: Optional[List[float]] = None,
    bias: float = STAND_IN_BIAS,
    text_col: str = "text",
) -> DataFrame:
    """Append ``margin`` (linear score) and ``keep`` (margin > 0).

    Map-only: the weight vector rides the plan as an array literal
    (same mechanism as a broadcast for kilobyte-scale models) and the
    margin folds per row with ``F.aggregate``. No shuffle, no UDF —
    Catalyst keeps the whole pass in one WholeStageCodegen stage."""
    w = weights if weights is not None else stand_in_weights()
    warr = F.array(*[F.lit(float(x)) for x in w])
    toks = tokens(F.col(text_col))
    margin = F.aggregate(
        F.transform(
            toks,
            lambda t: F.element_at(
                warr, (_bucket(t, len(w)) + 1).cast("int")),
        ),
        F.lit(float(bias)),
        lambda acc, x: acc + x,
    )
    return docs.withColumn("margin", margin).withColumn(
        "keep", F.col("margin") > 0)


def hashed_feature_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: Optional[str] = None,
    dim: int = DIM,
) -> DataFrame:
    """(id, bucket, cnt[, label]) rows — the sparse design matrix in
    COO form. One explode + one map-side-combinable count aggregation;
    at corpus scale this is the only full shuffle the trainer pays, and
    it is paid ONCE (callers cache the result across iterations)."""
    keep = [id_col] + ([label_col] if label_col else [])
    ex = docs.select(
        *keep, F.explode(tokens(F.col(text_col))).alias("_tok")
    ).withColumn("bucket", _bucket(F.col("_tok"), dim))
    return ex.groupBy(*keep, "bucket").agg(
        F.count(F.lit(1)).alias("cnt"))


def train_logreg(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DIM,
    iters: int = 30,
    lr: float = 1.0,
) -> Tuple[List[float], float]:
    """Batch-GD logistic regression; returns (weights, bias).

    Per iteration: per-doc margin (one aggregation over the cached COO
    rows, weights joined in as a plan literal), per-bucket gradient
    (one aggregation of residual*cnt), one ``dim``-row collect. The
    label must be 0/1."""
    feats = hashed_feature_rows(
        docs, id_col=id_col, text_col=text_col, label_col=label_col,
        dim=dim).persist()
    n = feats.select(id_col).distinct().count()
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        warr = F.array(*[F.lit(x) for x in w])
        margins = feats.groupBy(id_col, label_col).agg(
            (F.lit(b) + F.sum(
                F.col("cnt") * F.element_at(
                    warr, (F.col("bucket") + 1).cast("int")))
             ).alias("_m"))
        resid = margins.select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m")))
             - F.col(label_col).cast("double")).alias("_r"))
        grad = (
            feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_r") * F.col("cnt")).alias("_g"))
            .collect()
        )
        gb = resid.agg(F.sum("_r")).collect()[0][0] or 0.0
        for row in grad:
            w[row["bucket"]] -= lr * row["_g"] / n
        b -= lr * gb / n
    feats.unpersist(blocking=False)
    return w, b


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
