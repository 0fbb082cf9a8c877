"""Deterministic dataset curation: train/val/test splits and
stratified sampling.

Training-data pipelines need reproducible, order-independent splits:
re-running the job on the same corpus (or on the corpus re-partitioned
1000 ways on a different cluster) must assign every document to the
same split. ``rand()`` and ``df.sample`` are seed-and-partitioning
dependent, so both operators here hash a caller-named id column
instead:

* ``split_assign`` — map-side only (no shuffle, no state): each row's
  split is a pure function of ``md5(id)``. At 100 TB this is a free
  column projection fused into whatever scan already runs.
* ``stratified_sample`` — exact k rows per stratum, chosen by the
  smallest ``md5(id)`` values within the stratum (a deterministic
  "random" order). One shuffle on the strata keys; the per-stratum
  top-k is a rank inside the same exchange. For web-scale strata
  (billions of rows per language) the hash-order top-k is the
  classic 2-phase pattern: map-side partial top-k per partition would
  bound the shuffle — Catalyst's WindowGroupLimit pushes the rank
  filter map-side automatically for rank <= k predicates.

MD5 (not xxhash64) so the DuckDB oracle mirrors bit-for-bit: both
engines produce the identical lowercase-hex digest, and a fixed-width
hex string compares lexicographically as the number it encodes.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^8 buckets from the first 8 hex chars: plenty of resolution for
# split fractions and small enough for exact integer math in both
# engines (DuckDB mirrors with the same substring -> int conversion).
_HEX_DIGITS = 8
_BUCKETS = 16 ** _HEX_DIGITS


def _hash_bucket(id_col: Column) -> Column:
    """Integer in [0, 16^8) from the md5 hex prefix of the id."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, _HEX_DIGITS),
                  16, 10).cast("long")


def split_bounds(weights: Dict[str, float]) -> list:
    """Cumulative bucket boundaries for the named splits, in sorted-name
    order: ``[(name, upper_bound_exclusive), ...]``; the last bound is
    ``_BUCKETS``. Shared by ``split_assign`` and its SQL oracle mirror
    so both engines draw the identical boundaries."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    names = sorted(weights)
    out, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        out.append((name, int(round(acc * _BUCKETS))))
    out.append((names[-1], _BUCKETS))
    return out


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: Dict[str, float],
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    Deterministic in the id alone — stable across runs, partitionings,
    and cluster sizes — and map-side only (the plan is a projection;
    no exchange, no RNG state). Weights need not sum to 1; they are
    normalized. Split names are assigned in sorted order so the
    boundaries themselves are reproducible.
    """
    bounds = split_bounds(weights)
    bucket = _hash_bucket(F.col(id_col))
    expr = None
    # CASE WHEN bucket < bound THEN name ... — the last split takes the
    # remainder so every bucket lands somewhere.
    for name, bound in bounds[:-1]:
        branch = bucket < F.lit(bound)
        expr = (F.when(branch, F.lit(name)) if expr is None
                else expr.when(branch, F.lit(name)))
    expr = (F.lit(bounds[-1][0]) if expr is None
            else expr.otherwise(F.lit(bounds[-1][0])))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    Rows are ranked inside each stratum by (md5(id), id) — a fixed
    pseudo-random order independent of input partitioning — and the
    top k are kept. The id tiebreak makes the sample well-defined even
    under (astronomically unlikely) digest collisions.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(*[F.col(c) for c in strata]).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
