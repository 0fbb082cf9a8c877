"""Sequence packing for LLM pretraining (concat-and-chunk offsets).

Standard pretraining packing concatenates every document's tokens in a
fixed global order and cuts the stream every ``seq_len`` tokens. The
per-document piece of that layout is a prefix sum: doc i's tokens
occupy ``[tok_start, tok_end)`` where ``tok_start = sum of weights of
all docs ordered before it``. Which training sequences a document
lands in is then pure arithmetic on the offsets.

A naive Spark window ``SUM() OVER (ORDER BY id)`` computes this on ONE
partition — a non-starter at corpus scale. This module runs the
classic two-phase distributed scan instead:

1. range-bucket rows by the order key (bucket bounds from one tiny
   max() aggregate — a bounded driver scalar, same class as manifest
   stats);
2. within-bucket running sum — one hash shuffle, window per bucket;
3. per-bucket totals -> exclusive bucket offsets (n_buckets rows,
   prefix-summed driver-side) broadcast-joined back.

Total cost: one shuffle of (id, weight) pairs — the text itself never
moves — plus a broadcast of n_buckets rows. Deterministic: offsets
depend only on (order key, weight), never on physical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def pack_offsets(df: DataFrame, id_col: str = "doc_id",
                 weight_col: str = "n_tokens",
                 n_buckets: int = 64) -> DataFrame:
    """(id, weight, tok_start, tok_end) under concat order ``id``.

    ``id_col`` must be unique non-negative integers (a doc id / row
    number); ``weight_col`` a non-negative integer token count.
    """
    hi = df.agg(F.max(id_col).alias("m")).collect()[0]["m"]
    if hi is None:
        return df.select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            F.lit(0).cast("long").alias("tok_start"),
            F.lit(0).cast("long").alias("tok_end"),
        ).limit(0)
    # Integer bucket width avoids id*n_buckets overflow at 1e12 ids.
    width = max(1, (int(hi) + n_buckets) // n_buckets)
    bucketed = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        (F.col(id_col) / width).cast("long").alias("_bkt"),
    )
    # Phase 1+2 share one exchange: the window's hash partitioning on
    # _bkt also serves the per-bucket totals aggregation.
    w = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.withColumn("_cum", F.sum("weight").over(w))
    totals = [
        (r["_bkt"], r["t"])
        for r in bucketed.groupBy("_bkt")
        .agg(F.sum("weight").alias("t"))
        .collect()
    ]
    # Exclusive prefix over <= n_buckets rows: driver-side by design.
    totals.sort()
    offsets, run = [], 0
    for bkt, tot in totals:
        offsets.append((bkt, run))
        run += int(tot)
    off_df = df.sparkSession.createDataFrame(
        offsets, schema=f"_bkt long, _off long"
    )
    return (
        cum.join(broadcast(off_df), "_bkt")
        .select(
            F.col(id_col),
            F.col("weight"),
            (F.col("_off") + F.col("_cum") - F.col("weight"))
            .alias("tok_start"),
            (F.col("_off") + F.col("_cum")).alias("tok_end"),
        )
    )


def pack_sequences(offsets: DataFrame, seq_len: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Adds the training-sequence span per document: ``first_seq`` /
    ``last_seq`` (ids of the fixed-length sequences the document's
    tokens fall into) and ``n_seqs``. Zero-weight documents contribute
    no tokens and get a null span."""
    nonzero = F.col("weight") > 0
    first = F.floor(F.col("tok_start") / seq_len)
    last = F.floor((F.col("tok_end") - 1) / seq_len)
    return offsets.select(
        F.col(id_col),
        F.col("weight"),
        F.col("tok_start"),
        F.col("tok_end"),
        F.when(nonzero, first).cast("long").alias("first_seq"),
        F.when(nonzero, last).cast("long").alias("last_seq"),
        F.when(nonzero, last - first + 1)
        .otherwise(0).cast("long").alias("n_seqs"),
    )
