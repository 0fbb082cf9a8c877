"""Incremental KG construction with Structured Streaming.

The reference is batch-per-page (LDES pages are pulled, not pushed;
SURVEY.md §2.2 "Streaming: none"), so this module is pipeline
infrastructure, not reference parity: new page files landing in a
corpus directory are ingested incrementally —

    readStream(parquet pages dir)
      -> vectorized page->triples extraction (same mapInPandas op the
         batch path uses; Structured Streaming runs it per micro-batch)
      -> foreachBatch append into the snapshot-manifest table contract
         (sinks/materialize.py), one snapshot per micro-batch, with the
         stream checkpoint providing exactly-once batch replay and the
         manifest recording stream epoch lineage.

``Trigger.AvailableNow`` (availableNow=True) drains everything present
and stops — the "incremental re-run over new page partitions" mode from
SURVEY.md §2.2. A long-lived trigger works identically at cluster scale;
``maxFilesPerTrigger`` bounds micro-batch size so executor memory is
sized by config, not corpus size.

``streaming_page_metrics`` shows the watermark + windowed-aggregation
path (late pages beyond the watermark are dropped, state is bounded).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extract_cbd_shape_spark.sinks.materialize import (
    latest_manifest,
    materialize_table,
)
from extract_cbd_shape_spark.sources.pages import extract_page_triples

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    """Streaming DataFrame over a directory of page parquet files."""
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_dir)


def stream_pages_to_triples(
    spark: SparkSession,
    pages_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """Incrementally extract triples from new page files into the
    snapshot table at ``table_path``. Exactly-once: the stream
    checkpoint dedups input files across restarts, and a replayed
    micro-batch (crash between sink write and checkpoint commit) is
    detected by its ``stream-epoch-N`` stage name in the latest
    manifest and skipped. Returns the finished StreamingQuery."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        stage = f"stream-epoch-{batch_id}"
        m = latest_manifest(table_path)
        if m is not None and m["stage"] == stage:
            return  # replayed batch, already committed
        triples = extract_page_triples(batch_df)
        materialize_table(triples, table_path, stage)

    stream = pages_stream(spark, pages_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def streaming_page_metrics(pages: DataFrame, watermark: str = "1 hour",
                           window: str = "1 hour") -> DataFrame:
    """Per-(event-time window, lang) page counts with a watermark:
    late pages beyond ``watermark`` are dropped and aggregation state
    is evicted — bounded state at unbounded corpus size."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "lang", "n_pages", "n_chars",
        )
    )
