"""Incremental (Structured Streaming) ingestion: exactly-once snapshot
commits per micro-batch, and watermarked windowed aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from extract_cbd_shape_spark.sinks.materialize import (
    latest_manifest,
    read_latest_snapshot,
)
from extract_cbd_shape_spark.sources.pages import synth_pages
from extract_cbd_shape_spark.streaming import (
    pages_stream,
    stream_pages_to_triples,
    streaming_page_metrics,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def waves(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    pages = synth_pages(spark, SF).cache()
    w1 = pages.filter(F.col("url").endswith("0"))
    w2 = pages.filter(~F.col("url").endswith("0"))
    return root, pages, w1, w2


def _total_rows(spark, table):
    df = read_latest_snapshot(spark, table)
    # table accumulates one snapshot per micro-batch; sum all of them
    snaps = sorted(
        d for d in os.listdir(table) if d.startswith("snap-")
    )
    n = 0
    for s in snaps:
        n += spark.read.parquet(os.path.join(table, s, "data")).count()
    return n, df


def test_incremental_exactly_once(spark, waves):
    root, pages, w1, w2 = waves
    pages_dir = str(root / "pages")
    table = str(root / "triples_table")
    ckpt = str(root / "ckpt")

    w1.write.mode("append").parquet(pages_dir)
    stream_pages_to_triples(spark, pages_dir, table, ckpt)
    n1, _ = _total_rows(spark, table)
    from extract_cbd_shape_spark.sources.pages import extract_page_triples
    expect1 = extract_page_triples(w1).count()
    assert n1 == expect1

    # second wave: only new files are processed on re-run
    w2.write.mode("append").parquet(pages_dir)
    stream_pages_to_triples(spark, pages_dir, table, ckpt)
    n2, _ = _total_rows(spark, table)
    expect_all = extract_page_triples(pages).count()
    assert n2 == expect_all

    # a third run with nothing new must commit nothing
    stream_pages_to_triples(spark, pages_dir, table, ckpt)
    n3, _ = _total_rows(spark, table)
    assert n3 == expect_all

    m = latest_manifest(table)
    assert m["stage"].startswith("stream-epoch-")


def test_windowed_metrics_with_watermark(spark, waves):
    root, pages, w1, _ = waves
    pages_dir = str(root / "pages")  # written by previous test
    stream = pages_stream(spark, pages_dir)
    agg = streaming_page_metrics(stream, watermark="1 hour", window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("page_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.lang): r.n_pages
        for r in spark.sql("SELECT * FROM page_metrics").collect()
    }
    want = {
        (r.window_start, r.lang): r.n_pages
        for r in (
            pages.groupBy(
                F.window("warc_ts", "1 hour").alias("w"), "lang"
            )
            .agg(F.count("*").alias("n_pages"))
            .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
            .collect()
        )
    }
    assert got == want
