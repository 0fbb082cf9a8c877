"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors, evidenced in-sandbox as
local[N] vs local[4N] on the same input).

Jobs are sized so executor work dominates fixed per-wave driver
overhead (which a real cluster overlaps, but a single local JVM
serializes):

* kbo_extract — bulk shape-guided extraction of every member of the
  KBO-style corpus (orders rows at the sf; 150k members / 2.1M quads
  at sf0.1): the reference's perf scenario generalized.
* kg_pipeline — the end-to-end KG construction pipeline over a
  replicated pages corpus (REPLICATE deterministic disjoint copies of
  the sf documents).

Each level runs in a fresh JVM (sequential, no contention), with a
small warm-up first so codegen/JIT is out of the timing.

Usage: python tools/bench_scaling.py [sf_dir] [lo_cpus] [hi_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 32
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "16"))

RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicate = int(sys.argv[3])
from bench import build_spark
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
from extract_cbd_shape_spark.plans.pipeline import KGConstructionPipeline
from extract_cbd_shape_spark.sources.pages import synth_pages
from extract_cbd_shape_spark.operators.kgtriples import (
    kbo_members, KBO_SHAPE_TTL, KBO_SHAPE_IRI)
from extract_cbd_shape_spark.operators import BulkCBDShapeExtractor
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import ShapesGraph
from extract_cbd_shape_spark.model import Term, IRI

# Warm-up: JVM/codegen on a small slice, excluded from timing.
shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
wt, wm = kbo_members(spark, "/root/testdata/sf0.001")
BulkCBDShapeExtractor(spark, shapes_graph=shapes).extract(
    wt, wm, shape=Term(IRI, KBO_SHAPE_IRI))[0].count()
wh0 = tempfile.mkdtemp(prefix="warm_")
KGConstructionPipeline(spark, wh0).run(
    synth_pages(spark, sf_dir).limit(50), resume=False)
shutil.rmtree(wh0, ignore_errors=True)

t0 = time.time()
triples, members = kbo_members(spark, sf_dir)
ex = BulkCBDShapeExtractor(spark, shapes_graph=shapes)
results, _ = ex.extract(triples, members, shape=Term(IRI, KBO_SHAPE_IRI))
extract_quads = results.count()
extract_sec = time.time() - t0

# Store-local fast path: same extraction, applyInPandas per store.
from extract_cbd_shape_spark.operators.local_extract import local_bulk_extract
from pyspark.sql import functions as F
t2_, m2_ = kbo_members(spark, sf_dir)
tl = t2_.withColumn("store_key", F.split(F.col("subject"), ":")[1])
ml = m2_.withColumn("store_key", F.split(F.col("entity"), ":")[1])
local_bulk_extract(tl.limit(500), ml.limit(50), shapes_graph=shapes,
                   shape=Term(IRI, KBO_SHAPE_IRI)).count()  # warm
tloc = time.time()
local_quads = local_bulk_extract(
    tl, ml, shapes_graph=shapes, shape=Term(IRI, KBO_SHAPE_IRI)).count()
local_sec = time.time() - tloc

t1 = time.time()
wh = tempfile.mkdtemp(prefix="scal_")
pages = synth_pages(spark, sf_dir, replicate=replicate)
manifests = KGConstructionPipeline(spark, wh).run(pages, resume=False)
pipeline_sec = time.time() - t1
triples_n = manifests["triples"]["rows"] + manifests["raw_triples"]["rows"]
shutil.rmtree(wh, ignore_errors=True)

# MinHash-LSH dedup over the replicated corpus (CPU-bound md5/shuffle).
from extract_cbd_shape_spark.operators.dedup import minhash_lsh_dups
from pyspark.sql import functions as F
# Each copy gets a distinguishing prefix token (so copies are NOT
# cross-copy duplicates) plus one exact duplicate within the copy —
# candidate pairs stay linear in corpus size, as in a real corpus.
docs = spark.read.parquet(sf_dir + "/documents.parquet").select("doc_id", "text")
parts = []
for i in range(replicate):
    di = docs.select(
        (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
        F.concat(F.lit("c%d " % i), F.col("text")).alias("text"))
    parts.append(di)
    parts.append(di.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
corpus = parts[0]
for p_ in parts[1:]:
    corpus = corpus.unionByName(p_)
minhash_lsh_dups(corpus.limit(200), threshold=0.5).count()  # warm
t2 = time.time()
minhash_pairs = minhash_lsh_dups(corpus, threshold=0.5).count()
minhash_docs = 2 * replicate * docs.count()
minhash_sec = time.time() - t2

print("RESULT " + json.dumps(dict(
    cpus=cpus, pipeline_sec=round(pipeline_sec, 2), triples=triples_n,
    extract_sec=round(extract_sec, 2), extract_quads=extract_quads,
    local_sec=round(local_sec, 2), local_quads=local_quads,
    minhash_sec=round(minhash_sec, 2), minhash_docs=minhash_docs,
    minhash_pairs=minhash_pairs)))
spark.stop()
"""


def run(cpus: int) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), SF_DIR, str(REPLICATE)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT in output: {out.stdout[-2000:]} "
                       f"{out.stderr[-2000:]}")


def main():
    lo = run(LO)
    hi = run(HI)
    ratio = HI / LO
    ex_lo = lo["extract_quads"] / lo["extract_sec"]
    ex_hi = hi["extract_quads"] / hi["extract_sec"]
    eff_extract = (ex_hi / ex_lo) / ratio
    tp_lo = lo["triples"] / lo["pipeline_sec"]
    tp_hi = hi["triples"] / hi["pipeline_sec"]
    eff_pipeline = (tp_hi / tp_lo) / ratio
    lx_lo = lo["local_quads"] / lo["local_sec"]
    lx_hi = hi["local_quads"] / hi["local_sec"]
    eff_local = (lx_hi / lx_lo) / ratio
    mh_lo = lo["minhash_docs"] / lo["minhash_sec"]
    mh_hi = hi["minhash_docs"] / hi["minhash_sec"]
    eff_minhash = (mh_hi / mh_lo) / ratio

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Same input ({SF_DIR}, pipeline corpus replicated x{REPLICATE}), same
jobs, fresh JVM per level, warm-up excluded from timing. Parallelism
levels: local[{LO}] (N) vs local[{HI}] (4N) per the driver's
two-cluster-size rule.

| job | local[{LO}] | local[{HI}] | throughput N | throughput 4N | scaling efficiency |
|---|---|---|---|---|---|
| bulk shape extraction (quads/s) | {lo['extract_sec']}s | {hi['extract_sec']}s | {ex_lo:,.0f}/s | {ex_hi:,.0f}/s | {eff_extract:.2f} |
| store-local extraction (quads/s) | {lo['local_sec']}s | {hi['local_sec']}s | {lx_lo:,.0f}/s | {lx_hi:,.0f}/s | {eff_local:.2f} |
| KG pipeline e2e (triples/s) | {lo['pipeline_sec']}s | {hi['pipeline_sec']}s | {tp_lo:,.0f}/s | {tp_hi:,.0f}/s | {eff_pipeline:.2f} |
| MinHash-LSH dedup (docs/s) | {lo['minhash_sec']}s | {hi['minhash_sec']}s | {mh_lo:,.0f}/s | {mh_hi:,.0f}/s | {eff_minhash:.2f} |

Efficiency = (throughput_4N / throughput_N) / {ratio:.0f}. Target >= 0.8
(BASELINE.json north_rule). Caveat: local mode shares one JVM heap,
GC, and driver thread across all cores; fixpoint rounds have fixed
per-wave driver overhead that does not parallelize, so these numbers
UNDERSTATE multi-executor scaling on a real cluster where driver
coordination overlaps executor work and each executor has its own heap.

Raw: {json.dumps(dict(lo=lo, hi=hi, replicate=REPLICATE))}
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
