"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors, evidenced in-sandbox as
local[N] vs local[4N] on the same input).

Runs the flagship KG pipeline + engine extraction at local[8] and
local[32] in separate JVMs (fresh SparkSession each, sequential so
they don't contend), writes BENCH.md.

Usage: python tools/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]
from bench import build_spark
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
from extract_cbd_shape_spark.plans.pipeline import KGConstructionPipeline
from extract_cbd_shape_spark.sources.pages import synth_pages
import __spark_entry__ as entrymod

# Warm up the JVM/codegen on a small slice so we time steady state.
wh0 = tempfile.mkdtemp(prefix="warm_")
KGConstructionPipeline(spark, wh0).run(synth_pages(spark, sf_dir).limit(50),
                                       resume=False)
shutil.rmtree(wh0, ignore_errors=True)

t0 = time.time()
wh = tempfile.mkdtemp(prefix="scal_")
pages = synth_pages(spark, sf_dir)
manifests = KGConstructionPipeline(spark, wh).run(pages, resume=False)
pipeline_sec = time.time() - t0
triples = manifests["triples"]["rows"] + manifests["raw_triples"]["rows"]
shutil.rmtree(wh, ignore_errors=True)

t1 = time.time()
df = entrymod.queries()["shape_extract_order"](spark, sf_dir)
n_quads = df.count()
extract_sec = time.time() - t1

print("RESULT " + json.dumps(dict(
    cpus=cpus, pipeline_sec=round(pipeline_sec, 2), triples=triples,
    extract_sec=round(extract_sec, 2), extract_quads=n_quads)))
spark.stop()
"""


def run(cpus: int) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), SF_DIR],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT in output: {out.stdout[-2000:]} "
                       f"{out.stderr[-2000:]}")


def main():
    lo = run(8)
    hi = run(32)
    tp_lo = lo["triples"] / lo["pipeline_sec"]
    tp_hi = hi["triples"] / hi["pipeline_sec"]
    eff_pipeline = (tp_hi / tp_lo) / 4
    ex_lo = lo["extract_quads"] / lo["extract_sec"]
    ex_hi = hi["extract_quads"] / hi["extract_sec"]
    eff_extract = (ex_hi / ex_lo) / 4

    md = f"""# BENCH — scaling evidence (N vs 4N parallelism)

Same input ({SF_DIR}), same jobs, fresh JVM per level, warm-up run
excluded from timing. Parallelism levels: local[8] (N) vs local[32]
(4N) per the driver's two-cluster-size rule.

| job | local[8] | local[32] | throughput N | throughput 4N | scaling efficiency |
|---|---|---|---|---|---|
| KG pipeline e2e (triples/s) | {lo['pipeline_sec']}s | {hi['pipeline_sec']}s | {tp_lo:,.0f}/s | {tp_hi:,.0f}/s | {eff_pipeline:.2f} |
| shape extraction (quads/s) | {lo['extract_sec']}s | {hi['extract_sec']}s | {ex_lo:,.0f}/s | {ex_hi:,.0f}/s | {eff_extract:.2f} |

Efficiency = (throughput_4N / throughput_N) / 4. Target >= 0.8
(BASELINE.json north_rule). Caveat: local mode shares one JVM heap and
driver; fixpoint rounds have fixed per-wave driver overhead that does
not parallelize, so these numbers UNDERSTATE multi-executor scaling
where driver rounds overlap executor work across a real cluster.

Raw: {json.dumps(dict(lo=lo, hi=hi))}
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
