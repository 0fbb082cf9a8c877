"""Decompose the zero-shuffle extraction's N->4N scaling gap by layer.

The pre-bucketed extraction (scan -> mapInArrow kernel -> count) measures
~0.5 efficiency from local[2] to local[8] while a bare Catalyst
shuffle-join on the same corpus measures ~0.82 (BENCH.md).  Everything
in the job is embarrassingly parallel, so SOME layer anti-scales.  This
harness times each layer separately at both levels, one fresh JVM per
cell (same methodology as tools/bench_scaling.py):

* scan      — parquet scan -> count, JVM only (no Python anywhere).
* arrow     — scan -> mapInArrow(pass-through batches) -> count: adds
              the JVM->Arrow->Python->Arrow->JVM boundary, no kernel.
* kernel    — the real extraction (local_bulk_extract_prebucketed).
* kernelnp  — the kernel body run OUTSIDE Spark: buckets pre-exported
              to Arrow record batches in RAM, then a multiprocessing
              pool runs _vec_extract_bucket per bucket.  Scaling of the
              numpy work itself with zero Spark involvement.

Usage: python tools/profile_local_scaling.py [sf_dir] [lo] [hi] [layer...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 2
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 8
ONLY = set(sys.argv[4:])
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "16"))

RUNNER = r'''
import json, shutil, sys, tempfile, time
sys.path.insert(0, REPO_PATH)


def _np_run_file(path):
    import time as _t
    import pyarrow.parquet as pq
    batches = pq.read_table(path).to_batches()
    t0 = _t.time()
    n = 0
    for rb in _NP_RUNNER(iter(batches)):
        n += rb.num_rows
    return _t.time() - t0, n


layer = sys.argv[1]; cpus = int(sys.argv[2]); sf_dir = sys.argv[3]
replicate = int(sys.argv[4])
from bench import build_spark
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
from extract_cbd_shape_spark.operators.kgtriples import (
    kbo_members, with_store_key, KBO_SHAPE_TTL, KBO_SHAPE_IRI)
from extract_cbd_shape_spark.operators.local_extract import (
    local_bulk_extract_prebucketed, materialize_store, read_store)
from extract_cbd_shape_spark.rdf import parse_trig
from extract_cbd_shape_spark.shapes import ShapesGraph
from extract_cbd_shape_spark.model import Term, IRI
import os as _os

shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
shape = Term(IRI, KBO_SHAPE_IRI)
work = tempfile.mkdtemp(
    prefix="proflo_", dir="/dev/shm" if _os.path.isdir("/dev/shm") else None)
tl, ml = kbo_members(spark, sf_dir, replicate=replicate)
tl, ml = with_store_key(tl, ml)
store_path = materialize_store(tl, ml, work + "/store", n_buckets=256)
st = read_store(spark, store_path)

if layer == "scan":
    st.count()  # warm
    t0 = time.time()
    n = st.count()
    out = dict(sec=time.time() - t0, units=n)
elif layer == "arrow":
    def passthru(it):
        for b in it:
            yield b
    st.limit(10).mapInArrow(passthru, st.schema).count()  # warm
    t0 = time.time()
    n = st.mapInArrow(passthru, st.schema).count()
    out = dict(sec=time.time() - t0, units=n)
elif layer == "kernel":
    wt, wm = kbo_members(spark, "/root/testdata/sf0.001")
    wt, wm = with_store_key(wt, wm)
    wst = read_store(spark, materialize_store(wt, wm, work + "/wstore"))
    local_bulk_extract_prebucketed(
        wst, shapes_graph=shapes, shape=shape).count()  # warm
    t0 = time.time()
    n = local_bulk_extract_prebucketed(
        st, shapes_graph=shapes, shape=shape).count()
    out = dict(sec=time.time() - t0, units=n)
elif layer == "kernelnp":
    # Export every bucket to Arrow tables in RAM (untimed), then run the
    # kernel body in a multiprocessing pool — no Spark in the timed
    # region.  Uses the same per-bucket entry the Spark runner calls.
    import glob
    import multiprocessing as mp
    files = sorted(glob.glob(store_path + "/*.parquet")) or sorted(
        glob.glob(store_path + "/**/*.parquet", recursive=True))
    spark.stop()
    global _NP_RUNNER
    from extract_cbd_shape_spark.operators import local_extract as lx
    vec_plan = lx.compile_single_hop_links(shapes, shape)
    _NP_RUNNER = lx._make_runner(
        vec_plan, shapes, shape, (), True, False, "store_key", False,
        lx.OUT_COLS)
    with mp.Pool(min(cpus, len(files))) as pool:
        t0 = time.time()
        res = pool.map(_np_run_file, files)
        wall = time.time() - t0
    out = dict(sec=wall, units=sum(r[1] for r in res),
               cpu_sec=round(sum(r[0] for r in res), 2), files=len(files))
else:
    raise SystemExit("unknown layer " + layer)
shutil.rmtree(work, ignore_errors=True)
print("RESULT " + json.dumps(out))
'''


def run(layer: str, cpus: int) -> dict:
    code = "REPO_PATH = " + repr(REPO) + "\n" + RUNNER
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out = subprocess.run(
        [sys.executable, "-c", code, layer, str(cpus), SF_DIR,
         str(REPLICATE)],
        capture_output=True, text=True, timeout=3600, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT for {layer}@{cpus}: "
                       f"{out.stdout[-1500:]} {out.stderr[-1500:]}")


LAYER_LABELS = {
    "scan": "parquet scan -> count (JVM only, no Python)",
    "arrow": "scan -> mapInArrow pass-through -> count (adds the "
             "JVM<->Arrow<->Python boundary, no kernel)",
    "kernel": "full extraction (scan -> Arrow -> CSR kernel -> Arrow -> "
              "count)",
    "kernelnp": "kernel body alone, multiprocessing pool over bucket "
                "files, ZERO Spark (pyarrow read untimed)",
}


def main():
    layers = ["scan", "arrow", "kernel", "kernelnp"]
    if ONLY:
        layers = [l for l in layers if l in ONLY]
    rows = []
    for layer in layers:
        lo = run(layer, LO)
        hi = run(layer, HI)
        eff = (hi["units"] / hi["sec"]) / (lo["units"] / lo["sec"]) / (HI / LO)
        print(f"{layer:9s} lo={lo['sec']:7.1f}s hi={hi['sec']:7.1f}s "
              f"eff={eff:.2f}  {json.dumps(dict(lo=lo, hi=hi))}",
              flush=True)
        rows.append((layer, lo, hi, eff))
    if not ONLY:
        table = "\n".join(
            f"| {layer} — {LAYER_LABELS[layer]} | {lo['sec']:.1f}s "
            f"| {hi['sec']:.1f}s | {eff:.2f} |"
            for layer, lo, hi, eff in rows)
        with open(os.path.join(REPO, "BENCH_LAYERS.md"), "w") as f:
            f.write(f"""# BENCH_LAYERS — zero-shuffle extraction, scaling by layer

Decomposition of the pre-bucketed extraction's local[{LO}] -> local[{HI}]
scaling: each layer timed separately, one fresh JVM per cell
(methodology of tools/bench_scaling.py), corpus {SF_DIR} x{REPLICATE}.

| layer | local[{LO}] | local[{HI}] | efficiency |
|---|---|---|---|
{table}

Reading: the extraction's own numpy work (kernelnp) is embarrassingly
parallel and scales near-perfectly as independent OS processes; what
anti-scales in-JVM is the JVM->Arrow->Python boundary (arrow row) —
double-materializing every quad through the IPC pipe is
memory-bandwidth-bound on this single-socket box and serializes in the
single local-mode JVM. That measurement motivated the file-manifest
scan path (`local_bulk_extract_files` / `extract_store_files_to_store`):
tasks read their complete bucket parquet files directly with pyarrow
inside the Python worker (and, sink-fused, write output parquet there
too), so the JVM never touches quad bytes — Spark schedules, retries,
and tracks lineage only. See BENCH.md for the resulting rows.
""")


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
