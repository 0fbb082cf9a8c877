"""Profile the global fixpoint engine's eager actions.

Wraps DataFrame.localCheckpoint / isEmpty / count with timers keyed by
the engine source line that issued them, runs kbo_bulk_extract at the
given sf/parallelism, and prints a per-call-site time table. This is
how we find driver-serialized time (the t = F + W/c fixed term that
caps local-mode scaling efficiency).

Usage: python tools/profile_global.py [sf_dir] [cpus] [replicate]
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 1
BULK = os.environ.get("PROFILE_BULK", "0") == "1"  # match bench_scaling's bulk=True
DISTINCT = os.environ.get("PROFILE_DISTINCT", "0") == "1"  # store_distinct contract
MATERIALIZE_INPUT = os.environ.get("PROFILE_MAT_INPUT", "0") == "1"

try:  # PySpark 4: concrete methods live on the classic subclass
    import pyspark.sql.classic.dataframe as dfm
except ImportError:
    import pyspark.sql.dataframe as dfm

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        if "extract_cbd_shape_spark" in fr.filename:
            return f"{os.path.basename(fr.filename)}:{fr.lineno}"
    return "other"


def _wrap(name):
    orig = getattr(dfm.DataFrame, name)

    def timed(self, *a, **kw):
        t0 = time.time()
        out = orig(self, *a, **kw)
        dt = time.time() - t0
        key = f"{name} @ {_site()}"
        TIMES[key] += dt
        COUNTS[key] += 1
        return out

    setattr(dfm.DataFrame, name, timed)


for _n in ("localCheckpoint", "isEmpty", "count", "collect"):
    _wrap(_n)

from bench import build_spark

spark = build_spark(CPUS)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from extract_cbd_shape_spark.model import IRI, Term  # noqa: E402
from extract_cbd_shape_spark.operators import BulkCBDShapeExtractor  # noqa: E402
from extract_cbd_shape_spark.operators.kgtriples import (  # noqa: E402
    KBO_SHAPE_IRI,
    KBO_SHAPE_TTL,
    kbo_members,
)
from extract_cbd_shape_spark.rdf import parse_trig  # noqa: E402
from extract_cbd_shape_spark.shapes import ShapesGraph  # noqa: E402

shapes = ShapesGraph.from_quads(parse_trig(KBO_SHAPE_TTL))
shape = Term(IRI, KBO_SHAPE_IRI)

# warm
wt, wm = kbo_members(spark, "/root/testdata/sf0.001")
ex = BulkCBDShapeExtractor(spark, shapes_graph=shapes, store_distinct=DISTINCT)
ex.extract(wt, wm, shape=shape, bulk=BULK)[0].count()
TIMES.clear()
COUNTS.clear()

triples, members = kbo_members(spark, SF_DIR, replicate=REP) if REP > 1 else kbo_members(spark, SF_DIR)
if MATERIALIZE_INPUT:
    # bench_scaling reads its input from materialized parquet (tmpfs);
    # mirror that so profiles decompose the same job.
    import tempfile

    _work = tempfile.mkdtemp(
        prefix="prof_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    triples.write.mode("overwrite").parquet(_work + "/t")
    members.write.mode("overwrite").parquet(_work + "/m")
    triples = spark.read.parquet(_work + "/t")
    members = spark.read.parquet(_work + "/m")
    TIMES.clear()
    COUNTS.clear()
t0 = time.time()
n = ex.extract(triples, members, shape=shape, bulk=BULK)[0].count()
total = time.time() - t0

print(f"\nTOTAL {total:.2f}s  rows={n}  cpus={CPUS}")
acct = sum(TIMES.values())
print(f"eager-action time {acct:.2f}s ({100*acct/total:.0f}% of total)\n")
for k in sorted(TIMES, key=TIMES.get, reverse=True):
    print(f"{TIMES[k]:8.2f}s  x{COUNTS[k]:<3d} {k}")
spark.stop()
