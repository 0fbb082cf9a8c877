import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_TESTS = "/root/reference/tests"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    # Tiny-fixture tuning: 1 shuffle partition, no codegen/AQE — per-stage
    # compile overhead dominates at this scale. bench.py flips these for
    # real data volumes.
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("extract-cbd-shape-spark-tests")
        .config("spark.sql.shuffle.partitions", "1")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.codegen.wholeStage", "false")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def load_fixture(relpath: str) -> str:
    with open(os.path.join(REFERENCE_TESTS, relpath)) as f:
        return f.read()
