import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# Slow tier (r15, VERDICT r14 next #1): the suite had grown past the
# driver's verify window (1072 tests, 32-47 min), so the long tail is
# marked `slow` and excluded by default (pytest.ini addopts). The list
# lives in tests/slow_tests.txt — one nodeid per line, function-level
# entries cover every parametrization. Audit rule used to build it:
# every test class/file keeps at least one fast representative, so
# every operator retains default coverage; the slow tier holds the
# deep/replay/e2e redundancy layer. Run it with `-m slow`.
# ---------------------------------------------------------------------------
_SLOW_LIST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "slow_tests.txt")


def _load_slow_ids():
    try:
        with open(_SLOW_LIST) as f:
            return {ln.strip() for ln in f if ln.strip()
                    and not ln.startswith("#")}
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    slow_ids = _load_slow_ids()
    if not slow_ids:
        return
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if not nodeid.startswith("tests/"):
            # pytest rooted inside tests/: normalize to repo-relative
            nodeid = "tests/" + nodeid
        if nodeid in slow_ids or nodeid.split("[")[0] in slow_ids:
            item.add_marker(pytest.mark.slow)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECT = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from brahmand_spark.io import configure

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .appName("brahmand_spark-tests")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tpch(spark):
    from brahmand_spark.graphs.tpch import build_session

    return build_session(spark, SF_SMOKE)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return con
