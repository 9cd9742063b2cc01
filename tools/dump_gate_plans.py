"""Dump .explain("formatted") for every benched gate to
plans/r15/<gate>_<suffix>.txt (the optimization round's before/after
plan evidence). Usage:

    PYTHONPATH=/root/repo python3 tools/dump_gate_plans.py before [gate ...]

Iterative operators run their supersteps eagerly at construction; the
dumped plan is the FINAL materialized plan (post-checkpoint), which is
what the noop sink executes — per-superstep plans are the per-round
join/aggregate shapes described in OPTIMIZATION_r15.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import bench
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("brahmand_spark-plandump")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15"))
    os.makedirs(outdir, exist_ok=True)

    qs = entrymod.queries(fresh=True)
    names = [n for n in bench.BENCH_QUERIES if n in qs]
    if only:
        names = [n for n in names if n in only]
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as exc:  # record the failure, keep going
            plan = f"PLAN DUMP FAILED: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
