#!/usr/bin/env python
"""Fresh-seed deep fuzz sweep: run the parity generators from
tests/test_fuzz_parity.py with NEW seeds and a bigger N than the
pinned pytest runs — the end-of-round confidence pass (r9 ran 480
fresh cases; failures print the exact Cypher/SQL pair to reproduce).

Usage: python tools/fuzz_sweep.py [N_PER_GENERATOR] [SEED]
"""
from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0xC0FFEE


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("fuzz-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    from brahmand_spark.graphs.tpch import build_session
    from tests import test_fuzz_parity as gen
    from tests.helpers import assert_same

    sf = "/root/testdata/sf0.001"
    session = build_session(spark, sf)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    generators = [
        ("scan", gen._scan_query),
        ("agg", gen._agg_query),
        ("hop", gen._hop_query),
        ("subquery", gen._subquery_query),
        ("correlated_call", gen._correlated_call_query),
        ("varlen_props", gen._varlen_props_query),
        ("qpp", gen._qpp_query),
        ("slice_expr", gen._slice_expr_query),
    ]
    total, failures = 0, []
    for name, g in generators:
        rnd = random.Random(SEED + hash(name) % 10_000)
        for i in range(N):
            cy, sq = g(rnd)
            total += 1
            try:
                assert_same(session.execute(cy), con.sql(sq))
            except Exception as exc:
                failures.append((name, i, cy, sq, str(exc)[:300]))
                print(f"FAIL {name}[{i}]\n  {cy}\n  vs {sq}\n  {exc}",
                      file=sys.stderr)
    print(f"fuzz sweep: {total} cases, {len(failures)} failures "
          f"(seed {SEED}, N {N}/generator)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
