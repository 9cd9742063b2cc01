"""Driver-mimic: run every __spark_entry__ query against its DuckDB oracle
at a given scale factor and report match/mismatch per query.

Usage: PYTHONPATH=/root/repo python3 tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df, places=6):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append("NaN" if math.isnan(v) else round(v, places))
            elif hasattr(v, "isoformat"):
                out.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                out.append(tuple(v))
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=repr)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("check_entry")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    print(f"== entry() smoke on sf0.001 ==")
    edf = entrymod.entry(spark)
    print(f"entry rows: {edf.count()}  schema: {edf.columns}")

    qs = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        qs = {n: qs[n] for n in names if n in qs}
    oracles = entrymod.oracle_sql()
    ok = bad = rows_only = 0
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) [no oracle]")
            rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            bad += 1
            failures.append(name)
            continue
        l, r = canon(sdf), canon(odf)
        if sorted(c.lower() for c in sdf.columns) != sorted(c.lower() for c in odf.columns):
            print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            bad += 1
            failures.append(name)
        elif len(l) != len(r):
            print(f"FAIL  {name}: rows spark={len(l)} oracle={len(r)}")
            bad += 1
            failures.append(name)
        elif l != r:
            diff = next(i for i, (a, b) in enumerate(zip(l, r)) if a != b)
            print(f"FAIL  {name}: values differ at row {diff}:\n"
                  f"      spark={l[diff]}\n      duck ={r[diff]}")
            bad += 1
            failures.append(name)
        else:
            print(f"ok    {name}: {len(l)} rows ({dt:.1f}s)")
            ok += 1
    print(f"\n== {ok} ok, {rows_only} rows-only, {bad} failed ==")
    if failures:
        print("failures:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
