"""SemDeDup auto-k scale point (r11, VERDICT r10 next #4).

r10's sf1 soak measured dedup_semantic at 0.99x wall per unit of
QUADRATIC workload with k pinned at 8 while the corpus grew 10x — the
expected shape for a fixed k (per-cluster pair work is ~(N/k)^2 * k =
N^2/k, so wall tracks N^2). The r11 auto-k default (k = ceil(sqrt(N)))
bounds pair work at ~N^1.5; this script measures the same 10x growth
with auto-k in a FRESH process per (sf, mode) sample and prints the
wall ratios against both workload models:

  fixed-k workload ratio  (N1/N0)^2      = 100   for 10x rows
  auto-k  workload ratio  (N1/N0)^1.5    = 31.6  for 10x rows

Usage:
  python3 tools/measure_semdedup_sf.py            # run both points
  python3 tools/measure_semdedup_sf.py --one sf_dir mode   # child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF0 = os.environ.get("SEMDEDUP_SF0", "/root/testdata/sf0.1")
SF1 = os.environ.get("SEMDEDUP_SF1", "/root/repo/.localdata/sf1")


def run_one(sf_dir: str, mode: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from brahmand_spark.io import read_parquet
    from brahmand_spark.ops.dedup import _spread
    from brahmand_spark.ops.semdedup import semdedup

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # _spread matches the dedup_semantic gate's input shape: the tiny
    # parquet arrives as 1-2 splits, which would serialize the cosine
    # compute on 1-2 cores and time the scheduler, not the operator
    emb = _spread(read_parquet(
        spark, os.path.join(sf_dir, "embeddings.parquet")))
    n = emb.count()
    k = None if mode == "auto" else 8
    # warmup pass absorbs codegen/session costs, timed pass is fresh
    for tag in ("warm", "timed"):
        t0 = time.time()
        out = semdedup(emb, k=k, iters=3, threshold=0.4)
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
    print(json.dumps({"sf_dir": sf_dir, "mode": mode, "rows": n,
                      "wall": wall}))


def main() -> None:
    here = os.path.abspath(__file__)
    res = {}
    for sf_dir in (SF0, SF1):
        for mode in ("auto", "fixed8"):
            out = subprocess.run(
                [sys.executable, here, "--one", sf_dir, mode],
                capture_output=True, text=True)
            line = next((ln for ln in out.stdout.splitlines()
                         if ln.startswith("{")), None)
            if line is None:
                print(f"# FAILED {sf_dir} {mode}:\n{out.stderr[-1500:]}",
                      file=sys.stderr)
                continue
            rec = json.loads(line)
            res[(sf_dir, mode)] = rec
            print(f"# {sf_dir} {mode}: rows={rec['rows']} "
                  f"wall={rec['wall']}s", file=sys.stderr)
    summary = {}
    for mode, wl_exp in (("auto", 1.5), ("fixed8", 2.0)):
        a, b = res.get((SF0, mode)), res.get((SF1, mode))
        if not (a and b):
            continue
        growth = b["rows"] / a["rows"]
        wall_ratio = b["wall"] / a["wall"]
        workload_ratio = growth ** wl_exp
        summary[mode] = {
            "rows": [a["rows"], b["rows"]],
            "wall": [a["wall"], b["wall"]],
            "wall_ratio": round(wall_ratio, 2),
            "workload_model": f"N^{wl_exp}",
            "workload_ratio": round(workload_ratio, 1),
            "per_unit": round(wall_ratio / workload_ratio, 3),
        }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        run_one(sys.argv[i + 1], sys.argv[i + 2])
    else:
        main()
