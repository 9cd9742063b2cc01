"""Benchmark harness: runs the headline queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (so
projection work isn't pruned away by count()).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: graph traversals + aggregates + pipeline extensions.
BENCH_QUERIES = [
    "match_filter_project",
    "multi_hop",
    "adjacency_traversal",
    "aggregates_five",
    "count_distinct",
    "order_skip_limit",
    "with_having",
    "with_rebind_match",
    "shared_alias_patterns",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "text_quality_score",
    "text_fingerprint",
    "text_lang_id",
    "events_window_agg",
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 16)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .appName("brahmand_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # Pass 1 (warmup): run every query once to absorb one-time session
    # costs — janino codegen compiles, Python worker forks, parquet
    # footer reads, broadcast relation builds. On a long-lived cluster
    # serving a 100 TB corpus these amortize to zero, so the steady-state
    # pass is the honest throughput number; the cold total is reported
    # alongside for transparency.
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        df = qs[name](spark, SF_DIR)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        print(f"# cold {name}: {cold[name]}s", file=sys.stderr)

    # Pass 2 (timed, steady state)
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        df = qs[name](spark, SF_DIR)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "methodology": "1 warmup + 1 timed pass per query (steady-state)",
        "cold_total": round(sum(cold.values()), 3),
    }))


if __name__ == "__main__":
    main()
