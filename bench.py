"""Benchmark harness: runs the headline queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (round 4): 1 warmup pass + N timed passes per query
(N = $SPARK_GRAFT_BENCH_PASSES, default 3); the reported per-query number
and the headline total are the per-query MEDIAN, with per-query MIN
reported alongside.  Median-of-3 makes a uniform machine-contention
multiplier (the round-3 false "regression") distinguishable from a real
plan change: contention inflates some passes, a plan change inflates all
of them including the min.

Each query is forced to full materialization with the noop sink (so
projection work isn't pruned away by count()).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))

# Headline set: graph traversals + aggregates + pipeline extensions,
# plus (round 4) the iterative / loop-shaped operators so the most
# scale-sensitive plans get a wall-time trend line.
BENCH_QUERIES = [
    "match_filter_project",
    "multi_hop",
    "adjacency_traversal",
    "aggregates_five",
    "order_skip_limit",
    "with_having",
    "with_rebind_match",
    "shared_alias_patterns",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_duplicate_spans",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "ann_cosine_topk",
    "text_quality_score",
    "text_fingerprint",
    "text_lang_id",
    "text_repetition",
    "text_bm25",
    "text_chunking",
    "seq_packing",
    "cluster_kmeans",
    "sketch_hll_distinct",
    "sketch_cms_topk",
    "events_window_agg",
    "events_asof_join",
    # Iterative / loop-shaped (round-4 additions)
    "graph_pagerank",
    "graph_cc_two_phase",
    "graph_lpa",
    "graph_kcore",
    "graph_sssp_weighted",
    "shortest_path",
    "var_length_multi",
    "events_sessionize",
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

    # fresh=True: rebuild every plan per pass, so each timed pass pays
    # full construction + execution. The entry's default memoization
    # (build-once, serve the same DataFrame) previously let persisted/
    # checkpointed intermediates from the warmup serve the timed
    # passes — the iterative operators timed as ~0.02 s noop re-writes
    # and the hash-dedup family timed cache re-reads, not computation.
    qs = entrymod.queries(fresh=True)
    missing = [n for n in BENCH_QUERIES if n not in qs]
    if missing:
        # registry drift must not kill the whole recording — time what
        # exists and say what was skipped
        print(f"# WARNING: not in queries(), skipped: {missing}",
              file=sys.stderr)
    bench_queries = [n for n in BENCH_QUERIES if n in qs]

    def run_once(name: str) -> float:
        # Timer wraps plan CONSTRUCTION as well as execution: the
        # iterative operators (pagerank, components, lpa, kcore,
        # shortest_path) run their supersteps eagerly (localCheckpoint)
        # while the DataFrame is being built, so timing only the final
        # noop write would miss nearly all their work.
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # Warmup pass: absorb one-time session costs — janino codegen
    # compiles, Python worker forks, parquet footer reads, broadcast
    # relation builds.  On a long-lived cluster serving a 100 TB corpus
    # these amortize to zero, so steady-state is the honest throughput
    # number; the cold total is reported alongside for transparency.
    cold: dict[str, float] = {}
    for name in bench_queries:
        cold[name] = run_once(name)
        print(f"# cold {name}: {cold[name]}s", file=sys.stderr)

    # Timed passes (steady state): interleave whole passes rather than
    # back-to-back repeats of one query, so a transient contention burst
    # hits different queries in different passes instead of all repeats
    # of one query.
    samples: dict[str, list[float]] = {name: [] for name in bench_queries}
    for p in range(PASSES):
        for name in bench_queries:
            t = run_once(name)
            samples[name].append(t)
            print(f"# pass{p + 1} {name}: {t}s", file=sys.stderr)

    med = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    mins = {n: round(min(ts), 3) for n, ts in samples.items()}

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "queries_min": mins,
        "queries_all_passes": samples,
        "sf": sf,
        "methodology": (
            f"1 warmup + {PASSES} interleaved timed passes per query; "
            "'queries'/'value' are per-query medians, 'queries_min' the "
            "per-query min (contention-robust lower bound). Each pass "
            "builds a FRESH plan and executes it fully (queries("
            "fresh=True)) — r2/r3 timed re-execution of memoized plans, "
            "so the hash-dedup family was reading its warmup-persisted "
            "intermediates from cache and iterative operators only "
            "re-wrote checkpointed results; those numbers are not "
            "comparable to these."
        ),
        "min_total": round(sum(mins.values()), 3),
        "cold_total": round(sum(cold.values()), 3),
    }))


if __name__ == "__main__":
    main()
