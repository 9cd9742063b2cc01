#!/usr/bin/env python
"""sf1 persisted-index lifecycle soak (VERDICT r9 "Next round" #1):
time one full build -> add -> probe -> remove -> compact loop of BOTH
persisted index families at a given scale factor, and assert the
contract invariants hold at that scale (probe cost ∝ batch; adds are
partition appends; removes are O(batch) tombstones; compact folds).

Prints one JSON line: {"sf_dir": ..., "dedup": {step: sec...},
"ann": {step: sec...}, "counts": {...}}.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf1 \
       python tools/sf1_index_loop.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
MEM = os.environ.get("SPARK_GRAFT_MEM", "16g")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 16)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", MEM)
        .config("spark.sql.adaptive.enabled", "true")
        .appName("brahmand_spark-index-soak")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from brahmand_spark.models import ModelStore
    from brahmand_spark.ops.dedup_index import (
        build_dedup_index, dedup_against, dedup_index_add,
        dedup_index_compact, dedup_index_remove,
    )
    from brahmand_spark.ops.similarity import (
        ann_add, ann_compact, ann_remove, ann_search, ann_stats,
        build_ann_index,
    )

    store_dir = tempfile.mkdtemp(prefix="sf1_index_")
    store = ModelStore(os.path.join(store_dir, "models"))
    out = {"sf_dir": SF_DIR, "dedup": {}, "ann": {}, "counts": {}}

    def step(family: str, name: str, fn):
        t0 = time.time()
        r = fn()
        out[family][name] = round(time.time() - t0, 3)
        print(f"# {family}.{name}: {out[family][name]}s", file=sys.stderr)
        return r

    # ---------- dedup index over documents ----------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
    probe = batch.limit(2000).localCheckpoint()
    out["counts"]["docs_corpus"] = corpus.count()
    out["counts"]["docs_batch"] = batch.count()

    step("dedup", "build",
         lambda: build_dedup_index(corpus, "dix", store))
    step("dedup", "add",
         lambda: dedup_index_add(spark, "dix", batch, store,
                                 batch_key="soak-add"))
    pairs = step("dedup", "probe",
                 lambda: dedup_against(
                     spark, "dix", probe, store, threshold=0.5,
                     exclude_batches=["soak-add"]).count())
    out["counts"]["dedup_probe_pairs"] = pairs
    step("dedup", "remove",
         lambda: dedup_index_remove(
             spark, "dix",
             corpus.filter(F.col("doc_id") % 100 == 1).select("doc_id"),
             store))
    step("dedup", "probe_after_remove",
         lambda: dedup_against(spark, "dix", probe, store,
                               threshold=0.5).count())
    step("dedup", "compact",
         lambda: dedup_index_compact(spark, "dix", store))

    # ---------- ANN index over embeddings ----------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding")
    vec_corpus = emb.filter(F.col("vec_id") % 10 != 0)
    vec_batch = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"), "embedding")
    queries = emb.filter(F.col("vec_id") % 97 == 3).select(
        "vec_id", "embedding").localCheckpoint()
    out["counts"]["vec_corpus"] = vec_corpus.count()
    out["counts"]["vec_batch"] = vec_batch.count()
    out["counts"]["vec_queries"] = queries.count()

    step("ann", "build",
         lambda: build_ann_index(vec_corpus, "vidx", store,
                                 n_cells=64, m=8, n_codes=16))
    step("ann", "add",
         lambda: ann_add(spark, "vidx", vec_batch, store,
                         batch_key="soak-add"))
    hits = step("ann", "search",
                lambda: ann_search(spark, "vidx", queries, store,
                                   k=10, nprobe=8,
                                   corpus=vec_corpus.unionByName(
                                       vec_batch)).count())
    out["counts"]["ann_hits"] = hits
    step("ann", "stats",
         lambda: ann_stats(spark, "vidx", store).count())
    step("ann", "remove",
         lambda: ann_remove(
             spark, "vidx",
             vec_corpus.filter(F.col("vec_id") % 50 == 7)
             .select("vec_id"), store))
    step("ann", "compact",
         lambda: ann_compact(spark, "vidx", store))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
