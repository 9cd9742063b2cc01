"""Similarity search over embedding columns (`array<float>`).

Extension beyond the reference surface. Two tiers:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (queries are the small side by construction);
  corpus never shuffles; per-partition score + global top-k via window.
- ``hyperplane_lsh_topk``: the 100 TB path — random-hyperplane LSH
  buckets (sign bits of dot products with deterministic seeded
  hyperplanes), candidates only within matching buckets, exact cosine
  re-rank. Recall < 1 by design; multiple tables raise it.

All vector math is JVM-side (`zip_with`/`aggregate`); no UDFs.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "vec_id", query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.
    Ties broken by corpus id (deterministic). Queries are broadcast;
    the corpus is scanned once with no shuffle before the final
    per-query top-k."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(query_vec_col)).alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    scored = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
    scored = scored.withColumn(
        "cosine",
        F.round(dot(F.col("cv"), F.col("qv"))
                / (F.col("cn") * F.col("qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(x) for x in plane])) >= 0, 1
        ).otherwise(0)
        for plane in planes
    ]
    bucket = F.lit(0)
    for b in bits:
        bucket = bucket * 2 + b
    return bucket


def hyperplane_lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, n_planes: int = 4, seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.
    2^n_planes buckets; the bucket assignment is a narrow projection on
    both sides, the join shuffles on the bucket key only. Approximate —
    neighbors across bucket boundaries are missed (tunable via
    n_planes; union several seeds for multi-table recall)."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    c = c.withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    c = c.withColumn("cn", norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    q = q.withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    q = q.withColumn("qn", norm(F.col("qv")))
    scored = c.alias("c").join(
        F.broadcast(q.alias("q")),
        (F.col("c.bucket") == F.col("q.bucket"))
        & (F.col("corpus_id") != F.col("query_id")),
    )
    scored = scored.withColumn(
        "cosine",
        F.round(dot(F.col("cv"), F.col("qv"))
                / (F.col("cn") * F.col("qn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
