"""Grouped quantiles + random projection (ops/stats): DuckDB parity,
approx-vs-exact error bound, JL distance preservation, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from brahmand_spark.ops.stats import group_quantiles, random_projection

from .conftest import SF_SMOKE
from .helpers import assert_same


class TestGroupQuantiles:
    def test_duckdb_parity_grouped(self, spark, duck):
        from brahmand_spark.io import read_parquet

        li = read_parquet(spark, f"{SF_SMOKE}/lineitem.parquet")
        got = group_quantiles(li, "l_extendedprice", ["l_returnflag"])
        # quantile_cont only takes CONSTANT fractions in DuckDB ->
        # one SELECT per prob
        per_p = "\n            UNION ALL ".join(
            f"SELECT l_returnflag, CAST({p} AS DOUBLE) AS prob, "
            f"round(quantile_cont(l_extendedprice, {p}), 4) AS quantile "
            f"FROM lineitem GROUP BY l_returnflag"
            for p in (0.25, 0.5, 0.75, 0.95)
        )
        assert_same(got, duck.sql(per_p))

    def test_duckdb_parity_global(self, spark, duck):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        lens = docs.select(F.length("text").alias("n"))
        got = group_quantiles(lens, "n", probs=[0.0, 0.5, 1.0])
        per_p = "\n            UNION ALL ".join(
            f"SELECT CAST({p} AS DOUBLE) AS prob, "
            f"round(quantile_cont(length(text), {p}), 4) AS quantile "
            f"FROM documents"
            for p in (0.0, 0.5, 1.0)
        )
        assert_same(got, duck.sql(per_p))

    def test_approx_within_rank_error(self, spark):
        """approx_percentile's rank error: the approximate median of
        0..9999 lands within accuracy-driven distance of 5000."""
        df = spark.range(10_000).select(F.col("id").cast("double")
                                        .alias("v"))
        exact = {r["prob"]: r["quantile"]
                 for r in group_quantiles(df, "v").collect()}
        approx = {r["prob"]: r["quantile"]
                  for r in group_quantiles(
                      df, "v", exact=False, accuracy=1000).collect()}
        for p, e in exact.items():
            assert abs(approx[p] - e) <= 10_000 / 1000 + 1

    def test_rejects_bad_probs(self, spark):
        df = spark.range(3).select(F.col("id").alias("v"))
        with pytest.raises(ValueError):
            group_quantiles(df, "v", probs=[1.5])


class TestRandomProjection:
    def test_deterministic_and_shaped(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        a = random_projection(emb, 8).collect()
        b = random_projection(emb, 8).collect()
        assert sorted(map(repr, a)) == sorted(map(repr, b))
        assert all(len(r["projected"]) == 8 for r in a)

    def test_distances_roughly_preserved(self, spark):
        """JL property: squared-distance ratios between projected and
        original stay within a loose band for out_dim=16 (statistical,
        but deterministic here — fixed data + seeded planes)."""
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet") \
            .filter(F.col("vec_id") < 40)
        orig = {r["vec_id"]: list(map(float, r["embedding"]))
                for r in emb.collect()}
        proj = {r["vec_id"]: list(r["projected"])
                for r in random_projection(emb, 16).collect()}

        def d2(u, v):
            return sum((x - y) ** 2 for x, y in zip(u, v))

        ids = sorted(orig)[:20]
        ratios = []
        for i in range(0, len(ids) - 1, 2):
            a, b = ids[i], ids[i + 1]
            do, dp = d2(orig[a], orig[b]), d2(proj[a], proj[b])
            if do > 0:
                ratios.append(dp / do)
        mean = sum(ratios) / len(ratios)
        assert 0.6 < mean < 1.4, ratios
        assert all(0.2 < r < 2.5 for r in ratios), ratios

    def test_narrow_plan_no_shuffle(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        plan = random_projection(emb, 8, dim=emb.selectExpr(
            "size(embedding) d").first()["d"])._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan

    def test_component_matches_manual_dot(self, spark):
        """First projected component == scaled dot with the first
        seeded plane, replayed in plain Python."""
        from brahmand_spark.ops.similarity import _hyperplanes

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet") \
            .filter(F.col("vec_id") == 0)
        row = emb.collect()[0]
        dim = len(row["embedding"])
        planes = _hyperplanes(dim, 8, 42)
        got = random_projection(emb, 8).collect()[0]["projected"][0]
        want = sum(
            float(x) * p for x, p in zip(row["embedding"], planes[0])
        ) / math.sqrt(8)
        assert abs(got - round(want, 6)) < 1e-9

    def test_rejects_bad_dim(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        with pytest.raises(ValueError):
            random_projection(emb, 0)
