"""HyperLogLog sketch (ops/sketches): DuckDB-oracle parity, accuracy
bounds, branch coverage (linear-counting vs raw estimator), and the
register-merge property an incremental corpus pipeline relies on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from brahmand_spark.ops.sketches import (
    hll_distinct,
    hll_distinct_with_exact,
    hll_estimate,
    hll_registers,
)

from .conftest import SF_SMOKE
from .helpers import assert_same


def test_hll_gate_oracle_parity(spark, duck):
    """The same comparison the driver runs at sf0.01, at sf0.001 —
    sf0.001 lineitem has ~1.5k distinct orderkeys per group, so this
    exercises the linear-counting branch (sf0.01 exercises raw)."""
    import __spark_entry__ as entry

    fn = entry.queries()["sketch_hll_distinct"]
    sql = entry.oracle_sql()["sketch_hll_distinct"]
    assert_same(fn(spark, SF_SMOKE), duck.sql(sql))


def test_hll_raw_branch_parity_and_accuracy(spark, duck):
    """50k distinct synthetic values force E_raw > 2.5m (raw branch,
    no linear counting) — replay in DuckDB over the same range and
    check the estimate lands within the ~3.25/sqrt(m) HLL error bound
    (3 sigma ~ 10% at m=1024)."""
    n = 50_000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v", p=10)
    import __spark_entry__ as entry

    h = entry._md5h60_sql("v::VARCHAR")
    numer = 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024 * float(1 << 51)
    sql = f"""
        WITH hashed AS (
            SELECT {h} AS h FROM (SELECT unnest(range({n})) AS v)),
        rows_rho AS (
            SELECT h % 1024 AS bucket,
                   CASE WHEN (h >> 10) = 0 THEN 51
                        ELSE 50 - length(bin(h >> 10)) + 1 END AS rho
            FROM hashed),
        reg AS (SELECT bucket, max(rho) AS max_rho FROM rows_rho GROUP BY 1),
        agg AS (SELECT count(*) AS n_present,
                       sum(1::BIGINT << (51 - max_rho)) AS s_present
                FROM reg),
        est AS (SELECT n_present,
                       {numer!r} / (s_present
                           + (1024 - n_present) * {1 << 51})::DOUBLE AS e_raw,
                       1024 - n_present AS v FROM agg)
        SELECT n_present AS n_registers,
               round(CASE WHEN e_raw <= 2560.0 AND v > 0
                          THEN 1024.0 * ln(1024.0 / v)
                          ELSE e_raw END, 4) AS hll_estimate
        FROM est"""
    assert_same(est, duck.sql(sql))
    got = est.collect()[0]["hll_estimate"]
    assert abs(got - n) / n < 3.25 / math.sqrt(1024), got


def test_hll_small_range_branch_exact_ish(spark):
    """Tiny cardinalities hit linear counting, which is near-exact
    when n << m."""
    df = spark.range(100).select((F.col("id") * 7).alias("v"))
    got = hll_distinct(df, "v", p=10).collect()[0]["hll_estimate"]
    assert abs(got - 100) <= 8, got


def test_hll_registers_merge_across_increments(spark):
    """union + re-max of two increments' registers == registers of the
    whole corpus — the mergeability an incremental pipeline needs (and
    what Spark's opaque approx_count_distinct state can't give you)."""
    df = spark.range(20_000).select(F.col("id").alias("v"))
    half_a = df.filter(F.col("v") < 12_000)
    half_b = df.filter(F.col("v") >= 9_000)  # overlapping increments
    merged = (
        hll_registers(half_a, "v", p=10)
        .unionByName(hll_registers(half_b, "v", p=10))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = hll_registers(df, "v", p=10)
    a = hll_estimate(merged, p=10).collect()[0]
    b = hll_estimate(whole, p=10).collect()[0]
    assert a["n_registers"] == b["n_registers"]
    assert a["hll_estimate"] == b["hll_estimate"]


def test_hll_grouped_with_exact_rel_err(spark):
    """Grouped estimates stay within the error bound at m=1024 and the
    convenience join reports the matching exact counts."""
    df = spark.range(30_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id")).alias("v")
    )
    rows = {
        r["g"]: r
        for r in hll_distinct_with_exact(df, "v", ["g"], p=10).collect()
    }
    assert set(rows) == {0, 1, 2}
    for g, r in rows.items():
        assert r["exact_distinct"] == 10_000
        assert r["rel_err"] < 3.25 / math.sqrt(1024)


def test_hll_rejects_bad_precision(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=2)


class TestCountMin:
    def test_gate_oracle_parity(self, spark, duck):
        import __spark_entry__ as entry

        fn = entry.queries()["sketch_cms_topk"]
        sql = entry.oracle_sql()["sketch_cms_topk"]
        assert_same(fn(spark, SF_SMOKE), duck.sql(sql))

    def test_never_underestimates_and_tight_when_wide(self, spark):
        from brahmand_spark.ops.sketches import cms_heavy_hitters

        vals = spark.createDataFrame(
            [(f"tok{i % 7}",) for i in range(700)], "v string"
        )
        narrow = {r["v"]: r for r in
                  cms_heavy_hitters(vals, "v", k=7, width=4).collect()}
        for v, r in narrow.items():
            assert r["cms_estimate"] >= r["exact_count"]
        wide = {r["v"]: r for r in
                cms_heavy_hitters(vals, "v", k=7, width=4096).collect()}
        assert all(r["cms_estimate"] == r["exact_count"] == 100
                   for r in wide.values())

    def test_sketch_merges_across_increments(self, spark):
        """union + re-sum of two increments' cells == whole-corpus
        sketch, so estimates agree — the incremental-pipeline
        contract."""
        from pyspark.sql import functions as F

        from brahmand_spark.ops.sketches import cms_estimate, cms_table

        rows = [(f"t{i % 13}",) for i in range(520)]
        df = spark.createDataFrame(rows, "v string")
        half_a = spark.createDataFrame(rows[:200], "v string")
        half_b = spark.createDataFrame(rows[200:], "v string")
        merged = (
            cms_table(half_a, "v").unionByName(cms_table(half_b, "v"))
            .groupBy("row", "bucket").agg(F.sum("c").alias("c"))
        )
        items = df.select("v").distinct()
        a = sorted(map(tuple, cms_estimate(merged, items, "v").collect()))
        b = sorted(map(tuple, cms_estimate(
            cms_table(df, "v"), items, "v").collect()))
        assert a == b

    def test_absent_value_estimates_zero_when_no_collision(self, spark):
        from brahmand_spark.ops.sketches import cms_estimate, cms_table

        df = spark.createDataFrame([("a",), ("a",)], "v string")
        items = spark.createDataFrame([("zzz-absent",)], "v string")
        got = cms_estimate(cms_table(df, "v", width=4096), items,
                           "v", width=4096).collect()[0]
        assert got["cms_estimate"] == 0

    def test_rejects_bad_params(self, spark):
        from brahmand_spark.ops.sketches import cms_table

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError):
            cms_table(df, "v", depth=0)


class TestBloom:
    def test_no_false_negatives_and_duckdb_replay(self, spark, duck):
        """Every inserted value must probe true; the bit table replays
        in DuckDB (same double-hashing arithmetic)."""
        from brahmand_spark.ops.sketches import (
            bloom_might_contain, bloom_table,
        )

        import __spark_entry__ as entry

        vals = spark.range(500).select(
            F.concat(F.lit("v"), F.col("id")).alias("v")
        )
        bits = bloom_table(vals, "v", m_bits=4096, k_hashes=5)
        got = bloom_might_contain(bits, vals, "v",
                                  m_bits=4096, k_hashes=5)
        assert got.filter(~F.col("might_contain")).count() == 0

        h1 = entry._md5h60_sql("'b1:7:' || v")
        h2 = entry._md5h60_sql("'b2:7:' || v")
        per_i = "\n            UNION ALL ".join(
            f"SELECT (({h1}) + {i} * ({h2})) % 4096 AS bit FROM vals"
            for i in range(5)
        )
        from .helpers import assert_same
        assert_same(bits, duck.sql(f"""
            WITH vals AS (
                SELECT 'v' || CAST(unnest(range(500)) AS VARCHAR) AS v)
            SELECT DISTINCT bit FROM ({per_i})"""))

    def test_false_positive_rate_in_range(self, spark):
        """~(1-e^{-kn/m})^k: n=500, m=8192, k=5 -> ~0.2%; check absent
        probes stay under a loose 2% and at least SOME absent value is
        rejected (the filter does something)."""
        from brahmand_spark.ops.sketches import (
            bloom_might_contain, bloom_table,
        )

        present = spark.range(500).select(
            F.concat(F.lit("in"), F.col("id")).alias("v"))
        absent = spark.range(2000).select(
            F.concat(F.lit("out"), F.col("id")).alias("v"))
        bits = bloom_table(present, "v")
        got = bloom_might_contain(bits, absent, "v")
        fp = got.filter(F.col("might_contain")).count()
        assert fp <= 40, fp  # 2% of 2000

    def test_prefilter_keeps_all_matches(self, spark):
        """bloom_prefilter never drops a row whose key IS present —
        the join result after prefiltering equals the plain join."""
        from brahmand_spark.ops.sketches import bloom_prefilter

        large = spark.range(5000).select(
            (F.col("id") % 700).alias("k"), F.col("id").alias("payload"))
        keys = spark.range(50).select((F.col("id") * 9).alias("k"))
        pre = bloom_prefilter(large, keys, "k")
        want = large.join(keys.distinct(), "k", "leftsemi")
        got_join = pre.join(keys.distinct(), "k", "leftsemi")
        a = sorted(map(tuple, want.collect()))
        b = sorted(map(tuple, got_join.collect()))
        assert a == b
        # and the prefilter really pruned: strictly fewer rows than large
        assert pre.count() < large.count()

    def test_merge_across_increments(self, spark):
        from brahmand_spark.ops.sketches import (
            bloom_might_contain, bloom_table,
        )

        a = spark.range(100).select(F.concat(F.lit("a"), F.col("id"))
                                    .alias("v"))
        b = spark.range(100).select(F.concat(F.lit("b"), F.col("id"))
                                    .alias("v"))
        merged = bloom_table(a, "v").union(bloom_table(b, "v")).distinct()
        both = a.union(b)
        got = bloom_might_contain(merged, both, "v")
        assert got.filter(~F.col("might_contain")).count() == 0

    def test_rejects_bad_params(self, spark):
        from brahmand_spark.ops.sketches import bloom_table

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError):
            bloom_table(df, "v", m_bits=4)
