"""Z-order layout (ops/layout.py): exact Morton-code replay in Python
and DuckDB, the locality property that justifies the operator (tight
per-file bounding boxes on EVERY z-column), and determinism."""

import pyspark.sql.functions as F

from brahmand_spark.ops.layout import zorder_layout, zorder_value

from .conftest import SF_SMOKE
from .helpers import assert_same


def _py_rank(v, lo, hi, bits):
    if v is None:
        return 0
    if hi <= lo:
        return 0
    return int((float(v) - lo) / (hi - lo) * ((1 << bits) - 1))


def _py_morton(ranks, bits):
    out, n = 0, len(ranks)
    for i in range(bits):
        for j, r in enumerate(ranks):
            out |= ((r >> i) & 1) << (i * n + (n - 1 - j))
    return out


def _duck_morton_sql(cols, bits, bounds):
    """The same rank+interleave arithmetic rendered as DuckDB SQL."""
    ranks = []
    for c in cols:
        lo, hi = bounds[c]
        ranks.append(
            f"CASE WHEN {hi} - {lo} > 0 THEN CAST(floor("
            f"({c}::DOUBLE - {lo}) / ({hi} - {lo}) * {(1 << bits) - 1})"
            f" AS BIGINT) ELSE 0 END"
        )
    n = len(cols)
    terms = [
        f"(((({r}) >> {i}) & 1) << {i * n + (n - 1 - j)})"
        for i in range(bits)
        for j, r in enumerate(ranks)
    ]
    return " | ".join(terms)


class TestZValue:
    def test_matches_python_replay(self, spark):
        rows = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(rows, "x int, y int")
        got = {(r["x"], r["y"]): r["zvalue"] for r in zorder_value(
            df, ["x", "y"], bits=3,
            bounds={"x": (0, 7), "y": (0, 7)}).collect()}
        for x, y in rows:
            want = _py_morton(
                [_py_rank(x, 0, 7, 3), _py_rank(y, 0, 7, 3)], 3)
            assert got[(x, y)] == want, (x, y, got[(x, y)], want)
        # the curve actually interleaves: (1,0) and (0,1) differ and
        # adjacent cells stay numerically close
        assert got[(1, 0)] != got[(0, 1)]

    def test_matches_duckdb_replay(self, spark, duck):
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        bounds = {"l_quantity": (1.0, 50.0),
                  "l_extendedprice": (900.0, 105000.0)}
        got = zorder_value(
            li, ["l_quantity", "l_extendedprice"], bits=8,
            bounds=bounds,
        ).select("l_orderkey", "l_linenumber", "zvalue")
        expr = _duck_morton_sql(
            ["l_quantity", "l_extendedprice"], 8, bounds)
        assert_same(got, duck.sql(
            f"SELECT l_orderkey, l_linenumber, {expr} AS zvalue "
            "FROM lineitem"))

    def test_deterministic_and_bounds_probed(self, spark):
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        a = zorder_value(li, ["l_quantity", "l_extendedprice"], bits=8)
        b = zorder_value(li.repartition(7),
                         ["l_quantity", "l_extendedprice"], bits=8)
        assert sorted(r["zvalue"] for r in a.select("zvalue").collect()) \
            == sorted(r["zvalue"] for r in b.select("zvalue").collect())

    def test_overflow_guard(self, spark):
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        import pytest

        with pytest.raises(ValueError, match="overflows"):
            zorder_value(li, ["l_quantity"] * 4, bits=16)


class TestZLayout:
    def test_partitions_cover_tight_rectangles(self, spark):
        """The operator's reason to exist: range-partitioning on the
        Morton code gives every partition a small bounding box in BOTH
        dimensions, where a plain single-column sort leaves the other
        dimension's per-partition span at full width."""
        rows = [(x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "x int, y int")
        bounds = {"x": (0, 63), "y": (0, 63)}

        def area(d):
            spans = (
                d.withColumn("p", F.spark_partition_id())
                .groupBy("p")
                .agg((F.max("x") - F.min("x")).alias("sx"),
                     (F.max("y") - F.min("y")).alias("sy"))
                .collect()
            )
            return sum((r["sx"] + 1) * (r["sy"] + 1) for r in spans)

        z = zorder_layout(df, ["x", "y"], n_files=16, bits=6,
                          bounds=bounds)
        x_sorted = df.repartitionByRange(16, "x")
        # 4096 cells in 16 partitions: ideal area 4096; x-only sort
        # leaves y spanning 64 per partition (area ~4096*? no: each
        # partition is a 4-wide x-stripe * 64 y -> total 4096 too, but
        # measured as bounding boxes: stripes are exact). Use a filter
        # selective in BOTH dims to expose the difference instead:
        # count partitions touched by a small square.
        def touched(d, x0, x1, y0, y1):
            return (
                d.withColumn("p", F.spark_partition_id())
                .groupBy("p")
                .agg(F.min("x").alias("nx"), F.max("x").alias("mx"),
                     F.min("y").alias("ny"), F.max("y").alias("my"))
                .filter((F.col("mx") >= x0) & (F.col("nx") <= x1)
                        & (F.col("my") >= y0) & (F.col("ny") <= y1))
                .count()
            )

        assert area(z) <= area(x_sorted)
        # an 8x8 query square: the z-layout's min/max stats prune most
        # partitions on y too; the x-stripe layout can only prune on x
        z_hits = touched(z, 8, 15, 8, 15)
        x_hits = touched(x_sorted, 8, 15, 8, 15)
        assert z_hits <= x_hits
        assert z_hits <= 8

    def test_layout_preserves_rows(self, spark):
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        z = zorder_layout(li, ["l_quantity", "l_extendedprice"],
                          n_files=8, bits=8)
        assert z.count() == li.count()
        assert "zvalue" not in z.columns


class TestNullColumns:
    def test_all_null_column_ranks_constant(self, spark):
        """An entirely-NULL z-column probes (None, None) bounds — the
        constant-rank path applies instead of a float(None) crash."""
        df = spark.createDataFrame(
            [(1, None), (2, None), (3, None)], "x int, y int")
        out = zorder_value(df, ["x", "y"], bits=4).collect()
        assert len(out) == 3
        # y contributes 0 bits -> zvalue ordered purely by x
        by_x = sorted(out, key=lambda r: r["x"])
        assert [r["zvalue"] for r in by_x] == \
            sorted(r["zvalue"] for r in out)
