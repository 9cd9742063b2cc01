"""Z-order (Morton curve) data layout for multi-column data skipping.

The lakehouse clustering move (Delta/Iceberg ``OPTIMIZE ZORDER BY``,
Databricks 2021; Morton 1966): parquet readers prune files/row-groups
by min/max statistics, but a single sort key only tightens the stats
of ITS column. Interleaving the bits of several columns' ranks into
one Morton code and sorting by that gives every participating column
locality — each written file covers a small hyper-rectangle of the
key space, so a selective filter on ANY of the z-columns skips most
files. At 100 TB this is the difference between scanning a corpus and
scanning a shard: the layout is paid once at write time, every
subsequent scan with a pushed-down filter benefits.

Spark shape, all JVM, deterministic:

- per column, a fixed-point RANK: value scaled into [0, 2^bits) from
  (min, max) bounds computed in ONE aggregate job (or supplied by the
  caller — e.g. known domain bounds — making the whole transform a
  pure narrow projection);
- the Morton code interleaves rank bits with shift-or arithmetic
  unrolled at plan-build time (``bits`` per column, typically 16 —
  stays inside whole-stage codegen, no UDF);
- files come from ``repartitionByRange(n, zvalue)`` (Spark's range
  partitioner — contiguous z-ranges per partition) + an in-partition
  sort, so per-file min/max stats are tight on every z-column.

``zorder_value`` exposes the raw code for tests/oracles (the bit
interleave replays exactly in DuckDB integer arithmetic);
``zorder_layout`` returns the re-laid-out DataFrame ready to write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Fixed-point rank of ``col`` in [lo, hi] -> [0, 2^bits).
    Constant columns (hi == lo) rank 0; NULLs rank 0 (sort first,
    like NULLS FIRST)."""
    span = hi - lo
    scaled = F.when(
        span > 0,
        F.floor((col.cast("double") - lo) / span * ((1 << bits) - 1)),
    ).otherwise(F.lit(0))
    return F.coalesce(scaled.cast("bigint"), F.lit(0))


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton interleave: output bit (i*n_cols + j) = bit i of
    ranks[n_cols-1-j] — unrolled shift-or arithmetic, codegen-friendly
    (n_cols * bits terms, e.g. 32 for 2x16)."""
    n = len(ranks)
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, r in enumerate(ranks):
            src_bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(
                F.shiftleft(src_bit, i * n + (n - 1 - j)))
    return out


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append ``zvalue``: the Morton code of ``cols``. ``bounds`` maps
    column -> (min, max); columns not covered are bounded by one
    corpus aggregate (a single tiny-result job). n_cols * bits must
    fit a signed 64-bit value (<= 62)."""
    if len(cols) * bits > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits overflows the 63-bit "
            "Morton code; lower bits")
    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        row = df.agg(*[
            e for c in missing
            for e in (F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                      F.max(F.col(c).cast("double")).alias(f"_hi_{c}"))
        ]).first()
        for c in missing:
            lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
            # Entirely-NULL column: no bounds exist — use the
            # constant-rank path (every row ranks 0) instead of
            # crashing on float(None).
            bounds[c] = (0.0, 0.0) if lo is None else (lo, hi)
    ranks = [
        _rank(F.col(c), F.lit(float(bounds[c][0])),
              F.lit(float(bounds[c][1])), bits)
        for c in cols
    ]
    return df.withColumn("zvalue", _interleave(ranks, bits))


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int = 64,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Re-lay ``df`` along the Morton curve: range-partition on the
    z-value (contiguous z-ranges per output file) and sort within
    partitions, then drop the helper column. ``.write.parquet(...)``
    on the result produces files whose per-file min/max stats are
    tight on EVERY z-column."""
    z = zorder_value(df, cols, bits, bounds)
    return (
        z.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
    )
