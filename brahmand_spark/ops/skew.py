"""Skew-handling utilities for joins and aggregations at scale.

AQE's skew-join splitting (enabled in io.configure) handles most cases;
these helpers cover the two patterns AQE can't fix:

- ``salted_join``: a broadcast-less join where one side has heavy-hitter
  keys (a celebrity node in a graph, a header token in a posting list).
  The skewed side gets a random salt in [0, factor); the other side is
  replicated across all salt values; the join key becomes (key, salt),
  splitting each hot key's row group across ``factor`` tasks.
- ``two_phase_agg``: count/sum-style aggregation over skewed keys —
  partial agg on (key, salt) first, then final agg on key, so no single
  task accumulates a hot key alone. (Spark's hash aggregate already does
  map-side partials; this helps when the *reduce* side is the problem,
  e.g. collect_set on a hot key.)

Salts use a deterministic per-row hash (pmod of xxhash64 over the row's
columns), not rand(), so retried tasks produce identical output
(required for exactly-once sinks and for reproducible tests).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def add_salt(df: DataFrame, factor: int,
             deterministic_cols: Optional[list[str]] = None) -> DataFrame:
    """Attach a salt column in [0, factor)."""
    if deterministic_cols:
        salt = F.pmod(F.xxhash64(*deterministic_cols), F.lit(factor))
    else:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                      F.lit(factor))
    return df.withColumn(SALT_COL, salt.cast("int"))


def explode_salt(df: DataFrame, factor: int) -> DataFrame:
    """Replicate every row across all salt values (the small/even side)."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))),
    )


def salted_join(
    skewed: DataFrame, other: DataFrame, on: list[str],
    factor: int = 8, how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has heavy-hitter values in ``on``.
    Cost: ``other`` is replicated ``factor``× (keep factor modest or
    pre-filter ``other`` to keys that are actually hot)."""
    left = add_salt(skewed, factor, deterministic_cols=list(skewed.columns))
    right = explode_salt(other, factor)
    out = left.join(right, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def two_phase_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, str],
    factor: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: phase 1 on (keys, salt), phase 2 on keys.
    ``aggs``: output_name -> 'count' | 'sum:<col>' | 'min:<col>' |
    'max:<col>' | 'collect_set:<col>'."""
    salted = add_salt(df, factor, deterministic_cols=keys and list(df.columns))

    partial_exprs = []
    final_exprs = []
    for name, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
            continue
        op, col = spec.split(":", 1)
        if op == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{name}"))
            final_exprs.append(F.min(f"__p_{name}").alias(name))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{name}"))
            final_exprs.append(F.max(f"__p_{name}").alias(name))
        elif op == "collect_set":
            partial_exprs.append(F.collect_set(col).alias(f"__p_{name}"))
            final_exprs.append(
                F.array_distinct(F.flatten(F.collect_list(f"__p_{name}")))
                .alias(name)
            )
        else:
            raise ValueError(f"unknown agg spec {spec!r}")
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def hot_keys(df: DataFrame, key_cols: list[str],
             min_count: int = 100_000) -> DataFrame:
    """Diagnostic: keys whose row count exceeds ``min_count`` — the
    candidates for salting / broadcast isolation."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc())
    )
