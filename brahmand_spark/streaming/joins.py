"""Stream-stream joins with event-time bounds.

Extension beyond the reference surface (it has no streaming). The
canonical product question — "which events of type A were followed by
an event of type B from the same key within T?" (signup -> purchase,
impression -> click) — is a stream-stream INNER join. Spark can only
run it with bounded state: both sides watermarked and the join
condition carrying an event-time range, so the state store can expire
rows older than (watermark - tolerance). ``funnel_join`` packages
exactly that shape, and — like every operator in this package — the
same function body runs on batch DataFrames (watermark is a no-op),
which is what the batch-parity test compares against.

Scale posture: the join shuffles both streams on the key column once;
state per key is bounded by the watermark + tolerance horizon. Skewed
hot keys behave like any skewed shuffle join — pre-filter or salt
upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import with_watermark


def funnel_join(
    left: DataFrame, right: DataFrame, key: str = "user_id",
    ts_col: str = "ts", within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Pairs (l, r) with l.key == r.key and l.ts <= r.ts <= l.ts +
    within. Output columns: the key, then every other column of each
    side prefixed ``l_`` / ``r_``. Works identically on batch and
    streaming inputs; on streams both sides are watermarked and the
    time-range bound makes the join's state finite."""
    l = with_watermark(left, ts_col, watermark)
    r = with_watermark(right, ts_col, watermark)
    l = l.select(
        F.col(key).alias("_lk"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
    )
    r = r.select(
        F.col(key).alias("_rk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    lt, rt = F.col(f"l_{ts_col}"), F.col(f"r_{ts_col}")
    cond = (
        (F.col("_lk") == F.col("_rk"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("_lk").alias(key),
        *[f"l_{c}" for c in left.columns if c != key],
        *[f"r_{c}" for c in right.columns if c != key],
    )
