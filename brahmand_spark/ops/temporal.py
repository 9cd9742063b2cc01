"""Temporal joins: AS-OF (point-in-time) matching between event
streams.

Extension beyond the reference surface (SURVEY.md §2.8): the classic
"attach the most recent quote to each trade" / "most recent profile
snapshot to each event" operator. Spark has no built-in as-of join
(pandas has ``merge_asof``; DuckDB has ASOF JOIN — which is exactly
what the oracle uses), and the naive SQL formulation is a range
self-join plus an argmax — quadratic in per-key row counts.

This implementation is the UNION-AND-CARRY shape, linear in the data:

1. tag left rows 0, right rows 1, union them on (key, ts);
2. one window per key ordered by ``(ts, tag DESC)`` — a right row at
   the same timestamp sorts BEFORE the left row, so "at or before"
   includes ties;
3. ``last_value(..., ignoreNulls)`` over unbounded-preceding..current
   carries the latest right payload forward;
4. keep the left rows.

Scale posture: ONE shuffle, keyed by the join key (the same
partitioning any keyed window needs); no range join, no per-key
explosion — per-row cost is O(log run) sort amortized. Forward
direction flips the sort; a tolerance turns stale matches into NULLs
with a post-filter (no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame, right: DataFrame, on: str | list[str],
    left_ts: str = "ts", right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward", tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the single right row with the latest
    ``right_ts <= left_ts`` (``direction='backward'``, ties match) or
    the earliest ``right_ts >= left_ts`` (``'forward'``), per join
    key. Unmatched left rows keep NULL right columns (left-join
    semantics, like DuckDB ``ASOF LEFT JOIN``).

    ``right_cols``: right payload columns to attach (default: all
    non-key, non-ts columns). The matched timestamp is always attached
    as ``right_ts + suffix``. ``tolerance``: an INTERVAL string (e.g.
    ``'30 minutes'``); matches farther than this become NULLs.

    Right rows should be unique per (key, ts) — if not, which
    same-timestamp row wins is not defined (pre-aggregate to make it
    so; DuckDB's ASOF has the same caveat).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    ts_out = right_ts + suffix
    payload = [ts_out] + [c + suffix for c in right_cols]

    l_tag = left.select(
        *keys, F.col(left_ts).alias("__ts"), F.lit(0).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        *[F.lit(None).alias(p) for p in payload],
    )
    r_tag = right.select(
        *keys, F.col(right_ts).alias("__ts"), F.lit(1).alias("__r"),
        F.lit(None).alias("__row"),
        F.col(right_ts).alias(ts_out),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )
    # backward: latest right at-or-before -> ascending ts, right rows
    # first within a timestamp; forward mirrors it with descending ts
    # (carrying the latest-seen = earliest at-or-after).
    asc = direction == "backward"
    order = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__r").desc(),
    ]
    w = (
        Window.partitionBy(*keys).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__r", "__row",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    out = carried.filter(F.col("__r") == 0)
    if tolerance is not None:
        sign = "-" if asc else "+"
        within = F.expr(
            f"{ts_out} IS NOT NULL AND "
            f"({ts_out} {'<=' if not asc else '>='} "
            f"__row.{left_ts} {sign} INTERVAL {tolerance})"
        )
        out = out.select(
            "__row",
            *[F.when(within, F.col(p)).alias(p) for p in payload],
        )
    return out.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns], *payload
    )
