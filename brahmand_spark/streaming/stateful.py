"""Custom stateful streaming operators via ``applyInPandasWithState``.

Extension beyond the reference surface (SURVEY.md §2.8: the reference
has no streaming). These cover semantics the built-in windowed
aggregations cannot express: per-key state that evolves across
micro-batches with arbitrary Python update logic, emitted in ``update``
mode every batch.

Scale posture: state lives in Spark's per-key state store (RocksDB/HDFS
backed on a real cluster), partitioned by the grouping key — each
executor holds only its keys' state. The update function receives
Arrow-batched pandas frames (no per-row Python overhead). Timestamps
are carried in state as epoch microseconds (plain int64) so state
round-trips exactly regardless of session timezone handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "first_us bigint, last_us bigint"
)
STATE_SCHEMA = "n bigint, total double, first_us bigint, last_us bigint"


def running_user_stats(events: DataFrame, key_col: str = "user_id",
                       ts_col: str = "ts",
                       value_col: str = "value") -> DataFrame:
    """Per-key running totals maintained across micro-batches: event
    count, value sum, first/last event time (epoch micros). Each batch
    emits the UPDATED running totals for keys seen in that batch — a
    monotone change-log that windowed aggregation cannot produce
    (``update`` output of an unwindowed global-per-key aggregate is not
    allowed with watermarks; explicit state is the supported shape).

    Works only on streaming DataFrames (`applyInPandasWithState`
    requires one); see ``running_user_stats_batch`` for the
    batch/oracle equivalent.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, total, first_us, last_us = 0, 0.0, None, None
        if state.exists:
            n, total, first_us, last_us = state.get
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            total += float(pdf[value_col].sum())
            ts_us = pdf[ts_col].astype("int64") // 1000
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None or lo < first_us else first_us
            last_us = hi if last_us is None or hi > last_us else last_us
        state.update((n, round(total, 6), first_us, last_us))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n],
            "total_value": [round(total, 6)],
            "first_us": [first_us], "last_us": [last_us],
        })

    return events.groupBy(key_col).applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout,
    )


def running_user_stats_batch(events: DataFrame, key_col: str = "user_id",
                             ts_col: str = "ts",
                             value_col: str = "value") -> DataFrame:
    """Batch equivalent of the final state ``running_user_stats``
    converges to once the stream drains — the correctness oracle for
    the stateful path (one hash aggregate, map-side partial agg)."""
    from pyspark.sql import functions as F

    us = (F.unix_micros(F.col(ts_col).cast("timestamp"))
          if dict(events.dtypes).get(ts_col) == "timestamp_ntz"
          else F.unix_micros(F.col(ts_col)))
    return events.groupBy(F.col(key_col).alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("total_value"),
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
    )
