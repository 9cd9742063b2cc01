"""Structured Streaming operators over event tables.

Extension beyond the reference surface (SURVEY.md §2.8: the reference has
no streaming of any kind). Every transform here is written against the
unified DataFrame API so the SAME function works on a batch DataFrame
(used by the DuckDB-oracle correctness gate) and on a
``spark.readStream`` source (used in production with watermarks).

Scale posture: watermarks bound state; tumbling/sliding windows use
Spark's native windowed hash aggregation (map-side partial agg, one
shuffle on (window, keys)); session windows use the built-in
``session_window`` (state-store backed under streaming).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema: Optional[str] = None,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream over a parquet directory (the streaming
    counterpart of io.read_parquet)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_watermark(df: DataFrame, ts_col: str = "ts",
                   delay: str = "10 minutes") -> DataFrame:
    """Bound state for late data (no-op on batch DataFrames).
    Watermarks require TIMESTAMP (with local tz); NTZ event times are
    cast — wall-clock values are preserved."""
    if df.isStreaming:
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_agg(
    df: DataFrame, ts_col: str = "ts", keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour", value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window count + sum per key. Works identically on batch
    (oracle: GROUP BY date_trunc) and streaming (watermarked state)."""
    df = with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys, "n", "total_value",
        )
    )


def sliding_counts(
    df: DataFrame, ts_col: str = "ts", keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour", slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding (hopping) window counts — each event lands in
    window/slide buckets."""
    df = with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"), *keys, "n",
        )
    )


def windowed_hll_registers(
    df: DataFrame, value_col: str, ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",), window: str = "1 hour",
    watermark: str = "10 minutes", p: int = 10,
) -> DataFrame:
    """Distinct-count SKETCH per tumbling window: HLL register rows
    ``(window_start, keys..., bucket, max_rho)``.

    ``count(DISTINCT x)`` is not an incremental streaming aggregate —
    exact distinct state grows with cardinality and Structured
    Streaming rejects it. HLL registers ARE incremental: ``max(rho)``
    per (window, key, bucket) is an ordinary watermarked streaming
    aggregation with bounded state (<= 2^p rows per group), and the
    SAME function body runs on a batch DataFrame for the oracle
    comparison. Fold the sink's register table with
    ``ops.sketches.hll_estimate(group_cols=['window_start', *keys])``
    — kept as a separate stateless step because chaining a second
    stateful aggregate onto a streaming query is the thing Structured
    Streaming restricts, and the register table is itself the
    mergeable artifact worth persisting (late increments re-max in).
    """
    from ..ops.sketches import hll_bucket_rho

    df = with_watermark(df, ts_col, watermark)
    bucket, rho = hll_bucket_rho(F.col(value_col), p)
    return (
        df.select(
            F.col(ts_col), *keys,
            bucket.alias("bucket"), rho.alias("rho"),
        )
        .groupBy(F.window(ts_col, window).alias("w"), *keys, "bucket")
        .agg(F.max("rho").alias("max_rho"))
        .select(F.col("w.start").alias("window_start"), *keys,
                "bucket", "max_rho")
    )


def windowed_cms_table(
    df: DataFrame, value_col: str, ts_col: str = "ts",
    keys: tuple[str, ...] = (), window: str = "1 hour",
    watermark: str = "10 minutes", depth: int = 4, width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Count-min sketch per tumbling window: cell rows
    ``(window_start, keys..., row, bucket, c)`` — the heavy-hitter /
    point-frequency artifact over a stream.

    Exact per-value counts over a high-cardinality stream need
    unbounded state; the CMS cells are an ordinary watermarked SUM
    aggregation with state bounded by depth * width rows per (window,
    key) group, mergeable across restarts and late increments (sums
    re-add). The SAME function body runs on a batch DataFrame for the
    oracle comparison; fold the sink's cell table with
    ``ops.sketches.cms_estimate`` (min over rows never underestimates)
    or re-aggregate cells across windows (sum) for coarser spans."""
    from ..ops.sketches import cms_cell_rows

    df = with_watermark(df, ts_col, watermark)
    return (
        df.select(F.col(ts_col), *keys,
                  cms_cell_rows(value_col, depth, width, seed))
        .groupBy(F.window(ts_col, window).alias("w"), *keys,
                 F.col("rb.row").alias("row"),
                 F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("window_start"), *keys,
                "row", "bucket", "c")
    )


def sessionize(
    df: DataFrame, ts_col: str = "ts", key: str = "user_id",
    gap: str = "30 minutes", watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: activity runs per key separated by >= gap.
    Uses the built-in ``session_window`` (merging state windows under
    streaming; a sort-based merge under batch)."""
    df = with_watermark(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events", "total_value",
        )
    )


def streaming_dedup(
    df: DataFrame, keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts", watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once event dedup within the watermark horizon
    (``dropDuplicates`` is state-store backed on streams; plain distinct
    on batch)."""
    df = with_watermark(df, ts_col, watermark)
    if df.isStreaming:
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def streaming_url_dedup(
    df: DataFrame, url_col: str = "url", ts_col: str = "ts",
    watermark: str = "1 hour", keep_invalid: bool = False,
) -> DataFrame:
    """URL-exact dedup on an ARRIVING corpus: normalize each URL with
    the batch front door's exact expression (ops/urls.normalize_url —
    scheme/host lowering, www/default-port/fragment/tracking-param
    strips) and keep ONE row per normalized URL within the watermark
    horizon. The normalization is a narrow projection, so the only
    streaming state is the dropDuplicates key store — bounded by the
    watermark, exactly like streaming_dedup.

    Unparseable URLs (url_norm NULL) are dropped by default;
    ``keep_invalid=True`` passes every one of them through UNTOUCHED —
    they have no identity to dedup on, matching
    ops/urls.url_exact_dedup (NULL must never become a shared dedup
    key that collapses all malformed rows into one survivor).

    Survivor choice: on a stream, the first arrival the state store
    sees (micro-batch processing order). On a batch DataFrame the
    survivor is DETERMINISTIC — earliest ``ts_col``, ties broken by
    the full-row hash — so retries and repartitioning keep the same
    rows, the module-wide rule."""
    from pyspark.sql.window import Window

    from ..ops.urls import normalize_url

    out = df.withColumn("url_norm", normalize_url(F.col(url_col)))
    valid = with_watermark(out.filter(F.col("url_norm").isNotNull()),
                           ts_col, watermark)
    if valid.isStreaming:
        kept = valid.dropDuplicatesWithinWatermark(["url_norm"])
    else:
        w = Window.partitionBy("url_norm").orderBy(
            F.col(ts_col).asc(),
            F.xxhash64(*[F.col(c) for c in out.columns]))
        kept = (valid.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
    if keep_invalid:
        inv = with_watermark(out.filter(F.col("url_norm").isNull()),
                             ts_col, watermark)
        return kept.unionByName(inv)
    return kept
