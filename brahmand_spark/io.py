"""Parquet source loading.

The reference's only source is ClickHouse tables over HTTP
(server/clickhouse_client.rs:10-19); ours is Spark's native parquet
reader, which hands Catalyst predicate pushdown + column pruning +
partition pruning for free.

One wrinkle: Spark refuses parquet TIMESTAMP(NANOS) columns by default
(PARQUET_TYPE_ILLEGAL). We set ``spark.sql.legacy.parquet.nanosAsLong``
and rebuild the value as TIMESTAMP_NTZ with pure epoch arithmetic —
timezone-free, so results hash-match engines (DuckDB) that read nanos
natively as naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def configure(spark: SparkSession) -> None:
    """Session tuning; safe to call repeatedly (used by entry points that
    receive an externally-built SparkSession)."""
    spark.conf.set(_NANOS_CONF, "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


def _nanos_columns(path: str) -> list[str]:
    try:
        import pyarrow.parquet as pq
        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    nanos = _nanos_columns(path)
    if nanos and spark.conf.get(_NANOS_CONF, "false") != "true":
        spark.conf.set(_NANOS_CONF, "true")
    df = spark.read.parquet(path)
    for c in nanos:
        # long nanos -> TIMESTAMP_NTZ via epoch arithmetic (no timezone
        # interpretation anywhere, unlike timestamp_micros which yields LTZ).
        df = df.withColumn(
            c,
            F.expr(
                f"timestampadd(MICROSECOND, `{c}` div 1000, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df
