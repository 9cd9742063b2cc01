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


_EXT_FORMATS = {
    ".parquet": "parquet", ".csv": "csv", ".tsv": "csv", ".json": "json",
    ".jsonl": "json", ".ndjson": "json", ".orc": "orc",
}


def read_source(
    spark: SparkSession, source: str, fmt: str | None = None, **options
) -> DataFrame:
    """Load a table from any Spark-native file source (parquet / CSV /
    JSON-lines / ORC, dispatched by extension or explicit ``fmt``) or
    fall back to a registered Spark view/table name. Parquet goes
    through ``read_parquet`` for the nanos-timestamp handling; CSV
    defaults to header+inferSchema (pass options to override). All
    formats keep Catalyst's pushdown/pruning where the source supports
    it (parquet/ORC; CSV/JSON prune columns only)."""
    if fmt is None:
        for ext, f in _EXT_FORMATS.items():
            if source.endswith(ext):
                fmt = f
                break
    if fmt is None:
        import os

        if os.path.isdir(source):
            fmt = "parquet"  # directory datasets default to parquet
        else:
            return spark.table(source)
    if fmt == "parquet":
        return read_parquet(spark, source)
    reader = spark.read
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": "true"}
        if source.endswith(".tsv"):
            opts["sep"] = "\t"
        opts.update(options)
        return reader.options(**opts).csv(source)
    opts = dict(options)
    if fmt == "json":
        return reader.options(**opts).json(source)
    if fmt == "orc":
        return reader.options(**opts).orc(source)
    return reader.format(fmt).options(**opts).load(source)


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
