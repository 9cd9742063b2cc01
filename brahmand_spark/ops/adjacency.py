"""Grouped-adjacency materialization — the Spark analogue of the
reference's bitmap adjacency indexes.

The reference maintains, per ``ADJ INDEX(true)`` relationship, two
AggregatingMergeTree tables ``{rel}_outgoing`` / ``{rel}_incoming`` of
``(from_id, groupBitmapState(to_id))`` kept fresh by materialized views
(ddl_query.rs:290-311), and traverses them with
``arrayJoin(bitmapToArray(to_id))`` (graph_traversal_planning.rs:685-691).

In Spark the same physical idea is a pre-grouped table
``groupBy(src).agg(collect_set(dst))`` written once (or refreshed
incrementally via Structured Streaming), and traversal is
``explode(neighbors)`` — a narrow operation replacing the per-hop
edge-shuffle with a co-partitioned scan. Worth materializing when a
relationship is traversed many times per analysis session; the plain
edge-list join (the compiler default) is otherwise better because AQE
can still broadcast/skew-split it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import RelationshipSchema


def build_adjacency(
    edges: DataFrame, src_col: str, dst_col: str,
    num_buckets: Optional[int] = None,
) -> DataFrame:
    """``(src, neighbors array<id>, degree)`` — one row per source node.
    ``num_buckets`` repartitions by src so the written table is
    co-partitioned for downstream joins against node ids."""
    adj = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.collect_set(F.col(dst_col)).alias("neighbors"))
        .withColumn("degree", F.size("neighbors"))
    )
    if num_buckets:
        adj = adj.repartition(num_buckets, "src")
    return adj


def materialize_for_rel(
    session, rel: RelationshipSchema, path_prefix: str,
) -> dict[str, str]:
    """Write ``{rel}_outgoing`` / ``{rel}_incoming`` grouped-adjacency
    parquet tables (the reference's two direction tables,
    ddl_query.rs:290-296) and register them. Returns name->path."""
    edges = session._load_for_label(rel.type_name)
    out: dict[str, str] = {}
    for direction, (s, d) in {
        "outgoing": (rel.from_column, rel.to_column),
        "incoming": (rel.to_column, rel.from_column),
    }.items():
        name = f"{rel.type_name}_{direction}"
        path = f"{path_prefix}/{name}.parquet"
        build_adjacency(edges, s, d).write.mode("overwrite").parquet(path)
        session.register_table(name, path)
        out[name] = path
    return out


def expand(adj: DataFrame, direction_ids: DataFrame,
           id_col: str) -> DataFrame:
    """Traverse one hop through a grouped-adjacency table:
    semi-restrict to the frontier ids, then ``explode(neighbors)`` —
    the analogue of ``arrayJoin(bitmapToArray(to_id))`` with the
    reference's ``IN (SELECT ...)`` pruning folded into a leftsemi join.
    Returns ``(src, dst)`` pairs."""
    frontier = direction_ids.select(F.col(id_col).alias("src")).distinct()
    return (
        adj.join(frontier, on="src", how="leftsemi")
        .select("src", F.explode("neighbors").alias("dst"))
    )


def write_adjacency_bucketed(
    adj: DataFrame, path: str, num_buckets: int = 64,
) -> None:
    """Write a grouped-adjacency table partitioned by a hash bucket of
    src — the layout incremental maintenance needs (only touched buckets
    are rewritten)."""
    (
        adj.withColumn(
            "bucket", F.pmod(F.col("src"), F.lit(num_buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def maintain_adjacency_stream(
    edges_stream: DataFrame, path: str, src_col: str, dst_col: str,
    checkpoint_dir: str, num_buckets: int = 64,
):
    """Keep a grouped-adjacency table fresh from an edge stream — the
    Spark analogue of the reference's materialized views
    (mv_{rel}_outgoing -> AggregatingMergeTree, ddl_query.rs:304-310).

    Each microbatch: (1) find the buckets its sources hash into,
    (2) read ONLY those bucket partitions of the existing table,
    (3) merge old neighbor lists with the batch's new edges,
    (4) dynamic-partition-overwrite just those buckets. Work per batch is
    proportional to touched buckets, not table size. (With Delta/Iceberg
    this becomes a MERGE; plain parquet needs the bucket layout.)

    Returns the StreamingQuery (caller awaits/stops it).
    """
    spark = edges_stream.sparkSession

    def upsert(batch_df, batch_id: int) -> None:
        new_pairs = batch_df.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        if new_pairs.isEmpty():
            return
        new_pairs = new_pairs.withColumn(
            "bucket", F.pmod(F.col("src"), F.lit(num_buckets)).cast("int")
        )
        buckets = [r.bucket for r in
                   new_pairs.select("bucket").distinct().collect()]
        try:
            existing = spark.read.parquet(path).filter(
                F.col("bucket").isin(buckets)
            ).select(
                "src", F.explode("neighbors").alias("dst"), "bucket"
            )
            all_pairs = existing.unionByName(new_pairs)
        except Exception:  # first batch: nothing materialized yet
            all_pairs = new_pairs
        merged = (
            all_pairs.groupBy("src", "bucket")
            .agg(F.collect_set("dst").alias("neighbors"))
            .withColumn("degree", F.size("neighbors"))
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("bucket").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        edges_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def degree_stats(adj: DataFrame) -> DataFrame:
    """Degree distribution summary — the skew diagnostic that decides
    whether a traversal needs salting (heavy-hitter sources)."""
    return adj.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("degree").alias("n_edges"),
        F.max("degree").alias("max_degree"),
        F.round(F.avg("degree"), 2).alias("avg_degree"),
        F.percentile_approx("degree", 0.99).alias("p99_degree"),
    )
