"""Streaming/windowing operators: batch-mode oracle checks + a real
Structured Streaming run (availableNow trigger -> memory sink) proving
the same transform works on a stream."""

import pyspark.sql.functions as F
import pytest

from .conftest import SF_SMOKE
from .helpers import assert_same


@pytest.fixture(scope="module")
def events(spark):
    from brahmand_spark.io import read_parquet

    return read_parquet(spark, f"{SF_SMOKE}/events.parquet")


class TestBatchWindows:
    def test_tumbling_agg(self, events, duck):
        from brahmand_spark.streaming import tumbling_agg

        assert_same(
            tumbling_agg(events, window="1 hour"),
            duck.sql("""
                SELECT date_trunc('hour', ts) AS window_start,
                       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
                       event_type, count(*) AS n,
                       round(sum(value), 2) AS total_value
                FROM events GROUP BY 1, 2, 3"""),
        )

    def test_sessionize(self, events, duck):
        from brahmand_spark.streaming import sessionize

        assert_same(
            sessionize(events, gap="30 minutes"),
            duck.sql("""
                WITH marked AS (
                    SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                     OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                                THEN 1 ELSE 0 END AS new_session
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
                numbered AS (
                    SELECT *, sum(new_session) OVER (
                        PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
                    FROM marked)
                SELECT user_id, min(ts) AS session_start,
                       max(ts) + INTERVAL 30 MINUTE AS session_end,
                       count(*) AS n_events,
                       round(sum(value), 2) AS total_value
                FROM numbered GROUP BY user_id, sid"""),
        )

    def test_sliding_counts(self, events, duck):
        from brahmand_spark.streaming import sliding_counts

        assert_same(
            sliding_counts(events, window="1 hour", slide="30 minutes"),
            duck.sql("""
                SELECT time_bucket(INTERVAL '30 minutes', ts)
                           - (k * INTERVAL '30 minutes') AS window_start,
                       event_type, count(*) AS n
                FROM events, (VALUES (0), (1)) t(k)
                GROUP BY 1, 2"""),
        )

    def test_batch_dedup(self, spark):
        from brahmand_spark.streaming import streaming_dedup

        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1.0),
             (1, "2024-01-01 00:05:00", 2.0),
             (2, "2024-01-01 00:10:00", 3.0)],
            "event_id long, ts string, value double",
        ).selectExpr("event_id", "cast(ts as timestamp) ts", "value")
        assert streaming_dedup(df).count() == 2


class TestRealStream:
    def test_stream_tumbling_matches_batch(self, spark, events, tmp_path):
        """Drive the SAME transform through readStream (availableNow ->
        memory sink) and check it equals the batch result."""
        from brahmand_spark.streaming import read_event_stream, tumbling_agg

        src = str(tmp_path / "stream_src")
        events.write.mode("overwrite").parquet(src)
        stream = read_event_stream(spark, src, max_files_per_trigger=2)
        assert stream.isStreaming
        out = tumbling_agg(stream, window="1 hour")
        q = (
            out.writeStream.format("memory").queryName("tumbling_test")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT window_start, event_type, n, total_value "
            "FROM tumbling_test"
        ).toPandas()
        want = tumbling_agg(events, window="1 hour").select(
            "window_start", "event_type", "n", "total_value"
        ).toPandas()
        from .helpers import canon

        assert canon(got) == canon(want)


class TestAdjacency:
    def test_build_and_expand(self, spark, tpch):
        from brahmand_spark.ops.adjacency import build_adjacency, expand

        edges = tpch.tables["PLACED"]
        adj = build_adjacency(edges, "from_Customer", "to_Order")
        customers = tpch.tables["Customer"].select("c_custkey")
        pairs = expand(adj, customers, "c_custkey")
        assert pairs.count() == edges.count()
        direct = {(r.from_Customer, r.to_Order) for r in edges.collect()}
        via_adj = {(r.src, r.dst) for r in pairs.collect()}
        assert direct == via_adj

    def test_expand_prunes_frontier(self, spark, tpch):
        from brahmand_spark.ops.adjacency import build_adjacency, expand

        edges = tpch.tables["PLACED"]
        adj = build_adjacency(edges, "from_Customer", "to_Order")
        frontier = tpch.tables["Customer"].select("c_custkey").limit(10)
        pairs = expand(adj, frontier, "c_custkey").collect()
        frontier_ids = {r.c_custkey for r in frontier.collect()}
        assert {r.src for r in pairs} <= frontier_ids

    def test_degree_stats(self, tpch):
        from brahmand_spark.ops.adjacency import build_adjacency, degree_stats

        adj = build_adjacency(
            tpch.tables["PLACED"], "from_Customer", "to_Order"
        )
        stats = degree_stats(adj).first()
        assert stats.n_edges == tpch.tables["PLACED"].count()
        assert stats.max_degree >= stats.avg_degree


class TestIncrementalAdjacency:
    def test_stream_maintained_equals_batch(self, spark, tpch, tmp_path):
        """Stream the PLACED edges in file chunks into a maintained
        adjacency table; the final table must equal the batch-built one."""
        from brahmand_spark.ops.adjacency import (
            build_adjacency, maintain_adjacency_stream,
        )

        edges = tpch.tables["PLACED"]
        src_dir = str(tmp_path / "edge_stream")
        adj_path = str(tmp_path / "adj")
        ckpt = str(tmp_path / "ckpt")
        edges.repartition(6).write.mode("overwrite").parquet(src_dir)

        stream = (
            spark.readStream.schema(edges.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src_dir)
        )
        q = maintain_adjacency_stream(
            stream, adj_path, "from_Customer", "to_Order", ckpt,
            num_buckets=8,
        )
        q.awaitTermination(180)

        got = (
            spark.read.parquet(adj_path)
            .select("src", F.explode("neighbors").alias("dst"))
        )
        want = (
            build_adjacency(edges, "from_Customer", "to_Order")
            .select("src", F.explode("neighbors").alias("dst"))
        )
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))
