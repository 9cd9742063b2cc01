"""CALL procedures (brahmand_spark/procedures.py): Cypher surface over
ops/algos — parity with direct calls, a DuckDB oracle through the full
CALL pipeline, and the error surface."""

import pytest

from brahmand_spark.errors import PlanError

from .helpers import assert_same


class TestCallProcedures:
    def test_degrees_full_pipeline_vs_duckdb(self, tpch, duck):
        got = tpch.execute(
            "CALL graph.degrees('PLACED') YIELD id, out_degree AS o "
            "WHERE o >= 5 ORDER BY o DESC, id ASC SKIP 2 LIMIT 10")
        want = duck.sql("""
            SELECT id, o FROM (
                SELECT o_custkey AS id, count(*) AS o
                FROM orders GROUP BY o_custkey)
            WHERE o >= 5 ORDER BY o DESC, id ASC OFFSET 2 LIMIT 10""")
        assert_same(got, want)

    def test_pagerank_matches_direct_call(self, tpch):
        from brahmand_spark.ops.algos import pagerank
        from pyspark.sql import functions as F

        via_call = tpch.execute(
            "CALL graph.pagerank('NEXT_CUST', 5) YIELD id, rank")
        edges = tpch.tables["NEXT_CUST"].select(
            F.col("from_Customer").alias("src"),
            F.col("to_Customer").alias("dst"))
        direct = pagerank(edges, iterations=5)
        assert sorted(map(tuple, via_call.collect())) \
            == sorted(map(tuple, direct.collect()))

    def test_scc_and_wcc_and_harmonic(self, tpch):
        from brahmand_spark.ops.algos import connected_components
        from pyspark.sql import functions as F

        wcc = tpch.execute("CALL graph.wcc('NEXT_CUST')")
        assert set(wcc.columns) == {"id", "component"}
        edges = tpch.tables["NEXT_CUST"].select(
            F.col("from_Customer").alias("src"),
            F.col("to_Customer").alias("dst"))
        assert sorted(map(tuple, wcc.collect())) \
            == sorted(map(tuple, connected_components(edges).collect()))
        scc = tpch.execute("CALL graph.scc('NEXT_CUST', 30)")
        # NEXT_CUST is a directed chain: every vertex its own SCC
        assert scc.filter("id <> scc").count() == 0
        h = tpch.execute(
            "CALL graph.harmonic('NEXT_CUST', 8, 4) "
            "YIELD id, centrality ORDER BY centrality DESC LIMIT 5")
        assert h.count() == 5

    def test_parameter_args(self, tpch):
        a = tpch.execute(
            "CALL graph.bfs('NEXT_CUST', $src, 3) YIELD id, distance",
            params={"src": 0})
        assert sorted(r["id"] for r in a.collect()) == [0, 1, 2, 3]

    def test_error_surface(self, tpch):
        with pytest.raises(PlanError, match="unknown procedure"):
            tpch.execute("CALL graph.nope('PLACED')")
        with pytest.raises(PlanError, match="unknown relationship"):
            tpch.execute("CALL graph.pagerank('NOPE')")
        with pytest.raises(PlanError, match="yields no column"):
            tpch.execute("CALL graph.pagerank('NEXT_CUST') YIELD nope")
        with pytest.raises(PlanError, match="literals"):
            tpch.execute("CALL graph.pagerank(1 + 2)")
        with pytest.raises(PlanError, match="graph.kcore"):
            tpch.execute("CALL graph.kcore('NEXT_CUST')")  # k missing


class TestDbIntrospection:
    def test_labels_and_relationships(self, tpch):
        labels = {r["label"]: r for r in
                  tpch.execute("CALL db.labels()").collect()}
        assert "Customer" in labels and "Order" in labels
        assert labels["Customer"]["id_column"] == "c_custkey"
        rels = {r["type"]: r for r in tpch.execute(
            "CALL db.relationships() YIELD type, from_node, to_node"
        ).collect()}
        assert rels["PLACED"]["from_node"] == "Customer"
        assert rels["PLACED"]["to_node"] == "Order"

    def test_filterable_like_any_call(self, tpch):
        one = tpch.execute(
            "CALL db.relationships() YIELD type, adj_index "
            "WHERE type = 'PLACED'")
        assert one.count() == 1


class TestSsspProcedure:
    def test_matches_direct_call(self, tpch):
        from brahmand_spark.ops.algos import sssp_weighted
        from pyspark.sql import functions as F

        got = tpch.execute(
            "CALL graph.sssp('HAS_LINE', 'l_linenumber', 1, 4) "
            "YIELD id, dist ORDER BY id")
        edges = tpch.tables["HAS_LINE"].select(
            F.col("from_Order").alias("src"),
            F.col("to_Lineitem").alias("dst"),
            F.col("l_linenumber").alias("weight"))
        src = tpch.spark.createDataFrame([(1,)], "id bigint")
        want = sssp_weighted(edges, src, max_iterations=4)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect()))

    def test_unknown_weight_property(self, tpch):
        import pytest
        from brahmand_spark.errors import PlanError

        with pytest.raises(PlanError, match="no property"):
            tpch.execute("CALL graph.sssp('HAS_LINE', 'nope', 1)")


class TestCorpusProcedures:
    def test_profile_via_call(self, tpch):
        from brahmand_spark.ops.profile import profile_corpus

        got = tpch.execute("CALL corpus.profile('Customer', true)")
        want = profile_corpus(tpch._load_for_label("Customer"),
                              exact_distinct=True)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, want.collect()))

    def test_histogram_via_call(self, tpch):
        from pyspark.sql import functions as F

        h = tpch.execute(
            "CALL corpus.histogram('Order', 'o_totalprice', 5)")
        n = tpch._load_for_label("Order").count()
        assert h.agg(F.sum("n")).first()[0] == n
        assert h.count() <= 5


def test_personalized_pagerank_via_call(tpch):
    from brahmand_spark.ops.algos import pagerank
    from pyspark.sql import functions as F

    got = tpch.execute(
        "CALL graph.pagerank('NEXT_CUST', 5, 0.85, [0, 1]) "
        "YIELD id, rank")
    edges = tpch.tables["NEXT_CUST"].select(
        F.col("from_Customer").alias("src"),
        F.col("to_Customer").alias("dst"))
    seeds = tpch.spark.createDataFrame([(0,), (1,)], "id bigint")
    want = pagerank(edges, iterations=5, sources=seeds)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


class TestCorpusPipelineProcedures:
    """The LLM-pipeline flagship operators reachable from Cypher:
    CALL corpus.{dedup_minhash,semdedup,bm25,curate} dispatch onto the
    existing ops, so a Cypher-first user gets the pipeline half of the
    engine from the query language. Parity with direct calls + the
    existing DuckDB oracles through the full CALL pipeline."""

    def test_bm25_via_call_vs_duckdb_oracle(self, tpch, duck):
        from brahmand_spark.ops.search import bm25_oracle_sql

        got = tpch.execute(
            "CALL corpus.bm25('Document', 'spark join vector', 20)")
        assert_same(got, duck.sql(
            bm25_oracle_sql(["spark", "join", "vector"], k=20)))

    def test_bm25_term_list_and_pipeline_tail(self, tpch):
        a = tpch.execute(
            "CALL corpus.bm25('Document', ['spark', 'join'], 10) "
            "YIELD doc_id, bm25 WHERE bm25 > 0 "
            "ORDER BY bm25 DESC, doc_id LIMIT 5")
        assert 0 < a.count() <= 5

    def test_dedup_minhash_via_call_matches_direct(self, tpch):
        from brahmand_spark.ops.dedup import minhash_lsh_candidates
        from pyspark.sql import functions as F

        got = tpch.execute(
            "CALL corpus.dedup_minhash('Document', 0.5)")
        direct = minhash_lsh_candidates(
            tpch.tables["Document"], "doc_id", "text",
            num_hashes=64, bands=16,
        ).filter(F.col("est_jaccard") >= 0.5)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, direct.collect()))

    def test_semdedup_via_call_matches_direct(self, tpch):
        from brahmand_spark.ops.semdedup import semdedup

        got = tpch.execute(
            "CALL corpus.semdedup('Embedding', 0.4, 4) "
            "YIELD vec_id, keep")
        direct = semdedup(tpch.tables["Embedding"], k=4,
                          threshold=0.4).select("vec_id", "keep")
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, direct.collect()))
        # the threshold actually drops something at 0.4
        assert got.filter("NOT keep").count() > 0

    def test_curate_via_call_matches_direct(self, tpch):
        from brahmand_spark.ops.pipeline import curate

        got = tpch.execute(
            "CALL corpus.curate('Document', ['en', 'de', 'es', 'fr'], "
            "0.1) YIELD doc_id, split")
        direct, _ = curate(
            tpch.tables["Document"],
            languages=("en", "de", "es", "fr"), min_quality=0.1)
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple,
                          direct.select("doc_id", "split").collect()))

    def test_unknown_label_error(self, tpch):
        with pytest.raises(Exception, match="unknown label"):
            tpch.execute(
                "CALL corpus.bm25('Nope', 'spark', 5)").collect()

    def test_dedup_groups_via_call(self, tpch):
        """Transitive groups: keep = min id of each component; total
        over the corpus; keep-count equals distinct groups."""
        got = tpch.execute(
            "CALL corpus.dedup_groups('Document', 0.5)")
        rows = got.collect()
        assert len(rows) == tpch.tables["Document"].count()
        groups = {}
        for r in rows:
            groups.setdefault(r["group"], []).append(
                (r["doc_id"], r["keep"]))
        for g, members in groups.items():
            kept = [d for d, k in members if k]
            assert kept == [min(d for d, _ in members)] == [g]


class TestDbIndexes:
    """CALL db.indexes() (r10): one introspection surface over BOTH
    persisted index families with the drift/health counters."""

    def test_lists_both_families_with_health_counters(
            self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        from brahmand_spark import GraphSession
        from .conftest import SF_SMOKE

        s = GraphSession(spark, models_path=str(tmp_path / "m"),
                         allow_writes=False)
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
            .select("doc_id", "text")
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        s.execute("CREATE NODE TABLE Doc (doc_id Int64, text String, "
                  "NODE ID (doc_id))")
        s.register_table("Doc", docs.filter(F.col("doc_id") % 2 == 0))
        s.execute("CREATE NODE TABLE DocB (doc_id Int64, text String, "
                  "NODE ID (doc_id))")
        s.register_table("DocB", docs.filter(F.col("doc_id") % 2 == 1))
        s.execute("CREATE NODE TABLE Gone (doc_id Int64, "
                  "NODE ID (doc_id))")
        s.register_table(
            "Gone", docs.filter(F.col("doc_id") % 10 == 0)
            .select("doc_id"))
        s.execute("CREATE NODE TABLE Embedding (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table("Embedding", emb)

        s.execute("CALL corpus.build_dedup_index('Doc', 'dix')")
        s.execute("CALL corpus.dedup_add('dix', 'DocB')")
        n_gone = s.tables["Gone"].count()
        s.execute("CALL corpus.dedup_remove('dix', 'Gone')")
        s.execute("CALL vector.build_index('Embedding', 'vidx', 8, 4, 8)")

        rows = {r["name"]: r for r in
                s.execute("CALL db.indexes()").collect()}
        assert set(rows) == {"dix", "vidx"}
        d = rows["dix"]
        assert d["kind"] == "dedup_index"
        # n_docs is maintained net of tombstones by dedup_index_remove
        assert d["n_live"] == docs.count() - n_gone
        assert d["add_batches"] == 1       # the dedup_add batch
        assert d["tombstones"] == n_gone
        assert d["cell_skew"] is None
        assert json.loads(d["config"])["bands"] == 16
        v = rows["vidx"]
        assert v["kind"] == "ann_index"
        assert v["n_live"] == emb.count()
        assert v["tombstones"] == 0
        assert v["stats_delta_depth"] is None
        assert v["cell_skew"] is not None and v["cell_skew"] >= 1.0
        assert json.loads(v["config"])["n_cells"] == 8

    def test_empty_store_returns_no_rows(self, spark, tmp_path):
        from brahmand_spark import GraphSession

        s = GraphSession(spark, models_path=str(tmp_path / "m2"))
        assert s.execute("CALL db.indexes()").count() == 0

    def test_yield_filter_on_health_columns(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from brahmand_spark import GraphSession
        from .conftest import SF_SMOKE

        s = GraphSession(spark, models_path=str(tmp_path / "m3"))
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        s.execute("CREATE NODE TABLE Embedding (vec_id Int64, "
                  "NODE ID (vec_id))")
        s.register_table("Embedding", emb)
        s.execute("CALL vector.build_index('Embedding', 'v1', 8, 4, 8)")
        out = s.execute(
            "CALL db.indexes() YIELD name, kind, cell_skew "
            "WHERE kind = 'ann_index' ORDER BY name").collect()
        assert [r["name"] for r in out] == ["v1"]
        assert out[0]["cell_skew"] >= 1.0
