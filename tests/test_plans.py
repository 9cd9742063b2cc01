"""Plan-quality assertions: the compiled Cypher queries must produce
physical plans with filters and projections pushed to the parquet scans,
broadcast joins for small dimensions, and no Python (BatchEvalPython)
stages in the Cypher path."""


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestPlanQuality:
    def test_filter_pushed_to_scan(self, tpch):
        df = tpch.execute("""
            MATCH (c:Customer)-[:PLACED]->(o:Order)
            WHERE o.o_totalprice > 300000 AND c.c_acctbal > 0
            RETURN c.c_name AS name, count(*) AS n""")
        plan = formatted(df)
        assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,300000.0)" in plan
        assert "GreaterThan(c_acctbal,0.0)" in plan

    def test_column_pruning(self, tpch):
        df = tpch.execute(
            "MATCH (c:Customer) RETURN c.c_name AS name"
        )
        plan = formatted(df)
        # scan must read only the projected column
        assert "ReadSchema: struct<c_name:string>" in plan

    def test_broadcast_small_dimension(self, tpch):
        df = tpch.execute("""
            MATCH (c:Customer)-[:CUST_IN]->(n:Nation)-[:IN_REGION]->(r:Region)
            WHERE r.r_name = 'ASIA'
            RETURN count(*) AS n""")
        plan = physical_plan(df)
        assert "BroadcastHashJoin" in plan

    def test_no_python_in_cypher_path(self, tpch):
        df = tpch.execute("""
            MATCH (c:Customer)-[:PLACED]->(o:Order)
            RETURN toUpper(c.c_mktsegment) AS seg,
                   round(avg(o.o_totalprice), 2) AS avg_price""")
        plan = physical_plan(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_whole_stage_codegen_present(self, tpch):
        df = tpch.execute(
            "MATCH (c:Customer) WHERE c.c_acctbal > 0 "
            "RETURN c.c_acctbal * 2 AS x"
        )
        plan = physical_plan(df)
        # '*(n)' prefixes mark whole-stage-codegen stages in toString form
        assert "*(1)" in plan


class TestCatalogRefresh:
    def test_refresh_picks_up_new_version(self, spark, tmp_path):
        from brahmand_spark import GraphSession

        path = str(tmp_path / "catalog.json")
        s1 = GraphSession(spark, catalog_path=path)
        s1.execute("CREATE NODE TABLE A (id Int64, NODE ID (id))")
        s2 = GraphSession(spark, catalog_path=path)
        assert "A" in s2.schema.nodes
        s1.execute("CREATE NODE TABLE B (id Int64, NODE ID (id))")
        assert "B" not in s2.schema.nodes
        assert s2.refresh_catalog() is True
        assert "B" in s2.schema.nodes
        assert s2.refresh_catalog() is False


class TestAdjacencyPlanner:
    """Planner-integrated grouped-adjacency traversal (the reference's
    bitmap-index path: query_validation.rs:103-124 eligibility +
    graph_traversal_planning.rs:678-807 expansion)."""

    QUERY = """MATCH (c:Customer)-[:PLACED]->(o:Order)
               WHERE c.c_custkey <= 100
               RETURN c.c_custkey AS src, o.o_orderkey AS dst"""

    def _fresh(self, spark):
        from brahmand_spark.graphs.tpch import build_session

        from .conftest import SF_SMOKE

        return build_session(spark, SF_SMOKE)

    def test_adjacency_hop_equals_edge_list(self, spark, tpch):
        expected = tpch.execute(self.QUERY)
        s = self._fresh(spark)
        s.build_adj_index("PLACED")
        got = s.execute(self.QUERY)
        assert physical_plan(got).count("Generate explode") == 1
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0

    def test_materialized_parquet_scan_in_plan(self, spark):
        # NB: short scratch path — plan toString truncates Location
        # strings at spark.sql.maxMetadataStringLength (100 chars).
        import shutil
        import tempfile

        scratch = tempfile.mkdtemp(prefix="adj", dir="/tmp")
        try:
            s = self._fresh(spark)
            s.build_adj_index("PLACED", path_prefix=scratch)
            got = s.execute(self.QUERY)
            plan = physical_plan(got)
            assert "PLACED_outgoing.parquet" in plan
            assert "Generate explode" in plan
            # the frontier filter must reach the adjacency parquet scan
            assert "LessThanOrEqual(src,100)" in plan
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_incoming_direction_uses_incoming_table(self, spark, tpch):
        q = """MATCH (o:Order)<-[:PLACED]-(c:Customer)
               WHERE c.c_acctbal < 0
               RETURN c.c_name AS name, count(*) AS orders"""
        s = self._fresh(spark)
        s.build_adj_index("PLACED", path_prefix=None)
        got = s.execute(q)
        assert "Generate explode" in physical_plan(got)
        expected = tpch.execute(q)
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0

    def test_either_direction_unions_both_tables(self, spark, tpch):
        # PREV_CUST: same-label AND prop-less — the only combination
        # where the 'both' orientation stays adjacency-eligible (a
        # prop-carrying rel like NEXT_CUST must dedup over props)
        q = """MATCH (a:Customer)-[:PREV_CUST]-(b:Customer)
               WHERE a.c_custkey <= 10
               RETURN a.c_custkey AS src, b.c_custkey AS dst"""
        s = self._fresh(spark)
        s.build_adj_index("PREV_CUST")
        got = s.execute(q)
        assert physical_plan(got).count("Generate explode") == 2
        expected = tpch.execute(q)
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0

    def test_either_direction_with_props_stays_on_edge_list(
            self, spark, tpch):
        """A rel WITH property columns must NOT take the adjacency
        'both' path: the edge-list plan dedups over (src, dst,
        props) while the prop-less adjacency tables dedup over bare
        pairs — the cardinalities differ for reciprocal edges with
        distinct props (NEXT_CUST carries hop_w since r9)."""
        q = """MATCH (a:Customer)-[:NEXT_CUST]-(b:Customer)
               WHERE a.c_custkey <= 10
               RETURN a.c_custkey AS src, b.c_custkey AS dst"""
        s = self._fresh(spark)
        s.build_adj_index("NEXT_CUST")
        got = s.execute(q)
        assert physical_plan(got).count("Generate explode") == 0
        expected = tpch.execute(q)
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0

    def test_rel_filter_falls_back_to_edge_list(self, spark):
        s = self._fresh(spark)
        s.build_adj_index("HAS_LINE")
        got = s.execute("""
            MATCH (o:Order)-[h:HAS_LINE]->(l:Lineitem)
            WHERE h.l_linenumber = 1 RETURN count(*) AS n""")
        assert "Generate explode" not in physical_plan(got)

    def test_rel_projection_falls_back_to_edge_list(self, spark):
        s = self._fresh(spark)
        s.build_adj_index("HAS_LINE")
        got = s.execute("""
            MATCH (o:Order)-[h:HAS_LINE]->(l:Lineitem)
            RETURN h.l_linenumber AS ln, count(*) AS n""")
        assert "Generate explode" not in physical_plan(got)

    def test_var_length_falls_back_to_edge_list(self, spark, tpch):
        q = """MATCH (a:Customer)-[:NEXT_CUST*2..3]->(b:Customer)
               WHERE a.c_custkey <= 100
               RETURN a.c_custkey AS src, b.c_custkey AS dst"""
        s = self._fresh(spark)
        s.build_adj_index("NEXT_CUST")
        got = s.execute(q)
        expected = tpch.execute(q)
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0


class TestAdjacencyEquivalenceSweep:
    """With EVERY relationship's adjacency index materialized, the whole
    Cypher gate matrix must return identical results — the planner may
    only ever swap the physical hop, never the semantics. Queries that
    are ineligible (rel refs, var-length, paths) exercise the fallback
    branch of the same decision."""

    def test_all_cypher_gates_unchanged(self, spark, tpch):
        import __spark_entry__ as entry

        from brahmand_spark.graphs.tpch import build_session

        from .conftest import SF_SMOKE

        s = build_session(spark, SF_SMOKE)
        for rel in list(s.schema.relationships):
            s.build_adj_index(rel)
        mismatches = []
        for name, cypher in entry._CYPHER.items():
            expected = tpch.execute(cypher)
            got = s.execute(cypher)
            if (got.exceptAll(expected).count()
                    or expected.exceptAll(got).count()):
                mismatches.append(name)
        assert not mismatches, f"adjacency planner changed: {mismatches}"


class TestEndpointElision:
    """FK-join elimination: hop endpoints that contribute only their id
    bind straight from the edge column — no node-table scan, no join.
    Enabled for derived-FK graphs (graphs/tpch) where integrity holds
    by construction; plain GraphSession keeps the reference's
    dangling-edge-dropping inner joins."""

    def test_unreferenced_endpoints_drop_scans(self, tpch):
        df = tpch.execute(
            "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n")
        plan = physical_plan(df)
        assert "customer.parquet" not in plan
        assert plan.count("Join") == 0  # pure edge-table aggregate

    def test_id_only_access_elides(self, tpch):
        df = tpch.execute("""
            MATCH (c:Customer)-[:PLACED]->(o:Order)
            WHERE c.c_custkey <= 100
            RETURN c.c_custkey AS src, count(*) AS n""")
        plan = formatted(df)
        assert "customer.parquet" not in plan
        # the id filter pushes into the edge scan instead
        assert "LessThanOrEqual(o_custkey,100)" in plan

    def test_any_other_property_keeps_scan(self, tpch):
        df = tpch.execute("""
            MATCH (c:Customer)-[:PLACED]->(o:Order)
            RETURN c.c_name AS name, count(*) AS n""")
        assert "customer.parquet" in physical_plan(df)

    def test_disabled_without_integrity_flag(self, spark, tpch):
        from brahmand_spark.session import GraphSession

        s = GraphSession(spark, schema=tpch.schema)
        s.tables = tpch.tables
        df = s.execute(
            "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n")
        assert "customer.parquet" in physical_plan(df)
        # and results agree on clean data either way
        assert df.collect() == tpch.execute(
            "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n"
        ).collect()

    def test_elided_alias_still_joinable_downstream(self, tpch, duck):
        from .helpers import assert_same

        # o is id-only in expressions but structurally reused by a
        # second hop — the derived id column carries the join
        q = """MATCH (c:Customer)-[:PLACED]->(o:Order)
               MATCH (o)-[:HAS_LINE]->(l:Lineitem)
               RETURN count(*) AS n, count(DISTINCT o.o_orderkey) AS orders"""
        assert_same(tpch.execute(q), duck.sql(
            """SELECT count(*) AS n,
                      count(DISTINCT l_orderkey) AS orders
               FROM lineitem"""))


def test_adjacency_plus_elision_is_scan_and_explode_only(spark):
    """Composed fast path: adjacency index + id-only endpoints = the
    whole hop is one pre-grouped table scan + explode, no joins at
    all (the shape a 1000-executor traversal wants)."""
    from brahmand_spark.graphs.tpch import build_session

    from .conftest import SF_SMOKE

    s = build_session(spark, SF_SMOKE)
    s.build_adj_index("PLACED")
    df = s.execute("""
        MATCH (c:Customer)-[:PLACED]->(o:Order)
        WHERE c.c_custkey <= 100
        RETURN c.c_custkey AS src, o.o_orderkey AS dst""")
    plan = physical_plan(df)
    assert "Generate explode" in plan
    assert plan.count("Join") == 0
    # NB: the persisted adjacency's InMemoryRelation lineage still
    # PRINTS its build recipe (orders scan) — what matters is that no
    # node table participates in execution: no joins, no customer scan.
    assert "customer.parquet" not in plan
    assert df.count() > 0


def test_shortest_path_uses_adjacency_when_available(spark, tpch):
    from brahmand_spark.graphs.tpch import build_session

    from .conftest import SF_SMOKE

    q = """MATCH p = shortestPath((a:Customer)-[:NEXT_CUST*..3]->(b:Customer))
           WHERE a.c_custkey <= 50
           RETURN a.c_custkey AS src, b.c_custkey AS dst, length(p) AS dist"""
    s = build_session(spark, SF_SMOKE)
    s.build_adj_index("NEXT_CUST")
    got = s.execute(q)
    expected = tpch.execute(q)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


class TestFkFusion:
    """Node-table-backed relationships compile to single joins (edge
    'tables' that are FK projections of a node table never scan
    separately)."""

    def _scans_joins(self, df):
        import re

        p = physical_plan(df)
        return len(re.findall(r"FileScan parquet", p)), p.count("Join")

    def test_three_hop_chain_is_relational_join_tree(self, tpch):
        df = tpch.execute("""
            MATCH (c:Customer)-[:PLACED]->(o:Order)-[:HAS_LINE]->(l:Lineitem)-[:OF_PART]->(p:Part)
            WHERE p.p_size > 40 AND o.o_orderstatus = 'O'
            RETURN c.c_name AS name, p.p_name AS part, l.l_quantity AS qty""")
        scans, joins = self._scans_joins(df)
        assert (scans, joins) == (4, 3)  # customer⋈orders⋈lineitem⋈part

    def test_rel_property_hop_single_scan(self, tpch):
        df = tpch.execute("""
            MATCH (o:Order)-[h:HAS_LINE]->(l:Lineitem)
            WHERE h.l_linenumber = 1 AND l.l_quantity > 45
            RETURN o.o_orderkey AS okey, l.l_extendedprice AS price""")
        scans, joins = self._scans_joins(df)
        assert (scans, joins) == (1, 0)  # lineitem only; o elided

    def test_bare_rel_reference_disables_fusion(self, tpch, duck):
        from .helpers import assert_same

        # RETURN h expands all rel property columns -> edge-list path
        df = tpch.execute("""
            MATCH (o:Order)-[h:HAS_LINE]->(l:Lineitem)
            WHERE l.l_quantity > 49 RETURN h ORDER BY h.l_linenumber""")
        assert_same(df, duck.sql("""
            SELECT l_linenumber AS "h.l_linenumber" FROM lineitem
            WHERE l_quantity > 49 ORDER BY 1"""))

    def test_ddl_rels_keep_edge_list(self, spark):
        from brahmand_spark.session import GraphSession

        s = GraphSession(spark, allow_writes=True)
        s.execute("CREATE NODE TABLE V (id Int64, NODE ID (id))")
        s.execute("CREATE REL TABLE E FROM V TO V ()")
        s.execute("CREATE (:V {id: 1}), (:V {id: 2})")
        s.execute("MATCH (a:V {id: 1}) MATCH (b:V {id: 2}) "
                  "CREATE (a)-[:E]->(b)")
        rows = s.execute(
            "MATCH (a:V)-[:E]->(b:V) RETURN a.id AS s, b.id AS d").collect()
        assert [(r.s, r.d) for r in rows] == [(1, 2)]


def test_profile_summarizes_plan(tpch):
    p = tpch.profile(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n")
    assert p["joins"] == 0 and p["scans"] == 1  # fused + elided
    assert p["python_stages"] == 0
    assert "AdaptiveSparkPlan" in p["plan"]
    p2 = tpch.profile("""
        MATCH (c:Customer)-[:PLACED]->(o:Order)
        RETURN c.c_name AS name, round(avg(o.o_totalprice), 2) AS avg""")
    assert p2["joins"] == 1 and p2["scans"] == 2


class TestAdjacencyMultigraph:
    """Round-4 fix: the adjacency tables store per-neighbor
    multiplicity (counts array) and traversal re-expands it, so an
    adj-indexed hop returns the SAME rows as the edge-list plan on a
    multigraph (the old collect_set silently dropped parallel edges —
    the reference's bitmap semantics, ref ddl_query.rs:290-311, which
    we deliberately do not copy)."""

    def _session(self, spark):
        from brahmand_spark.catalog import (
            GraphSchema, NodeSchema, RelationshipSchema,
        )
        from brahmand_spark.session import GraphSession

        g = GraphSchema()
        g.add_node(NodeSchema("Person", "person_tbl", "id", ["id", "name"]))
        g.add_relationship(RelationshipSchema(
            "KNOWS", "knows_tbl", "Person", "Person", "src", "dst",
            ["src", "dst"],
        ))
        s = GraphSession(spark, schema=g)
        s.register_table("person_tbl", spark.createDataFrame(
            [(i, f"p{i}") for i in range(1, 6)], "id long, name string"))
        # parallel edges: 1->2 three times, 2->3 twice, 3->4 once
        s.register_table("knows_tbl", spark.createDataFrame(
            [(1, 2), (1, 2), (1, 2), (2, 3), (2, 3), (3, 4)],
            "src long, dst long"))
        return s

    QUERY = ("MATCH (a:Person)-[:KNOWS]->(b:Person) "
             "RETURN a.id AS src, b.id AS dst")

    def test_adj_hop_preserves_parallel_edge_cardinality(self, spark):
        s = self._session(spark)
        expected = sorted(map(tuple, s.execute(self.QUERY).collect()))
        assert expected == [(1, 2)] * 3 + [(2, 3)] * 2 + [(3, 4)]
        s.build_adj_index("KNOWS")
        got_df = s.execute(self.QUERY)
        assert "Generate explode" in physical_plan(got_df)
        assert sorted(map(tuple, got_df.collect())) == expected

    def test_incoming_multiplicity(self, spark):
        s = self._session(spark)
        q = ("MATCH (b:Person)<-[:KNOWS]-(a:Person) "
             "RETURN a.id AS src, b.id AS dst")
        expected = sorted(map(tuple, s.execute(q).collect()))
        s.build_adj_index("KNOWS")
        got = sorted(map(tuple, s.execute(q).collect()))
        assert got == expected

    def test_degree_is_true_edge_count(self, spark):
        from brahmand_spark.ops.adjacency import build_adjacency

        edges = spark.createDataFrame(
            [(1, 2), (1, 2), (1, 3)], "src long, dst long")
        row = build_adjacency(edges, "src", "dst").collect()[0]
        assert row.degree == 3
        assert sorted(row.neighbors) == [2, 3]
        assert sorted(row.counts) == [1, 2]


class TestSkewAwareHopPlanning:
    """Round-4: the hop planner consults degree stats captured at
    build_adj_index time and salts the frontier-edge join for
    supernode-heavy relationships (the analogue of the reference's
    per-hop bitmap-index physical decision,
    ref query_validation.rs:103-124): the hot key's edge rows split
    across skew_salt_factor tasks, the frontier replicates factor x."""

    def _session(self, spark, n_fans=400):
        from brahmand_spark.catalog import (
            GraphSchema, NodeSchema, RelationshipSchema,
        )
        from brahmand_spark.session import GraphSession

        g = GraphSchema()
        g.add_node(NodeSchema("User", "user_tbl", "id", ["id", "name"]))
        g.add_relationship(RelationshipSchema(
            "FOLLOWS", "follows_tbl", "User", "User", "src", "dst",
            ["src", "dst"],
        ))
        s = GraphSession(spark, schema=g)
        s.register_table("user_tbl", spark.createDataFrame(
            [(i, f"u{i}") for i in range(n_fans + 2)],
            "id long, name string"))
        # power-law-ish: node 0 is a celebrity followed by everyone;
        # the rest form a sparse chain
        edges = [(i, 0) for i in range(1, n_fans + 1)]
        edges += [(i, i + 1) for i in range(1, n_fans)]
        s.register_table("follows_tbl", spark.createDataFrame(
            edges, "src long, dst long"))
        return s

    QUERY = ("MATCH (a:User)-[:FOLLOWS]->(b:User) "
             "WHERE b.name = 'u0' RETURN a.id AS follower")

    def test_salted_hop_on_power_law_graph(self, spark):
        s = self._session(spark)
        baseline = sorted(r.follower for r in s.execute(self.QUERY).collect())
        s.build_adj_index("FOLLOWS")
        assert s.degree_stats["FOLLOWS"]["incoming"]["max_degree"] == 400
        s.skew_degree_threshold = 100  # flag the celebrity node
        df = s.execute(self.QUERY)
        plan = physical_plan(df)
        assert "__hop_salt" in plan  # salted join in the physical plan
        assert sorted(r.follower for r in df.collect()) == baseline

    def test_no_salt_below_threshold(self, spark):
        s = self._session(spark)
        s.build_adj_index("FOLLOWS")  # default threshold 50k >> 400
        assert "__hop_salt" not in physical_plan(s.execute(self.QUERY))

    def test_no_salt_without_index_stats(self, spark):
        s = self._session(spark)
        s.skew_degree_threshold = 100
        assert "__hop_salt" not in physical_plan(s.execute(self.QUERY))

    def test_salted_outgoing_direction(self, spark):
        """Reverse pattern: frontier joins on the hop's to_id; for a
        forward-oriented rel that is the physical IN-degree."""
        s = self._session(spark)
        q = ("MATCH (b:User)<-[:FOLLOWS]-(a:User) "
             "WHERE a.id <= 5 RETURN a.id AS src, b.id AS dst")
        baseline = sorted(map(tuple, s.execute(q).collect()))
        s.build_adj_index("FOLLOWS")
        s.skew_degree_threshold = 100
        df = s.execute(q)
        assert sorted(map(tuple, df.collect())) == baseline


class TestVarLengthOverAdjacency:
    """Var-length and shortestPath traversal bases re-expand from the
    multiplicity-exact adjacency tables when an index exists — same
    rows as the edge-list base, narrower scan."""

    def _session(self, spark):
        from brahmand_spark.catalog import (
            GraphSchema, NodeSchema, RelationshipSchema,
        )
        from brahmand_spark.session import GraphSession

        g = GraphSchema()
        g.add_node(NodeSchema("Person", "person_tbl", "id", ["id", "name"]))
        g.add_relationship(RelationshipSchema(
            "KNOWS", "knows_tbl", "Person", "Person", "src", "dst",
            ["src", "dst"],
        ))
        s = GraphSession(spark, schema=g)
        s.register_table("person_tbl", spark.createDataFrame(
            [(i, f"p{i}") for i in range(1, 6)], "id long, name string"))
        # multigraph: 1->2 twice — two distinct 2-hop walks 1->2->3
        s.register_table("knows_tbl", spark.createDataFrame(
            [(1, 2), (1, 2), (2, 3), (3, 4)], "src long, dst long"))
        return s

    Q_VAR = ("MATCH (a:Person)-[:KNOWS*1..2]->(b:Person) "
             "RETURN a.id AS src, b.id AS dst")
    Q_SP = ("MATCH p = shortestPath((a:Person)-[:KNOWS*..3]->(b:Person)) "
            "RETURN a.id AS src, b.id AS dst, length(p) AS hops")

    def test_var_length_multiplicity_preserved(self, spark):
        s = self._session(spark)
        expected = sorted(map(tuple, s.execute(self.Q_VAR).collect()))
        # parallel edge 1->2 appears twice at 1 hop AND doubles 1->3
        assert expected.count((1, 2)) == 2
        assert expected.count((1, 3)) == 2
        s.build_adj_index("KNOWS")
        got = sorted(map(tuple, s.execute(self.Q_VAR).collect()))
        assert got == expected

    def test_shortest_path_same_with_index(self, spark):
        s = self._session(spark)
        expected = sorted(map(tuple, s.execute(self.Q_SP).collect()))
        s.build_adj_index("KNOWS")
        got = sorted(map(tuple, s.execute(self.Q_SP).collect()))
        assert got == expected


class TestDropAdjIndex:
    def test_drop_releases_cache_and_restores_edge_plan(self, spark, tpch):
        from brahmand_spark.graphs.tpch import build_session

        from .conftest import SF_SMOKE

        q = ("MATCH (c:Customer)-[:PLACED]->(o:Order) "
             "WHERE c.c_custkey <= 50 "
             "RETURN c.c_custkey AS src, o.o_orderkey AS dst")
        s = build_session(spark, SF_SMOKE)
        s.build_adj_index("PLACED")
        after_build = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert "Generate explode" in physical_plan(s.execute(q))
        assert "PLACED" in s.degree_stats
        s.drop_adj_index("PLACED")
        # the two direction tables' cached blocks are released (other
        # tests' RDDs may be context-cleaned concurrently, so compare
        # against the post-build count, not an absolute baseline)
        after_drop = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert after_drop <= after_build - 2
        assert "PLACED" not in s.degree_stats
        assert "PLACED_outgoing" not in s.tables
        plan = physical_plan(s.execute(q))
        assert "Generate explode" not in plan  # back to edge-list hop
        expected = tpch.execute(q)
        got = s.execute(q)
        assert got.exceptAll(expected).count() == 0
        assert expected.exceptAll(got).count() == 0


class TestHopPruning:
    """Per-hop traversal pruning (prune_hops='semi'|'bloom'): the
    reference's hop-CTE ``WHERE from_id IN (SELECT id FROM prev_cte)``
    (ref analyzer/graph_traversal_planning.rs:819-843) as an opt-in
    prefilter of each hop's edge input."""

    Q = ("MATCH (c:Customer)-[:PLACED]->(o:Order)-[:HAS_LINE]->"
         "(l:Lineitem) WHERE c.c_mktsegment = 'BUILDING' "
         "AND c.c_acctbal > 9000 "
         "RETURN c.c_name AS n, count(*) AS cnt ORDER BY cnt DESC, n")

    def _session(self, spark, mode):
        from brahmand_spark.graphs.tpch import build_session

        from .conftest import SF_SMOKE

        s = build_session(spark, SF_SMOKE)
        s.prune_hops = mode
        return s

    def test_parity_both_modes(self, spark, tpch):
        want = sorted(map(tuple, tpch.execute(self.Q).collect()))
        for mode in ("semi", "bloom"):
            got = sorted(map(tuple, (
                self._session(spark, mode).execute(self.Q).collect())))
            assert got == want, mode

    def test_semi_prefilter_in_plan(self, spark):
        plan = physical_plan(self._session(spark, "semi").execute(self.Q))
        assert "LeftSemi" in plan
        # The frontier-keys branch re-applies the anchor's WHERE
        # conjuncts, so the selective filter reaches (at least) two
        # scans: the main plan's and the prefilter's.
        assert plan.count("BUILDING") >= 2, plan

    def test_bloom_prefilter_in_plan(self, spark):
        plan = physical_plan(self._session(spark, "bloom").execute(self.Q))
        # the packed bit array is broadcast and probed via
        # array_contains inside the edge-side stage — no leftsemi, no
        # extra edge exchange
        assert "array_contains" in plan
        assert "LeftSemi" not in plan
        assert plan.count("BUILDING") >= 2, plan

    def test_unfiltered_query_not_pruned(self, spark):
        q = ("MATCH (c:Customer)-[:PLACED]->(o:Order) "
             "RETURN count(*) AS n")
        for mode in ("semi", "bloom"):
            plan = physical_plan(self._session(spark, mode).execute(q))
            assert "LeftSemi" not in plan
            assert "array_contains" not in plan

    def test_default_off(self, tpch):
        plan = physical_plan(tpch.execute(self.Q))
        assert "LeftSemi" not in plan
        assert "array_contains" not in plan

    def test_invalid_mode_raises(self, spark):
        import pytest

        from brahmand_spark.compile.compiler import QueryCompiler

        with pytest.raises(ValueError, match="prune_hops"):
            QueryCompiler(None, None, prune_hops="nope")

    def test_pruning_interplay_parity(self, spark, tpch):
        """Pruning composes with var-length, shortestPath, subquery
        expressions, and OPTIONAL MATCH without changing results."""
        queries = [
            ("MATCH (a:Customer)-[:NEXT_CUST*1..3]->(b:Customer) "
             "WHERE a.c_custkey <= 5 "
             "RETURN a.c_custkey AS s, b.c_custkey AS d"),
            ("MATCH p = shortestPath((a:Customer)-[:NEXT_CUST*1..4]->"
             "(b:Customer)) WHERE a.c_custkey = 3 "
             "RETURN b.c_custkey AS d, length(p) AS l"),
            ("MATCH (c:Customer) WHERE c.c_acctbal > 9000 AND EXISTS { "
             "(c)-[:PLACED]->(o:Order) WHERE o.o_totalprice > 100000 } "
             "RETURN c.c_custkey AS ck, "
             "COUNT { (c)-[:PLACED]->(x:Order) } AS n ORDER BY ck"),
            ("MATCH (c:Customer) WHERE c.c_custkey <= 10 "
             "OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
             "RETURN c.c_custkey AS ck, count(o.o_orderkey) AS n"),
        ]
        want = [sorted(map(tuple, tpch.execute(q).collect()))
                for q in queries]
        for mode in ("semi", "bloom"):
            s = self._session(spark, mode)
            for q, w in zip(queries, want):
                got = sorted(map(tuple, s.execute(q).collect()))
                assert got == w, (mode, q[:60])


class TestVarLengthCarryVsAdjacency:
    """r9: prop-less var-length rels in a path variable carry per-hop
    structs (nodes()/relationships() work) UNLESS adjacency-indexed —
    there the grouped-table fast path wins and introspection rejects
    with guidance."""

    def test_propless_path_var_carries(self, tpch):
        rows = tpch.execute(
            "MATCH p = (a:Customer)-[:PREV_CUST*2..2]->(b:Customer) "
            "WHERE a.c_custkey = 5 "
            "RETURN nodes(p) AS ns, size(relationships(p)) AS nr"
        ).collect()
        assert [(list(r["ns"]), r["nr"]) for r in rows] == \
            [([5, 4, 3], 2)]

    def test_adjacency_indexed_propless_rejects_introspection(
            self, spark):
        from brahmand_spark.errors import PlanError
        from brahmand_spark.graphs.tpch import build_session

        from .conftest import SF_SMOKE

        s = build_session(spark, SF_SMOKE)
        s.build_adj_index("PREV_CUST")
        # the pair walk keeps the adjacency fast path...
        df = s.execute(
            "MATCH (a:Customer)-[:PREV_CUST*2..2]->(b:Customer) "
            "WHERE a.c_custkey = 5 RETURN b.c_custkey AS bk")
        assert [r["bk"] for r in df.collect()] == [3]
        # ...and path introspection points at the trade
        import pytest

        with pytest.raises(PlanError, match="adjacency-indexed"):
            s.execute(
                "MATCH p = (a:Customer)-[:PREV_CUST*2..2]->"
                "(b:Customer) WHERE a.c_custkey = 5 "
                "RETURN nodes(p) AS ns").collect()
