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
