"""OPTIONAL MATCH (left-outer traversal) vs DuckDB LEFT JOIN oracles."""

from .helpers import assert_same


class TestOptionalMatch:
    def test_basic_left_join(self, tpch, duck):
        # every customer, with order count incl. zero-order customers
        assert_same(
            tpch.execute("""
                MATCH (c:Customer)
                OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
                RETURN c.c_name AS name, count(o) AS n_orders"""),
            duck.sql("""
                SELECT c.c_name AS name, count(o.o_orderkey) AS n_orders
                FROM customer c
                LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY c.c_name"""),
        )

    def test_optional_where_filters_inside(self, tpch, duck):
        # WHERE after OPTIONAL MATCH restricts the optional side only
        assert_same(
            tpch.execute("""
                MATCH (c:Customer)
                OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
                WHERE o.o_totalprice > 300000
                RETURN c.c_name AS name, count(o) AS n_big"""),
            duck.sql("""
                SELECT c.c_name AS name, count(o.o_orderkey) AS n_big
                FROM customer c
                LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
                  ON o.o_custkey = c.c_custkey
                GROUP BY c.c_name"""),
        )

    def test_null_columns_when_no_match(self, tpch, duck):
        assert_same(
            tpch.execute("""
                MATCH (c:Customer) WHERE c.c_custkey <= 20
                OPTIONAL MATCH (c)-[:PLACED]->(o:Order)
                WHERE o.o_totalprice > 400000
                RETURN c.c_custkey AS ck, o.o_orderkey AS ok"""),
            duck.sql("""
                SELECT c.c_custkey AS ck, o.o_orderkey AS ok
                FROM customer c
                LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
                  ON o.o_custkey = c.c_custkey
                WHERE c.c_custkey <= 20"""),
        )

    def test_two_hop_optional(self, tpch, duck):
        assert_same(
            tpch.execute("""
                MATCH (s:Supplier)
                OPTIONAL MATCH (s)<-[:SUPPLIED_BY]-(l:Lineitem)-[:OF_PART]->(p:Part)
                WHERE p.p_size > 48
                RETURN s.s_name AS name, count(p) AS n"""),
            duck.sql("""
                SELECT s.s_name AS name, count(x.p_partkey) AS n
                FROM supplier s LEFT JOIN (
                    SELECT l.l_suppkey, p.p_partkey
                    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                    WHERE p.p_size > 48) x
                  ON x.l_suppkey = s.s_suppkey
                GROUP BY s.s_name"""),
        )

    def test_optional_first_clause_empty(self, tpch):
        df = tpch.execute("""
            OPTIONAL MATCH (c:Customer) WHERE c.c_custkey < 0
            RETURN count(c) AS n""")
        rows = df.collect()
        assert len(rows) == 1 and rows[0].n == 0
