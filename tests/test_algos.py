"""Graph-algorithm tests: hand-checkable fixtures + numpy power-iteration
oracle for PageRank + DuckDB recursive-CTE oracle for BFS."""

import numpy as np
import pyspark.sql.functions as F

from .helpers import canon


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestPageRank:
    def test_matches_power_iteration(self, spark):
        pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
        from brahmand_spark.ops.algos import pagerank

        got = {
            r.id: r.rank
            for r in pagerank(edges_df(spark, pairs), iterations=25).collect()
        }
        # numpy oracle: same convention (ranks sum to n, dangling uniform)
        ids = sorted({x for p in pairs for x in p})
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        M = np.zeros((n, n))
        out_deg = {}
        for s, d in pairs:
            out_deg[s] = out_deg.get(s, 0) + 1
        for s, d in pairs:
            M[idx[d], idx[s]] = 1.0 / out_deg[s]
        r = np.ones(n)
        for _ in range(25):
            dangling = sum(r[idx[v]] for v in ids if v not in out_deg)
            r = (1 - 0.85) + 0.85 * (M @ r + dangling / n)
        for v in ids:
            assert abs(got[v] - r[idx[v]]) < 1e-6, (v, got[v], r[idx[v]])

    def test_ranks_sum_to_n(self, spark):
        from brahmand_spark.ops.algos import pagerank

        pairs = [(i, (i + 1) % 10) for i in range(10)]
        total = pagerank(edges_df(spark, pairs), iterations=5) \
            .agg(F.sum("rank")).first()[0]
        assert abs(total - 10.0) < 1e-6


class TestConnectedComponents:
    def test_two_components(self, spark):
        from brahmand_spark.ops.algos import connected_components

        pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)]
        comps = {
            r.id: r.component
            for r in connected_components(edges_df(spark, pairs)).collect()
        }
        assert comps[1] == comps[2] == comps[3] == 1
        assert comps[10] == comps[11] == comps[12] == 10
        assert comps[1] != comps[10]

    def test_chain_converges(self, spark):
        from brahmand_spark.ops.algos import connected_components

        pairs = [(i, i + 1) for i in range(15)]
        comps = connected_components(
            edges_df(spark, pairs), max_iterations=20
        ).select("component").distinct().collect()
        assert len(comps) == 1 and comps[0].component == 0


class TestBFS:
    def test_distances_vs_duckdb_recursive(self, spark, duck):
        from brahmand_spark.ops.algos import bfs_distances

        pairs = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (4, 6), (7, 8)]
        e = edges_df(spark, pairs)
        src = spark.createDataFrame([(1,)], "id long")
        got = bfs_distances(e, src, max_hops=10)
        values = ", ".join(f"({a}, {b})" for a, b in pairs)
        want = duck.sql(f"""
            WITH RECURSIVE g(src, dst) AS (SELECT * FROM (VALUES {values})),
            walk(id, distance) AS (
                SELECT 1::BIGINT, 0
                UNION ALL
                SELECT g.dst, w.distance + 1
                FROM walk w JOIN g ON g.src = w.id WHERE w.distance < 10)
            SELECT id, min(distance) AS distance FROM walk GROUP BY id""")
        assert canon(got.toPandas()) == canon(want.df())

    def test_unreachable_absent(self, spark):
        from brahmand_spark.ops.algos import bfs_distances

        e = edges_df(spark, [(1, 2), (3, 4)])
        src = spark.createDataFrame([(1,)], "id long")
        ids = {r.id for r in bfs_distances(e, src).collect()}
        assert ids == {1, 2}


class TestTriangles:
    def test_known_triangles(self, spark):
        from brahmand_spark.ops.algos import triangle_count

        # triangle 1-2-3 plus a pendant edge 3-4
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        got = {
            r.id: r.triangles
            for r in triangle_count(edges_df(spark, pairs)).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}

    def test_two_triangles_shared_edge(self, spark):
        from brahmand_spark.ops.algos import triangle_count

        pairs = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]
        got = {
            r.id: r.triangles
            for r in triangle_count(edges_df(spark, pairs)).collect()
        }
        assert got == {1: 1, 2: 2, 3: 2, 4: 1}


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        """Two 4-cliques joined by one bridge edge: LPA must assign one
        community per clique (labels converge to each clique's min id)."""
        import itertools

        from brahmand_spark.ops.algos import label_propagation

        c1, c2 = [0, 1, 2, 3], [10, 11, 12, 13]
        edges = (list(itertools.combinations(c1, 2))
                 + list(itertools.combinations(c2, 2))
                 + [(3, 10)])
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r.id: r.community
               for r in label_propagation(df, max_iterations=8).collect()}
        assert len({out[v] for v in c1}) == 1
        assert len({out[v] for v in c2}) == 1
        assert out[0] != out[10]

    def test_single_clique_converges_to_one(self, spark):
        import itertools

        from brahmand_spark.ops.algos import label_propagation

        df = spark.createDataFrame(
            list(itertools.combinations(range(5), 2)), "src long, dst long")
        out = {r.community
               for r in label_propagation(df, max_iterations=8).collect()}
        assert len(out) == 1


class TestDegreesAndKCore:
    def test_degrees(self, spark):
        from brahmand_spark.ops.algos import degrees

        df = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3)], "src long, dst long")
        out = {r.id: (r.out_degree, r.in_degree, r.degree)
               for r in degrees(df).collect()}
        assert out == {1: (2, 0, 2), 2: (1, 1, 2), 3: (0, 2, 2)}

    def test_k_core_peels_tail(self, spark):
        """A 4-clique with a pendant path: 3-core = the clique only
        (peeling must cascade through the path)."""
        import itertools

        from brahmand_spark.ops.algos import k_core

        clique = list(itertools.combinations([0, 1, 2, 3], 2))
        path = [(3, 10), (10, 11), (11, 12)]
        df = spark.createDataFrame(clique + path, "src long, dst long")
        core3 = {r.id for r in k_core(df, 3).collect()}
        assert core3 == {0, 1, 2, 3}
        core1 = {r.id for r in k_core(df, 1).collect()}
        assert core1 == {0, 1, 2, 3, 10, 11, 12}
        assert k_core(df, 4).count() == 0
