"""LOAD CSV (r12 extension — Neo4j's bulk-ingest clause; the
reference ingests via ClickHouse instead, SURVEY §2.7): all-string
fields, header map / positional list binding, read and write
trailers, FIELDTERMINATOR."""

import pytest

from brahmand_spark.errors import UnsupportedError
from brahmand_spark.session import GraphSession


@pytest.fixture()
def csv_dir(tmp_path):
    (tmp_path / "people.csv").write_text(
        "id,name,age\n1,Ada,36\n2,Bob,41\n3,Cy,28\n")
    (tmp_path / "bare.csv").write_text("10;x\n20;y\n")
    return tmp_path


class TestLoadCsvRead:
    def test_with_headers_read(self, spark, csv_dir):
        s = GraphSession(spark)
        rows = s.execute(
            f"LOAD CSV WITH HEADERS FROM '{csv_dir}/people.csv' "
            f"AS row "
            f"RETURN row.name AS n, toInteger(row.age) AS a "
            f"ORDER BY a").collect()
        assert [(r.n, r.a) for r in rows] == [
            ("Cy", 28), ("Ada", 36), ("Bob", 41)]

    def test_without_headers_positional(self, spark, csv_dir):
        s = GraphSession(spark)
        rows = s.execute(
            f"LOAD CSV FROM 'file://{csv_dir}/bare.csv' AS row "
            f"FIELDTERMINATOR ';' "
            f"RETURN toInteger(row[0]) AS i, row[1] AS v "
            f"ORDER BY i").collect()
        assert [(r.i, r.v) for r in rows] == [(10, "x"), (20, "y")]

    def test_fields_are_strings(self, spark, csv_dir):
        s = GraphSession(spark)
        row = s.execute(
            f"LOAD CSV WITH HEADERS FROM '{csv_dir}/people.csv' "
            f"AS row RETURN row.age AS a LIMIT 1").collect()[0]
        assert isinstance(row.a, str)  # Neo4j semantics: cast yourself

    def test_aggregation_over_csv(self, spark, csv_dir):
        s = GraphSession(spark)
        row = s.execute(
            f"LOAD CSV WITH HEADERS FROM '{csv_dir}/people.csv' "
            f"AS row "
            f"WITH toInteger(row.age) AS age "
            f"RETURN count(*) AS n, avg(age) AS m").collect()[0]
        assert row.n == 3 and row.m == 35.0


class TestLoadCsvWrite:
    def test_create_nodes_from_csv(self, spark, csv_dir):
        s = GraphSession(spark, allow_writes=True)
        s.execute("CREATE NODE TABLE Person (id Int64, name String, "
                  "age Int64, PRIMARY KEY(id), NODE ID(id))")
        out = s.execute(
            f"LOAD CSV WITH HEADERS FROM '{csv_dir}/people.csv' "
            f"AS row "
            f"CREATE (p:Person {{id: toInteger(row.id), "
            f"name: row.name, age: toInteger(row.age)}})"
        ).collect()[0]
        assert out["nodes_created"] == 3
        got = {tuple(r) for r in s.execute(
            "MATCH (p:Person) RETURN p.id AS i, p.name AS n, "
            "p.age AS a").collect()}
        assert got == {(1, "Ada", 36), (2, "Bob", 41), (3, "Cy", 28)}

    def test_match_set_from_csv(self, spark, csv_dir):
        s = GraphSession(spark, allow_writes=True)
        s.execute("CREATE NODE TABLE Person (id Int64, age Int64, "
                  "PRIMARY KEY(id), NODE ID(id))")
        for i in (1, 2, 3):
            s.execute(f"CREATE (p:Person {{id: {i}, age: 0}})")
        s.execute(
            f"LOAD CSV WITH HEADERS FROM '{csv_dir}/people.csv' "
            f"AS row MATCH (p:Person) "
            f"WHERE p.id = toInteger(row.id) "
            f"SET p.age = toInteger(row.age)")
        got = {tuple(r) for r in s.execute(
            "MATCH (p:Person) RETURN p.id AS i, p.age AS a").collect()}
        assert got == {(1, 36), (2, 41), (3, 28)}

    def test_write_requires_allow_writes(self, spark, csv_dir):
        s = GraphSession(spark)
        with pytest.raises(UnsupportedError, match="allow_writes"):
            s.execute(
                f"LOAD CSV WITH HEADERS FROM '{csv_dir}/people.csv' "
                f"AS row CREATE (p:Person {{id: 1}})")


@pytest.fixture()
def csv_http_server(csv_dir):
    """Serve csv_dir over a local HTTP server for the URL tests."""
    import http.server
    import threading

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(csv_dir), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


class TestLoadCsvFromUrl:
    """r13 (VERDICT r12 missing #5): LOAD CSV FROM 'http(s)://…' —
    driver-side size-capped fetch to a temp file, then the existing
    distributed scan; fetches cached per (session, url)."""

    def test_http_url_reads(self, spark, csv_http_server):
        s = GraphSession(spark)
        rows = s.execute(
            f"LOAD CSV WITH HEADERS FROM "
            f"'{csv_http_server}/people.csv' AS row "
            f"RETURN row.name AS n, toInteger(row.age) AS a "
            f"ORDER BY a").collect()
        assert [(r.n, r.a) for r in rows] == [
            ("Cy", 28), ("Ada", 36), ("Bob", 41)]
        # second run hits the fetch cache (same temp path)
        p1 = s._url_csv_cache[f"{csv_http_server}/people.csv"]
        s.execute(
            f"LOAD CSV WITH HEADERS FROM "
            f"'{csv_http_server}/people.csv' AS row "
            f"RETURN count(*) AS n").collect()
        assert s._url_csv_cache[f"{csv_http_server}/people.csv"] == p1

    def test_file_url_reads(self, spark, csv_dir):
        s = GraphSession(spark)
        rows = s.execute(
            f"LOAD CSV FROM 'file://{csv_dir}/bare.csv' AS row "
            f"FIELDTERMINATOR ';' "
            f"RETURN toInteger(row[0]) AS i ORDER BY i").collect()
        assert [r.i for r in rows] == [10, 20]

    def test_size_cap_is_loud(self, spark, csv_http_server,
                              monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_LOAD_CSV_URL_CAP", "10")
        s = GraphSession(spark)
        with pytest.raises(UnsupportedError, match="cap"):
            s.execute(
                f"LOAD CSV WITH HEADERS FROM "
                f"'{csv_http_server}/people.csv' AS row "
                f"RETURN count(*) AS n").collect()

    def test_unreachable_url_is_loud(self, spark):
        s = GraphSession(spark)
        with pytest.raises(UnsupportedError, match="could not fetch"):
            s.execute("LOAD CSV FROM "
                      "'http://127.0.0.1:9/none.csv' AS r "
                      "RETURN r").collect()


class TestLoadCsvErrors:

    def test_load_stays_soft_identifier(self, tpch):
        # a column alias named `load` / `csv` must still parse
        rows = tpch.execute(
            "UNWIND [1] AS load RETURN load AS csv").collect()
        assert rows[0]["csv"] == 1
