"""Server parity tests: POST /query over a real socket, all output
formats (reference: server/handlers.rs + models.rs:20-27)."""

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(tpch):
    from brahmand_spark.server import serve

    httpd = serve(tpch, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def post(url, body):
    req = urllib.request.Request(
        f"{url}/query", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


class TestServer:
    def test_json_each_row(self, server):
        status, body = post(server, {
            "query": "MATCH (r:Region) RETURN r.r_name AS name ORDER BY name",
            "format": "JSONEachRow",
        })
        assert status == 200
        lines = [json.loads(x) for x in body.strip().splitlines()]
        assert {"name": "ASIA"} in lines
        assert len(lines) == 5

    def test_pretty_has_elapsed(self, server):
        status, body = post(server, {
            "query": "MATCH (r:Region) RETURN count(*) AS n",
            "format": "PrettyCompact",
        })
        assert status == 200
        assert "Elapsed:" in body
        assert "| n" in body or "| 5" in body

    def test_csv_with_names(self, server):
        status, body = post(server, {
            "query": "MATCH (r:Region) RETURN r.r_name AS name ORDER BY name LIMIT 2",
            "format": "CSVWithNames",
        })
        assert status == 200
        assert body.splitlines()[0] == "name"

    def test_parse_error_400(self, server):
        status, body = post(server, {"query": "MATCH (r:Region RETURN 1"})
        assert status == 400
        assert "error" in json.loads(body)

    def test_unknown_format_400(self, server):
        status, _ = post(server, {
            "query": "MATCH (r:Region) RETURN 1 AS x", "format": "XML",
        })
        assert status == 400

    def test_write_query_rejected(self, server):
        status, body = post(server, {
            "query": "MATCH (r:Region) SET r.r_name = 'x'",
        })
        assert status == 400
        assert "not executable" in json.loads(body)["error"]

    def test_params(self, server):
        status, body = post(server, {
            "query": "MATCH (r:Region) WHERE r.r_name = $name RETURN count(*) AS n",
            "params": {"name": "ASIA"},
        })
        assert status == 200
        assert json.loads(body.strip()) == {"n": 1}

    def test_explain_statement(self, server):
        status, body = post(server, {
            "query": ("EXPLAIN MATCH (c:Customer)-[:PLACED]->(o:Order) "
                      "RETURN c.c_name AS n, count(*) AS cnt"),
        })
        assert status == 200
        row = json.loads(body.strip().splitlines()[0])
        assert "Physical Plan" in row["plan"]

    def test_profile_statement(self, server):
        status, body = post(server, {
            "query": "PROFILE MATCH (r:Region) RETURN count(*) AS n",
        })
        assert status == 200
        row = json.loads(body.strip().splitlines()[0])
        assert row["rows"] == 1
        assert row["python_stages"] == 0
        assert row["elapsed_s"] >= 0


def test_jsoneachrow_serializes_structs_as_objects(tpch):
    """Map-projection / properties() results must land as JSON
    OBJECTS with field names, not field-nameless arrays (r7)."""
    import json as _json

    from brahmand_spark.server import format_rows

    df = tpch.execute(
        "MATCH (n:Nation) WHERE n.n_nationkey = 1 "
        "RETURN n {.n_name, .n_regionkey} AS m, keys(n) AS k")
    out = "".join(format_rows(df.columns, iter(df.collect()),
                              "JSONEachRow", 0.0))
    rec = _json.loads(out.strip())
    assert rec["m"] == {"n_name": "NATION_1", "n_regionkey": 1}
    assert rec["k"] == ["n_nationkey", "n_name", "n_regionkey"]
