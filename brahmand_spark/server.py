"""HTTP server + REPL — thin parity layer over GraphSession.

Reference surface: a single ``POST /query`` route
(brahmand/src/server/mod.rs:45-48) taking ``{"query": ..., "format":
...}`` with output formats JSONEachRow / Pretty / PrettyCompact / CSV /
CSVWithNames (server/models.rs:20-27), responses streamed line-by-line
(server/handlers.rs:195-219) with ``Elapsed: N sec`` appended to the
pretty/CSV formats (handlers.rs:182-185). The client is a line REPL
(brahmand-client/src/main.rs:13-91).

Implemented on the stdlib http.server (no web-framework dependency);
DataFrame results are collected via toLocalIterator so large results
stream without materializing on the driver.
"""

from __future__ import annotations

import csv
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterator

from .errors import BrahmandError
from .session import GraphSession

FORMATS = {"JSONEachRow", "Pretty", "PrettyCompact", "CSV", "CSVWithNames"}


def _json_default(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _jsonable(v):
    """Struct Rows are tuple subclasses — json.dumps would render
    them as field-nameless arrays, so map results (r7: map
    projections / properties()) must convert to dicts recursively
    BEFORE serialization."""
    if hasattr(v, "asDict"):  # pyspark Row
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def format_rows(columns: list[str], rows: Iterator, fmt: str,
                elapsed: float) -> Iterator[str]:
    """Render rows in one of the reference's output formats."""
    if fmt == "JSONEachRow":
        for row in rows:
            yield json.dumps(
                {c: _jsonable(v) for c, v in zip(columns, row)},
                default=_json_default,
            ) + "\n"
        return
    if fmt in ("CSV", "CSVWithNames"):
        buf = io.StringIO()
        writer = csv.writer(buf)
        if fmt == "CSVWithNames":
            writer.writerow(columns)
        for row in rows:
            writer.writerow(row)
        yield buf.getvalue()
        yield f"\nElapsed: {elapsed:.3f} sec\n"
        return
    # Pretty / PrettyCompact: fixed-width table
    materialized = [tuple(str(v) for v in row) for row in rows]
    widths = [len(c) for c in columns]
    for row in materialized:
        for i, v in enumerate(row):
            widths[i] = max(widths[i], len(v))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+\n"
    if fmt == "Pretty":
        yield sep
    yield "|" + "|".join(
        f" {c.ljust(w)} " for c, w in zip(columns, widths)
    ) + "|\n"
    yield sep
    for row in materialized:
        yield "|" + "|".join(
            f" {v.ljust(w)} " for v, w in zip(row, widths)
        ) + "|\n"
    yield sep
    yield f"Elapsed: {elapsed:.3f} sec\n"


def make_handler(session: GraphSession):
    class QueryHandler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def do_POST(self):
            if self.path != "/query":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
                query = body.get("query", "")
                fmt = body.get("format", "JSONEachRow")
                if fmt not in FORMATS:
                    raise BrahmandError(f"unknown format '{fmt}'")
                t0 = time.time()
                df = session.execute(query, params=body.get("params"))
                columns = df.columns
                rows = ([row[c] for c in columns]
                        for row in df.toLocalIterator())
                payload = "".join(
                    format_rows(columns, rows, fmt, time.time() - t0)
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except BrahmandError as e:
                msg = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
            except Exception as e:  # planner/execution errors -> 500
                msg = json.dumps({"error": str(e)[:2000]}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return QueryHandler


def serve(session: GraphSession, host: str = "127.0.0.1",
          port: int = 8080) -> ThreadingHTTPServer:
    """Start the query server (non-blocking; call .serve_forever() or use
    as a context)."""
    return ThreadingHTTPServer((host, port), make_handler(session))


def repl(session: GraphSession) -> None:
    """Line REPL printing PrettyCompact (client parity,
    brahmand-client/src/main.rs:13-91)."""
    while True:
        try:
            line = input("brahmand> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line or line in {"exit", "quit", r"\q"}:
            break
        t0 = time.time()
        try:
            df = session.execute(line)
            cols = df.columns
            rows = ([row[c] for c in cols] for row in df.toLocalIterator())
            for chunk in format_rows(
                cols, rows, "PrettyCompact", time.time() - t0
            ):
                print(chunk, end="")
        except Exception as e:
            print(f"error: {e}")
