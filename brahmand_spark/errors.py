"""Error hierarchy (reference: open_cypher_parser/errors.rs, query_planner errors)."""

from __future__ import annotations


class BrahmandError(Exception):
    """Base error for the engine."""


class ParseError(BrahmandError):
    """Cypher text failed to parse (reference: OpenCypherParsingError)."""

    def __init__(self, message: str, position: int = -1, text: str = ""):
        self.position = position
        if position >= 0 and text:
            line = text.count("\n", 0, position) + 1
            col = position - (text.rfind("\n", 0, position) + 1) + 1
            message = f"{message} (line {line}, col {col})"
        super().__init__(message)


class CatalogError(BrahmandError):
    """Unknown label/type or invalid DDL (reference: graph_catalog errors)."""


class PlanError(BrahmandError):
    """Query cannot be planned (bad pattern, disconnected patterns, ...)."""


class UnsupportedError(BrahmandError):
    """Parsed but not executable (reference: UnsupportedDDLQuery routing,
    clickhouse_query_generator/ddl_query.rs:339-352)."""
