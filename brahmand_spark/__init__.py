"""brahmand_spark — a PySpark-native openCypher graph-query engine.

A from-scratch rebuild of the capabilities of darshanDevrai/brahmand
(a Rust openCypher->ClickHouse-SQL compiler) on Apache Spark: Cypher text
in, Spark DataFrame out, with Catalyst/Tungsten doing the relational
optimization the reference hand-rolls. Plus large-scale data-pipeline
operators (dedup, similarity search, text analysis) as composable
DataFrame transforms under ``brahmand_spark.ops``.
"""

from .catalog import GraphSchema, NodeSchema, RelationshipSchema
from .errors import (
    BrahmandError, CatalogError, ParseError, PlanError, UnsupportedError,
)
from .session import GraphSession

__all__ = [
    "GraphSchema", "NodeSchema", "RelationshipSchema", "GraphSession",
    "BrahmandError", "CatalogError", "ParseError", "PlanError",
    "UnsupportedError",
]

__version__ = "0.1.0"
