"""docker_neo4j_spark — a PySpark-native property-graph analytics engine.

Re-expresses the query and data-processing capabilities packaged, configured
and tested by the reference repo (neo4j/docker-neo4j — see SURVEY.md) as an
idiomatic Spark DataFrame engine: property graph = two DataFrames, Cypher
pattern matching = joins, graph algorithms = DataFrame BSP loops, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) required at 100 TB scale.
"""

import logging as _logging

from .graph import PropertyGraph
from .session import get_spark

# PySpark double-logs every captured AnalysisException through this
# logger (errors/exceptions/base.py) — the engine's compile-time schema
# probes intentionally try/except analysis, so the duplicate JSON blobs
# are pure noise; real errors still raise to the caller (r12).
_logging.getLogger("DataFrameQueryContextLogger").setLevel(_logging.CRITICAL)

__all__ = ["PropertyGraph", "get_spark"]
__version__ = "0.1.0"
