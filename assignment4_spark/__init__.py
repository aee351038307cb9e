"""assignment4_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference system
(BigDataIA-Fall2024-TeamB8/Assignment4, a document-intelligence / RAG
pipeline; see SURVEY.md) as a Spark-first DataFrame engine: relational
operators, RAG/LLM-data-pipeline operators (chunk/embed/similarity/dedup),
streaming over events, and a UDF surface.

Public API:
    from assignment4_spark.registry import QUERIES, ORACLES   # named queries
    from assignment4_spark.session import get_spark
    from assignment4_spark import api                          # composable ops
"""

__version__ = "0.1.0"
