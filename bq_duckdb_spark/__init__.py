"""bq_duckdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference BigQuery-runner service
(alexchoi0/bq-duckdb, surveyed in SURVEY.md).

Architecture (SURVEY.md §7.1):

- ``types``    — BigQuery ⇄ Spark type bijection (SURVEY §1.3).
- ``dialect``  — BigQuery-SQL → Spark-SQL transpile + dependency / CTE
                 extraction (reference src/session/pipeline.rs:595-723
                 semantics, re-expressed).
- ``engine``   — Session / SessionManager: query(sql) → DataFrame,
                 create_table, insert, parquet + SQL directory loaders
                 (reference src/session/manager.rs, src/session/loader.rs).
- ``result``   — DataFrame → BigQuery ``queryResponse`` JSON
                 (reference src/executor/yachtsql.rs:207-231 shape).
- ``dag``      — DAG pipeline: register / topo-sort / run / retry / skip
                 (reference src/session/pipeline.rs).
- ``server``   — JSON-RPC 2.0 over stdio (reference src/rpc/*).
- ``ext``      — beyond-reference large-scale training-data operators:
                 dedup, similarity search, text analysis, multimodal.

All compute is DataFrame / Spark SQL — Catalyst plans and optimizes; the
Python layer only declares plans and orchestrates.
"""

from bq_duckdb_spark.spark_session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
