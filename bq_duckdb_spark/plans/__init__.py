"""Plan inspection and audit utilities.

The engine's performance contract is that Catalyst produces the plan a
Spark expert would write by hand: filters and projections pushed into
the parquet scan, tiny dimensions broadcast, no redundant exchanges,
whole-stage codegen over the hot path. ``audit`` makes those properties
assertable so they are tested, not assumed.
"""

from bq_duckdb_spark.plans.audit import PlanAudit, audit_plan

__all__ = ["PlanAudit", "audit_plan"]
