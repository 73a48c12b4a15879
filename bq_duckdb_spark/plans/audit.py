"""Physical-plan audit: parse ``df.explain`` output into assertable
facts (scan pushdown, join strategies, exchange count, codegen spans).

Used by the perf test-suite to pin plan shape — a regression that turns
a broadcast join into a sort-merge join or drops a parquet filter
pushdown fails tests long before it shows up in a 100 TB bill.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    formatted: str
    scans: list[dict] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    codegen_spans: int = 0
    aqe: bool = False

    def scan_for(self, table_hint: str) -> dict | None:
        for s in self.scans:
            if table_hint.lower() in s["location"].lower():
                return s
        return None

    def assert_pushed_filter(self, table_hint: str, column: str) -> None:
        s = self.scan_for(table_hint)
        assert s is not None, f"no scan found for {table_hint}\n{self.formatted}"
        assert column.lower() in s["pushed"].lower(), (
            f"filter on {column} not pushed into {table_hint} scan: "
            f"PushedFilters={s['pushed']}"
        )

    def assert_pruned_schema(self, table_hint: str, max_columns: int) -> None:
        s = self.scan_for(table_hint)
        assert s is not None, f"no scan found for {table_hint}"
        ncols = s["read_schema"].count(":") if s["read_schema"] else 0
        assert ncols <= max_columns, (
            f"{table_hint} scan reads {ncols} columns (> {max_columns}): "
            f"{s['read_schema']}"
        )


def audit_plan(df: DataFrame) -> PlanAudit:
    formatted = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    audit = PlanAudit(formatted=formatted)
    audit.broadcast_joins = len(re.findall(r"BroadcastHashJoin", formatted))
    audit.sortmerge_joins = len(re.findall(r"SortMergeJoin", formatted))
    audit.nested_loop_joins = len(re.findall(r"BroadcastNestedLoopJoin", formatted))
    audit.exchanges = len(re.findall(r"\bExchange\b", formatted))
    audit.codegen_spans = len(set(re.findall(r"\[codegen id : (\d+)\]", formatted)))
    audit.aqe = "AdaptiveSparkPlan" in formatted

    # parse per-scan detail blocks:
    #   (N) Scan parquet \n Output [...] ... Location: ... PushedFilters: ... ReadSchema: ...
    for block in re.finditer(
        r"\(\d+\) Scan parquet ?\n(.*?)(?=\n\(\d+\)|\Z)", formatted, re.DOTALL
    ):
        body = block.group(1)
        loc = re.search(r"Location:.*?\[(.*?)\]", body)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", body)
        schema = re.search(r"ReadSchema: struct<(.*?)>", body, re.DOTALL)
        audit.scans.append(
            {
                "location": loc.group(1) if loc else "",
                "pushed": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1) if schema else "",
            }
        )
    return audit
