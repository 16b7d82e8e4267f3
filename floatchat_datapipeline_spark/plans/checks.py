"""Physical-plan inspection helpers.

At 100 TB the difference between a good and a bad plan is not visible in
a row-count test: a scan that reads every column, a filter that never
reaches parquet, or a dim join that shuffles instead of broadcasting all
return the same rows — 100× slower. These helpers expose the executed
plan as a string so tests (tests/test_plan_shapes.py) can pin the plan
properties the engine is designed around:

- predicate pushdown  → ``PushedFilters: [...]`` on the scan node
- column pruning      → ``ReadSchema`` lists only referenced columns
- broadcast dim joins → ``BroadcastHashJoin`` (not SortMergeJoin)
- JVM-only hot paths  → no ``BatchEvalPython``/``ArrowEvalPython`` node
- codegen             → ``WholeStageCodegen`` spans
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The query's physical plan as text (same output as
    df.explain(mode=...), returned instead of printed)."""
    je = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return je.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Column names in each parquet scan's ReadSchema (flattened)."""
    cols: list[str] = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:") and (table_hint in line or not table_hint):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(p.split(":")[0] for p in inner.split(",") if ":" in p)
    return cols


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters entries of every scan in the plan."""
    return " ".join(
        line.strip()
        for line in plan_string(df).splitlines()
        if line.strip().startswith("PushedFilters:")
    )


def has_node(df: DataFrame, node: str) -> bool:
    return node in plan_string(df)
