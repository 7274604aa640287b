"""Physical-plan audit helpers — the scale-readiness checks.

Wraps ``explain("formatted")`` into assertable facts so tests (and the
bench loop) can verify a plan *stays* the plan we want as the code
evolves: filters reach the parquet scan, projections prune columns,
small dimensions broadcast, no cartesian products sneak in.

This is how the 100 TB contract is enforced continuously rather than
eyeballed once: a plan regression (lost pushdown, a surprise
SortMergeJoin where a broadcast belongs, an accidental CartesianProduct)
fails a unit test long before it costs a cluster-day.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@dataclass
class PlanFacts:
    """Greppable facts extracted from a formatted physical plan."""

    text: str
    n_exchanges: int
    n_broadcast_joins: int
    n_sort_merge_joins: int
    n_cartesian: int
    read_schemas: list[str]
    pushed_filters: list[str]
    # Note: pre-execution AdaptiveSparkPlan output omits codegen ids, so
    # this is only meaningful for plans explained with AQE disabled or
    # after execution.
    has_codegen: bool


def python_rdd_scans(text: str) -> list[str]:
    """The ``Scan ExistingRDD`` detail blocks that are NOT JVM-side
    ``localCheckpoint`` pins. A checkpoint scan is memory-resident JVM
    data (the stable-id machinery pins partitioning with it); a scan
    whose RDD lineage mentions neither checkpoint form is the Python-RDD
    fallback the audits exist to catch — it forks a Python worker per
    evaluation (the r10 write-path defect class)."""
    import re as _re

    out = []
    blocks = _re.split(r"\n(?=\(\d+\) )", text)
    for b in blocks:
        first = b.splitlines()[0] if b else ""
        if "Scan ExistingRDD" in first and "localCheckpoint" not in b:
            out.append(b)
    return out


def audit(df: DataFrame) -> PlanFacts:
    text = formatted_plan(df)
    reads, pushed = [], []
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            reads.append(s[len("ReadSchema:"):].strip())
        if s.startswith("PushedFilters:"):
            pushed.append(s[len("PushedFilters:"):].strip())
    return PlanFacts(
        text=text,
        n_exchanges=text.count("Exchange ("),
        n_broadcast_joins=text.count("BroadcastHashJoin"),
        n_sort_merge_joins=text.count("SortMergeJoin"),
        n_cartesian=text.count("CartesianProduct") + text.count("BroadcastNestedLoopJoin"),
        read_schemas=reads,
        pushed_filters=pushed,
        has_codegen="codegen id" in text or "WholeStageCodegen" in text,
    )


def assert_columns_pruned(df: DataFrame, table_cols: dict[str, int]) -> None:
    """Assert no scan reads more than ``max_cols`` columns — catches lost
    projection pruning. ``table_cols`` maps a column that identifies the
    scan (e.g. 'l_orderkey') to the max column count allowed for it."""
    facts = audit(df)
    for marker, max_cols in table_cols.items():
        for schema in facts.read_schemas:
            if marker in schema:
                n = schema.count(",") + 1
                assert n <= max_cols, (
                    f"scan containing {marker} reads {n} columns (> {max_cols}): {schema}"
                )


def assert_no_cartesian(df: DataFrame) -> None:
    facts = audit(df)
    assert facts.n_cartesian == 0, "plan contains a cartesian / nested-loop join"
