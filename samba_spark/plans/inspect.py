"""Physical-plan inspection — the engine's "did Catalyst do what we
designed for?" feedback loop.

Used by tests to pin the plan shapes that matter at 100 TB: predicate
pushdown into the parquet scan, broadcast joins for small sides, top-k as
TakeOrderedAndProject (partition-local k + merge, no global sort), partial
aggregation (map-side combine), and whole-stage codegen coverage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def plan_summary(df: DataFrame) -> dict:
    plan = plan_string(df, "formatted")
    simple = plan_string(df, "simple")
    return {
        "n_exchanges": len(re.findall(r"\bExchange\b", simple)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", simple)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", simple)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", simple)),
        "has_take_ordered": "TakeOrderedAndProject" in simple,
        "n_hash_aggregates": len(re.findall(r"HashAggregate", simple)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "partition_filters": re.findall(r"PartitionFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: ([^\n]*)", plan),
        "wholestage_codegen_ids": sorted(
            set(int(x) for x in re.findall(r"WholeStageCodegen \((\d+)\)", simple))
        ),
        "plan": plan,
    }


def assert_pushdown(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in some PushedFilters of the scan."""
    s = plan_summary(df)
    pushed = " | ".join(s["pushed_filters"])
    for frag in fragments:
        assert frag in pushed, (
            f"filter '{frag}' not pushed to scan; pushed: {pushed!r}"
        )


def assert_pruned_columns(df: DataFrame, max_cols: int, table_hint: str = "") -> None:
    """Assert every scan reads at most ``max_cols`` columns (column
    pruning reached the reader)."""
    s = plan_summary(df)
    for schema in s["read_schemas"]:
        ncols = schema.count(":")
        assert ncols <= max_cols, (
            f"scan reads {ncols} columns (> {max_cols}): {schema} {table_hint}"
        )


def assert_partition_pruned(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in some PartitionFilters of the scan —
    i.e. the predicate prunes whole hive-style partition directories before
    any file is opened (the difference between scanning one day and
    scanning 100 TB)."""
    s = plan_summary(df)
    parts = " | ".join(s["partition_filters"])
    for frag in fragments:
        assert frag in parts, (
            f"'{frag}' not in PartitionFilters; got: {parts!r}"
        )
