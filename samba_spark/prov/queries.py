"""Provenance *query* operators (SURVEY.md §2.2) — the analytical surface
the reference serves over REST (SAMbA/WebApplication/.../ExecutionAPICtrl.kt,
TaskAPICtrl.kt, DataElementAPICtrl.kt:42-320). Here they are plain Spark SQL
over the provenance tables, so they distribute; the reference assembles
graphs in the web server's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samba_spark.operators.wrapper import DROP_SENTINEL_PREFIX


def list_executions(store) -> DataFrame:
    """reference ExecutionAPICtrl.kt:20-26."""
    return store.table("executions")


def task_dag(store, run_id: str) -> DataFrame:
    """Task vertices + edges of one run (reference TaskAPICtrl.kt:22-35)."""
    tasks = store.table("tasks").where(F.col("run_id") == run_id)
    deps = store.table("task_deps").where(F.col("run_id") == run_id)
    return tasks.alias("t").join(
        deps.alias("d"), F.col("t.task_id") == F.col("d.task_id"), "left"
    ).select(
        "t.task_id",
        "t.transformation_type",
        "t.description",
        F.col("d.dep_task_id").alias("upstream_task_id"),
    )


def element_graph(store, run_id: str, include_dropped: bool = False) -> DataFrame:
    """Full element lineage graph (reference DataElementAPICtrl.kt:42-103).
    Drop-sentinel elements are hidden by default, matching the web UI's
    substring filter (DataElementAPICtrl.kt:80)."""
    deps = store.table("element_deps").where(F.col("run_id") == run_id)
    if not include_dropped:
        deps = deps.where(~F.col("element_id").startswith(DROP_SENTINEL_PREFIX))
    return deps.select(
        F.col("dep_element_id").alias("source"),
        F.col("element_id").alias("target"),
        F.col("task_id").alias("task"),
    )


def elements_of_task(store, run_id: str, task_id: str) -> DataFrame:
    """Elements produced by a task (reference DataElementAPICtrl.kt:106-179)."""
    return (
        store.table("elements")
        .where((F.col("run_id") == run_id) & (F.col("task_id") == task_id))
    )


def elements_consumed_by_task(store, run_id: str, task_id: str) -> DataFrame:
    deps = store.table("element_deps").where(
        (F.col("run_id") == run_id) & (F.col("task_id") == task_id)
    )
    elements = store.table("elements").where(F.col("run_id") == run_id)
    return (
        deps.select(F.col("dep_element_id").alias("element_id"))
        .distinct()
        .join(elements, "element_id", "inner")
    )


def transitive_lineage(
    store, run_id: str, element_ids: list[str], direction: str = "up", max_hops: int = 50
) -> DataFrame:
    """Transitive closure from a set of elements — BFS by iterative join
    (the reference walks the graph in server memory,
    DataElementAPICtrl.kt:140-179; ours distributes each hop).

    Returns (element_id, hop). direction: 'up' = ancestors, 'down' = descendants.
    """
    spark = store.spark
    src, dst = ("element_id", "dep_element_id") if direction == "up" else (
        "dep_element_id", "element_id"
    )
    edges = (
        store.table("element_deps")
        .where(F.col("run_id") == run_id)
        .select(F.col(src).alias("_edge_src"), F.col(dst).alias("_edge_dst"))
        .cache()
    )
    frontier = spark.createDataFrame(
        [(e,) for e in element_ids], "element_id string"
    ).withColumn("hop", F.lit(0))
    seen = frontier
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.element_id == F.col("_edge_src"), "inner")
            .select(F.col("_edge_dst").alias("element_id"))
            .distinct()
            .join(seen.select("element_id"), "element_id", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        # Iterative algorithm: the lazy localCheckpoint truncates the
        # growing plan and the isEmpty probe is the materializing action
        # (one job per hop instead of two); the driver sync per hop is
        # the unavoidable part.
        nxt = nxt.localCheckpoint(eager=False)
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    edges.unpersist()
    return seen


def element_detail(store, run_id: str, element_id: str) -> DataFrame:
    """Element value table with its task's schema header
    (reference DataElementAPICtrl.kt:181-233)."""
    e = store.table("elements").where(
        (F.col("run_id") == run_id) & (F.col("element_id") == element_id)
    )
    t = store.table("tasks").where(F.col("run_id") == run_id).select(
        "task_id", "schema_fields", "description"
    )
    return e.join(t, "task_id", "left")
