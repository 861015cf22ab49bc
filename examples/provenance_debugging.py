#!/usr/bin/env python
"""Provenance-driven debugging tour — the Layer-A capability (SURVEY §2.1/
§2.2) used the way the reference's web UI is used, but as DataFrames:

  1. run an instrumented pipeline with element capture + a drop-tracked
     filter (the SAMbA DataElement/Task model, columns instead of RPC)
  2. pick a suspect SOURCE row and walk the lineage DOWN — which outputs
     does it contaminate? (impact analysis)
  3. walk an OUTPUT row's lineage UP — which inputs produced it?
     (root-cause analysis)
  4. read the COLUMN-level lineage off the analyzed plan — which source
     columns feed each output column? (schema impact, zero Spark jobs)
  5. export the element graph JSON (reference exportFile,
     DataflowProvenance.scala:106-132)

Run:  python examples/provenance_debugging.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samba_spark.prov.queries import (
    element_graph,
    task_dag,
    transitive_lineage,
)
from samba_spark.session import ProvSession, get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="provenance_debugging")
    spark.sparkContext.setLogLevel("ERROR")
    prov_dir = tempfile.mkdtemp(prefix="prov_debug_")

    ps = ProvSession(spark, name="debug_tour", prov_dir=prov_dir)
    nation = ps.read_parquet(f"{sf_dir}/nation.parquet", "nation").with_elements()
    region = ps.read_parquet(f"{sf_dir}/region.parquet", "region").with_elements()
    nation.persist_elements()
    region.persist_elements()
    # drop-tracked filter: the discarded rows keep lineage too (A11 family)
    big = nation.where(F.col("n_nationkey") >= 5, track_dropped=True)
    big.persist_elements()
    joined = big.join(
        region, on=big.raw.n_regionkey == region.raw.r_regionkey, how="inner"
    )
    joined.persist_elements()
    per_region = joined.group_by("r_name").agg(
        F.count(F.lit(1)).alias("n_nations")
    )
    per_region.persist_elements()
    result = per_region.collect()
    print(f"pipeline output rows: {len(result)}")

    # column lineage BEFORE stopping: plan-sized, no job
    print("column lineage of the aggregate:")
    for r in per_region.column_lineage().orderBy("out_col", "src_col").collect():
        print(f"  {r.out_col:10s} <- {r.src_table}.{r.src_col}")

    ps.stop()
    store = ps.store
    run_id = ps.run_id

    print("task DAG edges:")
    dag = task_dag(store, run_id)
    print(f"  {dag.where(F.col('upstream_task_id').isNotNull()).count()} edges "
          f"over {dag.select('task_id').distinct().count()} tasks")

    # 2. impact analysis: one source nation row -> everything downstream
    src = (
        store.table("elements")
        .join(
            store.table("tasks").where(
                F.col("description").contains("nation")
            ).select("task_id"),
            "task_id",
        )
        .limit(1)
        .collect()[0]
    )
    down = transitive_lineage(store, run_id, [src.element_id], direction="down")
    print(
        f"impact of source element {src.element_id[:8]}…: "
        f"{down.count() - 1} downstream elements "
        f"(max hop {down.agg(F.max('hop')).collect()[0][0]})"
    )

    # 3. root cause: one aggregate output -> everything upstream
    agg_task = (
        store.table("tasks")
        .where(F.col("transformation_type") == "reduceByKey")
        .select("task_id")
        .collect()[0]
        .task_id
    )
    out_el = (
        store.table("elements").where(F.col("task_id") == agg_task).limit(1)
    ).collect()[0]
    up = transitive_lineage(store, run_id, [out_el.element_id], direction="up")
    print(
        f"root cause of output {out_el.element_id[:8]}…: "
        f"{up.count() - 1} upstream elements"
    )

    # 4. dropped rows are visible lineage too
    graph_all = element_graph(store, run_id, include_dropped=True).count()
    graph_clean = element_graph(store, run_id).count()
    print(f"lineage edges: {graph_clean} (+{graph_all - graph_clean} drop-sentinel)")

    # 5. export
    out_json = os.path.join(prov_dir, "graph.json")
    g = store.export_graph(run_id, out_json)
    print(f"exported graph: {len(g['nodes'])} nodes, {len(g['links'])} links")
    spark.stop()


if __name__ == "__main__":
    main()
