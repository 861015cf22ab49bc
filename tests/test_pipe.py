"""Line-mode pipe (reference rdd/RDD.scala:887-945, PipedRDD.scala:70-236):
rows stream through a native process per partition; element lineage is
all-to-all within the partition. q47's DuckDB oracle parity runs in
test_declared_queries; these tests cover the operator mechanics."""

import pytest
from pyspark.sql import functions as F

from samba_spark.operators.pipe import pipe_lines


def test_pipe_identity_preserves_rows(spark, sf_smoke):
    region = spark.read.parquet(f"{sf_smoke}/region.parquet")
    out = pipe_lines(region.select("r_name"), "cat")
    assert sorted(r.value for r in out.collect()) == sorted(
        r.r_name for r in region.collect()
    )


def test_pipe_multicolumn_tab_join(spark, sf_smoke):
    region = spark.read.parquet(f"{sf_smoke}/region.parquet")
    out = pipe_lines(region.select("r_regionkey", "r_name"), "cut -f2")
    assert sorted(r.value for r in out.collect()) == sorted(
        r.r_name for r in region.collect()
    )


def test_pipe_line_transform(spark, sf_smoke):
    region = spark.read.parquet(f"{sf_smoke}/region.parquet")
    out = pipe_lines(
        region.select("r_name"), "tr '[:upper:]' '[:lower:]'"
    )
    assert sorted(r.value for r in out.collect()) == sorted(
        r.r_name.lower() for r in region.collect()
    )


def test_pipe_row_count_change(spark, sf_smoke):
    """Commands may emit fewer/more lines than they consume (grep)."""
    nation = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    out = pipe_lines(
        nation.select("n_name"),
        "grep -i 'a' || true",  # grep exits 1 on no match in a partition
    )
    expected = [r.n_name for r in nation.collect() if "a" in r.n_name.lower()]
    assert sorted(r.value for r in out.collect()) == sorted(expected)


def test_pipe_failure_raises(spark, sf_smoke):
    region = spark.read.parquet(f"{sf_smoke}/region.parquet")
    out = pipe_lines(region.select("r_name"), "exit 3")
    with pytest.raises(Exception, match="pipe command failed|exit 3"):
        out.collect()


def test_pipe_all_to_all_partition_lineage(engine, sf_smoke):
    """Every output element depends on ALL input elements its partition
    consumed (reference PipedRDD.scala:170-236 — the command is a black
    box, so per-line provenance cannot be narrowed)."""
    region = engine.read_parquet(
        f"{sf_smoke}/region.parquet", "region"
    ).with_elements()
    region.persist_elements()
    single = region.coalesce(1)
    piped = single.pipe("cat", input_col="r_name")
    piped.persist_elements()
    n_rows = piped.count()
    assert n_rows == 5

    input_ids = {
        r.element_id
        for r in engine.store.table("elements")
        .where(F.col("task_id") == region.task_id)
        .collect()
    }
    assert len(input_ids) == 5
    deps = (
        engine.store.table("element_deps")
        .where(F.col("task_id") == piped.task_id)
        .collect()
    )
    by_elem = {}
    for d in deps:
        by_elem.setdefault(d.element_id, set()).add(d.dep_element_id)
    assert len(by_elem) == n_rows
    for elem, dep_set in by_elem.items():
        assert dep_set == input_ids, (
            f"element {elem} deps {dep_set} != all inputs"
        )
