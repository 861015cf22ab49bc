"""Bucketing and salting: prove the physical claims with plan + result
checks."""

import pytest
from pyspark.sql import functions as F

from samba_spark.plans.inspect import plan_summary
from samba_spark.plans.layout import repartition_for_join, salted_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a managed-table location can outlive the in-memory catalog
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    write_bucketed(orders, "b_orders", ["o_custkey"], 8)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        ["o_custkey"],
        8,
    )
    yield "b_orders", "b_customer"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, sf_smoke):
    t1, t2 = bucketed_tables
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), "o_custkey", "inner")
        s = plan_summary(joined)
        assert s["n_exchanges"] == 0, f"bucketed join still shuffles:\n{s['plan'][:500]}"
        # and the result is correct
        plain = (
            spark.read.parquet(f"{sf_smoke}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_smoke}/customer.parquet").withColumnRenamed(
                    "c_custkey", "o_custkey"
                ),
                "o_custkey",
                "inner",
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    t1, _ = bucketed_tables
    agged = spark.table(t1).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    s = plan_summary(agged)
    assert s["n_exchanges"] == 0


def test_salted_join_correctness(spark):
    """Salted join must return exactly the plain join's rows — including a
    pathologically hot key."""
    left = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 8, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )  # ~80% of rows share k=1
    right = spark.createDataFrame(
        [(1, "hot"), (17, "cold"), (999999, "missing-from-left... almost")],
        "k long, tag string",
    )
    plain = left.join(right, "k", "inner")
    salted = salted_join(left, right, "k")
    assert salted.count() == plain.count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_repartition_for_join_reuses_partitioning(spark, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    customer = spark.read.parquet(f"{sf_smoke}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l, r = repartition_for_join(orders, customer, "o_custkey", 8)
        joined = l.join(r, "o_custkey").groupBy("o_custkey").count()
        s = plan_summary(joined)
        # two explicit repartitions; join + groupBy add none
        assert s["n_exchanges"] == 2, s["plan"][:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_partitioned_write_prunes_partitions(spark, sf_smoke, tmp_path):
    """A filter on the partition column must appear as a PartitionFilter
    (directory pruning at planning time), and the scan must touch only the
    matching partition's files."""
    from samba_spark.plans.inspect import assert_partition_pruned
    from samba_spark.plans.layout import write_partitioned

    from samba_spark.sources.tables import load_tables

    events = load_tables(spark, sf_smoke, ["events"])["events"].withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    write_partitioned(events, path, ["event_date"])

    one_day = spark.read.parquet(path).where(
        F.col("event_date") == F.lit("2024-01-01").cast("date")
    )
    assert_partition_pruned(one_day, "event_date")
    # correctness: partitioned round trip preserves the day's rows
    expected = events.where(F.to_date("ts") == "2024-01-01").count()
    assert expected > 0, "fixture has no 2024-01-01 events; test is vacuous"
    assert one_day.count() == expected


def test_compact_dataset_reduces_files_preserves_rows(spark, tmp_path):
    """Many tiny files in, few files out, identical content."""
    from pyspark.sql import functions as F

    from samba_spark.plans.layout import compact_dataset

    path = str(tmp_path / "frag")
    df = spark.range(10000).withColumn("v", F.col("id") % 97)
    df.repartition(64).write.parquet(path)
    import os

    n_before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert n_before >= 32
    before = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    n_after = compact_dataset(spark, path, target_mb=512)
    assert n_after < n_before
    after = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_bucketed_rank_exact_and_skew_bounded(spark):
    """bucketed_rank equals the plain per-key ROW_NUMBER, while the hot
    key's window work is split across buckets: no (key, bucket) task sees
    more than a fraction of the hot key's rows, and the window's exchange
    partitions on (key, _bkt), never on key alone."""
    from pyspark.sql import Window

    from samba_spark.plans.layout import bucketed_rank

    # 9000 rows on hot key 0 (values spread), 1000 rows across 100 keys
    rows = [(0, float(i % 977), i) for i in range(9000)] + [
        (1 + i % 100, float(i % 53), 10_000 + i) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k int, v double, uid long")

    got = bucketed_rank(df, "k", "v", "uid", buckets=16)
    expected = df.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("k").orderBy("v", "uid")).cast("long"),
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0

    # skew bound: largest (key, bucket) group ≪ the 9000-row hot key
    from pyspark.sql import functions as FF

    lo, hi = 0.0, 976.0
    width = (hi - lo) / 16
    bucketed = df.where("k = 0").withColumn(
        "_bkt", FF.least(FF.lit(16), (FF.floor((FF.col("v") - lo) / width) + 1).cast("int"))
    )
    biggest = (
        bucketed.groupBy("k", "_bkt").count().agg(FF.max("count")).collect()[0][0]
    )
    assert biggest <= 9000 / 8, f"hot-key bucket too large: {biggest}"

    # the row_number (data-sized) window must partition on (k, _bkt) —
    # a bare-k spec would put all 9000 hot-key rows in one task. (The
    # cumulative-offset window partitions on bare k, but runs over the
    # #keys×buckets counts relation, which is fine.)
    plan = got._jdf.queryExecution().executedPlan().toString()
    rn_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn_lines, plan
    for l in rn_lines:
        assert "_bkt" in l, f"row_number window not bucket-partitioned: {l}"


def test_bucketed_rank_null_order_values_not_dropped(spark):
    """NULL order values rank first (Spark ASC default) instead of being
    silently dropped by a NULL bucket failing the offsets equi-join."""
    from pyspark.sql import Window

    from samba_spark.plans.layout import bucketed_rank

    rows = [(1, None, 10), (1, 5.0, 11), (1, None, 12), (1, 1.0, 13)]
    df = spark.createDataFrame(rows, "k int, v double, uid long")
    got = bucketed_rank(df, "k", "v", "uid", buckets=4)
    expected = df.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("k").orderBy("v", "uid")).cast("long"),
    )
    assert got.count() == 4
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_write_zordered_narrows_per_file_ranges(spark, sf_smoke, tmp_path):
    """Z-curve layout must make per-file min/max footer stats materially
    tighter than a round-robin layout on the same data — that tightness
    IS the pruning win. Compared via the distributed footer manifest."""
    from samba_spark.plans.layout import write_zordered
    from samba_spark.sources.manifest import table_manifest

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zdir = str(tmp_path / "zord")
    rdir = str(tmp_path / "rrob")
    write_zordered(orders, zdir, "o_custkey", "o_orderkey", n_files=8)
    orders.repartition(8).write.mode("overwrite").parquet(rdir)

    def avg_range(path):
        rows = [
            r
            for r in table_manifest(spark, path, "o_custkey").collect()
            if r.n_rows > 0
        ]
        return sum(r.max_key - r.min_key for r in rows) / len(rows)

    z_spread, r_spread = avg_range(zdir), avg_range(rdir)
    # round-robin files each span ~the whole key range; curve segments
    # cover a fraction of it
    assert z_spread < 0.6 * r_spread, (z_spread, r_spread)


def test_bucketed_rank_equal_order_hot_key_auto_split(spark):
    """An all-EQUAL-order hot key used to land in one bucket (the r3
    residual skew edge); over max_bucket_rows the group must auto-split on
    the tiebreak's value range, keeping per-task rows bounded while the
    rank stays exact."""
    from pyspark.sql import Window

    from samba_spark.plans.layout import bucketed_rank

    # hot key 0: 9000 rows, ALL the same order value; plus normal keys
    rows = [(0, 7.0, i) for i in range(9000)] + [
        (1 + i % 50, float(i % 31), 10_000 + i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k int, v double, uid long")

    got = bucketed_rank(df, "k", "v", "uid", buckets=16, max_bucket_rows=600)
    expected = df.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("k").orderBy("v", "uid")).cast("long"),
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0

    # the data-sized row_number window must partition on (k, _bkt, _sub)
    plan = got._jdf.queryExecution().executedPlan().toString()
    rn_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn_lines, plan
    assert any("_sub" in l for l in rn_lines), plan

    # bound check: replicate the sub-bucket assignment and assert no
    # (key, bucket, sub) group holds more than a fraction of the hot key
    w = (9000 - 1 - 0) / 16  # uid range of the hot key / buckets
    sub = df.where("k = 0").withColumn(
        "_sub", F.least(F.lit(16), (F.floor(F.col("uid") / w) + 1).cast("int"))
    )
    biggest = sub.groupBy("_sub").count().agg(F.max("count")).collect()[0][0]
    assert biggest <= 9000 / 8, f"hot group not split: {biggest}"


def test_bucketed_rank_non_numeric_tiebreak_still_exact(spark):
    """A string tiebreak skips the auto-split (no numeric range axis) but
    the rank must remain exact through the _sub=0 path."""
    from pyspark.sql import Window

    from samba_spark.plans.layout import bucketed_rank

    rows = [(1, float(i % 5), f"u{i:04d}") for i in range(200)]
    df = spark.createDataFrame(rows, "k int, v double, uid string")
    got = bucketed_rank(df, "k", "v", "uid", buckets=8, max_bucket_rows=50)
    expected = df.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("k").orderBy("v", "uid")).cast("long"),
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_bucketed_rank_wide_range_tiebreak_no_overflow(spark):
    """A hash-valued tiebreak spanning nearly the full signed-64 range
    must not overflow the sub-split's width arithmetic (long `_thi - _tlo`
    would crash under ANSI or wrap to a negative width): the range math
    runs in double, which is monotone, so the rank stays exact."""
    from pyspark.sql import Window

    from samba_spark.plans.layout import bucketed_rank

    # all-equal order, tiebreaks spread across almost the whole int64 line
    lo, hi = -(2**62) - 7, 2**62 + 13
    step = (hi - lo) // 999
    rows = [(0, 1.0, lo + i * step) for i in range(1000)]
    df = spark.createDataFrame(rows, "k int, v double, uid long")

    got = bucketed_rank(df, "k", "v", "uid", buckets=8, max_bucket_rows=100)
    expected = df.withColumn(
        "rnk",
        F.row_number()
        .over(Window.partitionBy("k").orderBy("v", "uid"))
        .cast("long"),
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
