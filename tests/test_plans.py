"""Plan-shape regression tests: the properties that make the declared
queries scale are pinned here — a refactor that silently loses pushdown or
broadcast fails these before it ever hits a big cluster."""

from samba_spark.plans.inspect import (
    plan_string,
    assert_pruned_columns,
    assert_pushdown,
    plan_summary,
)
from samba_spark.queries import DECLARED


def test_q2_filter_pushdown_and_pruning(spark, sf_smoke):
    df = DECLARED["q2_filter"].fn(spark, sf_smoke)
    assert_pushdown(df, "GreaterThan(l_quantity,45.0)", "LessThan(l_discount,0.02)")
    # 2 projected + 2 filter columns
    assert_pruned_columns(df, 4)


def test_q1_column_pruning(spark, sf_smoke):
    df = DECLARED["q1_scan_count"].fn(spark, sf_smoke)
    assert_pruned_columns(df, 1)  # only l_returnflag read


def test_q5_partial_aggregation(spark, sf_smoke):
    s = plan_summary(DECLARED["q5_groupby_aggs"].fn(spark, sf_smoke))
    # partial + final HashAggregate around one exchange = map-side combine
    assert s["n_hash_aggregates"] >= 2
    assert s["n_exchanges"] >= 1


def test_q12_topk_is_take_ordered(spark, sf_smoke):
    s = plan_summary(DECLARED["q12_topk"].fn(spark, sf_smoke))
    assert s["has_take_ordered"], "ORDER BY+LIMIT must plan as TakeOrderedAndProject"


def test_q23_broadcasts_dimension(spark, sf_smoke):
    s = plan_summary(DECLARED["q23_star_join"].fn(spark, sf_smoke))
    assert s["broadcast_joins"] >= 1, "filtered customer dim must broadcast"
    df = DECLARED["q23_star_join"].fn(spark, sf_smoke)
    assert_pushdown(df, "IsNotNull")


def test_q8_join_shape(spark, sf_smoke):
    """Small-dim join: broadcast (no shuffle of orders for the join),
    partial count before the groupBy exchange, top-100 via TakeOrdered.
    (WholeStageCodegen ids only appear in post-AQE final plans, so the
    codegen span is not assertable pre-execution.)"""
    s = plan_summary(DECLARED["q8_inner_join"].fn(spark, sf_smoke))
    assert s["broadcast_joins"] >= 1
    assert s["n_hash_aggregates"] >= 2
    assert s["has_take_ordered"]


def test_dedup_shuffle_key_is_digest_not_payload(spark, sf_smoke):
    """Exact dedup must shuffle 16-byte digests, never document text — at
    100 TB the difference is the whole job."""
    from samba_spark.operators.dedup import dedup_exact
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    plan = plan_summary(dedup_exact(docs))["plan"]
    assert "hashpartitioning(_digest" in plan
    # the exchange's input projection must not carry the text column
    exchange_inputs = [
        l for l in plan.splitlines() if "Arguments: hashpartitioning" in l
    ]
    assert exchange_inputs and all("text" not in l for l in exchange_inputs)


def test_cosine_topk_uses_window_group_limit(spark, sf_smoke):
    """rank<=k over a window must compile to WindowGroupLimit — each
    partition keeps only k candidates before the exchange (the partial
    top-k that makes brute-force search scan-bound)."""
    from pyspark.sql import functions as F

    from samba_spark.operators.simsearch import cosine_topk
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    embs = load_tables(spark, sf_smoke, ["embeddings"])["embeddings"]
    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    plan = plan_summary(cosine_topk(embs, queries))["plan"]
    assert "WindowGroupLimit" in plan


def test_zip_with_index_no_global_window(spark, sf_smoke):
    """zip_with_index must never funnel data rows through one task: the
    two-pass partition-offset scheme keeps every row-bearing stage
    parallel (a global Window.orderBy would show Exchange SinglePartition
    on the data path)."""
    from pyspark.sql import functions as F

    from samba_spark.operators.relational import zip_with_index

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    z = zip_with_index(
        li, [F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_quantity")]
    )
    plan = plan_string(z, "formatted")
    assert "Exchange SinglePartition" not in plan


def test_sessionize_single_user_exchange(spark, sf_smoke):
    """Lag window, session-numbering window, and the per-session aggregate
    must all ride ONE hash exchange on user_id (groupBy keys are a
    superset of the window partition key)."""
    from samba_spark.operators.sessionize import session_stats
    from samba_spark.sources.tables import load_tables

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    s = plan_summary(session_stats(events))
    assert s["n_exchanges"] == 1, s["plan"]
    assert "Exchange SinglePartition" not in s["plan"]


def test_redact_is_zero_shuffle_projection(spark, sf_smoke):
    """The scrub itself must be a pure projection over the scan."""
    from samba_spark.operators.textual import redaction_stats
    from samba_spark.sources.tables import load_tables

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    s = plan_summary(redaction_stats(events, "props", key="event_id"))
    assert s["n_exchanges"] == 0, s["plan"]


def test_salient_terms_broadcasts_df_side(spark, sf_smoke):
    """df (|vocab| rows) and n_docs (1 row) join back by broadcast — the
    corpus-sized tf side must never re-shuffle for those joins."""
    from samba_spark.operators.textual import salient_terms
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    s = plan_summary(salient_terms(docs))
    # df joins back as BroadcastHashJoin; the 1-row n_docs cross join plans
    # as BroadcastNestedLoopJoin (broadcast, trivially sized)
    assert s["broadcast_joins"] >= 1, s["plan"]
    assert "BroadcastNestedLoopJoin Cross BuildRight" in s["plan"]
    assert s["sortmerge_joins"] == 0 and s["shuffled_hash_joins"] == 0


def test_chunk_documents_zero_shuffle(spark, sf_smoke):
    """x29: chunking is a scan-stage fan-out — no Exchange anywhere."""
    from samba_spark.operators.chunking import chunk_documents
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    s = plan_summary(chunk_documents(docs))
    assert s["n_exchanges"] == 0, s["plan"][:800]


def test_merge_upsert_single_antijoin(spark, sf_smoke):
    """x30: the MERGE plan is one anti-join + union; the small update side
    broadcasts, so the corpus side never shuffles."""
    from pyspark.sql import functions as F

    from samba_spark.operators.merge import merge_upsert
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"].select(
        "doc_id", "source", "n_chars"
    )
    updates = docs.where(F.col("doc_id") % 7 == 0)
    s = plan_summary(merge_upsert(docs, updates, ["doc_id"]))
    plan = s["plan"]
    assert "LeftAnti" in plan, plan[:800]
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert s["n_exchanges"] == 0, s["plan"][:800]


def test_cross_source_overlap_broadcast_sizes(spark, sf_smoke):
    """x31: per-source sizes join back as broadcasts; the only real
    shuffles are the vocabulary distinct (both branches) and the tiny
    pair aggregation."""
    from samba_spark.operators.dedup import cross_source_overlap
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    plan = plan_summary(cross_source_overlap(docs))["plan"]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:1200]


def test_cross_source_overlap_hashed_matches_exact(spark, sf_smoke):
    """The 8-byte-key scale mode must agree with the exact-string mode on
    the fixture (no collisions at this vocabulary size)."""
    from samba_spark.operators.dedup import cross_source_overlap
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    exact = {
        (r.source_a, r.source_b): (r.n_shared, r.n_a, r.n_b)
        for r in cross_source_overlap(docs).collect()
    }
    hashed = {
        (r.source_a, r.source_b): (r.n_shared, r.n_a, r.n_b)
        for r in cross_source_overlap(docs, hash_shingles=True).collect()
    }
    assert exact == hashed


def test_tpch_q1_pushdown_and_partial_agg(spark, sf_smoke):
    """q48: shipdate filter reaches the parquet scan; aggregation is
    two-phase (partial before the exchange)."""
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.queries.extras import q48_tpch_q1

    s = plan_summary(q48_tpch_q1(spark, sf_smoke))
    assert "PushedFilters" in s["plan"] and "l_shipdate" in s["plan"], s["plan"][:900]
    assert s["plan"].count("HashAggregate") >= 2, s["plan"][:900]


def test_tpch_q3_broadcast_star_topk(spark, sf_smoke):
    """q50: the customer dim broadcasts and the top-10 runs as
    TakeOrderedAndProject, not a global sort."""
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.queries.extras import q50_tpch_q3

    plan = plan_summary(q50_tpch_q3(spark, sf_smoke))["plan"]
    assert "BroadcastHashJoin" in plan, plan[:900]
    assert "TakeOrderedAndProject" in plan, plan[:900]


def test_repeated_spans_no_cartesian(spark, sf_smoke):
    """x35: the span join keys on the chunk digest — hash join, never a
    nested-loop/cartesian; chunk fan-out itself stays shuffle-free."""
    from samba_spark.operators.dedup import repeated_spans
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    plan = plan_summary(repeated_spans(docs))["plan"]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan[:900]


def test_cap_tokens_no_global_window(spark, sf_smoke):
    """x36: the running total must come from the two-pass partition-offset
    scheme — no windowless-partition global sort (a single-task stage at
    scale)."""
    import re

    from samba_spark.operators.mixing import cap_tokens_per_group
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    plan = plan_summary(cap_tokens_per_group(docs, "doc_id", 2000))["plan"]
    # every Window node must carry a partition spec (partitionBy list
    # non-empty); the global form renders as "Window [..], [..ASC..]" with
    # no partition list between the function list and the sort order
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert m.group(1).strip(), f"global window found:\n{plan[:900]}"


def test_triangle_count_no_cartesian(spark, sf_smoke):
    """x55: wedge formation and closure must both be equi-joins (hash /
    sort-merge) — never a nested-loop; the rank comparison rides the
    join condition of an equi-join on the shared vertex."""
    from pyspark.sql import functions as F

    from samba_spark.operators.graph import triangle_count
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    orders = load_tables(spark, sf_smoke, ["orders"])["orders"]
    edges = (
        orders.select(
            (F.col("o_orderkey") % 499).alias("src"),
            (F.col("o_custkey") % 499).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    plan = plan_summary(triangle_count(edges))["plan"]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, (
        plan[:900]
    )


def test_concurrency_no_data_rows_through_single_task(spark, sf_smoke):
    """x59: the running sum over boundary points must be day-partitioned;
    the only single-partition stage allowed is the #days-row carry
    ladder. Assert the point-bearing window carries a partition spec."""
    import re

    from samba_spark.operators.sessionize import concurrency_profile
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    plan = plan_summary(concurrency_profile(events))["plan"]
    # the data-path window (running sum over delta points) must carry
    # 'day' as the first windowspecdefinition argument (its partition
    # spec); windows without one exist only on the carry ladder, whose
    # input is the per-day aggregate (tiny)
    assert re.search(
        r"sum\(delta#\d+\) windowspecdefinition\(day#\d+,", plan
    ), plan[:900]


def test_rare_token_blocking_no_cartesian(spark, sf_smoke):
    """x60: the candidate self-join keys on the rare token, the verify
    join on (doc, term) — all equi-joins."""
    from samba_spark.operators.dedup import rare_token_blocking_pairs
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    plan = plan_summary(rare_token_blocking_pairs(docs))["plan"]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, (
        plan[:900]
    )


def test_advisor_flags_known_antipatterns(spark, sf_smoke):
    """advise() detects a planted cartesian, a planted global window, and
    a planted row-UDF — and stays quiet on a clean declared query."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from samba_spark.plans.advisor import advise
    from samba_spark.queries import ALL_QUERIES

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    nation = spark.read.parquet(f"{sf_smoke}/nation.parquet")

    cart = orders.crossJoin(nation.select("n_name"))
    assert any(f.rule == "cartesian" for f in advise(cart))

    w = Window.orderBy("o_orderkey")
    glob = orders.withColumn("rn", F.row_number().over(w))
    assert any(f.rule == "single_partition" for f in advise(glob))

    slow = F.udf(lambda x: x + 1, LongType())
    udfed = orders.select(slow("o_orderkey").alias("k"))
    assert any(f.rule == "python_row_udf" for f in advise(udfed))

    clean = ALL_QUERIES["q23_star_join"].fn(spark, sf_smoke)
    bad = [
        f
        for f in advise(clean)
        if f.rule in ("cartesian", "single_partition", "python_row_udf")
    ]
    assert not bad, bad


def test_tpch_q4_semi_join_no_fanout(spark, sf_smoke):
    """q63: the EXISTS must plan as a left-semi join (no row multiplication
    from multi-line orders) with the order-date slice pushed to the scan."""
    from samba_spark.queries.tpch import TPCH

    df = TPCH["q63_tpch_q4"].fn(spark, sf_smoke)
    s = plan_summary(df)
    assert "LeftSemi" in s["plan"]
    assert_pushdown(df, "GreaterThanOrEqual(o_orderdate")


def test_tpch_q7_broadcast_nations_and_pushdown(spark, sf_smoke):
    """q64: both nation dims broadcast; the two-year shipdate slice reaches
    the lineitem scan so the big fact never over-reads."""
    from samba_spark.queries.tpch import TPCH

    df = TPCH["q64_tpch_q7"].fn(spark, sf_smoke)
    s = plan_summary(df)
    assert s["broadcast_joins"] >= 2
    assert_pushdown(df, "GreaterThanOrEqual(l_shipdate")


def test_tpch_q17_single_lineitem_join_tree(spark, sf_smoke):
    """q69: the decorrelated per-part average must NOT trigger a cartesian
    or nested-loop plan; part (filtered, tiny) broadcasts, and the
    threshold compare is a plain join condition."""
    from samba_spark.queries.tpch import TPCH

    df = TPCH["q69_tpch_q17"].fn(spark, sf_smoke)
    s = plan_summary(df)
    assert "CartesianProduct" not in s["plan"]
    assert s["broadcast_joins"] >= 1


def test_tpch_q19_one_pass_disjunction(spark, sf_smoke):
    """q70: the OR-of-conjunctions must stay ONE broadcast join pass over
    lineitem — not a union of three scans."""
    from samba_spark.queries.tpch import TPCH

    df = TPCH["q70_tpch_q19"].fn(spark, sf_smoke)
    s = plan_summary(df)
    assert s["broadcast_joins"] >= 1
    n_lineitem_scans = len(
        [sc for sc in s["read_schemas"] if "l_partkey" in sc]
    )
    assert n_lineitem_scans == 1, f"lineitem scanned {n_lineitem_scans}x"


def test_tpch_q21_semi_anti_no_cartesian(spark, sf_smoke):
    """q71: the waiting-supplier double correlation must plan as semi+anti
    equi-joins on l_orderkey, never a cartesian/nested-loop."""
    from samba_spark.queries.tpch import TPCH

    df = TPCH["q71_tpch_q21"].fn(spark, sf_smoke)
    s = plan_summary(df)
    assert "CartesianProduct" not in s["plan"]
    assert "LeftSemi" in s["plan"] and "LeftAnti" in s["plan"]
    assert s["has_take_ordered"]


def test_tpch_q22_broadcast_threshold(spark, sf_smoke):
    """q72: the 1-row average threshold joins as a broadcast nested loop
    (that is the right plan for a single-row side) and the no-recent-orders
    check is a left-anti equi-join."""
    from samba_spark.queries.tpch import TPCH

    df = TPCH["q72_tpch_q22"].fn(spark, sf_smoke)
    s = plan_summary(df)
    assert "CartesianProduct" not in s["plan"]
    assert "LeftAnti" in s["plan"]


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The AQE skew-join path SCALE.md leans on must actually fire: a
    200k-row hot key against a uniform tail, sort-merge joined with
    thresholds scaled to fixture size, re-plans at runtime into
    SortMergeJoin(skew=true) — the hot partition is split across tasks
    without any salting in user code. (Salting, plans/layout.salted_join,
    remains the static fallback when AQE is off or the skew is in an
    aggregation.)"""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(5_000).select(
                (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        dim = spark.range(51).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = fact.join(dim, "k").select("k")
        assert len(j.collect()) == 205_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A join filter on the dimension must prune fact PARTITIONS at
    runtime (DPP): the fact scan carries a dynamicpruning subquery
    instead of reading all 20 partition directories. This is the
    partition-layout payoff plans/layout.write_partitioned sets up — at
    100 TB it is the difference between scanning 1/20th and all of it."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "fact")
    spark.range(20_000).select(
        (F.col("id") % 20).alias("pk"), F.col("id").alias("v")
    ).write.partitionBy("pk").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.range(20).select(
        F.col("id").alias("pk"), (F.col("id") % 4).alias("seg")
    )
    j = fact.join(dim, "pk").where(F.col("seg") == 1).groupBy("pk").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_runtime_bloom_filter_injected_on_selective_join(spark, tmp_path):
    """With a selective dimension filter, Catalyst injects a runtime
    bloom filter (might_contain) on the fact side of the shuffle join —
    fact rows that cannot match are dropped at the scan, before the
    shuffle. The second runtime-filtering lever next to DPP; thresholds
    are scaled down to fixture size."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big_p, small_p = str(tmp_path / "big"), str(tmp_path / "small")
        spark.range(100_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
        ).write.parquet(big_p)
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("w")
        ).write.parquet(small_p)
        big, small = spark.read.parquet(big_p), spark.read.parquet(small_p)
        j = big.join(small.where(F.col("w") == 3), "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_are_respected(spark, sf_smoke):
    """The three join-strategy hints must reach the physical plan: at
    100 TB the strategy choice (broadcast vs shuffle-hash vs sort-merge)
    is a primary cost lever, and hints are the declarative override when
    statistics mislead the optimizer."""
    from pyspark.sql import functions as F

    from samba_spark.plans.inspect import plan_string
    from samba_spark.sources.tables import load_tables

    t = load_tables(spark, sf_smoke, ["orders", "customer"])
    orders = t["orders"].withColumnRenamed("o_custkey", "c_custkey")
    cust = t["customer"].select("c_custkey", "c_mktsegment")

    broadcast = orders.join(cust.hint("broadcast"), "c_custkey")
    assert "BroadcastHashJoin" in plan_string(broadcast, "simple")

    merge = orders.join(cust.hint("merge"), "c_custkey")
    assert "SortMergeJoin" in plan_string(merge, "simple")

    shuffle_hash = orders.join(cust.hint("shuffle_hash"), "c_custkey")
    assert "ShuffledHashJoin" in plan_string(shuffle_hash, "simple")


def test_sliding_distinct_broadcasts_targets_not_bitmaps(spark, sf_smoke):
    """Both sliding-distinct paths must broadcast the observed-minutes
    side, never the fanned side: Catalyst's size estimate of the fanned
    aggregate cannot see that bitmap_construct_agg emits a fixed 4 KiB
    per row — left unpinned it picked the bitmap side at 10x sf0.1 and
    OOMed the driver building the broadcast."""
    from samba_spark.operators.sketches import (
        sliding_distinct,
        sliding_distinct_bitmap,
    )
    from samba_spark.sources.tables import load_tables

    ev = load_tables(spark, sf_smoke, ["events"])["events"]
    for op, payload_col in (
        (sliding_distinct, "_id"),
        (sliding_distinct_bitmap, "_bm"),
    ):
        plan = plan_string(op(ev), "formatted")
        assert "BroadcastHashJoin" in plan, op.__name__
        # the broadcast build must be the bare (group, minute) key list —
        # the path's payload column (id triple / bitmap) inside the
        # BroadcastExchange's input block means the wrong side was picked
        bx_input = plan[plan.index("BroadcastExchange"):].split("\n\n")[0]
        assert payload_col not in bx_input, (op.__name__, bx_input)
        # broadcast_targets=False removes the PIN (it does not forbid the
        # optimizer from broadcasting a genuinely tiny side, as it will
        # at this SF) — the output contract must be unchanged
        fb = op(ev, broadcast_targets=False)
        assert fb.columns == ["event_type", "minute", "n_distinct"], (
            op.__name__,
            fb.columns,
        )


def test_url_canonicalize_zero_shuffle_single_agg_exchange(spark, sf_smoke):
    """x119: canonicalization is a pure projection (no exchange of its
    own); the whole dedup plans as ONE aggregation exchange keyed on the
    canonical string — partial + final HashAggregate around it."""
    from samba_spark.operators.textual import url_dedup_groups
    from samba_spark.sources.tables import load_tables
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    df = docs.withColumn(
        "url", F.concat(F.lit("HTTP://Ex.com:80/p/"), F.col("doc_id") % 10)
    )
    s = plan_summary(url_dedup_groups(df, "url", "doc_id"))
    assert s["n_exchanges"] == 1
    assert s["n_hash_aggregates"] >= 2  # map-side combine present
