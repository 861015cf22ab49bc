"""Sketch/recursion/stratification operator tests (sketches.py, the
stratified split, and the q77/x78-x82 query block): exactness properties,
estimator error bounds, determinism under repartitioning, and the plan
shapes that make them 100 TB-safe."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from samba_spark.plans.inspect import plan_summary
from samba_spark.sources.tables import load_tables


def test_bitmap_distinct_matches_exact(spark, sf_smoke):
    from samba_spark.operators.sketches import bitmap_distinct

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    got = {
        r["event_type"]: r["n_distinct"]
        for r in bitmap_distinct(events, ["event_type"], "user_id").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_bitmap_distinct_rollup_path_matches_flat(spark, sf_smoke):
    """The per-day OR-merge level must not change the answer: bitmaps are
    a mergeable summary, so rollup(day) == flat."""
    from samba_spark.operators.sketches import bitmap_distinct

    events = load_tables(spark, sf_smoke, ["events"])["events"].withColumn(
        "day", F.to_date("ts")
    )
    flat = bitmap_distinct(events, ["event_type"], "user_id").collect()
    rolled = bitmap_distinct(
        events, ["event_type"], "user_id", fine_keys=["day"]
    ).collect()
    assert sorted(map(tuple, flat)) == sorted(map(tuple, rolled))


def test_hll_rollup_error_bound(spark, sf_smoke):
    """HLL estimate within ±5% of exact (expected ~1.6% at lgConfigK=12),
    and the union of fine sketches must see every fine group's members."""
    from samba_spark.operators.sketches import hll_rollup

    events = load_tables(spark, sf_smoke, ["events"])["events"].withColumn(
        "day", F.to_date("ts")
    )
    est = {
        r["event_type"]: r["estimate"]
        for r in hll_rollup(
            events, ["day", "event_type"], ["event_type"], "user_id"
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) * 20 <= e, (k, est[k], e)


def test_topk_counts_exact_when_tracked(spark, sf_smoke):
    from samba_spark.operators.sketches import topk_counts

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    got = [
        (r["event_type"], r["rank"], r["n"])
        for r in topk_counts(events, ["event_type"], "user_id", k=5)
        .orderBy("event_type", "rank")
        .collect()
    ]
    exact = (
        events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.desc("n"), "user_id")
            ).cast("long"),
        )
        .where(F.col("rank") <= 5)
        .select("event_type", "rank", "n")
        .orderBy("event_type", "rank")
        .collect()
    )
    assert got == [(r["event_type"], r["rank"], r["n"]) for r in exact]


def test_journey_string_orders_by_ts_then_tiebreak(spark):
    from samba_spark.operators.sketches import journey_string

    rows = [
        # same timestamp → event_id breaks the tie deterministically
        (1, "2024-01-01 00:00:00", 2, "purchase"),
        (1, "2024-01-01 00:00:00", 1, "view"),
        (1, "2024-01-02 00:00:00", 3, "click"),
        (2, "2024-01-01 00:00:00", 4, "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r["journey"] for r in journey_string(df).collect()}
    assert got == {1: "vpc", 2: "e"}


def test_stratified_split_exact_proportions_and_stability(spark, sf_smoke):
    """Per stratum exactly ⌊0.8·n⌋ train rows; assignment is identical
    under a different input partitioning (content-keyed, not layout-keyed)."""
    from samba_spark.operators.mixing import stratified_exact_split

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    s = stratified_exact_split(docs, "doc_id", ["lang"], train_pct=80)
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in s.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in totals.items():
        assert counts.get((lang, "train"), 0) == (80 * n) // 100
        assert counts.get((lang, "train"), 0) + counts.get((lang, "test"), 0) == n

    a = {
        (r["doc_id"], r["split"])
        for r in s.select("doc_id", "split").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in stratified_exact_split(
            docs.repartition(13), "doc_id", ["lang"], train_pct=80
        )
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_stratified_split_single_exchange(spark, sf_smoke):
    """Rank window, count window, and label projection must share ONE
    stratum-keyed exchange."""
    from samba_spark.operators.mixing import stratified_exact_split

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    s = plan_summary(stratified_exact_split(docs, "doc_id", ["lang"]))
    assert s["n_exchanges"] == 1, s["plan"]
    assert "Exchange SinglePartition" not in s["plan"]


def test_journey_single_exchange_no_global_sort(spark, sf_smoke):
    """The journey build is one user-keyed aggregation; the per-user sort
    happens inside array_sort (partition-local), never as a global Sort."""
    from samba_spark.operators.sketches import journey_string

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    s = plan_summary(journey_string(events))
    assert s["n_exchanges"] == 1, s["plan"]
    assert "Exchange SinglePartition" not in s["plan"]


def test_recursive_cte_depth_matches_chain(spark, sf_smoke):
    """The walk must reach every nation exactly once: recursion depth per
    region equals chain length, total rows == #nations."""
    from samba_spark.queries.patterns import q77_recursive_cte

    out = q77_recursive_cte(spark, sf_smoke)
    nation = load_tables(spark, sf_smoke, ["nation"])["nation"]
    assert out.count() == nation.count()
    per_region = {
        r["rk"]: r["n"]
        for r in out.groupBy("rk").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r["n_regionkey"]: r["n"]
        for r in nation.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_region == want


def test_pipe_sql_pushes_filter_to_scan(spark, sf_smoke):
    """|> WHERE must reach the parquet scan exactly like nested-SELECT SQL
    — pipe syntax is parse-level sugar, not a plan change."""
    from samba_spark.plans.inspect import assert_pushdown
    from samba_spark.queries.patterns import q79_pipe_sql

    df = q79_pipe_sql(spark, sf_smoke)
    assert_pushdown(df, "GreaterThanOrEqual(o_orderdate")


def test_collated_grouping_merges_case_variants(spark, sf_smoke):
    """UTF8_LCASE grouping must produce the same histogram as lower()."""
    from samba_spark.queries.patterns import q80_collation

    got = {
        (r["lang_ci"], r["n_docs"])
        for r in q80_collation(spark, sf_smoke).collect()
    }
    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    want = {
        (r["l"], r["n"])
        for r in docs.groupBy(F.lower("lang").alias("l"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want


def test_run_audited_single_pass_metrics(spark, sf_smoke):
    """Observation metrics captured during an unrelated action equal a
    direct aggregation — the observe node saw every row exactly once."""
    from samba_spark.plans.audit import run_audited

    orders = load_tables(spark, sf_smoke, ["orders"])["orders"]
    result, audit = run_audited(
        orders,
        {
            "n_rows": F.count(F.lit(1)).cast("long"),
            "null_keys": F.sum(F.col("o_custkey").isNull().cast("long")),
        },
        lambda d: d.groupBy("o_orderstatus").count().collect(),
    )
    assert len(result) > 0
    direct = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("nk"),
    ).collect()[0]
    assert audit["n_rows"] == direct["n"]
    assert audit["null_keys"] == direct["nk"]


def test_stored_sketches_append_incrementally(spark, sf_smoke, tmp_path):
    """The sketch-table contract (x87): write sketches for all days but
    one, append the last day's sketches separately, and the union over
    the STORED bytes must estimate the same as sketching all raw events
    at once — proving day-partitioned append-only maintenance works
    without revisiting history."""
    d = str(tmp_path / "sk")
    events = load_tables(spark, sf_smoke, ["events"])["events"].withColumn(
        "day", F.to_date("ts")
    )
    last_day = events.agg(F.max("day").alias("m")).collect()[0]["m"]
    head = events.where(F.col("day") != F.lit(last_day))
    tail = events.where(F.col("day") == F.lit(last_day))
    head.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    ).write.parquet(d)
    tail.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    ).write.mode("append").parquet(d)
    merged = {
        r["event_type"]: r["e"]
        for r in spark.read.parquet(d)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"))
        .collect()
    }
    direct = {
        r["event_type"]: r["e"]
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()
    }
    assert merged == direct


def test_count_min_merge_and_overestimate_invariant(spark):
    """The CMS contract: (1) tables over disjoint halves merge by
    cell-wise sum into exactly the full-data table; (2) every point
    estimate >= the true count."""
    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    rows = [(i, f"tok{i % 17}") for i in range(400)]
    df = spark.createDataFrame(rows, ["i", "token"])
    h1, h2 = df.where("i < 200"), df.where("i >= 200")
    merged = (
        count_min_table(h1, "token", depth=3, width=32)
        .unionByName(count_min_table(h2, "token", depth=3, width=32))
        .groupBy("row_j", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    full = count_min_table(df, "token", depth=3, width=32)
    as_set = lambda d: {tuple(r) for r in d.collect()}
    assert as_set(merged) == as_set(full)

    truth = df.groupBy("token").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = count_min_estimate(
        full, truth.select("token"), "token", depth=3, width=32
    )
    joined = truth.join(est, "token").collect()
    assert len(joined) == 17
    assert all(r.est_cms >= r.true_cnt for r in joined)


def test_count_min_join_size_upper_bounds_and_small_case(spark):
    """Tiny exact case: keys unique per side, no hash collisions likely
    at width 512 → estimate equals the true join size; and the estimate
    can never be below the true size whatever the collisions."""
    from samba_spark.operators.sketches import (
        count_min_join_size,
        count_min_table,
    )

    a = spark.createDataFrame([(k,) for k in [1, 1, 2, 3]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 9]], ["k"])
    cms_a = count_min_table(a, "k")
    cms_b = count_min_table(b, "k")
    est = count_min_join_size(cms_a, cms_b).collect()[0].est_join_size
    true_size = a.join(b, "k").count()  # 1x2 + 1x2... keys: 1 matches twice
    assert true_size == 4
    assert est >= true_size


def test_count_min_join_size_disjoint_keys(spark):
    from samba_spark.operators.sketches import (
        count_min_join_size,
        count_min_table,
    )

    a = spark.createDataFrame([(f"a{k}",) for k in range(5)], ["k"])
    b = spark.createDataFrame([(f"b{k}",) for k in range(5)], ["k"])
    est = count_min_join_size(
        count_min_table(a, "k"), count_min_table(b, "k")
    ).collect()
    # disjoint keys: any hash row with no colliding bucket pins the min
    # to 0, and these fixed md5 buckets produce no 4-row-wide collision.
    assert est[0].est_join_size == 0


def test_sliding_distinct_exact_over_window_boundary(spark):
    import datetime

    from samba_spark.operators.sketches import sliding_distinct

    def t(h, m):
        return datetime.datetime(2026, 7, 1, h, m)

    # window is [t-59min, t]: user 1 at 10:00 and 10:31 (dup within one
    # window), user 2 at 10:31, user 3 at 11:30 — at 11:30 the 10:00
    # event has aged out (90 min) but 10:31 is exactly on the 59-minute
    # boundary and still counts.
    rows = [
        (0, t(10, 0), 1, "e", 0.0),
        (1, t(10, 31), 1, "e", 0.0),
        (2, t(10, 31), 2, "e", 0.0),
        (3, t(11, 30), 3, "e", 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = {
        r.minute.isoformat(): r.n_distinct
        for r in sliding_distinct(df, group_col="event_type").collect()
    }
    assert got["2026-07-01T10:00:00"] == 1
    assert got["2026-07-01T10:31:00"] == 2          # users 1,2 + aged 10:00 dup
    assert got["2026-07-01T11:30:00"] == 3          # 10:31 in, 10:00 aged out


def test_sliding_distinct_bitmap_bit_identical(spark, sf_smoke):
    """The bucket-bitmap path (x118) must produce BIT-IDENTICAL output to
    the triple fan-out path (x110) — same contract, different shuffle
    shape — on the real events fixture, including ids that span multiple
    32768-bit buckets and groups×minutes with boundary aging."""
    from samba_spark.operators.sketches import (
        sliding_distinct,
        sliding_distinct_bitmap,
    )
    from samba_spark.sources.tables import load_tables

    ev = load_tables(spark, sf_smoke, ["events"])["events"]
    a = {
        (r.event_type, r.minute): r.n_distinct
        for r in sliding_distinct(ev).collect()
    }
    b = {
        (r.event_type, r.minute): r.n_distinct
        for r in sliding_distinct_bitmap(ev).collect()
    }
    assert a == b
    assert len(a) > 0


def test_sliding_distinct_auto_dispatches_by_density(spark):
    """sliding_distinct_auto must pick the bitmap fan-out when many ids
    share a 32768-id bucket per (group, minute) and the triple fan-out
    when they don't — and both dispatches must return the exact counts
    (the two paths are bit-identical by contract)."""
    import datetime

    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import sliding_distinct_auto

    t0 = datetime.datetime(2026, 7, 1, 10, 0)
    # dense: 1000 consecutive ids in one minute -> ~1000 ids/bucket
    dense = spark.range(1000).select(
        F.lit("e").alias("event_type"),
        F.lit(t0).alias("ts"),
        F.col("id").alias("user_id"),
    )
    # sparse: 50 ids spaced a full bucket apart -> 1 id/bucket
    sparse = spark.range(50).select(
        F.lit("e").alias("event_type"),
        F.lit(t0).alias("ts"),
        (F.col("id") * 32768).alias("user_id"),
    )
    d = sliding_distinct_auto(dense)
    s = sliding_distinct_auto(sparse)
    d_plan = d._jdf.queryExecution().optimizedPlan().toString()
    s_plan = s._jdf.queryExecution().optimizedPlan().toString()
    assert "bitmap_or_agg" in d_plan, "dense regime must take the bitmap path"
    assert "bitmap_or_agg" not in s_plan, "sparse regime must take the triple path"
    assert [(r.n_distinct) for r in d.collect()] == [1000]
    assert [(r.n_distinct) for r in s.collect()] == [50]


def test_sliding_distinct_auto_non_integral_id_short_circuits(spark):
    """A string id column cannot take the bitmap path
    (bitmap_bit_position needs integral ids): auto must go straight to
    the triple path without probing."""
    import datetime

    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import sliding_distinct_auto

    t0 = datetime.datetime(2026, 7, 1, 10, 0)
    df = spark.range(10).select(
        F.lit("e").alias("event_type"),
        F.lit(t0).alias("ts"),
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
    )
    out = sliding_distinct_auto(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "bitmap_or_agg" not in plan
    assert [r.n_distinct for r in out.collect()] == [10]


def test_bloom_no_false_negatives_and_mergeable(spark):
    """Bloom invariants: every inserted key probes maybe_dup (zero false
    negatives — the structural guarantee); two filters over disjoint
    halves OR-merge into exactly the filter of the union (mergeable-
    summary contract)."""
    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import (
        bloom_filter_table,
        bloom_probe,
    )

    full = spark.range(2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    half1 = full.where(F.col("k").substr(2, 10).cast("long") < 1000)
    half2 = full.where(F.col("k").substr(2, 10).cast("long") >= 1000)
    merged = (
        bloom_filter_table(half1, "k")
        .unionByName(bloom_filter_table(half2, "k"))
        .groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
    )
    direct = bloom_filter_table(full, "k")
    m = {r.bucket: bytes(r.bm) for r in merged.collect()}
    d = {r.bucket: bytes(r.bm) for r in direct.collect()}
    assert m == d
    probe = full.select(F.col("k").alias("id"), "k")
    res = bloom_probe(direct, probe, "k", "id").collect()
    assert all(r.status == "maybe_dup" for r in res)


def test_bloom_definitely_new_is_sound(spark):
    """A probe key whose hash bits are not all set must verdict
    definitely_new — and absent keys at low fill overwhelmingly do."""
    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import (
        bloom_filter_table,
        bloom_probe,
    )

    corpus = spark.range(500).select(
        F.concat(F.lit("in"), F.col("id")).alias("k")
    )
    bloom = bloom_filter_table(corpus, "k")
    absent = spark.range(500).select(
        F.col("id"), F.concat(F.lit("out"), F.col("id")).alias("k")
    )
    res = bloom_probe(bloom, absent, "k", "id").collect()
    n_new = sum(1 for r in res if r.status == "definitely_new")
    # k=4 hashes, 500*4 bits in 2^18 -> fill <1%, fp rate ~(0.008)^4
    assert n_new >= 498


def test_kmv_estimates_within_tolerance_and_mergeable(spark):
    """KMV accuracy (k=256 -> ~1/sqrt(k) ≈ 6% relative error; assert a
    loose 15% bound on known-overlap sets) and the merge contract: the
    pairwise op's merged bottom-k equals a sketch built on the unioned
    input."""
    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import (
        kmv_set_ops_pairwise,
        kmv_sketch,
    )

    a = spark.range(0, 10000).select(
        F.lit("A").alias("g"), F.col("id").alias("k")
    )
    b = spark.range(5000, 18000).select(
        F.lit("B").alias("g"), F.col("id").alias("k")
    )
    sk = kmv_sketch(a.union(b), "g", "k", k=256)
    r = kmv_set_ops_pairwise(sk, k=256).collect()[0]
    for est, true in (
        (r.est_a, 10000),
        (r.est_b, 13000),
        (r.est_union, 18000),
        (r.est_inter, 5000),
    ):
        assert abs(est - true) / true < 0.15, (est, true)
    # exact regime: fewer than k distinct keys -> estimates are exact
    small_a = spark.range(0, 50).select(
        F.lit("A").alias("g"), F.col("id").alias("k")
    )
    small_b = spark.range(30, 80).select(
        F.lit("B").alias("g"), F.col("id").alias("k")
    )
    sk2 = kmv_sketch(small_a.union(small_b), "g", "k", k=256)
    r2 = kmv_set_ops_pairwise(sk2, k=256).collect()[0]
    assert (r2.est_a, r2.est_b, r2.est_union, r2.est_inter) == (
        50, 50, 80, 20,
    )


def test_bloom_probe_null_key_is_definitely_new(spark):
    """NULL probe keys short-circuit to definitely_new (ADVICE r6): a
    NULL was never inserted, and without the short-circuit its empty
    candidate bitmap would silently verdict maybe_dup. Build-side NULLs
    are dropped so the filter state is unchanged by them."""
    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import (
        bloom_filter_table,
        bloom_probe,
    )

    corpus = spark.createDataFrame(
        [("a",), ("b",), (None,)], ["k"]
    )
    bloom = bloom_filter_table(corpus, "k")
    no_null = bloom_filter_table(corpus.where(F.col("k").isNotNull()), "k")
    assert {r.bucket: bytes(r.bm) for r in bloom.collect()} == {
        r.bucket: bytes(r.bm) for r in no_null.collect()
    }
    probe = spark.createDataFrame(
        [("p1", "a"), ("p2", None), ("p3", "zzz")], ["id", "k"]
    )
    res = {r.id: r.status for r in bloom_probe(bloom, probe, "k", "id").collect()}
    assert res["p1"] == "maybe_dup"
    assert res["p2"] == "definitely_new"
    assert res["p3"] == "definitely_new"


def test_kmv_pairwise_rejects_mismatched_k(spark):
    """kmv_set_ops_pairwise validates k against the sketch (ADVICE r6):
    a k smaller than the sketch's build k would silently truncate
    merged sketches — the plan-folded raise_error assertion must fail
    the job at execution (NOT an eager .first(): the first cut of this
    guard scanned the whole lazy sketch plan twice per call)."""
    import pytest
    from pyspark.sql import functions as F

    from samba_spark.operators.sketches import (
        kmv_set_ops_pairwise,
        kmv_sketch,
    )

    df = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
    )
    sk = kmv_sketch(df, "g", "k", k=256)
    out = kmv_set_ops_pairwise(sk, k=64)  # lazy: constructing is fine
    with pytest.raises(Exception, match="must match"):
        out.collect()


def test_ivf_topk_validates_quantizer_args(spark):
    """ivf_topk raises when centroids is combined with training knobs
    (n_cells/seed) and when n_probe exceeds the cell count (ADVICE r6):
    silently-ignored arguments hid caller bugs."""
    import pytest
    from pyspark.sql import functions as F

    from samba_spark.operators import simsearch as S

    embs = spark.range(8).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    qs = embs.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    cents = [[0.0, 0.0], [1.0, 1.0]]
    with pytest.raises(ValueError, match="pass one or the other"):
        S.ivf_topk(embs, qs, k=2, centroids=cents, n_cells=4)
    with pytest.raises(ValueError, match="pass one or the other"):
        S.ivf_topk(embs, qs, k=2, centroids=cents, seed=7)
    with pytest.raises(ValueError, match="n_probe"):
        S.ivf_topk(embs, qs, k=2, centroids=cents, n_probe=3)
    # the valid pinned call still runs
    assert S.ivf_topk(embs, qs, k=2, centroids=cents, n_probe=2).count() > 0


def test_kmv_estimator_branch_matches_formula_and_truth(spark):
    """Force the ESTIMATOR regime (>k distinct keys per group) — the
    branch small-SF parity never exercised (the sf0.1 full sweep caught
    the oracle's DECIMAL overflow there, round 8): est must equal
    floor((k-1)·2⁵² / kth) exactly and land within 25% of truth."""
    from samba_spark.operators.sketches import (
        KMV_HASH_SPACE,
        kmv_set_ops_pairwise,
        kmv_sketch,
    )

    rows = [(i, "ga") for i in range(1000)] + [
        (i, "gb") for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    sk = kmv_sketch(df, group_col="event_type", key_col="user_id", k=256)
    per = {
        r["g"]: r
        for r in sk.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
        .collect()
    }
    out = kmv_set_ops_pairwise(sk, k=256).collect()[0]
    for g, est in (("ga", out["est_a"]), ("gb", out["est_b"])):
        assert per[g]["n"] == 256  # the estimator regime, not exact
        expected = int(255.0 * KMV_HASH_SPACE / per[g]["kth"])
        assert est == expected
        assert abs(est - 1000) <= 250, f"{g}: {est} vs truth 1000"
    # union truth 1500, intersection truth 500
    assert abs(out["est_union"] - 1500) <= 375
    assert abs(out["est_inter"] - 500) <= 250
