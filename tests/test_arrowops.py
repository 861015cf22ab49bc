"""Arrow-native boundary + bounded-state streaming tests (arrowops.py,
dedup_within_watermark, two_level_window_rollup)."""

import os
import time

from pyspark.sql import functions as F

from samba_spark.plans.inspect import plan_summary
from samba_spark.sources.tables import load_tables
from samba_spark.streaming import ops as S


def test_arrow_text_stats_zero_shuffle_and_exact(spark, sf_smoke):
    from samba_spark.operators.arrowops import arrow_text_stats

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    s = plan_summary(arrow_text_stats(docs))
    assert s["n_exchanges"] == 0, s["plan"]
    got = {
        r["doc_id"]: (r["n_chars"], r["n_spaces"])
        for r in arrow_text_stats(docs).collect()
    }
    want = {
        r["doc_id"]: (r["c"], r["s"])
        for r in docs.select(
            "doc_id",
            F.length("text").cast("long").alias("c"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            )
            .cast("long")
            .alias("s"),
        ).collect()
    }
    assert got == want


def test_arrow_cogroup_full_outer_semantics(spark):
    """Keys on only one side must still appear, with the other side 0."""
    from samba_spark.operators.arrowops import arrow_cogroup_counts

    events = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12)], "user_id long, event_id long"
    )
    orders = spark.createDataFrame(
        [(2, 5.50), (3, 1.25)], "o_custkey long, o_totalprice double"
    )
    got = {
        r["user_id"]: (r["n_events"], r["n_orders"], r["order_cents"])
        for r in arrow_cogroup_counts(events, orders).collect()
    }
    assert got == {1: (2, 0, 0), 2: (1, 1, 550), 3: (0, 1, 125)}


def _write_batches(spark, tmp_path, *batches):
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    d = str(tmp_path / "wm_stream")
    os.makedirs(d)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        p = str(tmp_path / f"b{i}")
        df.write.parquet(p)
        f = [x for x in os.listdir(p) if x.endswith(".parquet")][0]
        dst = os.path.join(d, f"part{i}.parquet")
        os.rename(os.path.join(p, f), dst)
        os.utime(dst, (time.time() + i, time.time() + i))
    return d


def test_dedup_within_watermark_expires_state(spark, tmp_path):
    """The contract: duplicates within the lateness bound are suppressed;
    a duplicate arriving after its original's state expired re-emits.
    Batch 1: key A@t0 (+ in-bound dup), key B advances the watermark far
    past A's expiry. Batch 2 runs with that watermark and evicts A's
    state at its end (eviction applies the watermark one batch after the
    data that advanced it). Batch 3: key A again → state gone →
    re-emitted."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, ts, uid, etype):
        return (eid, ts, uid, etype, 1.0, "{}")

    rows1 = [
        ev(1, t0, 1, "click"),
        ev(2, t0 + dt.timedelta(minutes=30), 1, "click"),  # in-bound dup
        ev(3, t0 + dt.timedelta(hours=10), 2, "view"),  # watermark driver
    ]
    rows2 = [ev(5, t0 + dt.timedelta(hours=11), 3, "error")]  # eviction batch
    rows3 = [ev(4, t0 + dt.timedelta(hours=12), 1, "click")]  # post-expiry dup
    d = _write_batches(spark, tmp_path, rows1, rows2, rows3)
    stream = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    dd = S.dedup_within_watermark(stream, "user_id", "event_type")
    out = S.run_to_memory(
        dd.select("event_id", "user_id", "event_type"),
        "t_wm_dedup",
        "append",
        state_partitions=4,
    )
    ids = sorted(r["event_id"] for r in out.collect())
    # 1 kept, 2 suppressed (in bound), 3/5 kept, 4 re-emitted (expired)
    assert ids == [1, 3, 4, 5]


def test_two_level_rollup_matches_batch_on_closed_days(spark, sf_smoke):
    from samba_spark.queries.patterns import q84_chained_stateful

    out = q84_chained_stateful(spark, sf_smoke)
    events = load_tables(spark, sf_smoke, ["events"])["events"]
    mx = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
    batch = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(F.window(F.col("w.start"), "1 day").alias("d"), "event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_fine_windows"),
        )
        .select(
            F.col("d.start").alias("d_start"),
            "event_type",
            "n_events",
            "n_fine_windows",
        )
        .where(
            F.col("d_start") + F.expr("INTERVAL 1 DAY")
            <= F.lit(mx) - F.expr("INTERVAL 1 HOUR")
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, batch.collect())
    )
