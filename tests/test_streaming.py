"""M5: Structured Streaming — deterministic micro-batch replay tests
(BASELINE.md: streaming is excluded from the DuckDB oracle; verified by
replay-vs-batch equivalence instead)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from samba_spark.streaming import ops as S


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    """Events split into two parquet files by time order, with distinct
    mtimes so the file source replays them as two deterministic batches."""
    from samba_spark.sources.tables import load_tables

    src = load_tables(spark, sf_smoke, ["events"])["events"].orderBy("ts")
    rows = src.count()
    first = src.limit(rows // 2)
    second = src.subtract(first)
    d = tmp_path_factory.mktemp("events_stream")
    p1, p2 = str(d / "batch1"), str(d / "batch2")
    first.coalesce(1).write.parquet(p1)
    time.sleep(1.1)
    second.coalesce(1).write.parquet(p2)
    out = str(d / "files")
    os.makedirs(out)
    for i, p in enumerate([p1, p2]):
        f = [x for x in os.listdir(p) if x.endswith(".parquet")][0]
        dst = os.path.join(out, f"part{i}.parquet")
        os.rename(os.path.join(p, f), dst)
        os.utime(dst, (time.time() + i, time.time() + i))
    return out


def test_tumbling_window_matches_batch(spark, events_dir):
    stream = S.read_events_stream(spark, events_dir)
    result = S.run_to_memory(
        S.tumbling_counts(stream, "10 minutes"), "t_tumble", "complete"
    )
    batch = S.tumbling_counts(spark.read.schema(S.EVENTS_SCHEMA).parquet(events_dir))
    assert sorted(map(tuple, result.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_sliding_window_matches_batch(spark, events_dir):
    stream = S.read_events_stream(spark, events_dir)
    result = S.run_to_memory(
        S.sliding_avg(stream, "10 minutes", "5 minutes"), "t_slide", "complete"
    )
    batch = S.sliding_avg(spark.read.schema(S.EVENTS_SCHEMA).parquet(events_dir))
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))
    # sliding windows: ~2x window instances vs tumbling
    assert result.count() > 0


def test_session_window_matches_batch(spark, events_dir):
    stream = S.read_events_stream(spark, events_dir)
    result = S.run_to_memory(
        S.session_counts(stream, "5 minutes"), "t_session", "complete"
    )
    batch = S.session_counts(spark.read.schema(S.EVENTS_SCHEMA).parquet(events_dir))
    assert sorted(map(tuple, result.collect())) == sorted(map(tuple, batch.collect()))


def test_watermark_drops_late_windows(spark, events_dir):
    """Append mode + watermark: after replaying both batches, only windows
    finalized by the watermark (max event time of batch 1 minus delay) are
    emitted — late/open windows are withheld. Multi-batch replay is what
    advances the watermark."""
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    result = S.run_to_memory(
        S.tumbling_counts(stream, "10 minutes", watermark="10 minutes"),
        "t_wm",
        "append",
    )
    batch_all = S.tumbling_counts(
        spark.read.schema(S.EVENTS_SCHEMA).parquet(events_dir)
    )
    emitted = {tuple(r) for r in result.collect()}
    all_windows = {tuple(r) for r in batch_all.collect()}
    assert emitted  # batch-1-finalized windows were flushed in batch 2
    assert emitted < all_windows  # open/withheld windows absent
    # every emitted window's content matches the full-data batch answer
    assert emitted <= all_windows


def test_stateful_totals_accumulate_across_batches(spark, events_dir):
    """applyInPandasWithState: state carries across the two micro-batches;
    the *last* update per user equals the full batch aggregate."""
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    result = S.run_to_memory(S.user_running_totals(stream), "t_state", "update")
    # update mode appends one row per user per batch it appears in; the max
    # total per user is the final state
    final = (
        result.groupBy("user_id")
        .agg(F.max("total").alias("total"))
        .collect()
    )
    expected = {
        r.user_id: r.n
        for r in spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r.user_id: r.total for r in final}
    assert got == expected
    # state genuinely accumulated: at least one user appears in both batches
    multi = result.groupBy("user_id").count().where("count > 1")
    assert not multi.isEmpty()


def test_foreach_batch_provenance(engine, events_dir, tmp_path):
    stream = S.read_events_stream(engine.spark, events_dir, max_files_per_trigger=1)
    counts = S.tumbling_counts(stream, "10 minutes", watermark="10 minutes")
    sink = str(tmp_path / "stream_sink")
    S.run_with_batch_provenance(engine, counts, sink, desc="tumble10")
    tasks = (
        engine.store.table("tasks")
        .where(F.col("transformation_type") == "stream_batch")
        .collect()
    )
    assert len(tasks) >= 2  # one task row per micro-batch
    descs = {t.description for t in tasks}
    assert any("tumble10#batch=0" in d for d in descs)
    assert os.path.exists(sink)


def test_idempotent_batch_sink_replay_safe(spark, events_dir, tmp_path):
    """A replayed micro-batch (same batch_id) replaces its own partition
    instead of appending duplicates — the at-least-once → exactly-once
    bridge for foreachBatch sinks."""
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    counts = S.tumbling_counts(stream, "10 minutes", watermark="10 minutes")
    sink_path = str(tmp_path / "idem_sink")
    sink = S.idempotent_batch_sink(sink_path)
    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    once = spark.read.parquet(sink_path)
    n_once = once.count()
    assert n_once > 0
    batch_ids = [r.batch_id for r in once.select("batch_id").distinct().collect()]
    assert len(batch_ids) >= 2  # one partition per micro-batch

    # simulate the failure-replay: re-run batch 0's write with the same id
    replay = once.where(F.col("batch_id") == batch_ids[0]).drop("batch_id")
    sink(replay, batch_ids[0])
    again = spark.read.parquet(sink_path)
    assert again.count() == n_once  # no duplicates, other partitions intact
    assert sorted(
        r.batch_id for r in again.select("batch_id").distinct().collect()
    ) == sorted(batch_ids)


def test_state_partitioning_restores_conf_and_results_invariant(spark, sf_smoke):
    """state_partitioning pins the count only inside the block, and a
    stateful query returns identical results under different state
    partitionings (results are partition-count independent; only replay
    cost differs)."""
    from samba_spark.streaming import ops as S

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with S.state_partitioning(spark, 3):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before

    import uuid

    stream = S.read_events_stream(
        spark, sf_smoke, nanos=True, path_glob="events.parquet"
    )
    outs = []
    for n in (2, 7):
        name = "sp_" + uuid.uuid4().hex[:8]
        out = S.run_to_memory(
            S.tumbling_counts(stream, "10 minutes"),
            name,
            "complete",
            state_partitions=n,
        )
        outs.append({tuple(r) for r in out.collect()})
    assert outs[0] == outs[1]


def test_composite_stateful_totals_match_batch(spark, events_dir):
    """user_totals_stateful (q78's operator): composite (count, cents,
    errors) state folds across batches to exactly the batch aggregate."""
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    result = S.run_to_memory(
        S.user_totals_stateful(stream), "t_state_cents", "update"
    )
    final = {
        r.user_id: (r.n_events, r.sum_cents, r.n_errors)
        for r in result.groupBy("user_id")
        .agg(
            F.max_by(F.struct("n_events", "sum_cents", "n_errors"), "n_events").alias(
                "s"
            )
        )
        .select("user_id", "s.n_events", "s.sum_cents", "s.n_errors")
        .collect()
    }
    expected = {
        r.user_id: (r.n, r.cents, r.errs)
        for r in spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("errs"),
        )
        .collect()
    }
    assert final == expected


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas worker needs the protobuf package "
    "(absent in this container; see user_totals_tws docstring)",
)
def test_transform_with_state_totals_match_batch(spark, events_dir):
    """Spark-4 transformWithStateInPandas path: same contract as the
    applyInPandasWithState fold above. Runs wherever protobuf exists."""
    stream = S.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    result = S.run_to_memory(S.user_totals_tws(stream), "t_tws", "update")
    final = {
        r.user_id: r.n
        for r in result.groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
    }
    expected = {
        r.user_id: r.n
        for r in spark.read.schema(S.EVENTS_SCHEMA)
        .parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == expected


def test_sessionize_stream_matches_batch(spark, tmp_path, sf_smoke):
    import os

    from samba_spark.operators.sessionize import sessionize
    from samba_spark.sources.tables import load_tables
    from samba_spark.streaming.ops import run_sessionize_stream

    # load_tables, not a raw parquet read: the fixture's events.ts
    # physical type varies by generation (verify-skill gotcha) and
    # unix_micros needs a true TIMESTAMP
    events = load_tables(spark, sf_smoke, ["events"])["events"].select(
        "user_id", "event_id", "ts", "event_type"
    )
    b = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    cut = b["lo"] + (b["hi"] - b["lo"]) / 2
    batches_dir = str(tmp_path / "batches")
    os.makedirs(batches_dir)
    for k, sdf in enumerate(
        (events.where(F.col("ts") < F.lit(cut)),
         events.where(F.col("ts") >= F.lit(cut)))
    ):
        tmp = str(tmp_path / f"stage_{k}")
        sdf.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
        )
        dst = os.path.join(batches_dir, f"b{k}.parquet")
        os.replace(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000_000 + k, 1_000_000_000 + k))
    store = str(tmp_path / "store")
    out = run_sessionize_stream(
        spark, batches_dir, store, gap_seconds=1800, user_buckets=4
    )
    got = out.orderBy("user_id", "event_id").collect()
    want = (
        sessionize(events, "user_id", "ts", 1800)
        .select("user_id", "event_id", "ts", "event_type", "session_id")
        .orderBy("user_id", "event_id")
        .collect()
    )
    assert got == want


def test_sessionize_stream_empty_batches(spark, tmp_path):
    import os

    from samba_spark.streaming.ops import run_sessionize_stream

    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    out = run_sessionize_stream(
        spark, empty, str(tmp_path / "store_never")
    )
    assert out.count() == 0
    assert "session_id" in out.columns
