#!/usr/bin/env python
"""Feature/label pipeline tour — the round-3 warehouse-maintenance and
feature-store surfaces composed the way a daily training-data job chains
them:

  events (parquet eras)
    → corrupt-record quarantine     (readers.read_json_tracked pattern)
    → streaming CDC snapshot        (q73: merge_latest folds per batch)
    → time travel                   (read_cdc_snapshot version=N)
    → point-in-time features        (q74: as-of + trailing-window, no leakage)
    → incremental rollup            (x71: merge_partial_aggs, O(delta))
    → dataset card                  (x76: per-source corpus report)
    → vocabulary induction          (x75/bpe_train: BPE merge rounds)

Run:  python examples/feature_pipeline.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samba_spark.operators.merge import merge_partial_aggs
from samba_spark.operators.textual import bpe_train
from samba_spark.session import get_spark
from samba_spark.sources.tables import load_tables
from samba_spark.streaming.ops import read_cdc_snapshot, run_cdc_snapshot


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="feature_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ["events", "documents", "orders"])
    events, docs, orders = t["events"], t["documents"], t["orders"]
    work = tempfile.mkdtemp(prefix="feature_pipeline_")

    # 1. CDC: fold the event stream into a latest-state-per-user snapshot,
    #    one micro-batch per file; snapshots are versioned per batch.
    src = os.path.join(work, "events_in")
    events.repartition(3).write.parquet(src)
    snapshot = run_cdc_snapshot(spark, src, work)
    print("CDC snapshot users:", snapshot.count())
    v0 = read_cdc_snapshot(spark, work, version=0)
    print("time-travel to batch 0:", v0.count(), "users")

    # 2. Point-in-time features per purchase label (leakage-free).
    labels = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    feats = (
        labels.join(
            views,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") < F.col("ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("v_ts").alias("views_1h"))
    )
    print("labels with features:", feats.count())

    # 3. Incremental rollup maintenance: fold the new day into the
    #    maintained aggregate instead of rescanning history.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def per_priority(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).alias("total_cents"),
        )

    cutoff = F.lit("1999-01-01").cast("timestamp")
    maintained = merge_partial_aggs(
        per_priority(orders.where(F.col("o_orderdate") < cutoff)),
        per_priority(orders.where(F.col("o_orderdate") >= cutoff)),
        ["o_orderpriority"],
        ["n", "total_cents"],
    )
    maintained.orderBy("o_orderpriority").show(truncate=False)

    # 4. Vocabulary induction for the tokenizer.
    merges, _final = bpe_train(docs, n_merges=3)
    for m in merges:
        print(
            f"merge round {m['round']}: "
            f"({m['pair_left']}, {m['pair_right']}) x{m['pair_count']}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
