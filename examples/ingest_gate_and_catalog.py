#!/usr/bin/env python
"""Crawl-ingest gate + catalog maintenance on samba_spark — the round-6
operators composed as one nightly job:

  yesterday's corpus
    → Bloom skip-list build       (x122: O(bytes) filter, bitmap rows)
  today's delta
    → Bloom probe                 (x122: definitely_new vs maybe_dup —
                                   only maybes pay the dedup pipeline)
    → audience overlap by source  (x123: KMV set algebra — est |A∩B|
                                   between sources, HLL can't do this)
  dimension feed
    → SCD2 history build          (q99: gaps-and-islands validity
                                   intervals, one key exchange)
  catalog sweep
    → inclusion-dependency scan   (x127: FK-candidate coefficients at
                                   NDV scale)
    → Benford screen              (x125: first-digit drift on amount
                                   columns)
    → daily autocorrelation       (x126: lag-1..5 seasonality per type)

Every stage is a lazy DataFrame transform; the Bloom filter and KMV
sketches are mergeable summaries, so tomorrow's run folds today's state
instead of rescanning history.

Run:  python examples/ingest_gate_and_catalog.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from samba_spark.operators.quality import (
    benford_profile,
    inclusion_coefficient,
)
from samba_spark.operators.relational import scd2_collapse
from samba_spark.operators.sessionize import autocorrelation
from samba_spark.operators.sketches import (
    bloom_filter_table,
    bloom_probe,
    kmv_set_ops_pairwise,
    kmv_sketch,
)
from samba_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ["documents", "events", "orders", "customer"])
    docs, events, orders = t["documents"], t["events"], t["orders"]

    # 1. ingest gate: yesterday's corpus (2/3) filters today's delta (1/3)
    corpus = docs.where(F.col("doc_id") % 3 != 0)
    delta = docs.where(F.col("doc_id") % 3 == 0)
    bloom = bloom_filter_table(corpus, "text")
    verdicts = bloom_probe(bloom, delta, "text", "doc_id")
    gate = {
        r.status: r.n
        for r in verdicts.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"ingest gate: {gate}  (only maybe_dup pays content dedup)")

    # 2. audience overlap between event types (KMV set algebra)
    sk = kmv_sketch(events, "event_type", "user_id", k=256)
    overlaps = kmv_set_ops_pairwise(sk, k=256).orderBy(
        F.desc("est_inter")
    )
    top = overlaps.first()
    print(
        f"largest audience overlap: {top.ga} x {top.gb} — "
        f"est |A∩B| = {top.est_inter} of est |A∪B| = {top.est_union}"
    )

    # 3. SCD2 dimension history from the event feed
    hist = scd2_collapse(
        events.where(F.col("user_id") < 50),
        "user_id",
        "event_type",
        "ts",
        tiebreak=["event_id"],
    )
    n_versions = hist.count()
    n_current = hist.where(F.col("valid_to").isNull()).count()
    print(f"SCD2 history: {n_versions} versions, {n_current} current rows")

    # 4. catalog sweep: FK candidates, Benford drift, seasonality
    fk = inclusion_coefficient(
        orders, "o_custkey", t["customer"], "c_custkey"
    ).first()
    print(
        f"FK candidate {fk.dependency}: coeff "
        f"{fk.coeff_e6 / 10_000:.2f}% over {fk.n_child_distinct} keys"
    )
    worst = (
        benford_profile(orders, "o_totalprice")
        .withColumn("drift", F.abs(F.col("pct_e6") - F.col("benford_e6")))
        .orderBy(F.desc("drift"))
        .first()
    )
    print(
        f"Benford drift: digit {worst.digit} observed "
        f"{worst.pct_e6 / 10_000:.2f}% vs expected "
        f"{worst.benford_e6 / 10_000:.2f}%"
    )
    acf1 = (
        autocorrelation(events, "event_type", "ts", "value", max_lag=1)
        .orderBy(F.desc(F.abs(F.col("acf"))))
        .first()
    )
    print(f"strongest lag-1 autocorrelation: {acf1.event_type} {acf1.acf}")
    spark.stop()


if __name__ == "__main__":
    main()
