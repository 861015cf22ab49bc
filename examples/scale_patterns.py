#!/usr/bin/env python
"""Scale-patterns tour on samba_spark — the mergeable-state family
composed the way a 100 TB analytics platform actually uses it:

  events/documents
    → HLL sketch rollup        (x80: distinct counts from sketch bytes)
    → bitmap exact distinct    (x82: popcount over 4 KiB bucket bitmaps)
    → top-k heavy hitters      (x81: approx_top_k, bounded state)
    → journey patterns         (x78: conversion paths as one regex pass)
    → stratified exact split   (x79: ⌊0.8·n⌋ train rows per language)
    → audited single-pass run  (x84: Observation metrics ride the scan)
    → SQL variables            (q82: data-dependent threshold, folded)

The point of the tour: none of these re-scan raw data to answer the
follow-up question — sketches merge, bitmaps OR, journeys re-regex,
splits re-rank, metrics ride along. That is the property that survives
a 1000-executor cluster.

Run:  python examples/scale_patterns.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samba_spark.operators.mixing import stratified_exact_split
from samba_spark.operators.sketches import (
    bitmap_distinct,
    hll_rollup,
    journey_string,
    pattern_match_counts,
    topk_counts,
)
from samba_spark.plans.audit import run_audited
from samba_spark.session import get_spark
from samba_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="scale_patterns")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir, ["events", "documents", "orders"])
    events, docs, orders = t["events"], t["documents"], t["orders"]
    daily = events.withColumn("day", F.to_date("ts"))

    print("== distinct users per event type: HLL estimate vs bitmap exact ==")
    est = hll_rollup(daily, ["day", "event_type"], ["event_type"], "user_id")
    exact = bitmap_distinct(daily, ["event_type"], "user_id", fine_keys=["day"])
    est.join(exact, "event_type").orderBy("event_type").show()

    print("== top-3 busiest users per event type (approx_top_k counts) ==")
    topk_counts(events, ["event_type"], "user_id", k=3).orderBy(
        "event_type", "rank"
    ).show()

    print("== conversion journeys: view→clicks*→purchase per user ==")
    j = journey_string(events)
    j.select(
        "user_id", pattern_match_counts(j, "vc*p").alias("conversions")
    ).where(F.col("conversions") > 0).orderBy(
        F.desc("conversions"), "user_id"
    ).show(5)

    print("== exact-proportion stratified split by language ==")
    stratified_exact_split(docs, "doc_id", ["lang"], train_pct=80).groupBy(
        "lang", "split"
    ).count().orderBy("lang", "split").show()

    print("== audited single-pass aggregation (Observation API) ==")
    by_priority, audit = run_audited(
        orders,
        {
            "n_rows": F.count(F.lit(1)),
            "cents": F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
        },
        lambda d: d.groupBy("o_orderpriority").count().collect(),
    )
    print(f"  rows seen: {audit['n_rows']}, cents total: {audit['cents']}")
    print(f"  (and the priority histogram came from the same scan: "
          f"{len(by_priority)} groups)")

    print("== SQL session variable folding ==")
    orders.createOrReplaceTempView("sp_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sp_thr DOUBLE")
    spark.sql("SET VAR sp_thr = (SELECT MAX(o_totalprice) / 2 FROM sp_orders)")
    spark.sql(
        "SELECT COUNT(*) AS n_above FROM sp_orders WHERE o_totalprice > sp_thr"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
