#!/usr/bin/env python
"""Event-analytics tour on samba_spark — the sessionization family
composed the way a product-analytics run chains them:

  events
    → batch sessionization      (x22: gaps-and-islands, one user-keyed shuffle)
    → ordered funnel            (x40: signup → click → purchase)
    → retention cohorts         (x41: weekly first-seen triangle)
    → join-key skew profile     (x39: decide-before-you-shuffle diagnostic)
    → touch attribution         (x56: first/last-touch credit matrix)
    → anomaly flags             (x58: exact-integer trailing z-score)
    → concurrency profile       (x59: sweep-line, day-bucketed)

Run:  python examples/events_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samba_spark.operators.sessionize import (
    attribution,
    concurrency_profile,
    funnel_counts,
    retention_cohorts,
    session_stats,
    sliding_zscore_anomalies,
)
from samba_spark.plans.layout import skew_profile
from samba_spark.session import get_spark
from samba_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="events_analytics")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_tables(spark, sf_dir, ["events"])["events"]

    sessions = session_stats(events, gap_seconds=300)
    print(f"sessions (5-min gap): {sessions.count()}")

    print("funnel:")
    for r in funnel_counts(events, ["signup", "click", "purchase"]).collect():
        print(f"  {r.step:18s} {r.n_users}")

    print("retention (cohort, offset, users):")
    for r in retention_cohorts(events).collect()[:8]:
        print(f"  {r.cohort}  +{r.period_offset}w  {r.n_users}")

    print("user_id skew profile (top 5):")
    for r in skew_profile(events, "user_id", top=5).collect():
        print(f"  user {r.user_id}: {r.n_rows} rows ({r.share_ppm} ppm)")

    print("purchase attribution (first_touch, last_touch, n, cents):")
    for r in attribution(events).orderBy("first_touch", "last_touch").collect()[:6]:
        print(f"  {r.first_touch:8s} {r.last_touch:8s} {r.n_conversions:5d} {r.value_cents}")

    anomalies = sliding_zscore_anomalies(events)
    print(f"trailing z-score anomalies (k=3, n=20): {anomalies.count()}")

    print("max concurrency per day (first 5):")
    for r in concurrency_profile(events).orderBy("day").collect()[:5]:
        print(f"  {r.day}  {r.max_concurrency}")

    spark.stop()


if __name__ == "__main__":
    main()
