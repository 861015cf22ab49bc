#!/usr/bin/env python
"""Robust time-series tour — the session-4 exact-integer analytics shelf
composed the way a metrics-quality run chains them:

  events
    → median/MAD outlier flags     (x104: 50% breakdown point, engine-exact)
    → winsorization audit          (x109: clip, don't drop, with counts)
    → CUSUM change-point           (x108: day-carry ladder, no global window)
    → per-user-day TWAP            (q92: value weighted by held time)
    → interpolated daily series    (q90: exact straight line through gaps)
    → closed-form regression       (x107: diurnal + trend fit, exact Cramer)

Run:  python examples/robust_timeseries.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samba_spark.operators.sessionize import (
    cusum_changepoint,
    interpolate_daily_counts,
    mad_outliers,
    time_weighted_average,
    winsorize_audit,
)
from samba_spark.operators.vectorops import linear_model_2f
from samba_spark.session import get_spark
from samba_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="robust_timeseries_example")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_tables(spark, sf_dir, ["events"])["events"]

    print("== MAD outliers (top 5 by deviation) ==")
    mad_outliers(events).orderBy(F.desc("dev4")).show(5, truncate=False)

    print("== Winsorization audit ==")
    winsorize_audit(events).orderBy("event_type").show(truncate=False)

    print("== CUSUM change-point per event type ==")
    cusum_changepoint(events).orderBy("event_type").show(truncate=False)

    print("== TWAP: 5 busiest user-days ==")
    time_weighted_average(events).orderBy(F.desc("twap_den")).show(5)

    print("== Interpolated daily counts (user 0) ==")
    interpolate_daily_counts(events).where("user_id = 0").orderBy(
        "day"
    ).show(10)

    print("== value ~ hour + day trend, per event type ==")
    linear_model_2f(
        events,
        "event_type",
        F.hour("ts"),
        F.expr("datediff(CAST(ts AS DATE), DATE'2024-01-01')"),
        F.round(F.col("value") * 100),
    ).orderBy("event_type").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
