"""Histogram-sketch approximations — bounded-state substitutes for
operators whose exact form needs a full per-group sort at 100 TB.

``binned_quantiles`` estimates per-group quantiles from a fixed-width
histogram: the only wide operation is a partial-count aggregate keyed by
(group, bucket), so shuffle volume is bounded by #groups × #buckets no
matter how many raw rows flow in — the classic histogram-sketch trade
(resolution = bucket width) that replaces q37's exact
per-group percentile sort. Unlike t-digest/HLL the binning is
deterministic integer arithmetic, so any engine reproduces the estimate
bit-for-bit (DuckDB oracle in the declared query).

Reference parity note: the reference's approximation story is HLL++
countApproxDistinct (rdd/RDD.scala:1386-1486) — sketch-shaped but
engine-internal; this family keeps the bounded-state idea while staying
oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_quantiles(
    df: DataFrame,
    value: str,
    group: str,
    quantiles: Sequence[int] = (50, 95, 99),
    bucket_width_cents: int = 25,
) -> DataFrame:
    """Per-``group`` quantile estimates of ``value`` from a fixed-width
    histogram. ``quantiles`` are integer percents; the estimate is the
    UPPER edge (in integer cents) of the first bucket whose cumulative
    count reaches p% of the group — a conservative (≥ true quantile)
    estimate with error ≤ one bucket width.

    Plan: one partial-agg shuffle on (group, bucket); the cumulative
    window runs over #buckets rows per group (bounded by the value range,
    not the row count); quantile selection is an integer-gate filter +
    min. Everything after the histogram is sketch-sized.
    """
    w_cents = bucket_width_cents
    bucket = F.floor(F.col(value) * 100 / w_cents).cast("long")
    hist = df.groupBy(F.col(group), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wcum = (
        Window.partitionBy(group)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(group)
    cum = hist.select(
        group,
        "bucket",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wtot).alias("total"),
    )
    ps = F.explode(
        F.array(*[F.lit(int(p)) for p in quantiles])
    ).alias("p_pct")
    # integer gate: cum/total >= p/100  ⇔  100*cum >= p*total
    hit = cum.select(group, "bucket", "cum", "total", ps).where(
        F.col("cum") * 100 >= F.col("p_pct") * F.col("total")
    )
    return (
        hit.groupBy(group, "p_pct")
        .agg(F.min("bucket").alias("_b"))
        .select(
            group,
            F.col("p_pct").cast("long").alias("p_pct"),
            ((F.col("_b") + 1) * w_cents).cast("long").alias("est_cents"),
        )
    )
