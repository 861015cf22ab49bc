"""Physical-layout utilities: bucketing and skew salting.

These are the two levers SCALE.md reserves for data-dependent tuning at
100 TB — co-locating repeated joins via bucketed tables (no per-query
shuffle) and spreading hot keys via salting (bounded task skew). Both are
plain Spark mechanisms; the helpers make them one-liners and the plan tests
prove the shuffle actually disappears.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    *,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sort-bucketed) table. Joins and
    aggregations keyed on ``bucket_cols`` between tables bucketed the same
    way run with ZERO exchange — the shuffle is paid once at write time.
    (Spark bucketing requires saveAsTable, i.e. a session catalog.)"""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: the (large, skewed) left side gets a random
    salt in [0, salt); the (smaller) right side is replicated ``salt``
    times. A key holding 20% of all rows then spreads over ``salt`` tasks
    instead of one. AQE's skew-join split handles moderate skew
    automatically; explicit salting is for the pathological keys AQE's
    partition-splitting cannot break up (single-key hot spots).
    """
    salted_l = left.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_r = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    *,
    mode: str = "overwrite",
) -> None:
    """Persist hive-style partitioned parquet (``path/col=value/...``).
    Readers filtering on ``partition_cols`` prune whole directories at
    planning time (PartitionFilters in the scan) — at 100 TB this is the
    primary access path for time- or tenant-scoped queries. Partition
    columns must be low-cardinality (days, regions), never high-cardinality
    keys (one directory per value)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def repartition_for_join(
    left: DataFrame, right: DataFrame, on: str, partitions: int
) -> tuple[DataFrame, DataFrame]:
    """Pre-shuffle both sides identically so a subsequent join (and any
    later groupBy on the same key) reuses the partitioning — one shuffle
    amortized over several stages."""
    return (
        left.repartition(partitions, on),
        right.repartition(partitions, on),
    )
