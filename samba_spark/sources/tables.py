"""Fixture-table loading (TESTDATA.md).

At 100 TB these reads hit a real warehouse; the contract stays the same —
``spark.read.parquet`` gives Catalyst the vectorized scan with predicate
pushdown and column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# events.parquet is written with TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects unless either (a) spark.sql.legacy.parquet.nanosAsLong is
# set, or (b) an explicit LongType schema is supplied for the column. The
# driver runs queries in its OWN session without the legacy conf, so the
# explicit schema is the only portable read (same approach as
# streaming/ops.py EVENTS_SCHEMA_NANOS, proven green under the driver).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch-nanos as INT64
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    out = {}
    for name in names or TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            if name == "events":
                # Explicit LongType schema for the nanos column — works in
                # ANY session, legacy conf or not. `div` (integer) keeps the
                # nanos→micros truncation exact past 2^53.
                from pyspark.sql import functions as F

                df = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path)
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            else:
                df = spark.read.parquet(path)
            out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
