"""Fixture-table loading (TESTDATA.md).

At 100 TB these reads hit a real warehouse; the contract stays the same —
``spark.read.parquet`` gives Catalyst the vectorized scan with predicate
pushdown and column pruning for free.
"""

from __future__ import annotations

import os

import functools
import glob as _glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The fixture generator has shipped events.ts under two physical layouts:
# TIMESTAMP(NANOS) (round 1) and TIMESTAMP(MICROS) (round 2). Spark's
# vectorized reader rejects NANOS unless either (a)
# spark.sql.legacy.parquet.nanosAsLong is set, or (b) an explicit LongType
# schema is supplied for the column; MICROS reads natively as TimestampType.
# The driver runs queries in its OWN session without the legacy conf, so the
# portable read is: sniff the parquet footer once (pyarrow, driver-side,
# O(footer) not O(data)) and pick the matching read path.
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

@functools.lru_cache(maxsize=None)
def events_ts_is_nanos(path: str) -> bool:
    """True iff the ``ts`` column at ``path`` needs the LongType+div-1000
    read (TIMESTAMP(NANOS), or already-raw INT64 nanos). ``path`` may be a
    single parquet file or a directory of part files."""
    import pyarrow.dataset as ds

    typ = str(ds.dataset(path, format="parquet").schema.field("ts").type)
    return typ in ("timestamp[ns]", "int64")


def resolve_events_file(path: str, path_glob: str | None = None) -> str:
    """A concrete parquet file/dir to sniff: ``path`` joined with the first
    ``path_glob`` match when a glob is given (streaming sources take a
    directory + glob)."""
    if path_glob is None:
        return path
    matches = sorted(_glob.glob(os.path.join(path, path_glob)))
    return matches[0] if matches else path


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
            if name == "events" and events_ts_is_nanos(path):
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
                if name == "events" and isinstance(
                    df.schema["ts"].dataType, T.TimestampNTZType
                ):
                    # MICROS files infer as TIMESTAMP_NTZ under Spark 4's
                    # default inferTimestampNTZ; every downstream time op
                    # (unix_micros, watermarks, window()) is written against
                    # TIMESTAMP, so pin the session-tz-aware type here. The
                    # wall-clock is UTC-generated and sessions run with
                    # timeZone=UTC, so the instant is unchanged.
                    from pyspark.sql import functions as F

                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            out[name] = df
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
