"""Additional sources/sinks from the reference's inventory (SURVEY.md §2.3
sources table): textFile, wholeTextFiles, binaryFiles, hadoop-style
structured readers, JDBC — each mapped to the idiomatic DataFrame reader
and wrapped with a provenance task when accessed through ProvSession.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """textFile / wholeTextFiles (reference SparkContext.scala:849,892)."""
    return spark.read.text(path, wholetext=wholetext)


def read_binary(spark: SparkSession, path: str) -> DataFrame:
    """binaryFiles (reference SparkContext.scala:944) → binaryFile source
    with (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(path)


def read_csv(
    spark: SparkSession, path: str, *, header: bool = True, schema=None
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_json_tracked(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON read with corrupt-record TRACKING instead of silent null-out:
    PERMISSIVE mode keeps every input line — malformed lines land with
    their raw text in ``corrupt_col`` and NULL data columns, so a 100 TB
    ingest can quarantine rejects (``WHERE corrupt_col IS NOT NULL``) and
    ledger counts reconcile (clean + quarantined = input lines). The
    explicit schema is required: inference would silently drop the
    corrupt column. Note Spark requires the corrupt column to be part of
    the supplied schema; this helper appends it."""
    from pyspark.sql import types as T

    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_jdbc(
    spark: SparkSession, url: str, table: str, *, properties: Optional[dict] = None
) -> DataFrame:
    """JdbcRDD analogue (reference rdd/JdbcRDD.scala) — partitionable via
    the standard numPartitions/partitionColumn options in properties."""
    return spark.read.jdbc(url, table, properties=properties or {})


def read_xml(
    spark: SparkSession, path: str, row_tag: str, schema=None, **options
) -> DataFrame:
    """XML source (built into Spark 4; the reference reads arbitrary Hadoop
    InputFormats — XML is the remaining common text format next to
    csv/json). Schema inference works like JSON's; pass an explicit schema
    at scale so the scan is single-pass."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


# NOTE: Avro is Spark's one "built-in but external module" format — the
# spark-avro jar is not bundled in the pyspark wheel, so the JVM
# datasource is unavailable here. sources/avro.py provides a clean-room
# pure-stdlib Object Container File codec (read_avro/write_avro, null +
# deflate codecs) implemented from the public Avro spec instead.


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """saveAsTextFile (reference rdd/RDD.scala:1684): single string column."""
    df.write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (hadoopFile/sequenceFile analogue for columnar data —
    the reference reads arbitrary Hadoop InputFormats, rdd/SparkContext
    hadoopFile; ORC and parquet are the two columnar formats Spark ships
    built-in, with the same pushdown/pruning support)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet directories written at
    different schema versions (columns added over time) into one frame
    with the merged schema — missing columns come back NULL, no rewrite
    of old data. This is how a 100 TB append-only dataset survives adding
    a column: ``mergeSchema`` pays one footer read per file (no data
    scan), so keep it off for stable-schema hot paths and on for
    evolved multi-era reads like this one."""
    return spark.read.option("mergeSchema", True).parquet(*paths)
