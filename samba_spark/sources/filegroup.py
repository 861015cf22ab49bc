"""FileGroup source (A4) — named sets of in-memory files as DataFrame rows.

Reference model (core/src/main/java/br/uff/spark/advancedpipe/
FileGroup.java:20-39, FileElement.java:13-49): a FileGroup is a named set of
in-memory files plus an extraInfo map; ``sc.fileGroup(templates…)`` loads
each template's files via binaryFiles into one group per template
(SparkContext.scala:1339-1358).

Ours is one DataFrame row per group::

    group_name string,
    extra_info map<string,string>,
    files array<struct<path string, name string, size bigint,
                       modified boolean, content binary>>

built on ``spark.read.format("binaryFile")`` — distributed read, no
in-driver file materialization. At 100 TB file content past a size
threshold should live in the artifact store as a content ref instead of
inline bytes (SURVEY.md §4.2 hard spot (c)); see blackbox.spill notes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILE_STRUCT = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("modified", T.BooleanType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FILE_GROUP_SCHEMA = T.StructType(
    [
        T.StructField("group_name", T.StringType()),
        T.StructField("extra_info", T.MapType(T.StringType(), T.StringType())),
        T.StructField("files", T.ArrayType(FILE_STRUCT)),
    ]
)


@dataclass
class FileGroupTemplate:
    """Declarative loader spec (reference advancedpipe/
    FileGroupTemplate.scala:17-84: ofFile / ofFiles / ofDirectory(WithFilter)
    / explicit baseDir+files; optional name)."""

    paths: list[str]
    name: Optional[str] = None
    extra_info: dict[str, str] = field(default_factory=dict)

    @classmethod
    def of_file(cls, path: str, name: Optional[str] = None, **extra) -> "FileGroupTemplate":
        return cls([path], name=name, extra_info={k: str(v) for k, v in extra.items()})

    @classmethod
    def of_files(cls, paths: list[str], name: Optional[str] = None, **extra) -> "FileGroupTemplate":
        return cls(list(paths), name=name, extra_info={k: str(v) for k, v in extra.items()})

    @classmethod
    def of_directory(
        cls,
        directory: str,
        name: Optional[str] = None,
        file_filter: Optional[Callable[[str], bool]] = None,
        **extra,
    ) -> "FileGroupTemplate":
        files = sorted(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if os.path.isfile(os.path.join(directory, f))
            and (file_filter is None or file_filter(f))
        )
        return cls(files, name=name, extra_info={k: str(v) for k, v in extra.items()})

    @property
    def resolved_name(self) -> str:
        """Default name = sorted joined file names (reference
        FileGroup.java:30-39)."""
        if self.name:
            return self.name
        return ",".join(sorted(os.path.basename(p) for p in self.paths))


def read_file_groups(session, templates, name: Optional[str] = None):
    """A4: one FileGroup row per template, unioned. Each template's files are
    read with the distributed binaryFile source and collected into the
    group's ``files`` array (small per-group file sets by construction —
    the reference materializes them all in executor memory too)."""
    from samba_spark.operators.wrapper import ProvDataFrame

    spark: SparkSession = session.spark
    parts: list[DataFrame] = []
    for t in templates:
        raw = spark.read.format("binaryFile").load(t.paths)
        if t.extra_info:
            kvs = [x for k, v in sorted(t.extra_info.items()) for x in (F.lit(k), F.lit(v))]
            extra = F.create_map(*kvs)
        else:
            extra = F.expr("map()").cast("map<string,string>")
        per_file = raw.select(
            F.lit(t.resolved_name).alias("group_name"),
            extra.alias("extra_info"),
            F.struct(
                F.col("path").alias("path"),
                F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
                F.col("length").alias("size"),
                F.lit(False).alias("modified"),
                F.col("content").alias("content"),
            ).alias("file"),
        )
        grouped = per_file.groupBy("group_name").agg(
            F.first("extra_info").alias("extra_info"),
            F.array_sort(F.collect_list("file")).alias("files"),
        )
        parts.append(grouped)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    pdf = ProvDataFrame._source(
        session, df, op="fileGroup", desc=name or f"fileGroup[{len(list(templates))}]"
    )
    return pdf
