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
                       modified boolean, content binary, content_ref string>>

built on ``spark.read.format("binaryFile")`` — distributed read, no
in-driver file materialization. At 100 TB file content past a size
threshold lives in a content-addressed blob store as a ``content_ref``
instead of inline bytes (SURVEY.md §4.2 hard spot (c)): see
:func:`spill_contents` / :func:`hydrate_contents`; every consumer resolves
refs via :func:`resolve_file_content`.
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
        # SURVEY.md §4.2 hard spot (c): past a size threshold the bytes
        # live in a content-addressed blob store and ``content`` is NULL;
        # ``content_ref`` holds the blob path. See spill_contents().
        T.StructField("content_ref", T.StringType()),
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
                F.lit(None).cast("string").alias("content_ref"),
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


def resolve_file_content(f) -> bytes:
    """Bytes of one file struct, following ``content_ref`` when the bytes
    were spilled to the blob store. Works on Row, dict, or pandas struct."""
    content = f["content"]
    if content is not None:
        return bytes(content)
    try:
        ref = f["content_ref"]
    except (KeyError, ValueError, IndexError):
        ref = None
    if ref:
        with open(ref, "rb") as fh:
            return fh.read()
    return b""


def _file_as_dict(f) -> dict:
    keys = ("path", "name", "size", "modified", "content", "content_ref")
    out = {}
    for k in keys:
        try:
            out[k] = f[k]
        except (KeyError, ValueError, IndexError):
            out[k] = None
    return out


def spill_contents(pdf, blob_root: str, threshold: int = 1 << 20):
    """Move file contents ≥ ``threshold`` bytes out of the DataFrame into a
    content-addressed blob directory (sha256, two-level fan-out — the same
    layout as the ArtifactStore), leaving ``content = NULL`` and
    ``content_ref = <blob path>`` in the row.

    This is the 100 TB contract for FileGroups (SURVEY.md §4.2 hard spot
    (c)): a shuffle or Arrow batch must never carry multi-GB payloads
    inline. After spilling, a FileGroup row costs O(#files × ref) bytes on
    the wire regardless of content size; every consumer (run_command,
    save_files_at, ArtifactStore.commit) resolves refs transparently via
    :func:`resolve_file_content`. ``blob_root`` must be storage every
    executor can reach — a shared filesystem locally, an object-store
    mount at cluster scale (same requirement the artifact store already
    has). Writes are executor-side, content-addressed and atomic
    (tmp + rename), so duplicate content across groups stores once and
    concurrent writers of equal blobs are safe. Lineage: a value-preserving
    physical rewrite — provenance ids/deps pass through unchanged."""
    import pandas as pd

    from samba_spark.operators.wrapper import ProvDataFrame

    src = pdf.raw
    schema = src.schema
    blob_dir = os.path.join(blob_root, "blobs")
    os.makedirs(blob_dir, exist_ok=True)

    def _spill(batches):
        import hashlib
        import uuid

        for batch in batches:
            new_files_col = []
            for files in batch["files"]:
                out = []
                for f in list(files):
                    d = _file_as_dict(f)
                    content = d["content"]
                    if content is not None and len(content) >= threshold:
                        content = bytes(content)
                        sha = hashlib.sha256(content).hexdigest()
                        sub = os.path.join(blob_dir, sha[:2])
                        os.makedirs(sub, exist_ok=True)
                        path = os.path.join(sub, sha)
                        if not os.path.exists(path):
                            tmp = f"{path}.{uuid.uuid4().hex}.tmp"
                            with open(tmp, "wb") as fh:
                                fh.write(content)
                            os.replace(tmp, path)
                        d["content"] = None
                        d["content_ref"] = path
                    out.append(d)
                new_files_col.append(out)
            batch = batch.copy()
            batch["files"] = new_files_col
            yield batch

    out = src.mapInPandas(_spill, schema)
    return ProvDataFrame(
        pdf.session,
        out,
        op="map",
        desc=f"spillContents(>={threshold}B)",
        parents=[pdf],
        elements_enabled=pdf.elements_enabled,
    )


def hydrate_contents(pdf):
    """Inverse of :func:`spill_contents`: read every ``content_ref`` back
    into inline ``content`` bytes (e.g. before handing groups to a consumer
    outside the engine). Executor-side reads; refs must be reachable from
    every executor."""
    from samba_spark.operators.wrapper import ProvDataFrame

    src = pdf.raw
    schema = src.schema

    def _hydrate(batches):
        for batch in batches:
            new_files_col = []
            for files in batch["files"]:
                out = []
                for f in list(files):
                    d = _file_as_dict(f)
                    if d["content"] is None and d["content_ref"]:
                        d["content"] = resolve_file_content(d)
                        d["content_ref"] = None
                    out.append(d)
                new_files_col.append(out)
            batch = batch.copy()
            batch["files"] = new_files_col
            yield batch

    out = src.mapInPandas(_hydrate, schema)
    return ProvDataFrame(
        pdf.session,
        out,
        op="map",
        desc="hydrateContents",
        parents=[pdf],
        elements_enabled=pdf.elements_enabled,
    )
