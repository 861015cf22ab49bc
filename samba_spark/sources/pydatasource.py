"""FileGroup as a Spark 4 Python Data Source (``format("filegroup")``).

The reference exposes file groups only through an RDD entry point
(``sc.fileGroup``, SparkContext.scala:1339-1358); sources/filegroup.py is
our DataFrame equivalent. This module additionally surfaces the concept
through Spark's user-defined data source API (pyspark.sql.datasource,
Spark 4): the source participates in normal reader/writer planning —
``spark.read.format("filegroup").option("path", root).load()`` — with

- **partition planning**: one InputPartition per group directory, so a
  root with 10k groups scans as 10k independent tasks, scheduled like any
  other scan (the executor reads only its group's files; nothing is
  materialized on the driver);
- **a writer half**: ``df.write.format("filegroup").mode(...).save()``
  (with ``.option("path", root)``) lays each (group, name, content) row
  down as ``<root>/<group>/<name>`` from the executors — the
  save_files_at contract as a declarative sink, with per-task commit
  messages aggregated into a file count in ``_SUCCESS``.

Rows are flat (one per file) — the per-file grain composes with ordinary
relational operators; sources/filegroup.py keeps the nested one-row-per-
group shape for blackbox pipelines.

Scale note: ``partitions()`` lists only group DIRECTORIES on the driver
(one listdir), never file contents; per-group file listing and reads
happen in ``read()`` on executors. Groups are the parallelism unit — a
single giant group serializes into one task, so shard such layouts into
more groups (same guidance as the reference's per-template grouping).

Plain-session rule: Spark pickles the DataSource class itself to the
create-data-source worker, so the class hierarchy is built inside
:func:`_build_source_class` — dynamic qualnames make cloudpickle ship
every class BY VALUE, and workers never need samba_spark on PYTHONPATH
(the same rule every pandas/stateful body in this repo follows).
"""

from __future__ import annotations

FILEGROUP_ROWS_SCHEMA = "group string, name string, size bigint, content binary"


def _build_source_class():
    import os
    import shutil

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    class FileGroupRowsReader(DataSourceReader):
        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError(
                    "filegroup source requires .option('path', <root>)"
                )
            self.suffix = options.get("suffix", "")

        def partitions(self):
            groups = sorted(
                d
                for d in os.listdir(self.root)
                if os.path.isdir(os.path.join(self.root, d))
            )
            return [InputPartition(g) for g in groups]

        def read(self, partition):
            gdir = os.path.join(self.root, partition.value)
            for name in sorted(os.listdir(gdir)):
                p = os.path.join(gdir, name)
                if not os.path.isfile(p) or not name.endswith(self.suffix):
                    continue
                with open(p, "rb") as f:
                    content = f.read()
                yield (partition.value, name, len(content), content)

    class WroteFiles(WriterCommitMessage):
        def __init__(self, n, paths):
            self.n = n
            self.paths = paths

    class FileGroupRowsWriter(DataSourceWriter):
        # Overwrite writes land in a staging root that commit() swaps in
        # (the compact_dataset two-rename discipline), so a previous save's
        # files can never survive an overwrite and a failed job leaves the
        # old root intact. Append writes go direct ('xb'); abort() removes
        # the files each failed task reported in its commit message.
        def __init__(self, options, overwrite):
            import uuid

            self.root = options.get("path")
            if not self.root:
                raise ValueError(
                    "filegroup sink requires .option('path', <root>)"
                )
            self.overwrite = overwrite
            # Unique staging per job (the writer instance is built on the
            # driver and shipped to every task, so the uuid is shared
            # within a job and distinct across jobs): a fixed staging name
            # would let two concurrent overwrites of the same root write
            # into each other's staging and the loser swap in an empty or
            # mixed directory. Crashed jobs leave their .fgwrite-*.tmp
            # behind; abort() removes this job's own.
            self.staging = (
                self.root.rstrip("/") + f".fgwrite-{uuid.uuid4().hex}.tmp"
                if overwrite
                else self.root
            )

        def write(self, iterator):
            n = 0
            paths = []
            for row in iterator:
                gdir = os.path.join(self.staging, row.group)
                os.makedirs(gdir, exist_ok=True)
                mode = "wb" if self.overwrite else "xb"
                path = os.path.join(gdir, row.name)
                with open(path, mode) as f:
                    f.write(
                        bytes(row.content) if row.content is not None else b""
                    )
                paths.append(path)
                n += 1
            return WroteFiles(n, paths)

        def commit(self, messages):
            total = sum(m.n for m in messages if m is not None)
            if self.overwrite:
                # Two-rename swap (old→aside, staging→root). Not atomic: a
                # crash between the renames leaves no root but DOES leave
                # the .old directory with the previous data for manual
                # recovery — never a silent mix of old and new files.
                old = self.root.rstrip("/") + ".fgwrite.old"
                if os.path.isdir(old):
                    shutil.rmtree(old)
                os.makedirs(self.staging, exist_ok=True)
                if os.path.isdir(self.root):
                    os.rename(self.root, old)
                os.rename(self.staging, self.root)
                if os.path.isdir(old):
                    shutil.rmtree(old)
            with open(os.path.join(self.root, "_SUCCESS"), "w") as f:
                f.write(str(total))

        def abort(self, messages):
            if self.overwrite:
                if os.path.isdir(self.staging):
                    shutil.rmtree(self.staging)
                return
            for m in messages or []:
                for path in getattr(m, "paths", None) or []:
                    try:
                        os.remove(path)
                    except OSError:
                        pass

    class FileGroupDataSource(DataSource):
        @classmethod
        def name(cls):
            return "filegroup"

        def schema(self):
            # inlined (not the module constant): the class ships by value
            # and must not capture a samba_spark module global
            return "group string, name string, size bigint, content binary"

        def reader(self, schema):
            return FileGroupRowsReader(self.options)

        def writer(self, schema, overwrite):
            return FileGroupRowsWriter(self.options, overwrite)

    return FileGroupDataSource


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(_build_source_class())
