"""Distributed parquet-footer manifest — Iceberg/Delta-style file
statistics collection, built from the engine side.

At 100 TB a table is O(100k) files; planning-time pruning needs per-file
row counts and column min/max WITHOUT scanning data. This operator reads
only parquet FOOTERS, distributed: the driver lists paths (metadata-sized),
executors each open their slice of files with pyarrow and emit one row per
file. The result is the manifest a table format would persist — and the
input to compact_dataset's small-file decisions (plans/layout.py).

Footer reads are ~KB each regardless of file size, so the operator's cost
is O(#files) seeks, fanned out across the cluster instead of a driver
loop. Verified against DuckDB's parquet_file_metadata()/parquet_metadata()
both in a dedicated parity test and by the declared x53 query, whose
oracle manifests a deterministic fixed-path dataset the query lays down.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = (
    "file_name string, n_rows long, n_row_groups long, n_columns long, "
    "min_key long, max_key long"
)


def parquet_manifest(
    spark: SparkSession,
    paths: list[str],
    stats_column: Optional[str] = None,
) -> DataFrame:
    """One row per parquet file: (file_name, n_rows, n_row_groups,
    n_columns, min_key, max_key). ``stats_column`` selects an int64 column
    whose row-group statistics are folded into file-level min/max (NULL
    when absent from a file or when statistics are missing).

    The path list is parallelized so each executor reads only the footers
    of its slice — no data pages are fetched.
    """
    col_name = stats_column

    def _read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for batch in batches:
            out = []
            for path in batch["path"]:
                f = pq.ParquetFile(path)
                md = f.metadata
                min_v = max_v = None
                if col_name is not None and col_name in f.schema_arrow.names:
                    idx = f.schema_arrow.names.index(col_name)
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            min_v = max_v = None
                            break
                        min_v = st.min if min_v is None else min(min_v, st.min)
                        max_v = st.max if max_v is None else max(max_v, st.max)
                out.append(
                    (
                        os.path.basename(path),
                        md.num_rows,
                        md.num_row_groups,
                        md.num_columns,
                        min_v,
                        max_v,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "file_name",
                    "n_rows",
                    "n_row_groups",
                    "n_columns",
                    "min_key",
                    "max_key",
                ],
            )

    # one task per slice of files, capped at the session's parallelism —
    # 4 files should not launch 32 Python workers, and 100k files should
    # not launch 100k tasks
    n_slices = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
    paths_df = spark.createDataFrame(
        [(p,) for p in sorted(paths)], "path string"
    ).repartition(n_slices)
    return paths_df.mapInPandas(_read_footers, _SCHEMA)


def table_manifest(
    spark: SparkSession, sf_dir: str, stats_column: Optional[str] = None
) -> DataFrame:
    """Manifest of every ``*.parquet`` under ``sf_dir`` (a file or a
    directory of part-files per table both work — directories contribute
    their part files)."""
    paths: list[str] = []
    for entry in sorted(os.listdir(sf_dir)):
        full = os.path.join(sf_dir, entry)
        if os.path.isfile(full) and entry.endswith(".parquet"):
            paths.append(full)
        elif os.path.isdir(full):
            for sub in sorted(os.listdir(full)):
                if sub.endswith(".parquet"):
                    paths.append(os.path.join(full, sub))
    return parquet_manifest(spark, paths, stats_column)
