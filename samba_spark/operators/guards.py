"""Plan-folded assertions — the kmv k-guard pattern, shared.

A guard rides an existing projection as ``F.when(bad,
raise_error(...)).otherwise(col)``: it costs one comparison per row
inside whole-stage codegen, fires AT EXECUTION on the first offending
row, and never runs the lazy plan a second time (the eager
``.first()``-style check it replaces did exactly that). Every
quantizer/layout/contract guard in the operator modules builds on
this one helper so the guard family's behavior and error-message
format cannot drift apart (round-8 review finding: four bespoke
re-implementations had already appeared)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def plan_assert(
    col: Column,
    bad: Column,
    *message_parts: Column,
    cast: "str | None" = None,
) -> Column:
    """``col`` unchanged when ``bad`` is false; a loud
    ``USER_RAISED_EXCEPTION`` built from ``message_parts`` (strings are
    wrapped as literals, Columns pass through) on the first row where
    it is true. ``cast`` coerces the raise branch when Spark needs both
    ``when`` branches to agree on a non-null type (e.g. replacing an
    integer column)."""
    parts = [
        F.lit(p) if isinstance(p, str) else p for p in message_parts
    ]
    branch = F.raise_error(F.concat(*parts))
    if cast is not None:
        branch = branch.cast(cast)
    return F.when(bad, branch).otherwise(col)


def tiny_df(spark, rows, schema: str):
    """Driver-side metadata as a ONE-partition DataFrame.

    ``spark.createDataFrame(list, ...)`` splits even a 4-row list into
    ``defaultParallelism`` Python partitions; any downstream
    ``coalesce(1).write`` then runs every partition's Python-worker
    handshake SEQUENTIALLY inside one task — measured ~0.12 s × 32
    threads ≈ 4 s per tiny artifact write on local[32] (round-9 bench
    forensics; prov/store.py dodged the same cost with raw pyarrow).
    One explicit slice keeps a metadata write a metadata write."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )
