"""Declarative data-quality audit — expectation checks as ONE aggregation
pass over the table.

A 100 TB ingest gate cannot afford one scan per rule; here every check is
a conditional partial aggregate (violation predicate → SUM of 0/1), so N
rules cost exactly one scan + one 1-row global aggregate regardless of N.
Key-uniqueness is the one rule that inherently needs more than row-local
state — it rides the same pass as a COUNT vs COUNT DISTINCT pair
(Catalyst's expand rewrite, still a single job).

The reference has no data-validation surface; this is north-star utility
for the training-data pipeline (gate a corpus drop before it poisons a
run), kept engine-exact: all outputs are integer counts.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_audit(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """One row per check: (check_name, n_violations, n_rows, passed).
    ``checks`` maps check name → VIOLATION predicate (TRUE = bad row).
    Single scan, single 1-row aggregate; results explode driver-free."""
    names = list(checks)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for name in names:
        aggs.append(
            F.sum(
                F.when(checks[name], F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"_v_{len(aggs)}")
        )
    row = df.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"_v_{i + 1}").alias("nv"),
            )
            for i, name in enumerate(names)
        ]
    )
    return row.select(F.col("_n"), F.explode(cells).alias("c")).select(
        F.col("c.check_name").alias("check_name"),
        F.col("c.nv").alias("n_violations"),
        F.col("_n").alias("n_rows"),
        (F.col("c.nv") == 0).alias("passed"),
    )


def key_uniqueness(df: DataFrame, *cols: str) -> DataFrame:
    """(n_rows, n_distinct, n_duplicates) for a candidate key — COUNT vs
    COUNT DISTINCT in one aggregate (expand rewrite, one job)."""
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(*[F.col(c) for c in cols])
        .cast("long")
        .alias("n_distinct"),
    ).select(
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).cast("long").alias("n_duplicates"),
    )
