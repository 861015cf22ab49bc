"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (Q23, TPC-H-Q3-like star join) at sf0.001.
- ``queries()``: one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()``: DuckDB-equivalent SQL per query for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from samba_spark.queries import DECLARED

    return DECLARED["q23_star_join"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (Q1-Q50
    relational/streaming/graph surface + x1-x34 extension operators)."""
    from samba_spark.queries import ALL_QUERIES

    return {name: spec.fn for name, spec in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key. Keys absent here (non-SQL-
    expressible ops: xxhash64-family minhash/simhash, seeded-LSH ANN) get a
    rows-only check from the driver."""
    from samba_spark.queries import ALL_QUERIES
    from samba_spark.queries.extras import seed_q24_oracle_dir

    # q24's oracle reads the prov parquet its own Spark run writes; seed
    # empty schema-correct files so the SQL BINDS in any consumer
    # ordering (the comparison itself always follows a fresh q24 run).
    seed_q24_oracle_dir()

    return {
        name: spec.oracle.strip()
        for name, spec in ALL_QUERIES.items()
        if spec.oracle is not None
    }
