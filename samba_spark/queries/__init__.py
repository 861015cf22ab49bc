"""Declared query surface (SURVEY.md §2.3/§2.4, FIXTURES.md).

``DECLARED`` maps query name → QuerySpec(spark_fn, oracle_sql). The spark_fn
is idiomatic DataFrame code (the operator under test); oracle_sql is the
ANSI-SQL equivalent DuckDB runs on the same parquet for the correctness gate.
"""

from samba_spark.queries.declared import DECLARED, QuerySpec
from samba_spark.queries.extensions import EXTENSIONS
from samba_spark.queries.extras import EXTRAS

ALL_QUERIES = {**DECLARED, **EXTRAS, **EXTENSIONS}

__all__ = ["DECLARED", "EXTRAS", "EXTENSIONS", "ALL_QUERIES", "QuerySpec"]
