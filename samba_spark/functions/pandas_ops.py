"""@pandas_udf factories — scalar and grouped-agg cells of the
Python-boundary matrix (x116). NO ``from __future__ import annotations``
here: pandas_udf resolves the Series/scalar type hints at definition
time, and stringified annotations (what the future import produces) are
rejected with UNSUPPORTED_SIGNATURE. Factory functions so every
worker-bound callable pickles by value (plain-session rule)."""

import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_to_cents():
    """Scalar pandas UDF: dollars → integer cents, Arrow-batched."""

    @pandas_udf("long")
    def to_cents(v: pd.Series) -> pd.Series:
        return (v * 100).round().astype("int64")

    return to_cents


def make_int_sum():
    """Grouped-agg pandas UDF: exact 64-bit integer sum — a user-defined
    aggregate riding the normal hash aggregate (partial aggregation is
    Spark's, only the reduction is Python)."""

    @pandas_udf("long")
    def int_sum(c: pd.Series) -> int:
        return int(c.sum())

    return int_sum


def make_int_count():
    """Grouped-agg pandas UDF: row count (pandas UDAFs cannot mix with
    built-in aggregates in one agg — INVALID_PANDAS_UDF_PLACEMENT — so
    the count rides the same Python reduction)."""

    @pandas_udf("long")
    def int_count(c: pd.Series) -> int:
        return int(len(c))

    return int_count
