"""Semi-structured (JSON) column operators.

Event logs and crawl metadata carry JSON payload columns; at 100 TB the
only viable parse is the JVM-side one — ``get_json_object`` /
``from_json`` are codegen'd expressions that run inside the parquet scan
stage (zero shuffle, zero Python). The reference has no JSON surface at
all (its payloads are opaque strings piped to black-box commands —
SURVEY.md §2.1 runCommand); this is the declarative replacement.

``json_field`` uses ``get_json_object`` (JSONPath, returns string) rather
than ``from_json`` so callers don't need a full schema for one field —
the common telemetry pattern. ``with_json_fields`` is the multi-field
variant; for wide structured payloads prefer ``from_json`` with an explicit
schema so Catalyst prunes unread fields.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_field(col: Column | str, path: str, cast: str | None = None) -> Column:
    """Extract one JSONPath field as string, optionally cast.

    ``path`` is a bare field name or a ``$.a.b`` JSONPath. Missing fields
    and malformed JSON yield NULL (never an error) — the only sane
    semantics for a dirty 100 TB payload column.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = path if path.startswith("$") else f"$.{path}"
    out = F.get_json_object(c, p)
    return out.cast(cast) if cast else out


def with_json_fields(
    df: DataFrame, col: str, fields: Mapping[str, tuple[str, str | None]]
) -> DataFrame:
    """Append columns extracted from the JSON string column ``col``.

    ``fields`` maps output column name → (JSONPath, cast-type-or-None).
    One projection over the scan — all fields extract in a single
    codegen'd stage.
    """
    return df.select(
        "*",
        *[
            json_field(col, path, cast).alias(name)
            for name, (path, cast) in fields.items()
        ],
    )


def to_variant(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Parse a JSON string column into a VARIANT column (Spark 4 binary
    semi-structured encoding). The 100 TB contract: parse each payload
    ONCE at ingest; every later field access is a binary offset read
    (``variant_field``), not a JSON re-parse — the reason VARIANT exists.
    Malformed JSON raises at parse; use try_parse_json upstream for dirty
    feeds."""
    return df.withColumn(out or f"{col}_v", F.parse_json(F.col(col)))


def variant_field(col: Column | str, path: str, cast: str = "string") -> Column:
    """Extract one field from a VARIANT column as ``cast`` type; NULL on
    missing field or failed cast (``try_variant_get`` semantics — the only
    sane behavior over a dirty payload column)."""
    c = F.col(col) if isinstance(col, str) else col
    p = path if path.startswith("$") else f"$.{path}"
    return F.try_variant_get(c, p, cast)
