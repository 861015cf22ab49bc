"""MERGE / upsert between snapshots — the warehouse "type-1" merge.

``merge_upsert(base, updates, keys)`` returns the next snapshot: every key
present in ``updates`` takes the update row; all other base rows pass
through. This is the incremental-refresh primitive a corpus pipeline runs
per ingest batch (re-crawled documents replace their previous versions).

Scale design: one hash-shuffled LEFT ANTI join on the merge keys plus a
union — exactly the plan a warehouse MERGE INTO compiles to when every
update matches at most one base row. The anti-join's build side is the
update batch (typically small vs the corpus); Spark broadcasts it when it
fits (AQE), otherwise both sides shuffle on the key once. No window, no
driver collect.

Not present in the reference (RDD lineage has no mutable-table concept);
extension operator x30.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Next snapshot of ``base`` with ``updates`` applied by ``keys``
    (update-wins). Schemas must agree by name; duplicate keys *within*
    ``updates`` are the caller's bug and pass through unchanged (same
    contract as SQL MERGE, which rejects multi-matches)."""
    keys = list(keys)
    kept = base.join(updates.select(*keys), on=keys, how="left_anti")
    return updates.unionByName(kept)
