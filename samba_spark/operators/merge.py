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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    payload: str = "text",
) -> DataFrame:
    """Corpus-version diff: ``(key, status)`` for every key that is
    ``added`` (new only), ``removed`` (old only), or ``changed`` (both,
    different content fingerprint). Unchanged keys are omitted — at
    corpus scale the diff is tiny relative to the snapshots, so emitting
    only deltas keeps the output proportional to the change set.

    Scale shape: both sides reduce to (key, md5) — constant-width rows —
    before a single full-outer hash join on the key. With both snapshots
    bucketed on the key this is exchange-free; the payload column never
    shuffles."""
    from pyspark.sql import functions as F

    o = old.select(F.col(key), F.md5(F.col(payload)).alias("_od"))
    n = new.select(F.col(key), F.md5(F.col(payload)).alias("_nd"))
    j = o.join(n, on=key, how="full_outer")
    return (
        j.withColumn(
            "status",
            F.when(F.col("_od").isNull(), "added")
            .when(F.col("_nd").isNull(), "removed")
            .when(F.col("_od") != F.col("_nd"), "changed"),
        )
        .where(F.col("status").isNotNull())
        .select(key, "status")
    )
