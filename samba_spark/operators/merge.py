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


def scd2_history(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    attr,
    attr_name: str = "attr",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history build: collapse each run of
    consecutive rows with the same ``attr`` value (per ``key``, in ``order``)
    into one validity row — ``(key, version, attr, effective_from,
    effective_to, n_rows)``. This is the other half of the warehouse MERGE
    story (x30 is type-1 update-wins; this keeps history), and the standard
    gaps-and-islands plan: change flags via LAG, island ids via a running
    SUM of flags, then one aggregate per island.

    ``order`` must be a total order within each key (pass a tiebreaker
    column — the fixture's ``(o_orderdate, o_orderkey)`` pattern) or island
    boundaries are engine-ambiguous. ``attr`` is a column name or Column
    expression; NULL attr values island together (null-safe comparison).

    Scale shape: the LAG window, the running-SUM window, and the final
    groupBy all key on ``key`` — Catalyst plans ONE hash exchange + one
    sort, reused by both windows and the partial aggregate. Output is
    #islands rows (≤ input, typically ≪). No global window, no collect.
    """
    from pyspark.sql import Window, functions as F

    keyc = F.col(key)
    attrc = F.col(attr) if isinstance(attr, str) else attr
    w = Window.partitionBy(keyc).orderBy(*[F.col(c) for c in order])
    flagged = df.select(
        keyc.alias(key),
        *[F.col(c) for c in order],
        attrc.alias(attr_name),
    ).withColumn(
        "_chg",
        # row 1 always opens an island (a NULL first attr must not read as
        # "unchanged since the non-existent previous row"); after that,
        # null-safe comparison islands NULL runs together
        F.when(F.row_number().over(w) == 1, F.lit(1))
        .when(
            F.lag(F.col(attr_name)).over(w).eqNullSafe(F.col(attr_name)),
            F.lit(0),
        )
        .otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "version",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    first_order = F.col(order[0])
    return (
        islands.groupBy(key, "version")
        .agg(
            F.min(attr_name).alias(attr_name),
            F.min(first_order).alias("effective_from"),
            F.max(first_order).alias("effective_to"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(key, "version", attr_name, "effective_from", "effective_to", "n_rows")
    )


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


def merge_partial_aggs(
    snapshot: DataFrame, delta: DataFrame, keys: Sequence[str], sums: Sequence[str]
) -> DataFrame:
    """Incremental aggregate maintenance: combine a maintained per-key
    aggregate ``snapshot`` with the same aggregation computed over only a
    new ``delta`` batch, producing the aggregate over the union of their
    inputs WITHOUT rescanning history.

    Only valid for additive measures (counts, sums — anything where
    agg(A ∪ B) = agg(agg(A), agg(B))); min/max also qualify if re-reduced
    with the matching function, but count-distinct does not (keep a sketch
    for that). This is the maintenance step of a 100 TB rollup: the daily
    job aggregates one day of data and folds it in, cost O(delta + groups)
    instead of O(history). Plan: union + one hash-shuffled partial/final
    aggregation on the keys — the same map-side-combine shape as a fresh
    aggregate, but over #groups + #delta rows.
    """
    from pyspark.sql import functions as F

    return (
        snapshot.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sums])
    )


def delta_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incremental maintenance of an INNER equi-join under inserts to
    BOTH sides: the new matches are exactly

        ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    so ``(A_old ⋈ B_old) ∪ delta_join(...) == (A_old∪ΔA) ⋈ (B_old∪ΔB)``
    — the algebraic identity every incremental-view-maintenance engine
    is built on (join distributes over union). Returns only the NEW
    result rows; the caller unions them onto the maintained snapshot.

    Scale posture: at 100 TB the old sides are the big ones and the
    deltas are an ingest batch — two of the three joins have a
    batch-sized probe side (broadcastable under AQE), and the snapshot
    join A_old ⋈ B_old never re-runs. Column layout is ``on`` keys +
    A-only columns + B-only columns, same as a plain ``a.join(b, on)``.
    """
    on = list(on)
    return (
        a_delta.join(b_old, on=on)
        .unionByName(a_old.join(b_delta, on=on))
        .unionByName(a_delta.join(b_delta, on=on))
    )
