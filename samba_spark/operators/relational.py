"""Relational operator compositions completing the reference's RDD surface
(SURVEY.md §2.3) plus the time-series joins the reference lacks (theta/
range/as-of — §2.3 joins table, 'extension' row).

Everything here is a composition of built-in DataFrame ops — no UDFs, no
Python in the data path — so Catalyst plans and scales them like any
declarative query.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cogroup_collect(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_alias: str = "left_values",
    right_alias: str = "right_values",
) -> DataFrame:
    """RDD cogroup (reference PairRDDFunctions.scala:785-806,
    CoGroupedRDD.scala:86): per key, the collected values of each side.
    Implemented as per-side collect_list aggregations + full outer join —
    each side shuffles once on the key, no row blow-up."""
    lcols = [c for c in left.columns if c != key]
    rcols = [c for c in right.columns if c != key]
    lagg = left.groupBy(key).agg(
        F.collect_list(F.struct(*lcols)).alias(left_alias)
    )
    ragg = right.groupBy(key).agg(
        F.collect_list(F.struct(*rcols)).alias(right_alias)
    )
    joined = lagg.join(ragg, key, "full_outer")
    return joined.select(
        key,
        F.coalesce(left_alias, F.array()).alias(left_alias),
        F.coalesce(right_alias, F.array()).alias(right_alias),
    )


_MID_MASK = (1 << 33) - 1  # monotonically_increasing_id: low 33 bits = row#


def zip_with_index(df: DataFrame, order_by: Sequence, name: str = "idx") -> DataFrame:
    """zipWithIndex (reference rdd/RDD.scala:1505, ZippedWithIndexRDD): a
    total order is required for determinism — Spark has no stable implicit
    row order, so the caller names one.

    Two-pass scheme, the same trick as the reference's ZippedWithIndexRDD:
    range-partition + sort on the order, count rows per partition, then add
    each partition's start offset to its local row number. No global data
    window — a ``Window.orderBy`` with no partitionBy funnels every row
    through ONE task, which dies at 100 TB; here every row-bearing stage
    stays parallel. The prefix-sum window runs over #partitions rows (not
    data rows) and the offsets come back via a broadcast join.

    The sorted layout is pinned with ``localCheckpoint`` before both
    branches read it: range partitioning estimates boundaries by sampling,
    and two independent exchanges are not guaranteed identical boundaries —
    without the pin, the count branch could disagree with the output branch
    and mis-index silently. The checkpoint also means the sort shuffle runs
    once, not twice (same rationale as the graph operators' per-round
    checkpoint). ``monotonically_increasing_id`` encodes
    (partition id << 33 | local row#) over the sorted layout, so the local
    row number is just the low bits."""
    sdf = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .localCheckpoint(eager=False)
    )
    counts = sdf.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_off")
    )
    out = sdf.join(F.broadcast(offsets), "_pid", "left")
    local = F.col("_mid").bitwiseAND(F.lit(_MID_MASK))
    return (
        out.withColumn(name, (F.col("_off") + local).cast("long"))
        .drop("_mid", "_pid", "_off")
    )


def zip_dataframes(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence,
    right_order: Sequence,
) -> DataFrame:
    """RDD zip (reference rdd/RDD.scala:1053): pairwise align two datasets
    by position under explicit total orders; errors at action time if
    lengths differ (inner join drops nothing when counts match)."""
    l = zip_with_index(left, left_order, "_zip_idx")
    r = zip_with_index(right, right_order, "_zip_idx")
    return l.join(r, "_zip_idx", "inner").drop("_zip_idx")


def sample_by(
    df: DataFrame, col: str, fractions: dict, seed: Optional[int] = None
) -> DataFrame:
    """sampleByKey (reference PairRDDFunctions.scala:257-286)."""
    return df.sampleBy(col, fractions, seed=seed)


def lookup(df: DataFrame, key: str, value) -> list:
    """PairRDD lookup (reference PairRDDFunctions.scala:940): filter
    pushdown makes this a pruned scan, not a full pass."""
    return df.where(F.col(key) == value).collect()


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the matching right row on the same
    key by time — the operator DuckDB spells ASOF JOIN and the reference
    does not have at all. ``direction``:

    - ``backward`` (default): latest right with ``right_ts <= left_ts``
    - ``forward``: earliest right with ``right_ts >= left_ts``
    - ``nearest``: whichever of the two is closer in time (ties prefer
      the backward match)

    Implementation is the union+window trick — one shuffle on the key, no
    range explosion: tag both sides, sort by (key, ts, side) so that at
    equal timestamps the right row falls inside the left row's frame
    (inclusive semantics), then last/first(..., ignorenulls) carries the
    right payload onto each left row. Scales as a single window over
    (key, time) — the partition key is ``on``, so skew follows key skew,
    not time range. ``nearest`` composes one pass per direction (two
    windows, same key exchange).
    """
    if direction == "nearest":
        carry = list(right_cols)
        if right_ts not in carry:
            carry.append(right_ts)
        b = asof_join(
            left, right, on=on, left_ts=left_ts, right_ts=right_ts,
            right_cols=carry, suffix="_bwd", direction="backward",
        )
        bf = asof_join(
            b, right, on=on, left_ts=left_ts, right_ts=right_ts,
            right_cols=carry, suffix="_fwd", direction="forward",
        )
        lts = F.col(left_ts)
        d_b = F.unix_micros(lts) - F.unix_micros(F.col(right_ts + "_bwd"))
        d_f = F.unix_micros(F.col(right_ts + "_fwd")) - F.unix_micros(lts)
        pick_b = F.col(right_ts + "_fwd").isNull() | (
            F.col(right_ts + "_bwd").isNotNull() & (d_b <= d_f)
        )
        out = bf
        for c in right_cols:
            out = out.withColumn(
                c + suffix,
                F.when(pick_b, F.col(c + "_bwd")).otherwise(F.col(c + "_fwd")),
            )
        return out.drop(*[c + "_bwd" for c in carry], *[c + "_fwd" for c in carry])
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    backward = direction == "backward"
    # at equal ts the right row must fall inside the left row's frame:
    # backward frame looks left → right sorts first; forward frame looks
    # right → right sorts last
    left_side, right_side = (1, 0) if backward else (0, 1)
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(left_side)
    )
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(c + suffix) for c in right_cols],
        )
        .withColumn("_side", F.lit(right_side))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))
    if backward:
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(*frame)
    )
    carried = unioned.select(
        *left.columns,
        "_side",
        *[
            pick(c + suffix, ignorenulls=True).over(w).alias(c + suffix)
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == left_side).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_point: str,
    right_point: str,
    lower,
    upper,
) -> DataFrame:
    """Banded range join: equi key + ``right_point`` within
    [left_point+lower, left_point+upper]. The equi key keeps the join
    hash-partitioned; the band is a post-join filter Catalyst fuses into
    the join condition. For keyless range joins, bucketize the range into
    band keys first (same pattern as LSH bucketing)."""
    cond = (
        (left[on] == right[on])
        & (right[right_point] >= left[left_point] + lower)
        & (right[right_point] <= left[left_point] + upper)
    )
    return left.join(right, cond, "inner")


def latest_wins(
    df: DataFrame,
    key,
    version_col: str = "ts",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """CDC log compaction: keep each key's newest record by ``version_col``
    (ties broken by ``tiebreak`` columns descending, so the survivor is
    total-order-determined and engine-exact).

    Scale shape: ``row_number() = 1`` over (key → version desc) compiles to
    WindowGroupLimit — each map task keeps one row per key before the
    exchange, so the shuffle carries O(distinct keys), not the full log.
    This is the standard upsert-materialization for an append-only change
    log at warehouse scale.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.desc(version_col), *[F.desc(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key,
    version_col: str | None = None,
) -> DataFrame:
    """SCD-1 merge: rows of ``updates`` replace same-key rows of
    ``target``; unmatched keys union in. With ``version_col``, ``updates``
    is first compacted to latest-wins per key (so a change batch with
    multiple versions of one key applies its newest).

    Scale shape: one shuffle per side on the key (the anti-join and the
    union both hash on it); no window over the target. Equivalent to
    ``MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`` —
    expressed as target-anti-join ∪ updates so it runs on any Spark sink,
    no table format required.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if version_col is not None:
        updates = latest_wins(updates, keys, version_col)
    survivors = target.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    )
    return survivors.unionByName(updates.select(*target.columns))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval OVERLAP join — both sides are time ranges and
    a pair matches iff ``l_start <= r_end AND r_start <= l_end``. This
    is the shape range_join (point vs window, q26) cannot express, and
    the naive plan is a cross join with a non-equi predicate — quadratic
    and unshuffleable.

    Scale strategy (standard bucket decomposition): every interval
    explodes to the fixed-width time buckets it covers, the join runs as
    an ordinary hash-shuffle EQUI-join on the bucket id, the exact
    overlap predicate filters false bucket-mates, and a distinct()
    collapses pairs that met in several buckets. Pick ``bucket_seconds``
    near the typical interval length: each interval then hits O(1)
    buckets and the shuffle is keyed on time — i.e., partition count
    scales with the time span, never with |L|×|R|. Long stragglers cost
    more buckets (linear in their length), not a cross join.

    Column names must be disjoint between the two frames (pre-rename);
    the output keeps all columns from both, deduplicated exactly.
    """
    bucket_us = bucket_seconds * 1_000_000

    def explode_buckets(df: DataFrame, start: str, end: str) -> DataFrame:
        # integer div, not float /: micros near 2^50 lose exactness in a
        # double quotient and can misplace boundary timestamps
        lo = F.expr(f"unix_micros({start}) div {bucket_us}L")
        hi = F.expr(f"unix_micros({end}) div {bucket_us}L")
        return df.withColumn("_bucket", F.explode(F.sequence(lo, hi)))

    lb = explode_buckets(left, l_start, l_end)
    rb = explode_buckets(right, r_start, r_end)
    joined = lb.join(rb, "_bucket").where(
        (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    )
    return joined.drop("_bucket").distinct()


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    id_col: str,
    bucket_width: int = 100_000,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not DOMINATED by any other —
    dominated means another row is ≤ on the minimized column and ≥ on
    the maximized column, strictly better on at least one. The
    multi-criteria shortlist query (cheapest-yet-largest) whose naive
    form is an O(n²) NOT EXISTS self-join.

    Sort-based pruning WITHOUT a global window: a row survives iff its
    max_col strictly exceeds the best max_col of every strictly-cheaper
    row, and it is the best of its equal-min peers. The
    strictly-cheaper prefix maximum is assembled two-level — a window
    inside each fixed-width value bucket of min_col plus a carry ladder
    over the O(#buckets) bucket maxima (disjoint value ranges make
    every earlier bucket strictly cheaper) — the same day-ladder shape
    as concurrency/CUSUM, so no single-task window exists at any data
    size. Duplicate (min, max) points keep the id-min representative.
    Integer criteria ⇒ engine-exact.
    """
    b = (F.col(min_col).cast("long") / F.lit(bucket_width)).cast("long")
    base = df.withColumn("_b", b)
    w_local = (
        Window.partitionBy("_b")
        .orderBy(F.col(min_col).cast("long"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    bucket_max = base.groupBy("_b").agg(
        F.max(max_col).alias("_bmax")
    )
    w_carry = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bucket_max.select(
        "_b", F.max("_bmax").over(w_carry).alias("_carry")
    )
    w_tie = Window.partitionBy(min_col).orderBy(
        F.col(max_col).desc(), F.col(id_col).asc()
    )
    staged = (
        base.withColumn("_local_prev", F.max(max_col).over(w_local))
        .join(carry, "_b")
        .withColumn(
            # greatest() skips NULLs: null only when both levels are empty
            "_best_prev",
            F.greatest(F.col("_local_prev"), F.col("_carry")),
        )
        .withColumn("_peer_rk", F.row_number().over(w_tie))
    )
    return staged.where(
        (
            F.col("_best_prev").isNull()
            | (F.col(max_col) > F.col("_best_prev"))
        )
        & (F.col("_peer_rk") == 1)
    ).drop("_b", "_local_prev", "_carry", "_best_prev", "_peer_rk")


def scd2_collapse(
    df: DataFrame,
    key: str,
    state: str,
    ts: str,
    tiebreak: "Sequence[str] | None" = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event log:
    collapse CONSECUTIVE rows with the same ``state`` per ``key`` into
    one validity interval — ``(key, state, valid_from, valid_to,
    version)``, ``valid_to`` NULL on the current version. The
    change-capture → dimension-history build every warehouse runs;
    ``latest_wins``/``upsert`` above keep only the head, this keeps the
    whole auditable timeline.

    Gaps-and-islands on ONE key-ordered exchange: a change flag
    (state <> lag(state), null-safe) prefix-sums into an island id,
    islands aggregate to their first timestamp, and valid_to/version
    come from lead/row_number over the same partitioning — four window
    functions sharing one shuffle, no self-joins. Deterministic given a
    total order: pass ``tiebreak`` columns when ``ts`` alone can tie."""
    tb = list(tiebreak or [])
    cols = [
        F.col(key),
        F.col(state).alias("_st"),
        F.col(ts).alias("_ts"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
    ]
    order = [F.col("_ts")] + [F.col(f"_tb{i}") for i in range(len(tb))]
    w = Window.partitionBy(key).orderBy(*order)
    flagged = (
        df.select(*cols)
        .withColumn(
            "_chg",
            F.when(
                F.lag(F.col("_st")).over(w).eqNullSafe(F.col("_st")), 0
            ).otherwise(1),
        )
        .withColumn(
            "_island",
            F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    # every row in an island shares one state by construction (any
    # change starts a new island) — plain min() is the honest aggregate
    islands = flagged.groupBy(key, "_island").agg(
        F.min("_st").alias(state),
        F.min("_ts").alias("valid_from"),
    )
    # order by the island id, NOT valid_from: island ids are monotone in
    # the (ts, tiebreak) row order, so two adjacent islands sharing a
    # min timestamp still version deterministically
    w2 = Window.partitionBy(key).orderBy("_island")
    return islands.select(
        key,
        state,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
    )
