"""Consistent-hash shard planning — the data-movement analytics a
100 TB re-partition decision needs BEFORE it runs.

Growing a mod-hashed layout from S to S' shards moves almost every row
(every key whose ``h % S != h % S'``); a consistent-hash ring moves
only ~1/S' of them. ``reshard_plan`` computes the exact old→new
movement matrix for BOTH strategies over the real key column, so the
operator answers "what does adding two shards actually cost" with
counts, not folklore — the same class of question the x97 join-size
estimator answers for joins.

The ring is DERIVED, not stored (the x144 make_jl_signs property): a
shard's vnode positions are md5 integers of ``"shard_{s}_vnode_{v}"``,
disambiguated to strict uniqueness by ``(md5 << 10) | (s·V + v)`` so
arg-min ties cannot exist in either engine (requires S·V ≤ 1024).
A key hashes to ``md5(key_string)`` on the same 32-bit grid and lands
on the first vnode position ≥ its own (wrapping to the ring minimum).

Scale posture: the ring (S·V structs) folds into the plan as literals;
assignment is one map-side higher-order filter per row — no join, no
shuffle; the movement matrix is one partial-aggregated hash agg to
O(S·S') rows per strategy. The oracle replays the ring from the same
md5 bytes in SQL.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from samba_spark.operators.dedup import _md5_base32

_VNODE_BITS = 10  # S*V <= 1024 keeps the disambiguated positions unique


def make_ring(shards: int, vnodes: int) -> list[tuple[int, int]]:
    """Sorted (position, shard) vnode ring — a pure function of
    (shards, vnodes). Positions are ``(md5_32 << 10) | (s·V + v)``:
    unique by construction, so first-position-≥ lookup is total."""
    if shards < 1:
        raise ValueError(f"make_ring: shards={shards} must be >= 1")
    if vnodes < 1:
        raise ValueError(f"make_ring: vnodes={vnodes} must be >= 1")
    if shards * vnodes > (1 << _VNODE_BITS):
        raise ValueError(
            f"make_ring: shards*vnodes={shards * vnodes} exceeds "
            f"{1 << _VNODE_BITS} — positions would no longer be unique"
        )
    ring = []
    for s in range(shards):
        for v in range(vnodes):
            h = int(
                hashlib.md5(f"shard_{s}_vnode_{v}".encode()).hexdigest()[:8],
                16,
            )
            ring.append(((h << _VNODE_BITS) | (s * vnodes + v), s))
    ring.sort()
    return ring


def _ring_assign(key_pos: Column, ring: list[tuple[int, int]]) -> Column:
    """First vnode position ≥ key position, wrapping to the ring
    minimum — one plan-folded array filter, no join."""
    arr = F.array(
        *[
            F.struct(
                F.lit(int(p)).alias("pos"), F.lit(int(s)).alias("shard")
            )
            for p, s in ring
        ]
    )
    nxt = F.get(F.filter(arr, lambda e: e["pos"] >= key_pos), 0)
    return F.coalesce(nxt["shard"], F.lit(int(ring[0][1]))).cast("long")


def reshard_plan(
    df: DataFrame,
    key_col: str,
    old_shards: int,
    new_shards: int,
    vnodes: int = 16,
) -> DataFrame:
    """Exact old→new shard movement matrix for the ring AND mod
    strategies: one row per (strategy, old_shard, new_shard) with the
    key count and a moved flag, ordered. The ring rows demonstrate the
    consistent-hashing guarantee (only keys between a new vnode and its
    predecessor move); the mod rows are the cautionary baseline."""
    # _md5_base32 carries the DuckDB-equivalence contract (dedup.py);
    # hash once per row, derive the ring position by shifting onto the
    # disambiguated scale (low vnode bits zero)
    keyed = df.select(
        _md5_base32(F.col(key_col).cast("string")).alias("_h32")
    )
    kp = F.shiftleft(F.col("_h32"), _VNODE_BITS)
    base = keyed.select(
        _ring_assign(kp, make_ring(old_shards, vnodes)).alias("ring_old"),
        _ring_assign(kp, make_ring(new_shards, vnodes)).alias("ring_new"),
        (F.col("_h32") % old_shards).alias("mod_old"),
        (F.col("_h32") % new_shards).alias("mod_new"),
    )
    ring_m = (
        base.groupBy(
            F.lit("ring").alias("strategy"),
            F.col("ring_old").alias("old_shard"),
            F.col("ring_new").alias("new_shard"),
        )
        .agg(F.count("*").alias("n_keys"))
    )
    mod_m = (
        base.groupBy(
            F.lit("mod").alias("strategy"),
            F.col("mod_old").alias("old_shard"),
            F.col("mod_new").alias("new_shard"),
        )
        .agg(F.count("*").alias("n_keys"))
    )
    return (
        ring_m.unionByName(mod_m)
        .select(
            "strategy",
            "old_shard",
            "new_shard",
            (F.col("old_shard") != F.col("new_shard")).alias("moved"),
            F.col("n_keys").cast("long").alias("n_keys"),
        )
        .orderBy("strategy", "old_shard", "new_shard")
    )
