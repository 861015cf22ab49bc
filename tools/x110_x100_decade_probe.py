#!/usr/bin/env python
"""One-more-decade scaling probe for the two 4.5×+ steps in
SCALING_r04.md — VERDICT r4 item 6: x110 (sliding-window exact distinct,
4.9×/decade) and x100 (exact multi-NDV table profile, 4.5×/decade) — run
at 1×/3×/10× of the sf0.1 fixture alongside their round-5 scale-safe
replacements: x118 (sliding_distinct_bitmap — ids compressed to 4 KiB
bucket bitmaps BEFORE the window fan-out) and x117's mode
(table_profile(exact=False) — HLL per column, no Expand rewrite).

Self-similar replica method (tools/x60_decade_probe.py): no sf0.3/sf1
fixtures exist, so the corpus is the sf0.1 table replicated R times with
DISJOINT key spaces —

* events: event_type suffixed per replica (groups ×R, per-group minute
  density and id distribution preserved exactly) and user_id offset per
  replica (id space disjoint, so distinct counts replicate too);
* lineitem: l_orderkey/l_partkey/l_suppkey offset per replica (NDV of
  the key columns grows ×R; the flag/date columns keep their small
  domains — exactly how a 10× production table behaves).

Output/work should grow ~linearly in R for a scale-safe design. Writes
scratch parquet under .scaling/ (gitignored) and prints a markdown table
to append to SCALING_r{N}.md. Run from the repo root, on an otherwise
idle machine:

    python tools/x110_x100_decade_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling"
)


def build_events(spark, out_path: str, replicas: int) -> int:
    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    n = base.count()
    parts = [
        base.select(
            (F.col("event_id") + F.lit(r * 100_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(r * 10_000_000)).alias("user_id"),
            F.concat(F.col("event_type"), F.lit(f"~{r}")).alias("event_type"),
            "ts",
            *[c for c in base.columns
              if c not in ("event_id", "user_id", "event_type", "ts")],
        )
        for r in range(replicas)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(8, replicas * 4)).write.mode("overwrite").parquet(
        out_path
    )
    return n * replicas


def build_lineitem(spark, out_path: str, replicas: int) -> int:
    from pyspark.sql import functions as F

    base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    n = base.count()
    parts = [
        base.select(
            (F.col("l_orderkey") + F.lit(r * 100_000_000)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(r * 10_000_000)).alias("l_partkey"),
            (F.col("l_suppkey") + F.lit(r * 1_000_000)).alias("l_suppkey"),
            *[c for c in base.columns
              if c not in ("l_orderkey", "l_partkey", "l_suppkey")],
        )
        for r in range(replicas)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(8, replicas * 4)).write.mode("overwrite").parquet(
        out_path
    )
    return n * replicas


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, warm: bool = False) -> float:
    if warm:
        force(fn())
    t0 = time.perf_counter()
    force(fn())
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from samba_spark.operators.quality import table_profile
    from samba_spark.operators.sketches import (
        sliding_distinct,
        sliding_distinct_bitmap,
    )
    from samba_spark.session import get_spark

    spark = get_spark(app_name="x110_x100_decade_probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(SCRATCH, exist_ok=True)

    rows = []
    for label, reps in (("x1", 1), ("x3", 3), ("x10", 10)):
        ev_path = os.path.join(SCRATCH, f"events_{label}.parquet")
        li_path = os.path.join(SCRATCH, f"lineitem_{label}.parquet")
        n_ev = build_events(spark, ev_path, reps)
        n_li = build_lineitem(spark, li_path, reps)
        ev = spark.read.parquet(ev_path)
        li = spark.read.parquet(li_path)
        ev.count(); li.count()  # warm footers/page cache

        # x118 is probed in its TARGET regime — the same deterministic
        # 4-hour time fold its declared query uses (240 dense minutes per
        # group) — because the raw fixture is ~2.6 events/minute: at that
        # sparsity each near-empty (group, minute) still pins a fixed
        # 4 KiB bitmap, so a raw-shape probe times the operator's
        # documented worst case (x110's triple path is the right tool
        # there, and IS probed on the raw shape below). Expected curve:
        # FLAT — the fanned bitmap volume is groups x 240 x window x
        # 4 KiB regardless of event count.
        dense = ev.withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1767225600) + F.unix_timestamp(F.col("ts")) % 14400
            ),
        )
        t_x110 = timed(lambda: sliding_distinct(ev), warm=(reps == 1))
        t_x118 = timed(
            lambda: sliding_distinct_bitmap(dense), warm=(reps == 1)
        )
        t_x100 = timed(lambda: table_profile(li), warm=(reps == 1))
        t_x117 = timed(
            lambda: table_profile(li, exact=False), warm=(reps == 1)
        )
        rows.append((label, reps, n_ev, n_li, t_x110, t_x118, t_x100, t_x117))
        print(
            f"{label}: events={n_ev} lineitem={n_li} "
            f"x110={t_x110:.2f}s x118={t_x118:.2f}s "
            f"x100={t_x100:.2f}s x117={t_x117:.2f}s",
            flush=True,
        )

    print("\n| scale | events rows | x110 triples, raw (s) |"
          " x118 bitmap, dense fold (s) |"
          " lineitem rows | x100 exact (s) | x117 HLL (s) |")
    print("|---|---|---|---|---|---|---|")
    base = rows[0]
    for r in rows:
        def g(i):
            return f"{r[i]:.2f}" + (
                f" ({r[i] / base[i]:.1f}×)" if r is not base else ""
            )
        print(
            f"| {r[0]} | {r[2]:,} | {g(4)} | {g(5)} | {r[3]:,} "
            f"| {g(6)} | {g(7)} |"
        )


if __name__ == "__main__":
    main()
