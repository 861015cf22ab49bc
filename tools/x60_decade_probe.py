#!/usr/bin/env python
"""One-more-decade scaling probe for x60 (rare-shingle blocking near-dup
join) — VERDICT r3 item 4: its 4.6× growth on the sf0.01→0.1 step was the
worst in SCALING_r03.md; this probe extends the curve to 3× and 10× the
sf0.1 corpus to confirm the df-cap keeps the operator sub-linear-or-linear
into the next decade.

No sf0.3/sf1 fixtures exist (and /root/testdata is read-only), so the
probe synthesizes SELF-SIMILAR corpora: the sf0.1 documents table is
replicated R times with every token suffixed by a replica tag, making each
replica's vocabulary (hence shingle space) disjoint. That preserves the
fixture's per-document shape and its near-dup cluster structure exactly —
each replica contributes the same blocking-bucket histogram — so candidate
volume and runtime should both grow ~linearly in R if the design scales.
(Replicating WITHOUT perturbation would be an adversarial shape instead:
10 identical copies of every document create Θ(R²) true near-dup pairs,
measuring the data, not the operator.)

Writes scratch parquet under .scaling/ (gitignored) and prints a markdown
table to append to SCALING_r{N}.md. Run from the repo root:

    python tools/x60_decade_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling")


def build_replica(spark, base_path: str, out_path: str, replicas: int) -> int:
    from pyspark.sql import functions as F

    base = spark.read.parquet(base_path)
    n = base.count()
    parts = []
    for r in range(replicas):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                # suffix every token => replica-disjoint shingle space
                F.regexp_replace("text", r"(\S+)", r"$1~" + str(r)).alias(
                    "text"
                ),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(4, replicas * 4)).write.mode("overwrite").parquet(
        out_path
    )
    return n * replicas


def main() -> None:
    from samba_spark.operators import dedup as D
    from samba_spark.session import get_spark

    spark = get_spark(app_name="x60_decade_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/root/testdata/sf0.1/documents.parquet"
    scales = [("x1", 1), ("x3", 3), ("x10", 10)]
    os.makedirs(SCRATCH, exist_ok=True)

    rows = []
    for label, reps in scales:
        path = os.path.join(SCRATCH, f"documents_{label}.parquet")
        n_docs = build_replica(spark, base, path, reps)
        docs = spark.read.parquet(path)
        docs.count()  # warm page cache / footers

        # candidate volume: the verify stage's input, exposed by running
        # with the Jaccard threshold at 0 (every candidate survives)
        cand = D.rare_token_blocking_pairs(docs, min_jaccard_pct=0).count()

        t0 = time.perf_counter()
        D.rare_token_blocking_pairs(docs).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        rows.append((label, reps, n_docs, cand, round(dt, 2)))
        print(f"{label}: docs={n_docs} candidates={cand} time={dt:.2f}s",
              file=sys.stderr)

    print("| scale | docs | candidate pairs | wall s | time ratio vs prev | data ratio |")
    print("|---|---|---|---|---|---|")
    prev = None
    for label, reps, n_docs, cand, dt in rows:
        tr = f"{dt / prev[4]:.2f}×" if prev else "—"
        dr = f"{reps / prev[1]:.1f}×" if prev else "—"
        print(f"| {label} ({n_docs} docs) | {n_docs} | {cand} | {dt} | {tr} | {dr} |")
        prev = (label, reps, n_docs, cand, dt)

    # remove ONLY this probe's replica files: .scaling/ is shared scratch
    # (query prov stores / sinks live there since round 6) and a whole-dir
    # rmtree would wipe q24_prov/x120_xml etc. mid-round
    for label, _ in scales:
        shutil.rmtree(
            os.path.join(SCRATCH, f"documents_{label}.parquet"),
            ignore_errors=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
