#!/usr/bin/env python
"""One-more-decade scaling probe for x132 (winnowed common-substring
pairs) — round-7 artifact discipline: every new heavy family gets one
decade of empirical scaling before it ships. Extends the curve to 3×
and 10× the sf0.1 corpus.

Self-similar replica method (tools/x60_decade_probe.py): the sf0.1
documents table is replicated R times with every token suffixed by a
replica tag — the suffix changes the CHARACTERS, so the 32-char window
space is replica-disjoint and each replica reproduces the fixture's
shared-span structure without creating cross-replica matches
(unperturbed replication would create Θ(R²) true pairs — measuring the
data, not the operator). Expected posture: selected fingerprints and
matched pairs ~linear in R; wall time ~linear (the df-cap bounds the
per-hash join fan-out independently of corpus size).

Writes scratch parquet under .scaling/ (gitignored) and prints a
markdown table for SCALING_r{N}.md:

    python tools/x132_decade_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.x60_decade_probe import SCRATCH, build_replica  # noqa: E402


def main() -> None:
    from samba_spark.operators import dedup as D
    from samba_spark.session import get_spark

    spark = get_spark(app_name="x132_decade_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/root/testdata/sf0.1/documents.parquet"
    scales = [("x1", 1), ("x3", 3), ("x10", 10)]
    os.makedirs(SCRATCH, exist_ok=True)

    rows = []
    paths = []
    for label, reps in scales:
        path = os.path.join(SCRATCH, f"x132_documents_{label}.parquet")
        paths.append(path)
        n_docs = build_replica(spark, base, path, reps)
        docs = spark.read.parquet(path)
        docs.count()  # warm page cache / footers

        t0 = time.perf_counter()
        out = D.common_substring_pairs(
            docs, window=32, min_len=44, winnow=8, max_df=20
        )
        n_pairs = out.count()
        dt = time.perf_counter() - t0
        rows.append((label, reps, n_docs, n_pairs, round(dt, 2)))
        print(
            f"{label}: docs={n_docs} pairs={n_pairs} time={dt:.2f}s",
            file=sys.stderr,
        )

    print("| scale | docs | overlap pairs | wall s | time ratio vs prev | data ratio |")
    print("|---|---|---|---|---|---|")
    prev = None
    for label, reps, n_docs, n_pairs, dt in rows:
        tr = f"{dt / prev[4]:.2f}×" if prev else "—"
        dr = f"{reps / prev[1]:.1f}×" if prev else "—"
        print(f"| {label} | {n_docs} | {n_pairs} | {dt} | {tr} | {dr} |")
        prev = (label, reps, n_docs, n_pairs, dt)

    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
