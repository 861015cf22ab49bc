#!/usr/bin/env python
"""One-more-decade scaling probe for x112 (asymmetric containment join)
— VERDICT r5 item 5: its 3.3× growth on the sf0.01→0.1 step was the
largest unexplained step after x110; this probe extends the curve to 3×
and 10× the sf0.1 corpus to confirm the rare-shingle prefix filter keeps
candidate volume (and runtime) ~linear into the next decade.

Self-similar replica method (tools/x60_decade_probe.py): no sf0.3/sf1
fixtures exist, so the sf0.1 documents table is replicated R times with
every token suffixed by a replica tag — replica-disjoint shingle spaces,
so each replica reproduces the fixture's blocking-bucket histogram and
containment-cluster structure exactly; candidates and runtime should grow
~linearly in R if the prefix filter scales. (Unperturbed replication
would instead create Θ(R²) true containment pairs — measuring the data,
not the operator.)

Writes scratch parquet under .scaling/ (gitignored; only its own files
are removed) and prints a markdown table for SCALING_r{N}.md:

    python tools/x112_decade_probe.py
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

    spark = get_spark(app_name="x112_decade_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/root/testdata/sf0.1/documents.parquet"
    scales = [("x1", 1), ("x3", 3), ("x10", 10)]
    os.makedirs(SCRATCH, exist_ok=True)

    rows = []
    paths = []
    for label, reps in scales:
        path = os.path.join(SCRATCH, f"x112_documents_{label}.parquet")
        paths.append(path)
        n_docs = build_replica(spark, base, path, reps)
        docs = spark.read.parquet(path)
        docs.count()  # warm page cache / footers

        # candidate volume: the verify stage's input, exposed by running
        # with the containment threshold at 0 (every candidate survives)
        cand = D.ngram_containment_pairs(docs, num_pct=0).count()

        t0 = time.perf_counter()
        D.ngram_containment_pairs(docs).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        rows.append((label, reps, n_docs, cand, round(dt, 2)))
        print(
            f"{label}: docs={n_docs} candidates={cand} time={dt:.2f}s",
            file=sys.stderr,
        )

    print("| scale | docs | candidate pairs | wall s | time ratio vs prev | data ratio |")
    print("|---|---|---|---|---|---|")
    prev = None
    for label, reps, n_docs, cand, dt in rows:
        tr = f"{dt / prev[4]:.2f}×" if prev else "—"
        dr = f"{reps / prev[1]:.1f}×" if prev else "—"
        print(f"| {label} | {n_docs} | {cand} | {dt} | {tr} | {dr} |")
        prev = (label, reps, n_docs, cand, dt)

    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
