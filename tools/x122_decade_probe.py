#!/usr/bin/env python
"""One-more-decade scaling probe for x122 (Bloom ingest skip-list): build
the filter over 1x/3x/10x replicas of the sf0.1 documents corpus and
probe a same-scale delta. The build is the operator's only data-scale
pass (one grouped bitmap_construct_agg); the filter itself is FIXED at
m/32768 bitmap rows, so probe cost should stay flat and build cost
~linear. Self-similar replica method from tools/x60_decade_probe.py.

    python tools/x122_decade_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.x60_decade_probe import SCRATCH, build_replica  # noqa: E402


def main() -> None:
    from samba_spark.operators.sketches import (
        bloom_filter_table,
        bloom_probe,
    )
    from samba_spark.session import get_spark

    spark = get_spark(app_name="x122_decade_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = "/root/testdata/sf0.1/documents.parquet"
    scales = [("x1", 1), ("x3", 3), ("x10", 10)]
    os.makedirs(SCRATCH, exist_ok=True)

    rows = []
    paths = []
    for label, reps in scales:
        path = os.path.join(SCRATCH, f"x122_documents_{label}.parquet")
        paths.append(path)
        n_docs = build_replica(spark, base, path, reps)
        docs = spark.read.parquet(path)
        docs.count()  # warm

        from pyspark.sql import functions as F

        corpus = docs.where(F.col("doc_id") % 3 != 0)
        delta = docs.where(F.col("doc_id") % 3 == 0)

        t0 = time.perf_counter()
        bloom = bloom_filter_table(corpus, "text").cache()
        n_buckets = bloom.count()  # force the build
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        bloom_probe(bloom, delta, "text", "doc_id").write.format(
            "noop"
        ).mode("overwrite").save()
        t_probe = time.perf_counter() - t0
        bloom.unpersist()
        rows.append(
            (label, n_docs, n_buckets, round(t_build, 2), round(t_probe, 2))
        )
        print(
            f"{label}: docs={n_docs} filter_rows={n_buckets} "
            f"build={t_build:.2f}s probe={t_probe:.2f}s",
            file=sys.stderr,
        )

    print("| scale | docs | filter bitmap rows | build s | probe s | build ratio | data ratio |")
    print("|---|---|---|---|---|---|---|")
    prev = None
    for label, n_docs, nb, tb, tp in rows:
        br = f"{tb / prev[3]:.2f}×" if prev else "—"
        dr = f"{n_docs / prev[1]:.1f}×" if prev else "—"
        print(f"| {label} | {n_docs} | {nb} | {tb} | {tp} | {br} | {dr} |")
        prev = (label, n_docs, nb, tb, tp)

    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
