"""End-to-end corpus-curation pipeline composing the round-8 operators.

The order mirrors a production pretraining data flow:

1. **segment_dedup** (x143) — cut corpus-wide repeated boilerplate out
   of every document and restitch the remainder.
2. **decontaminate_spans** (x149) — remove any window that appears in
   the held-out benchmark (src0 plays the eval set).
3. **char_entropy_profile** (x145) — drop degenerate low-entropy text.
4. **quantile_normalize** (x153) — calibrate the per-source length
   score onto the global distribution, then apply ONE global gate.
5. **kmeans_integer + clustering_metrics** (x142/x150) — topic-cluster
   the survivors' embeddings and score the partition against labels.
6. **mixture_plan** (x151) — apportion a token budget over the
   surviving sources (Hamilton largest-remainder: Σ targets == budget).

Run:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from samba_spark.operators.clustering import clustering_metrics, kmeans_integer
from samba_spark.operators.dedup import decontaminate_spans, segment_dedup
from samba_spark.operators.mixing import mixture_plan
from samba_spark.operators.quality import quantile_normalize
from samba_spark.operators.textual import char_entropy_profile
from samba_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="curation_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = docs.count()

    # 1. boilerplate removal (global segment dedup, 8-token windows)
    deduped = segment_dedup(docs, seg_tokens=8).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    meta = docs.select("doc_id", "source")
    deduped = deduped.join(meta, "doc_id")

    # 2. benchmark decontamination: src0 is the eval set
    bench = docs.where(F.col("source") == "src0")
    corpus = deduped.where(F.col("source") != "src0")
    cleaned = decontaminate_spans(corpus, bench, seg_tokens=8).select(
        "doc_id", F.col("clean_text").alias("text")
    ).join(meta, "doc_id")

    # 3. entropy gate: drop degenerate text (boilerplate cuts can
    # leave near-empty husks — exactly what the gate is for)
    gated = (
        char_entropy_profile(cleaned, gate_bits=3.0)
        .where(F.col("keep"))
        .select("doc_id", "n_chars")
        .join(cleaned, "doc_id")
    )

    # 4. cross-source calibrated length gate: keep the global top half
    # by the CALIBRATED score, so no source dominates on a hot scale
    calibrated = quantile_normalize(gated, F.col("n_chars"))
    quantiles = calibrated.approxQuantile("calibrated_score", [0.5], 0.0)
    if not quantiles:
        raise SystemExit(
            "curation_pipeline: no documents survived dedup/"
            "decontamination/entropy gating — nothing to calibrate"
        )
    cutoff = quantiles[0]
    kept = (
        calibrated.where(F.col("calibrated_score") >= cutoff)
        .select("doc_id", "source")
        .join(gated.select("doc_id", "text"), "doc_id")
    )

    # 5. topic clustering of the surviving docs' embeddings + quality
    surviving_embs = embs.join(
        kept.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    assign = kmeans_integer(surviving_embs, k=4, iters=2)
    quality = clustering_metrics(
        assign.select("vec_id", "cluster"),
        surviving_embs.select("vec_id", "label"),
    ).collect()[0]

    # 6. token-budget apportionment over the surviving sources
    plan = mixture_plan(
        kept.select("doc_id", "text", "source"), token_budget=100_000
    )
    plan_rows = plan.collect()
    assert sum(r["target_tokens"] for r in plan_rows) == 100_000

    n_kept = kept.count()
    print(f"docs in:            {n0}")
    print(f"after curation:     {n_kept}")
    print(
        f"cluster quality:    purity={quality['purity']}"
        f" ari={quality['ari']} over {quality['n_clusters']} clusters"
    )
    print("mixture plan (top 5 sources by target):")
    for r in sorted(plan_rows, key=lambda r: -r["target_tokens"])[:5]:
        print(
            f"  {r['source']}: {r['target_tokens']} tokens, "
            f"{r['epochs']} epochs (rate {r['rate']})"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
