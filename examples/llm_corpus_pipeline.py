#!/usr/bin/env python
"""End-to-end LLM training-corpus pipeline on samba_spark — the extension
operators (x1-x32) composed the way a real data-prep run chains them:

  raw documents
    → ingest quality gate         (x66: expectation checks, one scan)
    → fetch dedup by URL          (x119: canonicalize_url, zero-shuffle key)
    → exact dedup                 (x1: digest groupBy, keep lowest doc_id)
    → fuzzy dedup                 (x3: MinHash-LSH clusters, keep one per cluster)
    → quality gate                (x6: stats; keep score above threshold)
    → decontamination             (x16: drop docs overlapping the benchmark)
    → mixture sampling            (x32: deterministic per-source downweights)
    → train/val/test split        (x19: md5-bucket hash split)
    → chunking                    (x29: token windows for fixed-context examples)
    → sequence packing            (x15: token-budget packing stats)
    → search-index build          (x57: inverted posting lists over the split)

Every stage is a lazy DataFrame transform — Catalyst sees the whole chain
and fuses the zero-shuffle stages (quality gate, sampling, split,
chunking) into the scan. Stage counts print once at the end from a single
pass over the final frames.

Run:  python examples/llm_corpus_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samba_spark.operators.chunking import chunk_documents
from samba_spark.operators.dedup import dedup_exact, minhash_lsh_dedup
from samba_spark.operators.mixing import assign_split, weighted_sample
from samba_spark.operators.packing import pack_sequences
from samba_spark.operators.quality import quality_audit
from samba_spark.operators.textual import decontaminate, inverted_index, text_stats
from samba_spark.session import get_spark
from samba_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="llm_corpus_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    n_raw = docs.count()

    # 0. ingest gate: fail fast if the drop is malformed (one scan)
    gate = quality_audit(
        docs,
        {
            "doc_id_not_null": F.col("doc_id").isNull(),
            "text_not_empty": F.length(F.trim("text")) == 0,
            "lang_known": F.col("lang").isNull(),
        },
    ).collect()
    assert all(r.passed for r in gate), gate

    # 0.5 fetch dedup by canonical URL (x119) — BEFORE any content pass:
    # the same page fetched under utm params / case variants / trailing
    # slashes never reaches the (much more expensive) content dedup.
    # URLs here are synthesized from doc metadata (fixture has none);
    # canonicalization is a zero-shuffle projection.
    from samba_spark.operators.textual import url_dedup_groups

    with_urls = docs.withColumn(
        "url",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://")).otherwise(
                F.lit("https://")
            ),
            F.col("source"),
            F.lit(".example.com/doc/"),
            (F.col("doc_id") % 400).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=crawl"))
            .otherwise(F.lit("")),
        ),
    )
    url_keep = url_dedup_groups(with_urls, "url", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    docs0 = docs.join(url_keep, "doc_id", "left_semi")

    # 1. exact dedup — survivors only
    exact_keep = dedup_exact(docs0).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    docs1 = docs0.join(exact_keep, "doc_id", "left_semi")

    # 2. fuzzy dedup — one representative (min doc_id) per LSH cluster
    clusters = minhash_lsh_dedup(docs1)
    reps = clusters.groupBy("cluster_id").agg(
        F.min("doc_id").alias("doc_id")
    )
    docs2 = docs1.join(reps.select("doc_id"), "doc_id", "left_semi")

    # 3. quality gate — zero-shuffle projection; threshold the composite
    scored = docs2.join(
        text_stats(docs2).select("doc_id", "quality_score"), "doc_id"
    )
    docs3 = scored.where(F.col("quality_score") >= 0.3).drop("quality_score")

    # 4. decontamination vs a benchmark set (here: a held-out slice)
    benchmark = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    flags = decontaminate(docs3, benchmark, n=5)
    docs4 = docs3.join(
        flags.where(~F.col("contaminated")).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 5. span-level duplication report (substring-granular signal — here
    #    used as a diagnostic; a stricter pipeline would mask the spans)
    from samba_spark.operators.dedup import repeated_spans

    n_span_flags = repeated_spans(docs4, n=3, stride=2).count()

    # 6. deterministic mixture sampling — downweight the loudest sources,
    #    then cap every source at a token budget (mixing configs are
    #    denominated in tokens, not documents)
    from samba_spark.operators.mixing import cap_tokens_per_group

    docs5 = weighted_sample(
        docs4, "doc_id", {"src0": 0.5, "src1": 0.5}, group_col="source"
    )
    docs5 = cap_tokens_per_group(docs5, "doc_id", budget=100_000)

    # 7. stable train/val/test split (zero shuffle)
    split = assign_split(docs5, "doc_id")
    train = split.where(F.col("split") == "train")

    # 8. chunk the training split into 64-token windows (stride 32)
    chunks = chunk_documents(train, chunk=64, stride=32)

    # 9. packing audit: how many 256-token sequences does the split yield
    packs = pack_sequences(train, budget=256)

    n0, n1, n2, n3, n4, n5 = (
        docs0.count(),
        docs1.count(),
        docs2.count(),
        docs3.count(),
        docs4.count(),
        docs5.count(),
    )
    n_train = train.count()
    n_chunks = chunks.count()
    n_seqs = packs.count()
    n_terms = inverted_index(train, min_df=2).count()
    print(f"raw documents         : {n_raw}")
    print(f"after URL fetch dedup : {n0}")
    print(f"after exact dedup     : {n1}")
    print(f"after fuzzy dedup     : {n2}")
    print(f"after quality gate    : {n3}")
    print(f"after decontamination : {n4}")
    print(f"repeated-span flags   : {n_span_flags}")
    print(f"after mixing + caps   : {n5}")
    print(f"train split           : {n_train}")
    print(f"chunks (64/32)        : {n_chunks}")
    print(f"packed 256-tok seqs   : {n_seqs}")
    print(f"index terms (df>=2)   : {n_terms}")
    assert n_raw >= n1 >= n2 >= n3 >= n4 >= n5 >= n_train
    assert n_chunks >= n_train  # every surviving doc yields ≥1 chunk
    spark.stop()


if __name__ == "__main__":
    main()
