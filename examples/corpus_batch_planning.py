#!/usr/bin/env python
"""Training-batch planning tour — the round-7 operators composed the way
a data-prep run chains them before a training job:

  documents
    → cross-doc exact-substring overlap  (x132: winnowed fingerprints —
      which pairs share long verbatim spans; the char-level signal
      MinHash dilutes away)
    → χ² source×language screen          (x131: is the corpus mix
      confounded before we weight it?)
    → temperature mixture (α=0.5)        (x130: isqrt-exact per-source
      token allocations + epoch counts)
    → length-bucket batch economics      (x129: padding waste and
      utilization of the bucketed dynamic-batching layout)
    → JPEG sidecar decode                (x128: baseline-JPEG pixel
      stats through the pure-stdlib codec — the multimodal column next
      to the text)

Run:  python examples/corpus_batch_planning.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from samba_spark.operators.dedup import common_substring_pairs
from samba_spark.operators.mixing import temperature_mixture
from samba_spark.operators.multimodal import image_pixel_stats, synth_jpegs
from samba_spark.operators.packing import length_bucket_stats
from samba_spark.operators.quality import chi_square_screen
from samba_spark.session import get_spark
from samba_spark.sources.tables import load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus_batch_planning")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]

    print("verbatim-overlap pairs (winnowed, top 5 by span):")
    spans = (
        common_substring_pairs(
            docs.select("doc_id", "text"), window=32, min_len=44, winnow=8
        )
        .orderBy(F.desc("span_len"), "doc_a", "doc_b")
        .limit(5)
    )
    for r in spans.collect():
        print(f"  {r.doc_a} ~ {r.doc_b}: {r.span_len} chars, {r.n_spans} span(s)")

    print("source × lang χ² screen (top 3 contributors):")
    chi = chi_square_screen(docs, "source", "lang").orderBy(F.desc("contrib"))
    for r in chi.limit(3).collect():
        print(f"  ({r.a}, {r.b}): observed {r.observed}, contrib {r.contrib}")

    print("temperature mixture (α=0.5, 100k-token budget; first 5 sources):")
    mix = temperature_mixture(docs, token_budget=100_000).orderBy("source")
    for r in mix.limit(5).collect():
        print(
            f"  {r.source:6s} {r.n_tokens:7d} tokens -> alloc "
            f"{r.alloc_tokens:6d} ({r.epochs_bp / 100:.1f}% epochs)"
        )

    print("length-bucket batch economics (budget 256):")
    for r in length_bucket_stats(docs, budget=256).orderBy("bucket_len").collect():
        print(
            f"  bucket {r.bucket_len:4d}: {r.n_docs:4d} docs, "
            f"{r.n_batches:4d} batches, util {r.util_bp / 100:.1f}%"
        )

    print("JPEG sidecar pixel stats (first 4 docs):")
    media = synth_jpegs(docs.where("doc_id < 4").select("doc_id"))
    for r in image_pixel_stats(media).orderBy("media_id").collect():
        print(
            f"  media {r.media_id}: {r.width}x{r.height}x{r.channels}, "
            f"px_sum {r.px_sum} [{r.px_min}..{r.px_max}]"
        )

    spark.stop()


if __name__ == "__main__":
    main()
