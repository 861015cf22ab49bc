"""Sequence packing for LLM training-data pipelines.

Packs documents into fixed token-budget training sequences by streaming
concatenation: within each group (e.g. ``source``), documents are laid out
in a deterministic total order and the token stream is chunked every
``budget`` tokens; a document belongs to the sequence where its first token
lands. This is the deterministic "concat-and-chunk" packing used to build
fixed-length training batches — not bin-packing (which is order-dependent
and unstable under re-partitioning).

Scale design: the per-group running token total is computed with the same
two-pass partition-offset scheme as :func:`operators.relational.zip_with_index`
— no global ``Window.orderBy`` (a windowless-partition global sort is one
task at 100 TB). Partition-local cumulative sums run inside each
(spark-partition, group) slice, so every data-bearing stage is bounded by
the spark partition size; only the per-(partition, group) subtotals
(#partitions × #groups rows) flow through a small window and come back as a
broadcast join.

Not present in the reference (it has no training-data operators); this is
extension operator x15.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from samba_spark.operators.textual import tokens_col


def grouped_running_total(
    df: DataFrame,
    group: str,
    order_by: Sequence[str],
    value: str,
    name: str = "running_before",
) -> DataFrame:
    """Exclusive per-group running total of ``value`` under the total order
    ``(group, *order_by)``, without a single-task global window.

    Pass 1: range-partition + sort on (group, order); per-(partition, group)
    subtotals feed a prefix sum over *partition ids* (tiny — #partitions ×
    #groups rows). Pass 2: partition-local exclusive cumsum within each
    (partition, group) slice plus the broadcast group offset. The sorted
    layout is pinned with ``localCheckpoint`` so the subtotal branch and the
    output branch cannot disagree on sampled range boundaries (same pin
    rationale as zip_with_index)."""
    sdf = (
        df.repartitionByRange(group, *order_by)
        .sortWithinPartitions(group, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("_pid", group)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum(value).over(w_local), F.lit(0))
    subtot = sdf.groupBy("_pid", group).agg(F.sum(value).alias("_n"))
    w_off = (
        Window.partitionBy(group)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = subtot.select(
        "_pid",
        group,
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_goff"),
    )
    out = sdf.join(F.broadcast(offsets), ["_pid", group], "left")
    return out.withColumn(
        name, (F.col("_goff") + local_before).cast("long")
    ).drop("_pid", "_goff")


def pack_sequences(
    documents: DataFrame,
    budget: int = 256,
    group: str = "source",
    order_by: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Assign each document to a training sequence of ``budget`` tokens and
    report per-sequence stats: (group, seq_id, n_docs, seq_tokens,
    first_doc, last_doc). Token counts are whitespace tokens
    (:func:`textual.tokens_col`); ``seq_id`` is the integer chunk index of
    the document's first token in the group's concatenated token stream."""
    toks = F.size(tokens_col(F.col("text"))).cast("long")
    base = documents.select(group, *order_by, toks.alias("n_tokens"))
    off = grouped_running_total(
        base, group, order_by, "n_tokens", name="tok_before"
    )
    # integer `div`, not `/`: long/long with `/` promotes to double
    seq = off.withColumn(
        "seq_id", F.expr(f"tok_before div {int(budget)}").cast("long")
    )
    return seq.groupBy(group, "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("seq_tokens"),
        F.min(order_by[0]).alias("first_doc"),
        F.max(order_by[0]).alias("last_doc"),
    )


# power-of-two length buckets for dynamic batching (x129). A CASE chain,
# not pow(2, ceil(log2 n)): float log at exact powers of two is an
# engine-dependent edge, while a 12-arm CASE is integer-exact everywhere
# (the oracle replays the same chain).
_BUCKET_EDGES = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768]


def length_bucket_stats(
    documents: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
) -> DataFrame:
    """Per power-of-two length bucket: the batch-shape economics of
    bucketed dynamic batching at a fixed per-batch token ``budget`` —
    (bucket_len, n_docs, total_tokens, pad_tokens, n_batches,
    util_bp). Each document pads to its bucket length; a batch holds
    max(1, budget div bucket_len) documents (a bucket longer than the
    budget batches one doc at a time, the batch stretching to the bucket
    length); ``util_bp`` is real tokens over PADDED-SLOT capacity in
    basis points — floor(10000·total_tokens / (n_batches·cap·
    bucket_len)), not n_batches·budget, which differs exactly for the
    stretched buckets. The dynamic-batching planner's input: which
    length regimes waste padding, and what the end-to-end token
    utilization of the bucketed layout is.

    Everything is integer arithmetic on whitespace token counts
    (:func:`textual.tokens_col`), so the oracle replays it exactly. One
    hash aggregation — no window, no shuffle beyond the groupBy. Docs
    longer than the top bucket raise the CASE to NULL and are filtered
    out explicitly (reported upstream by quality screens, not silently
    bucketed)."""
    toks = F.size(tokens_col(F.col(text_col))).cast("long")
    bucket = F.lit(None).cast("long")
    for edge in reversed(_BUCKET_EDGES):
        bucket = F.when(toks <= edge, F.lit(edge)).otherwise(bucket)
    base = documents.select(
        bucket.alias("bucket_len"), toks.alias("n_tokens")
    ).where(F.col("bucket_len").isNotNull())
    per = base.groupBy("bucket_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    # docs per batch; a bucket longer than the budget still batches one
    # doc at a time (the batch stretches to the bucket length)
    cap = F.greatest(F.lit(1).cast("long"), F.expr(f"{int(budget)} div bucket_len"))
    # ceil(n_docs / cap) via (n + d - 1) div d — SQL `div` truncates
    # toward zero, so the -((-n) div d) idiom does NOT ceil here
    stats = per.withColumn("_cap", cap).withColumn(
        "n_batches", F.expr("(n_docs + _cap - 1) div _cap").cast("long")
    )
    return stats.select(
        "bucket_len",
        "n_docs",
        "total_tokens",
        (F.col("n_docs") * F.col("bucket_len") - F.col("total_tokens"))
        .cast("long")
        .alias("pad_tokens"),
        "n_batches",
        # integer `div` end-to-end: `/` would detour through double
        F.expr("(10000 * total_tokens) div (n_batches * _cap * bucket_len)")
        .cast("long")
        .alias("util_bp"),
    )
