"""Document chunking for LLM training / retrieval pipelines.

Splits each document's whitespace-token stream into fixed-size windows with
a configurable stride (overlapping when ``stride < chunk``) — the standard
preprocessing step for fixed-context training examples and RAG passage
indexes.

Scale design: pure Catalyst — ``sequence`` builds the per-document start
offsets and ``posexplode`` fans them out, so chunking is a zero-shuffle
projection that parallelizes with the scan (each output chunk is derived
from its own row; no window, no join). Chunk payloads are returned as
digests rather than text so the operator's output stays narrow; callers
that need the text select ``chunk_text`` explicitly.

Not present in the reference (no training-data operators); extension
operator x29.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from samba_spark.operators.textual import tokens_col


def chunk_documents(
    documents: DataFrame,
    chunk: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = False,
) -> DataFrame:
    """One row per (document, chunk window): ``(id, chunk_id, start,
    chunk_len, chunk_digest[, chunk_text])``. ``start`` is the 0-based token
    offset of the window; windows begin every ``stride`` tokens while any
    token remains, and the last window is short when the document ends
    mid-window. Zero-token documents produce no chunks."""
    if chunk <= 0 or stride <= 0:
        raise ValueError("chunk and stride must be positive")
    base = (
        documents.select(
            F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
        )
        .withColumn("_n", F.size("_toks").cast("long"))
        .where(F.col("_n") > 0)
    )
    ex = base.select(
        id_col,
        "_toks",
        F.posexplode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("_n") - 1,
                F.lit(int(stride)).cast("long"),
            )
        ).alias("chunk_id", "start"),
    )
    out = ex.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "start",
        F.expr(f"slice(_toks, start + 1, {int(chunk)})").alias("_ctoks"),
    ).select(
        id_col,
        "chunk_id",
        "start",
        F.size("_ctoks").cast("long").alias("chunk_len"),
        F.md5(F.array_join("_ctoks", " ")).alias("chunk_digest"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
    )
    return out if with_text else out.drop("chunk_text")
