"""Segment-level dedup with reassembly (operators/dedup.segment_dedup).

Oracle parity for x143 runs in the declared-queries harness; these pin
the operator contracts the oracle can't see: the global-removal rule
(boilerplate cut from EVERY holder, no winner kept), reassembly order,
partitioning independence, and the planted-fixture behavior.
"""

from __future__ import annotations

import pytest

from samba_spark.operators.dedup import segment_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_cut_from_every_holder(spark):
    """A shared 4-token prefix disappears from BOTH documents — the
    RefinedWeb global-removal rule, not keep-one-winner."""
    boiler = "all rights reserved worldwide"
    rows = [
        (1, f"{boiler} alpha beta gamma delta"),
        (2, f"{boiler} epsilon zeta eta theta"),
        (3, "unrelated words only here today"),
    ]
    out = {
        r["doc_id"]: r
        for r in segment_dedup(_df(spark, rows), seg_tokens=4).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    assert out[1]["n_dropped"] == 1 and out[2]["n_dropped"] == 1
    assert out[3]["n_dropped"] == 0


def test_reassembly_preserves_order_and_trailing_partial(spark):
    """Surviving segments rejoin in original position order; a trailing
    partial window is a segment like any other."""
    rows = [(1, "one two three four five six seven")]
    out = segment_dedup(_df(spark, rows), seg_tokens=3).collect()[0]
    assert out["clean_text"] == "one two three four five six seven"
    assert out["n_segments"] == 3  # 3+3+1 tokens
    assert out["n_dropped"] == 0


def test_fully_boilerplate_doc_empties(spark):
    rows = [(1, "same same same"), (2, "same same same")]
    out = segment_dedup(_df(spark, rows), seg_tokens=3).collect()
    assert all(r["clean_text"] == "" and r["n_dropped"] == 1 for r in out)


def test_empty_and_whitespace_docs_pass_through(spark):
    rows = [(1, ""), (2, "   "), (3, "real tokens here")]
    out = {
        r["doc_id"]: r
        for r in segment_dedup(_df(spark, rows), seg_tokens=4).collect()
    }
    for d in (1, 2):
        assert out[d]["clean_text"] == ""
        assert out[d]["n_segments"] == 0 and out[d]["n_dropped"] == 0
    assert out[3]["clean_text"] == "real tokens here"


def test_max_docs_threshold(spark):
    """max_docs=2 tolerates a segment in two docs; three trips it."""
    seg = "alpha beta gamma delta"
    rows = [(i, f"{seg} unique{i} u{i} uu{i} uuu{i}") for i in range(3)]
    out = segment_dedup(_df(spark, rows), seg_tokens=4, max_docs=2).collect()
    assert all(r["n_dropped"] == 1 for r in out)
    out2 = segment_dedup(
        _df(spark, rows[:2]), seg_tokens=4, max_docs=2
    ).collect()
    assert all(r["n_dropped"] == 0 for r in out2)


def test_partitioning_independent(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = segment_dedup(docs, seg_tokens=8).collect()
    b = segment_dedup(docs.repartition(13), seg_tokens=8).collect()
    assert a == b


def test_argument_validation(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    with pytest.raises(ValueError, match="seg_tokens=0"):
        segment_dedup(docs, seg_tokens=0)
    with pytest.raises(ValueError, match="max_docs=0"):
        segment_dedup(docs, max_docs=0)


# --- decontaminate_spans (x149) ---------------------------------------------
def test_decontaminate_cuts_benchmark_spans_any_alignment(spark):
    """A benchmark 4-gram buried mid-document is cut from the corpus doc
    even though the corpus segmentation is disjoint (stride-1 benchmark
    windows make the match alignment-independent)."""
    from samba_spark.operators.dedup import decontaminate_spans

    bench = spark.createDataFrame(
        [(100, "prefix words here alpha beta gamma delta suffix words")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta keep these four words"),
            (2, "totally clean document with eight safe tokens"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_spans(corpus, bench, seg_tokens=4).collect()
    }
    assert out[1]["clean_text"] == "keep these four words"
    assert out[1]["n_dropped"] == 1
    assert out[2]["n_dropped"] == 0
    assert out[2]["clean_text"] == "totally clean document with eight safe tokens"


def test_decontaminate_short_benchmark_no_windows(spark):
    """A benchmark shorter than seg_tokens contributes no windows —
    nothing is cut."""
    from samba_spark.operators.dedup import decontaminate_spans

    bench = spark.createDataFrame(
        [(100, "too short")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "too short but this corpus doc stays whole")],
        "doc_id long, text string",
    )
    out = decontaminate_spans(corpus, bench, seg_tokens=8).collect()[0]
    assert out["n_dropped"] == 0


def test_decontaminate_partitioning_independent(spark, sf_smoke):
    from pyspark.sql import functions as F

    from samba_spark.operators.dedup import decontaminate_spans

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    corpus = docs.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    a = decontaminate_spans(corpus, bench).collect()
    b = decontaminate_spans(corpus.repartition(13), bench.repartition(7)).collect()
    assert a == b
