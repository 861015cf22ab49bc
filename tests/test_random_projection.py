"""JL random-projection two-stage retrieval (simsearch.random_projection_topk).

Oracle parity for x144 runs in the declared-queries harness; these pin
the operator contracts: the derived sign matrix (pure function of
(dim, out_dim, label) — the no-stored-quantizer property), stage-1
recall against exact search, partitioning independence, and guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from samba_spark.operators.simsearch import (
    cosine_topk,
    make_jl_signs,
    random_projection_topk,
)


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(embs):
    return embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )


def test_sign_matrix_is_pure_function():
    a = make_jl_signs(64, 16)
    b = make_jl_signs(64, 16)
    assert a == b
    assert len(a) == 16 and all(len(r) == 64 for r in a)
    assert all(v in (1.0, -1.0) for r in a for v in r)
    # a different label derives a different matrix
    assert make_jl_signs(64, 16, label="other") != a
    # roughly balanced signs (md5 parity): no degenerate all-one rows
    for row in a:
        pos = sum(1 for v in row if v == 1.0)
        assert 10 <= pos <= 54


def test_projected_shortlist_recalls_exact_topk(spark, sf_smoke):
    """The 16-dim JL shortlist carries real signal (well above the
    shortlist/corpus = 0.1 random baseline on this 500-row fixture),
    and a corpus-covering shortlist makes the two-stage output EXACT —
    stage 2 is the same rounded cosine as cosine_topk."""
    embs = _embs(spark, sf_smoke)
    qs = _queries(embs)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(embs, qs, k=10).collect()
    }
    two_stage = {
        (r["query_id"], r["vec_id"])
        for r in random_projection_topk(
            embs, qs, k=10, dim=64, out_dim=16, shortlist=50
        ).collect()
    }
    recall = len(exact & two_stage) / len(exact)
    assert recall >= 0.3, f"JL recall {recall} at/below the random baseline"
    full = {
        (r["query_id"], r["vec_id"])
        for r in random_projection_topk(
            embs, qs, k=10, dim=64, out_dim=16, shortlist=500
        ).collect()
    }
    assert full == exact


def test_partitioning_independent(spark, sf_smoke):
    embs = _embs(spark, sf_smoke)
    qs = _queries(embs)
    a = random_projection_topk(embs, qs).orderBy("query_id", "rank").collect()
    b = (
        random_projection_topk(embs.repartition(13), qs)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert a == b


def test_exact_rerank_orders_final_output(spark, sf_smoke):
    """Stage-2 sim (exact cosine), not sim_proj, drives the final rank."""
    embs = _embs(spark, sf_smoke)
    rows = (
        random_projection_topk(embs, _queries(embs), k=10)
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))


def test_dim_mismatch_raises(spark):
    embs = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, 0.4])],
        "vec_id long, embedding array<float>",
    )
    qs = _queries(
        embs.unionByName(
            spark.createDataFrame(
                [(2, [0.5, 0.6])], "vec_id long, embedding array<float>"
            )
        )
    )
    with pytest.raises(Exception, match="dim=64"):
        random_projection_topk(embs, qs).collect()


def test_argument_validation(spark, sf_smoke):
    embs = _embs(spark, sf_smoke)
    qs = _queries(embs)
    with pytest.raises(ValueError, match="out_dim=0"):
        random_projection_topk(embs, qs, out_dim=0)
    with pytest.raises(ValueError, match="shortlist=5"):
        random_projection_topk(embs, qs, k=10, shortlist=5)
