"""Power-iteration PCA (vectorops.pca_power_scores / pca_power_iteration).

Oracle parity for x147 runs in the declared-queries harness; these pin
what the oracle can't see: the eigenvector actually solves the
eigenproblem (numpy cross-check), sign canonicalization, partitioning
independence, variance dominance of the extracted axis, and guards.
"""

from __future__ import annotations

import pytest

from samba_spark.operators.vectorops import (
    pca_power_iteration,
    pca_power_scores,
)


def _embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _collect_sums(spark, sf_dir, dims):
    from pyspark.sql import functions as F

    embs = _embs(spark, sf_dir)
    scale = 10**6
    q = [
        F.round(F.col("embedding")[i].cast("double") * scale).cast("long")
        for i in range(dims)
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(dims):
        aggs.append(F.sum(q[i]).cast("long").alias(f"s_{i}"))
    for i in range(dims):
        for j in range(i, dims):
            aggs.append(F.sum(q[i] * q[j]).cast("long").alias(f"p_{i}_{j}"))
    return embs.agg(*aggs).collect()[0].asDict()


def test_eigenvector_solves_covariance_eigenproblem(spark, sf_smoke):
    """Run to convergence (the fixture's synthetic embeddings are
    near-isotropic — λ₂/λ₁ ≈ 0.956, so this takes ~300 rounds; rounds
    are driver-side 8×8 matvecs, microseconds each): the returned
    direction is an eigenvector of the centered scatter, C·v ∥ v."""
    np = pytest.importorskip("numpy")
    dims = 8
    sums = _collect_sums(spark, sf_smoke, dims)
    v = np.array(pca_power_iteration(sums, dims, iters=500))
    n = sums["n"]
    c = np.empty((dims, dims))
    for i in range(dims):
        for j in range(i, dims):
            cij = float(
                n * sums[f"p_{i}_{j}"] - sums[f"s_{i}"] * sums[f"s_{j}"]
            )
            c[i, j] = c[j, i] = cij
    cv = c @ v
    lam = float(v @ cv)
    resid = np.linalg.norm(cv - lam * v) / np.linalg.norm(cv)
    assert resid < 1e-6, f"not an eigenvector: residual {resid}"
    # and it is the DOMINANT one: eigenvalue within 0.1% of numpy's max
    w = np.linalg.eigvalsh(c)
    assert lam >= 0.999 * w[-1]


def test_sign_canonicalized_and_unit_norm(spark, sf_smoke):
    np = pytest.importorskip("numpy")
    sums = _collect_sums(spark, sf_smoke, 8)
    v = pca_power_iteration(sums, 8, iters=8)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    lead = max(v, key=abs)
    assert lead > 0  # largest-magnitude component made positive


def test_scores_partitioning_independent(spark, sf_smoke):
    embs = _embs(spark, sf_smoke)
    a = pca_power_scores(embs, dims=8, iters=8).collect()
    b = pca_power_scores(embs.repartition(13), dims=8, iters=8).collect()
    assert a == b


def test_pc1_maximizes_projected_variance(spark, sf_smoke):
    """The variance of pc1 scores beats the variance along any raw
    coordinate axis — the defining property of the first component."""
    np = pytest.importorskip("numpy")
    embs = _embs(spark, sf_smoke)
    dims = 8
    scores = np.array(
        [r["pc1_score"] for r in pca_power_scores(embs, dims=dims).collect()]
    )
    mat = np.array(
        [r["embedding"][:dims] for r in embs.select("embedding").collect()],
        dtype=float,
    )
    axis_vars = mat.var(axis=0)
    assert scores.var() >= axis_vars.max() - 1e-12


def test_argument_validation(spark, sf_smoke):
    embs = _embs(spark, sf_smoke)
    with pytest.raises(ValueError, match="dims=1"):
        pca_power_scores(embs, dims=1)
    with pytest.raises(ValueError, match="iters=0"):
        pca_power_scores(embs, dims=4, iters=0)


def test_degenerate_scatter_raises():
    """A corpus of identical vectors has a zero scatter matrix; the
    iteration must fail loudly, not return garbage."""
    dims = 2
    # 3 identical rows of [1.0, 1.0] quantized at 1e6
    q = 10**6
    sums = {
        "n": 3,
        "s_0": 3 * q,
        "s_1": 3 * q,
        "p_0_0": 3 * q * q,
        "p_0_1": 3 * q * q,
        "p_1_1": 3 * q * q,
    }
    with pytest.raises(ValueError, match="zero vector"):
        pca_power_iteration(sums, dims, iters=2)
