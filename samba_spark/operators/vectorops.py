"""Distributed vector aggregation over embedding columns.

Per-group centroids (and quantized exact-parity sums) for
``array<float>`` embedding columns — the building block for semantic
clustering, IVF training stats, and drift monitoring over a 100 TB
embedding store.

Scale shape: ``posexplode`` multiplies rows by the dimension count, but
sum/count aggregation is partial (map-side combine), so the shuffle carries
O(groups × dims) rows per partition — never the exploded data. The array is
re-assembled AFTER aggregation (|groups| rows), so collect_list never sees
raw vectors. No Python in the data path.

Float caveat: distributed float sums are order-dependent, so the centroid
op itself is rows-only checkable. For the oracle gate,
:func:`centroid_sums_quantized` quantizes each component to an integer
(floor(x·10^6) of the exact float→double widening) BEFORE summing — integer
sums are associative, so Spark and DuckDB agree bit-for-bit.

Not present in the reference (no vector surface at all); north-star
extension per BASELINE.json similarity family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def vector_centroids(
    df: DataFrame, group: str = "label", vec: str = "embedding"
) -> DataFrame:
    """(group, centroid array<double>, n_vecs): the per-group mean vector."""
    pos = df.select(
        group, F.posexplode(F.col(vec).cast("array<double>")).alias("pos", "v")
    )
    per_dim = pos.groupBy(group, "pos").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy(group)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                lambda x: x["s"] / x["n"],
            ).alias("centroid"),
            F.first(F.col("n")).cast("long").alias("n_vecs"),
        )
    )


def centroid_sums_quantized(
    df: DataFrame,
    group: str = "label",
    vec: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """(group, pos, sum_q, n_vecs): exact integer component sums.

    Quantization is floor(double(v) · scale) — float→double widening is
    exact and the double multiply/floor are IEEE-defined, so any engine
    computes the identical BIGINT per component. Output is one row per
    (group, dimension): small, stable, hash-comparable."""
    pos = df.select(
        group, F.posexplode(F.col(vec).cast("array<double>")).alias("pos", "v")
    )
    return (
        pos.groupBy(group, "pos")
        .agg(
            F.sum(F.floor(F.col("v") * scale).cast("long"))
            .cast("long")
            .alias("sum_q"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
        )
        .select(group, F.col("pos").cast("long").alias("pos"), "sum_q", "n_vecs")
    )


def normalize_vectors(
    df: DataFrame, vec: str = "embedding", out: str = "unit"
) -> DataFrame:
    """Append an L2-normalized copy of ``vec`` (zero-norm → nulls).
    Pure Catalyst higher-order functions — codegen'd, zero-shuffle."""
    v = F.col(vec).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return df.withColumn(
        out,
        F.when(
            norm > 0, F.transform(v, lambda x: x / norm)
        ).otherwise(F.lit(None)),
    )


def quantization_stats(
    df: DataFrame,
    vec: str = "embedding",
    group: str = "label",
    bits: int = 8,
) -> DataFrame:
    """Per-group int-N symmetric quantization audit — the pre-flight check
    before shipping an embedding store as int8: for each vector, quantize
    q_i = round(v_i · qmax / maxabs) (per-vector scale, qmax = 2^(bits-1)-1),
    then aggregate per group the codebook usage (min/max/sum of q) and the
    worst reconstruction error max|v_i − q_i·maxabs/qmax| (quantized to
    integer nanounits so the reduction is order-free).

    Scale shape: the per-vector math is pure Catalyst higher-order
    functions (transform/aggregate/array_min/array_max) — explode-free and
    zero-shuffle, in contrast to x21's posexplode path, so a 100 TB store
    streams through the scan stage; the only exchange is the final
    #groups-key partial aggregate. Engine-exact: q sums/extrema are
    integers and the error max floors to integer before aggregation, so no
    float reduction order is exposed. Zero vectors quantize to all-zero
    codes with zero error (NULLIF/COALESCE guard).
    """
    qmax = (1 << (bits - 1)) - 1
    v = F.col(vec).cast("array<double>")
    maxabs = F.nullif(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(0.0)
    )
    q = F.transform(v, lambda x: F.round(x * qmax / maxabs).cast("long"))
    err_e9 = F.transform(
        v,
        lambda x: F.floor(
            F.abs(x - F.round(x * qmax / maxabs) * maxabs / qmax) * F.lit(1e9)
        ).cast("long"),
    )
    per_row = df.select(
        F.col(group),
        F.coalesce(
            F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x), F.lit(0)
        ).alias("_qs"),
        F.coalesce(F.array_min(q), F.lit(0)).alias("_qmin"),
        F.coalesce(F.array_max(q), F.lit(0)).alias("_qmax"),
        F.coalesce(F.array_max(err_e9), F.lit(0)).alias("_err"),
    )
    return (
        per_row.groupBy(group)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("_qs").cast("long").alias("sum_q"),
            F.min("_qmin").cast("long").alias("min_q"),
            F.max("_qmax").cast("long").alias("max_q"),
            F.max("_err").cast("long").alias("max_err_e9"),
        )
    )


def norm_stats(
    df: DataFrame, vec: str = "embedding", group: str = "label"
) -> DataFrame:
    """Per-group L2-norm statistics over an embedding column — the drift /
    health metric a 100 TB embedding store monitors per ingest batch
    (collapsed or exploding norms signal a broken encoder).

    Engine-exact by construction: each vector's sum of squares is
    quantized to integers (floor(x²·10¹²), associative sum), the norm is
    sqrt of that single double (correctly rounded in every IEEE engine),
    and per-group stats aggregate the ×10⁶-quantized norm integers — so
    min/max/avg carry no float-sum-order exposure. Zero-shuffle per-row
    math; one partial-agg shuffle keyed by ``group``.
    """
    v = F.col(vec).cast("array<double>")
    sumsq_q = F.aggregate(
        F.transform(v, lambda x: F.floor(x * x * F.lit(1e12)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    norm_q = F.floor(
        F.sqrt(sumsq_q.cast("double") / F.lit(1e12)) * F.lit(1e6)
    ).cast("long")
    per_row = df.select(F.col(group), norm_q.alias("_nq"))
    return (
        per_row.groupBy(group)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("_nq").alias("min_norm_e6"),
            F.max("_nq").alias("max_norm_e6"),
            F.sum("_nq").alias("_sum_nq"),
        )
        .select(
            group,
            "n_vecs",
            "min_norm_e6",
            "max_norm_e6",
            F.round(F.col("_sum_nq") / F.col("n_vecs") / F.lit(1e6), 6).alias(
                "avg_norm"
            ),
        )
    )


def _scatter_aggs(dims: int, vec_col: str, scale: int) -> list:
    """The one definition of the quantized scatter aggregation shared
    by covariance_matrix and pca_power_scores (review finding: two
    verbatim copies could drift): per-component exact integer sums
    ``n``, ``s_i``, and cross-products ``p_i_j`` (i ≤ j) over
    ``round(x·scale)`` — order-independent at any parallelism."""
    q = [
        F.round(F.col(vec_col)[i].cast("double") * scale).cast("long")
        for i in range(dims)
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(dims):
        aggs.append(F.sum(q[i]).cast("long").alias(f"s_{i}"))
    for i in range(dims):
        for j in range(i, dims):
            aggs.append(F.sum(q[i] * q[j]).cast("long").alias(f"p_{i}_{j}"))
    return aggs


def covariance_matrix(
    embs: DataFrame,
    dims: int = 8,
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Upper-triangular covariance matrix of the first ``dims`` embedding
    components — the PCA/whitening input, computed WITHOUT MLlib as one
    single-pass aggregation: every Σxᵢ and Σxᵢxⱼ is an exact integer sum
    of scale-quantized components (float sums are order-dependent;
    integer sums make the matrix identical at any parallelism), and the
    covariance is one deterministic double expression per cell.

    Plan shape: zero shuffles except the final 1-row global aggregate —
    dims(dims+3)/2 partial aggregates ride the scan. That is the right
    trade up to a few hundred cells; for full wide-d covariance
    (d² ≫ 10³ cells) switch to the posexplode-pair form (shuffle keyed
    by (i,j), same quantized sums) — same numbers, different budget.
    Int64 bounds: |q| ≤ scale, so Σxᵢxⱼ stays exact while
    rows × scale² < 2⁶³ (~9·10⁶ rows at scale 10⁶ worst-case; unit-norm
    embeddings give ~100× more headroom).
    """
    row = embs.agg(*_scatter_aggs(dims, vec_col, scale))
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("i"),
                F.lit(j).cast("long").alias("j"),
                F.col(f"p_{i}_{j}").alias("pij"),
                F.col(f"s_{i}").alias("si"),
                F.col(f"s_{j}").alias("sj"),
            )
            for i in range(dims)
            for j in range(i, dims)
        ]
    )
    nd = F.col("n").cast("double")
    cov = (
        (nd * F.col("c.pij").cast("double") - F.col("c.si").cast("double") * F.col("c.sj").cast("double"))
        / (nd * (nd - 1))
        / float(scale) ** 2
    )
    return (
        row.select("n", F.explode(cells).alias("c"))
        .select(
            F.col("c.i").alias("i"),
            F.col("c.j").alias("j"),
            F.col("n"),
            F.round(cov, 9).alias("cov"),
        )
    )


def linear_model_2f(
    df: DataFrame,
    group_col: str,
    x1,
    x2,
    y,
) -> DataFrame:
    """Closed-form least-squares fit of ``y ~ x1 + x2`` per group — model
    training INSIDE the engine, no collect, no iteration: one partial-
    aggregated scan accumulates the 9 sufficient statistics (Σx, Σx²,
    Σxy, …) and the normal equations are solved per group with Cramer's
    rule. Scaling by n clears every division, so the solution is exact
    integer arithmetic end to end: slopes are returned as
    (numerator, determinant) pairs — DECIMAL(38,0) products rendered as
    canonical digit strings (engine-portable; DuckDB mirrors them as
    HUGEINT) — plus IEEE-double ratios for human consumption.

    a11 = n·Σx1² − (Σx1)², a12 = n·Σx1x2 − Σx1Σx2, a22 likewise,
    b1 = n·Σx1y − Σx1Σy, b2 = n·Σx2y − Σx2Σy;
    det = a11a22 − a12², β1 = (b1a22 − b2a12)/det, β2 = (b2a11 − b1a12)/det.

    Bounds: with |x| ≤ 10³, |y| ≤ 10⁵ (cents) and n ≤ 10⁹ rows/group the
    deepest product stays < 10³⁸ — inside DECIMAL(38,0). Sufficient
    statistics shuffle O(groups) rows; the fit is embarrassingly partial
    — the 100 TB regression is one scan. Degenerate groups (det = 0:
    constant or collinear features) surface det='0' rather than a
    divide error. The reference has no analytics beyond counts; this is
    north-star in-engine modeling.
    """
    e = df.select(
        F.col(group_col),
        x1.cast("long").alias("_x1"),
        x2.cast("long").alias("_x2"),
        y.cast("long").alias("_y"),
    )
    s = e.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_x1").alias("_s1"),
        F.sum("_x2").alias("_s2"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x1") * F.col("_x1")).alias("_s11"),
        F.sum(F.col("_x2") * F.col("_x2")).alias("_s22"),
        F.sum(F.col("_x1") * F.col("_x2")).alias("_s12"),
        F.sum(F.col("_x1") * F.col("_y")).alias("_s1y"),
        F.sum(F.col("_x2") * F.col("_y")).alias("_s2y"),
    )

    def dec(c):
        return F.col(c).cast("decimal(38,0)")

    h = s.select(
        group_col,
        "n",
        (dec("n") * dec("_s11") - dec("_s1") * dec("_s1")).alias("_a11"),
        (dec("n") * dec("_s12") - dec("_s1") * dec("_s2")).alias("_a12"),
        (dec("n") * dec("_s22") - dec("_s2") * dec("_s2")).alias("_a22"),
        (dec("n") * dec("_s1y") - dec("_s1") * dec("_sy")).alias("_b1"),
        (dec("n") * dec("_s2y") - dec("_s2") * dec("_sy")).alias("_b2"),
    )
    det = F.col("_a11") * F.col("_a22") - F.col("_a12") * F.col("_a12")
    b1n = F.col("_b1") * F.col("_a22") - F.col("_b2") * F.col("_a12")
    b2n = F.col("_b2") * F.col("_a11") - F.col("_b1") * F.col("_a12")
    return h.select(
        group_col,
        "n",
        det.cast("string").alias("det"),
        b1n.cast("string").alias("beta1_num"),
        b2n.cast("string").alias("beta2_num"),
        F.when(
            det.cast("double") != 0.0,
            b1n.cast("double") / det.cast("double"),
        ).alias("slope1"),
        F.when(
            det.cast("double") != 0.0,
            b2n.cast("double") / det.cast("double"),
        ).alias("slope2"),
    )


def pca_power_iteration(
    sums: dict, dims: int, iters: int
) -> list[float]:
    """Driver-side power iteration on the exact-integer centered
    scatter matrix — the metadata-scale half of :func:`pca_power_scores`
    (the k-means-centroid split: data-bearing aggregation distributed,
    O(dims²) linear algebra on the driver, exactly how MLlib's
    RowMatrix collects the Gram matrix).

    ``sums`` carries the one-row aggregates (``n``, ``s_i``,
    ``p_i_j`` for i ≤ j) as Python ints, so the centered scatter
    ``C[i][j] = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ`` is computed in ARBITRARY-PRECISION
    integers (no 2⁶³ overflow at any row count) and converted to double
    once — the same exact-then-round the oracle does in HUGEINT. The
    iteration itself is plain IEEE doubles with EXPLICIT left-to-right
    accumulation, mirroring the generated SQL's left-associative ``+``
    chains term for term, so both engines produce bit-identical
    vectors. Sign is canonicalized (the component with the largest
    magnitude — lowest index on ties — is made positive)."""
    import math

    n = int(sums["n"])
    c = [[0.0] * dims for _ in range(dims)]
    for i in range(dims):
        for j in range(i, dims):
            cij = float(
                n * int(sums[f"p_{i}_{j}"])
                - int(sums[f"s_{i}"]) * int(sums[f"s_{j}"])
            )
            c[i][j] = cij
            c[j][i] = cij
    v = [1.0] * dims
    for _ in range(iters):
        u = []
        for i in range(dims):
            acc = 0.0
            for j in range(dims):
                acc = acc + c[i][j] * v[j]
            u.append(acc)
        ss = 0.0
        for i in range(dims):
            ss = ss + u[i] * u[i]
        nt = math.sqrt(ss)
        if nt == 0.0:
            raise ValueError(
                "pca_power_iteration: iteration collapsed to the zero "
                "vector — degenerate scatter matrix"
            )
        v = [u[i] / nt for i in range(dims)]
    mx = 0.0
    for i in range(dims):
        if abs(v[i]) > mx:
            mx = abs(v[i])
    lead = next(v[i] for i in range(dims) if abs(v[i]) == mx)
    if lead < 0.0:
        v = [-x for x in v]
    return v


def pca_power_scores(
    embs: DataFrame,
    dims: int = 16,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10**6,
    *,
    round_to: int = 6,
) -> DataFrame:
    """First-principal-component score per vector via power iteration —
    the eigen-decomposition step the linear-algebra family lacked: x65
    computes the covariance matrix and stops; this extracts its dominant
    eigenvector and projects every row onto it (PCA coordinate 1: the
    embedding-drift / outlier axis used for corpus diagnostics).

    Architecture: the ONLY data-bearing pass is the covariance_matrix-
    style single aggregation of exact scale-quantized integer sums
    (order-independent at any parallelism; int64 bound: rows × scale²
    < 2⁶³, same as x65); the 16×16 eigen-iteration runs on the driver
    in arbitrary-precision-then-double arithmetic
    (:func:`pca_power_iteration`), and the final projection is one
    map-side fold of the RAW double components against the plan-folded
    eigenvector literals — O(1)-magnitude outputs, rounded before
    ranking. Iteration count is FIXED (the q41-PageRank contract).

    Returns (id, pc1_score) ordered by id."""
    if dims < 2:
        raise ValueError(f"pca_power_scores: dims={dims} must be >= 2")
    if iters < 1:
        raise ValueError(f"pca_power_scores: iters={iters} must be >= 1")
    sums = embs.agg(*_scatter_aggs(dims, vec_col, scale)).collect()[
        0
    ].asDict()  # one metadata-scale row
    v = pca_power_iteration(sums, dims, iters)

    score = F.lit(0.0)
    for i in range(dims):
        score = score + F.col(vec_col)[i].cast("double") * F.lit(v[i])
    return (
        embs.select(
            F.col(id_col).alias(id_col),
            F.round(score, round_to).alias("pc1_score"),
        )
        .orderBy(id_col)
    )
