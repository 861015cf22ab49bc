"""Integer-exact Lloyd k-means over embedding columns.

The missing clustering family: every embedding operator so far either
seeds centroids from fixed rows (simsearch.ivf_topk / _pq_prepare) or
buckets by sign-LSH (semantic_prune) — none RE-ESTIMATES centers from
assignments. ``kmeans_integer`` runs true Lloyd iterations (assign →
re-center), the workhorse of topic-clustering / SemDeDup-style corpus
curation, in a form a DuckDB oracle can replay bit-for-bit:

* vectors are quantized to a fixed-point integer grid once
  (``floor(x * quant)`` per element — the x21_label_centroids trick),
  so every distance is an exact BIGINT and every per-cluster sum is
  associative: partial aggregation order cannot change the result;
* centroid update is integer floor-division (Python ``//`` on exact
  ints driver-side; ``floor(sum/cnt)`` in the oracle — identical while
  ``|sum| < 2**53``, which holds by construction at any SF where a
  cluster's member count times the quant grid stays under 2**53; the
  guard below raises loudly past it);
* ties in the argmin break to the LOWEST centroid id (struct-ordered
  array_sort, the ivf_topk idiom), deterministically in both engines.

Iteration count is FIXED (like q41 PageRank's 10 rounds), not
run-to-convergence: the output contract is "T Lloyd rounds from the
deterministic seed", so small-SF parity proves the same computation the
large-SF run performs — no hidden fixed point for scale to expose (the
x124 k-core lesson inverted: fixed-T is the contract, so there is no
under-convergence to hide).

Scale posture (100 TB): each round is one map-side argmin over literal
centroids (k×dim ints folded into the plan — no join, no shuffle for
assignment) plus ONE hash aggregation over the posexploded (cluster,
dim, value) triples — 64× row inflation feeding an immediately
partial-aggregated shuffle of k×dim rows per partition. The driver
collects k×dim+k numbers per round (metadata scale, the _pq_prepare
seed-rows family). T rounds = T such jobs. No iteration touches the
raw text; the only data-bearing pass is the quantized-vector scan,
which Catalyst prunes to (id, vector).

Reference parity note: SAMbA has no clustering surface at all
(br/uff/spark core is provenance capture); this extends the engine the
direction its LLM-pipeline mandate points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from samba_spark.operators.guards import plan_assert

# past this bound the oracle's floor(sum/cnt) double division is no
# longer exact; the operator raises rather than silently diverging
_EXACT_SUM_BOUND = 2**53


def _quantize(vec: Column, quant: int) -> Column:
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(quant))).cast("long")
    )


def _dist2_int(vec: Column, center: list[int]) -> Column:
    """Exact squared L2 distance between an integer vector column and a
    literal integer center — a single zip_with/aggregate fold, no UDF."""
    lit_c = F.array(*[F.lit(int(v)).cast("long") for v in center])
    return F.aggregate(
        F.zip_with(vec, lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Argmin over literal centroids; ties break to the lowest cid via
    struct-ordered array_sort (the ivf_topk coarse-quantizer idiom)."""
    cells = F.array(
        *[
            F.struct(
                _dist2_int(F.col("v"), c).alias("d"), F.lit(i).alias("cid")
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_sort(cells)[0]
    return q.select(
        "vec_id",
        "v",
        best["cid"].cast("long").alias("cluster"),
        best["d"].alias("dist2"),
    )


def _prep_quantized(
    embeddings: DataFrame,
    k: int,
    quant: int,
    id_col: str,
    vec_col: str,
    op: str,
):
    """Shared training prep: quantize, seed from the ``k`` smallest ids,
    guard raggedness, then localCheckpoint ONCE (ADVICE r8: without it
    the seed collect, every per-round aggregation, and the final
    assignment each re-execute the full upstream lineage — costly when
    fed a derived DataFrame like a joined/filtered embeddings view; the
    graph module's per-round checkpoint pattern). Returns
    (checkpointed_q, seed_centroids)."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("e")
    )
    q = base.select("vec_id", _quantize(F.col("e"), quant).alias("v"))

    seeds = q.orderBy("vec_id").limit(k).collect()  # k rows: metadata scale
    if len(seeds) < k:
        raise ValueError(f"{op}: corpus has {len(seeds)} rows < k={k}")
    dim = len(seeds[0]["v"])
    # a ragged vector would silently zip_with-truncate the distance;
    # assert instead (plan-folded, fires on the first offending row —
    # here at checkpoint time, before any Lloyd round runs)
    q = q.select(
        "vec_id",
        plan_assert(
            F.col("v"),
            F.size("v") != F.lit(dim),
            f"{op}: vector length ",
            F.size("v").cast("string"),
            f" != expected dim {dim}",
        ).alias("v"),
    ).localCheckpoint(eager=True)
    return q, [list(r["v"]) for r in seeds]


def kmeans_train(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    quant: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """The OFFLINE half of the clustering serving split (the ivf_topk
    ``centroids=`` / pq_topk ``codebooks=`` contract): run T Lloyd
    rounds and return the FINAL integer-grid centroids, to be pinned
    into :func:`kmeans_assign` (or persisted via
    indexstore.save_kmeans_index) for serving. Identical training
    computation to :func:`kmeans_integer` — same seeds, same rounds,
    same empty-cluster rule."""
    if k < 1:
        raise ValueError(f"kmeans_train: k={k} must be >= 1")
    if iters < 0:
        raise ValueError(f"kmeans_train: iters={iters} must be >= 0")
    if quant < 1:
        raise ValueError(f"kmeans_train: quant={quant} must be >= 1")
    q, centroids = _prep_quantized(
        embeddings, k, quant, id_col, vec_col, "kmeans_train"
    )
    return _lloyd_rounds(q, centroids, k, iters)


def kmeans_integer(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    quant: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """T-round Lloyd k-means on the integer grid.

    Seeds are the quantized vectors of the ``k`` smallest ids (the
    deterministic _pq_prepare seed-rows contract); each round assigns
    every vector to its nearest centroid and re-centers as the
    per-dimension integer floor-mean; a cluster that loses all members
    keeps its previous centroid. Returns the assignment against the
    FINAL centroids: (vec_id, cluster, dist2, cluster_size), ordered by
    vec_id.
    """
    if k < 1:
        raise ValueError(f"kmeans_integer: k={k} must be >= 1")
    if iters < 0:
        raise ValueError(f"kmeans_integer: iters={iters} must be >= 0")
    if quant < 1:
        raise ValueError(f"kmeans_integer: quant={quant} must be >= 1")
    q, centroids = _prep_quantized(
        embeddings, k, quant, id_col, vec_col, "kmeans_integer"
    )
    centroids = _lloyd_rounds(q, centroids, k, iters)
    return with_cluster_sizes(_assign(q, centroids))


def with_cluster_sizes(assigned: DataFrame) -> DataFrame:
    # Attach cluster_size via a broadcast of the (metadata-scale) size
    # table -- the shared output tail of kmeans_integer and the declared
    # x142 serving query (review finding: the copy had already forked).
    sizes = assigned.groupBy("cluster").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        assigned.join(F.broadcast(sizes), "cluster")
        .select("vec_id", "cluster", "dist2", "cluster_size")
        .orderBy("vec_id")
    )


def _lloyd_rounds(
    q: DataFrame, centroids: list[list[int]], k: int, iters: int
) -> list[list[int]]:
    for _ in range(iters):
        assigned = _assign(q, centroids)
        # ONE hash agg over (cluster, dim, value); partial aggregation
        # shrinks the shuffle to k*dim rows per map partition
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dimn", "val"))
            .groupBy("cluster", "dimn")
            .agg(F.sum("val").alias("s"), F.count("val").alias("n"))
            .collect()  # k*dim rows: metadata scale
        )
        by_cluster: dict[int, list[tuple[int, int, int]]] = {}
        for r in sums:
            if abs(r["s"]) >= _EXACT_SUM_BOUND:
                raise ValueError(
                    "kmeans Lloyd round: per-cluster coordinate sum "
                    f"{r['s']} exceeds the 2**53 exact-division bound — "
                    "lower quant or raise k"
                )
            by_cluster.setdefault(int(r["cluster"]), []).append(
                (int(r["dimn"]), int(r["s"]), int(r["n"]))
            )
        centroids = [
            # empty cluster keeps its previous centroid
            [s // n for _, s, n in sorted(by_cluster[cid])]
            if cid in by_cluster
            else centroids[cid]
            for cid in range(k)
        ]
    return centroids


def kmeans_assign(
    embeddings: DataFrame,
    centroids: list[list[int]],
    quant: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serving-mode assignment against PINNED integer centroids (the
    ivf_topk ``centroids=`` contract applied to clustering): no
    training scan; the argmin itself is map-side with no shuffle, and
    the only exchange is the final ``orderBy(vec_id)`` range sort that
    makes the output order deterministic (drop it downstream if the
    consumer doesn't need ordered rows). Centroids must be
    the integer-grid values a prior ``kmeans_integer`` run produced at
    the same ``quant``."""
    if not centroids:
        raise ValueError("kmeans_assign: centroids must be non-empty")
    dim = len(centroids[0])
    for i, c in enumerate(centroids):
        if len(c) != dim:
            raise ValueError(
                f"kmeans_assign: centroid {i} has dim {len(c)}, expected {dim}"
            )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("e")
    )
    q = base.select("vec_id", _quantize(F.col("e"), quant).alias("v"))
    q = q.select(
        "vec_id",
        plan_assert(
            F.col("v"),
            F.size("v") != F.lit(dim),
            "kmeans_assign: vector length ",
            F.size("v").cast("string"),
            f" != centroid dim {dim}",
        ).alias("v"),
    )
    return (
        _assign(q, [list(map(int, c)) for c in centroids])
        .select("vec_id", "cluster", "dist2")
        .orderBy("vec_id")
    )


def clustering_metrics(
    assignments: DataFrame,
    labels: DataFrame,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    label_col: str = "label",
) -> DataFrame:
    """External clustering-quality evaluation — purity and Adjusted
    Rand Index of a cluster assignment against gold labels: the
    clustering sibling of x140's retrieval metrics (x142 produces
    partitions; nothing scored them). Everything up to the final two
    divisions is EXACT integer pair-counting on the contingency table
    (all C(n,2) terms are BIGINT, products even by construction), so
    both engines reach the same two IEEE divisions:

        purity = Σ_c max_j n_cj / N
        ARI    = (idx − exp) / (max − exp),  idx = Σ C(n_ij,2),
                 exp = ΣC(a_i,2)·ΣC(b_j,2)/C(N,2),
                 max = (ΣC(a_i,2)+ΣC(b_j,2))/2

    Degenerate contract: when max == exp (both partitions trivial) the
    denominator is zero and ARI is defined as 1.0 — the partitions are
    then identical up to relabeling.

    Label-coverage contract (ADVICE r8): assignments join labels INNER
    on the id, so assignment ids absent from the labels table are
    silently excluded — n_rows and the purity/ARI denominators then
    cover only the LABELED subset, which is the standard external-
    evaluation convention (score where gold exists). If partial label
    coverage should fail loudly instead, compare the returned n_rows
    against the assignment count upstream — the metric itself cannot
    distinguish "unlabeled" from "absent by design".

    Returns ONE row: (n_rows, n_clusters, n_labels, purity_num, purity,
    ari), floats rounded to 6.

    Scale posture: the only data-bearing pass is the (cluster, label)
    contingency aggregation (partial-aggregated, ≤ k×|labels| result
    rows — metadata scale); every metric is an aggregate over that tiny
    table (the x131 cells-table family).
    """
    j = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("c")
    ).join(
        labels.select(F.col(id_col).alias("_id"), F.col(label_col).alias("l")),
        "_id",
    )
    ct = j.groupBy("c", "l").agg(F.count("*").alias("n"))
    pair = F.expr("n * (n - 1) div 2")
    row_sums = ct.groupBy("c").agg(F.sum("n").alias("a"))
    col_sums = ct.groupBy("l").agg(F.sum("n").alias("b"))
    stats = (
        ct.agg(
            F.sum("n").alias("n_rows"),
            F.sum(pair).alias("idx"),
            F.count_distinct("c").alias("n_clusters"),
            F.count_distinct("l").alias("n_labels"),
        )
        .crossJoin(
            ct.groupBy("c")
            .agg(F.max("n").alias("mx"))
            .agg(F.sum("mx").alias("purity_num"))
        )
        .crossJoin(row_sums.agg(F.sum(F.expr("a * (a - 1) div 2")).alias("sa")))
        .crossJoin(col_sums.agg(F.sum(F.expr("b * (b - 1) div 2")).alias("sb")))
    )
    n = F.col("n_rows").cast("double")
    cn2i = F.expr("n_rows * (n_rows - 1) div 2")
    cn2 = cn2i.cast("double")
    exp = F.col("sa").cast("double") * F.col("sb").cast("double") / cn2
    mx = (F.col("sa").cast("double") + F.col("sb").cast("double")) / F.lit(2.0)
    num = F.col("idx").cast("double") - exp
    den = mx - exp
    # n_rows < 2 ⇒ C(N,2) = 0 and exp would divide by zero (a hard
    # ANSI error, not NaN — confirmed by repro): a one-row table has no
    # pairs to disagree on, so ARI is 1.0 by the same trivial-partition
    # contract as the den == 0 branch. CASE short-circuits, so the
    # division never executes on that branch.
    ari = F.when(cn2i == F.lit(0), F.lit(1.0)).otherwise(
        F.when(den != F.lit(0.0), num / den).otherwise(F.lit(1.0))
    )
    return stats.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("n_labels").cast("long").alias("n_labels"),
        F.col("purity_num").cast("long").alias("purity_num"),
        F.round(F.col("purity_num").cast("double") / n, 6).alias("purity"),
        F.round(ari, 6).alias("ari"),
    )
