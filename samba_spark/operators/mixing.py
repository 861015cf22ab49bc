"""Data-mixing operators for training-corpus assembly.

Deterministic train/val/test splitting and per-source capping — the two
primitives a 100 TB corpus mix needs before packing/tokenization. Both are
pure Catalyst expressions keyed on the md5 hash family the dedup operators
already use (dedup._md5_base32), so the DuckDB oracle replays the exact
assignment and the split is stable across runs, partitionings, and engines
(unlike ``randomSplit``, whose assignment depends on partition layout).

Not present in the reference (its sampling surface is ``sample``/
``randomSplit`` — SURVEY.md §2.3 sampling row); these extend it with the
reproducible-by-key semantics modern data pipelines standardize on.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from samba_spark.operators.dedup import _md5_base32


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(key-as-string).

    The 32-bit md5 base is non-negative, so ``%`` agrees between Spark
    (sign-preserving pmod here is moot) and DuckDB's ``%``."""
    return (_md5_base32(key.cast("string")) % n_buckets).cast("long")


def assign_split(
    df: DataFrame,
    key: str,
    splits: Mapping[str, int] | None = None,
    bucket_col: str = "bucket",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a stable split label by hashing ``key``.

    ``splits`` maps label → integer weight (percent when they sum to 100).
    Buckets are carved by cumulative ranges in declaration order, so
    ``{"train": 90, "val": 5, "test": 5}`` sends bucket 0-89 to train,
    90-94 to val, 95-99 to test. Zero shuffle — a projection over the scan,
    so at 100 TB this is parquet-scan speed and the assignment of any given
    key never changes when the corpus grows."""
    splits = dict(splits or {"train": 90, "val": 5, "test": 5})
    total = sum(splits.values())
    b = hash_bucket(F.col(key), total)
    expr = None
    edge = 0
    for label, weight in splits.items():
        edge += weight
        cond = b < F.lit(edge)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(bucket_col, b).withColumn(
        split_col, expr  # final when() covers bucket == total-1
    )


def split_bucket_sql(key_expr: str, n_buckets: int = 100) -> str:
    """DuckDB expression mirroring :func:`hash_bucket` bit-for-bit."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )


def cap_per_group(
    df: DataFrame,
    group: str,
    k: int,
    key: str,
    extra_order: Sequence[str] = (),
    rank_col: str = "rk",
    salt_by_group: bool = False,
) -> DataFrame:
    """Deterministically downsample each ``group`` to at most ``k`` rows —
    the over-represented-source cap in a corpus mix. Rows are ranked by
    (md5-hash of ``key``, key) so the kept subset is a stable pseudo-random
    sample, independent of partitioning.

    ``salt_by_group=True`` hashes ``(group, key)`` instead, so each group
    keeps an INDEPENDENT pseudo-random subset: with the default every
    capped group drops the same high-hash keys, which correlates the
    error across groups (fine for a corpus mix where groups share no
    keys; wrong for e.g. basket capping where under-counting the same
    items in every oversized basket biases specific itemsets to zero).

    Scale shape: ``row_number() <= k`` compiles to WindowGroupLimit
    (plan-asserted in tests/test_plans.py for the top-k family), so each
    map task keeps only k rows per group before the shuffle — the exchange
    carries O(groups × k), never the full corpus sort."""
    order = [F.asc(c) for c in (*extra_order,)] or []
    hashed = (
        F.concat_ws("\x1f", F.col(group).cast("string"),
                    F.col(key).cast("string"))
        if salt_by_group
        else F.col(key).cast("string")
    )
    w = Window.partitionBy(group).orderBy(
        _md5_base32(hashed).asc(), F.col(key).asc(), *order
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .where(F.col(rank_col) <= k)
    )


def filter_top_quantile(
    df: DataFrame,
    group: str,
    score: Column,
    num: int,
    den: int,
    tiebreak: str = "doc_id",
) -> DataFrame:
    """Keep the top num/den fraction of each group by ``score``, decided by
    EXACT rank arithmetic (den·rank ≤ num·count) — no float percentile
    estimation, so any SQL engine keeps the identical row set.

    Scale shape: rank and count windows share one hash exchange on
    ``group``; the per-group sort is the inherent cost of an exact
    quantile (it IS the order statistic). For approximate gating at
    extreme scale use ``approxQuantile`` thresholds instead; this operator
    is the exact-answer path.
    """
    w = Window.partitionBy(group).orderBy(
        score.desc(), F.col(tiebreak).asc()
    )
    cnt = Window.partitionBy(group)
    return (
        df.withColumn("_rk", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(cnt).cast("long"))
        .where(F.lit(den) * F.col("_rk") <= F.lit(num) * F.col("_n"))
        .drop("_rk", "_n")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    rates: Mapping[str, float],
    group_col: str = "source",
    n_buckets: int = 10000,
) -> DataFrame:
    """Deterministic per-group subsampling to target mixture rates — the
    "data mixing" step that downweights overrepresented sources before
    training. A row survives iff ``hash_bucket(key) < rate × n_buckets``
    for its group's rate (groups absent from ``rates`` keep everything).

    Deterministic by construction: the same key always makes the same
    keep/drop decision, so re-runs, backfills, and incremental batches
    agree without coordination — unlike ``df.sample`` whose outcome
    depends on partitioning. Zero shuffle: one hash + one comparison in
    the scan stage. Rates are quantized to 1/n_buckets (0.01% at the
    default), exact for the rational rates mixing configs use.
    """
    b = hash_bucket(F.col(key), n_buckets)
    thr = None
    for label, rate in rates.items():
        t = int(round(rate * n_buckets))
        cond = F.col(group_col) == label
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(n_buckets) if thr is None else thr.otherwise(F.lit(n_buckets))
    return df.where(b < thr)


def cap_tokens_per_group(
    df: DataFrame,
    key: str,
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group TOKEN-budget cap (the token-denominated sibling of
    :func:`cap_per_group`): within each group, documents are laid out in
    deterministic hash order (md5 bucket, then key) and kept while the
    running token total before them is under ``budget`` — so each group
    contributes ~budget tokens, with the straddling document included.
    This is how mixing configs are actually denominated (tokens, not doc
    counts).

    Deterministic under re-partitioning and corpus growth-at-the-tail
    (hash order is content-independent), and built on the two-pass
    partition-offset running total — no single-task global window."""
    from samba_spark.operators.packing import grouped_running_total
    from samba_spark.operators.textual import tokens_col

    base = df.withColumn(
        "_n_tokens", F.size(tokens_col(F.col(text_col))).cast("long")
    ).withColumn("_b", hash_bucket(F.col(key), 1 << 16))
    tot = grouped_running_total(
        base, group_col, ["_b", key], "_n_tokens", name="_tok_before"
    )
    return tot.where(F.col("_tok_before") < budget).drop(
        "_b", "_tok_before", "_n_tokens"
    )


def stratified_exact_split(
    df: DataFrame,
    key: str,
    strata: Sequence[str],
    train_pct: int = 80,
    split_col: str = "split",
) -> DataFrame:
    """EXACT-proportion stratified train/test split.

    :func:`assign_split` hits its ratios only in expectation (hash
    buckets); evaluation protocols often need them exact *per stratum* —
    every language/source contributes precisely ⌊pct·n⌋ training rows.
    Rows are ranked within each stratum by (md5(key), key) — a
    deterministic content-independent order — and the first
    ⌊train_pct·n/100⌋ become ``train``. Integer comparison
    ``100·rank ≤ train_pct·n`` keeps the boundary rounding-mode-free, so
    Spark and any SQL oracle agree bit-for-bit.

    One stratum-keyed shuffle shared by the rank and count windows (same
    partitioning ⇒ one exchange). Stratum cardinality is the skew axis: a
    stratum with billions of rows makes one window partition — for
    unbounded strata prefer the hash split; for bounded evaluation strata
    (languages, sources, label classes) this is the right tool.
    """
    order = [_md5_base32(F.col(key).cast("string")), F.col(key)]
    w = Window.partitionBy(*strata).orderBy(*order)
    cnt = Window.partitionBy(*strata)
    return (
        df.withColumn("_rk", F.row_number().over(w).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(cnt).cast("long"))
        .withColumn(
            split_col,
            F.when(
                F.lit(100) * F.col("_rk") <= F.lit(int(train_pct)) * F.col("_n"),
                F.lit("train"),
            ).otherwise(F.lit("test")),
        )
        .drop("_rk", "_n")
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled (α=0.5) mixture weights per source — the
    multilingual/multi-domain rebalancing rule (sample ∝ n^α, α<1 lifts
    small sources, α=1 is proportional): per group, its token count, an
    integer weight numerator isqrt(n_tokens) with the shared denominator
    Σ isqrt, the group's token allocation out of ``token_budget``, and
    its implied epoch count in basis points (how many times the source
    repeats to fill its allocation — the "seen n times" oversampling
    signal mixing configs watch).

    α is pinned to 0.5 so the weights stay ENGINE-EXACT: IEEE requires
    sqrt to be correctly rounded (pow(x, 0.7) is not), and
    floor(sqrt(n)) for n ≪ 2^52 is therefore the same integer in every
    engine — all downstream arithmetic is integer division on exact
    integers, which is what lets the oracle replay the allocation
    bit-for-bit. One hash aggregation + one broadcast of the (tiny)
    per-group table back over itself for the denominator — O(groups)
    everywhere after the first agg."""
    from samba_spark.operators.textual import tokens_col

    toks = F.size(tokens_col(F.col(text_col))).cast("long")
    per = (
        df.select(F.col(group_col).alias("source"), toks.alias("_t"))
        .groupBy("source")
        .agg(F.sum("_t").cast("long").alias("n_tokens"))
        # a source whose documents are all empty carries no tokens and no
        # weight — dropped explicitly (isqrt(0)=0 would zero its
        # allocation anyway, but epochs_bp would divide by zero: NULL in
        # Spark, a hard error in the oracle)
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "w_num", F.floor(F.sqrt(F.col("n_tokens"))).cast("long")
        )
    )
    den = per.agg(F.sum("w_num").cast("long").alias("w_den"))
    out = per.crossJoin(F.broadcast(den))
    alloc = F.expr(f"({int(token_budget)} * w_num) div w_den")
    return out.select(
        "source",
        "n_tokens",
        "w_num",
        "w_den",
        alloc.cast("long").alias("alloc_tokens"),
        F.expr(
            f"(10000 * (({int(token_budget)} * w_num) div w_den)) div n_tokens"
        )
        .cast("long")
        .alias("epochs_bp"),
    )


def mixture_plan(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Exact token-budget apportionment over temperature weights — the
    planning step :func:`temperature_mixture` stops short of: its floor
    allocation silently loses up to (sources−1) tokens of the budget.
    This applies the Hamilton largest-remainder method so the per-source
    targets sum EXACTLY to ``token_budget``: every source gets
    ``floor(B·w/Σw)``, and the ``B − Σfloor`` leftover tokens go one
    each to the sources with the largest remainders (ties to the
    lexicographically smallest source — fully deterministic).

    Also emits the two numbers a training-data config actually consumes:
    ``epochs`` (integer ceiling — how many passes of the source fill its
    target) and ``rate`` (the oversampling factor, rounded).

    All apportionment arithmetic is exact integers (α is pinned to 0.5
    for the same isqrt engine-exactness reason as x130; int64 bound:
    ``token_budget · isqrt(max n_tokens) < 2⁶³``). Returns (source,
    n_tokens, w_num, target_tokens, epochs, rate) ordered by source;
    Σ target_tokens == token_budget by construction (test-pinned).

    Scale posture: one data-bearing hash aggregation (per-source token
    counts); everything after runs on the O(sources) metadata table —
    the x130 broadcast-denominator family, including its documented
    1-row crossJoins and the rank window over the tiny per-source table.
    """
    if token_budget < 0:
        raise ValueError(
            f"mixture_plan: token_budget={token_budget} must be >= 0"
        )
    from samba_spark.operators.textual import tokens_col

    toks = F.size(tokens_col(F.col(text_col))).cast("long")
    per = (
        df.select(F.col(group_col).alias("source"), toks.alias("_t"))
        .groupBy("source")
        .agg(F.sum("_t").cast("long").alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
        .withColumn("w_num", F.floor(F.sqrt(F.col("n_tokens"))).cast("long"))
    )
    den = per.agg(F.sum("w_num").cast("long").alias("w_den"))
    j = (
        per.crossJoin(F.broadcast(den))
        .withColumn("base", F.expr(f"({int(token_budget)} * w_num) div w_den"))
        .withColumn("rem", F.expr(f"({int(token_budget)} * w_num) % w_den"))
    )
    tot = j.agg(F.sum("base").cast("long").alias("tot_base"))
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    ranked = j.crossJoin(F.broadcast(tot)).withColumn(
        "rk", F.row_number().over(w).cast("long")
    )
    target = F.col("base") + F.when(
        F.col("rk") <= F.lit(int(token_budget)) - F.col("tot_base"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ranked.withColumn("target_tokens", target.cast("long"))
        .select(
            "source",
            "n_tokens",
            "w_num",
            "target_tokens",
            # integer ceiling — exact, no float division boundary
            F.expr("(target_tokens + n_tokens - 1) div n_tokens")
            .cast("long")
            .alias("epochs"),
            F.round(
                F.col("target_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("rate"),
        )
        .orderBy("source")
    )
