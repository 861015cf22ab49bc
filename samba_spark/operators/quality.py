"""Declarative data-quality audit — expectation checks as ONE aggregation
pass over the table.

A 100 TB ingest gate cannot afford one scan per rule; here every check is
a conditional partial aggregate (violation predicate → SUM of 0/1), so N
rules cost exactly one scan + one 1-row global aggregate regardless of N.
Key-uniqueness is the one rule that inherently needs more than row-local
state — it rides the same pass as a COUNT vs COUNT DISTINCT pair
(Catalyst's expand rewrite, still a single job).

The reference has no data-validation surface; this is north-star utility
for the training-data pipeline (gate a corpus drop before it poisons a
run), kept engine-exact: all outputs are integer counts.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quality_audit(df: DataFrame, checks: Mapping[str, Column]) -> DataFrame:
    """One row per check: (check_name, n_violations, n_rows, passed).
    ``checks`` maps check name → VIOLATION predicate (TRUE = bad row).
    Single scan, single 1-row aggregate; results explode driver-free."""
    names = list(checks)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for name in names:
        aggs.append(
            F.sum(
                F.when(checks[name], F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"_v_{len(aggs)}")
        )
    row = df.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(f"_v_{i + 1}").alias("nv"),
            )
            for i, name in enumerate(names)
        ]
    )
    return row.select(F.col("_n"), F.explode(cells).alias("c")).select(
        F.col("c.check_name").alias("check_name"),
        F.col("c.nv").alias("n_violations"),
        F.col("_n").alias("n_rows"),
        (F.col("c.nv") == 0).alias("passed"),
    )


def fd_profile(
    df: DataFrame, fds: Mapping[str, tuple[list[str], str]]
) -> DataFrame:
    """Functional-dependency check: does LHS → RHS hold, and how badly
    does it fail? ``fds`` maps a display name → ([lhs_cols], rhs_col).
    One row per FD: (fd, n_groups, violating_groups, max_rhs_distinct,
    holds). A group violates when one LHS value maps to >1 distinct RHS
    value; ``holds`` iff no group violates.

    Scale posture: each FD is one groupBy on its LHS (shuffle keyed on
    the dependency's own determinant — the natural partitioning) with a
    count_distinct partial, then a 1-row rollup; FDs over the SAME frame
    still run as independent aggregations because their grouping keys
    differ (no shared-scan trick exists for heterogeneous keys — this is
    the aggregation-shape floor, not an implementation choice). Profiler
    output is aggregation-sized: one row per candidate FD.

    Complements quality_audit (row-local predicates) and key_uniqueness
    (whole-row keys): FDs are the discovery tool schema normalization
    and dedup-key design start from.
    """
    if not fds:
        raise ValueError("fd_profile requires at least one FD")
    parts = []
    for name, (lhs, rhs) in fds.items():
        g = df.groupBy(*[F.col(c) for c in lhs]).agg(
            F.count_distinct(F.col(rhs)).alias("nd")
        )
        parts.append(
            g.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("violating_groups"),
                F.max("nd").cast("long").alias("max_rhs_distinct"),
            ).select(
                "*", (F.col("violating_groups") == 0).alias("holds")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def key_uniqueness(df: DataFrame, *cols: str) -> DataFrame:
    """(n_rows, n_distinct, n_duplicates) for a candidate key — COUNT vs
    COUNT DISTINCT in one aggregate (expand rewrite, one job)."""
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(*[F.col(c) for c in cols])
        .cast("long")
        .alias("n_distinct"),
    ).select(
        "n_rows",
        "n_distinct",
        (F.col("n_rows") - F.col("n_distinct")).cast("long").alias("n_duplicates"),
    )


def table_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """ANALYZE-style column statistics in one job: per column,
    (column, n_rows, n_distinct, n_null) — the NDV/null-count statistics
    a cost-based optimizer (and x97's sketch estimator) consumes.

    Cost model — choose the mode by table width:

    - ``exact=True``: N ``count_distinct``s in one aggregate go through
      Catalyst's **Expand rewrite** — an N-fold row expansion into the
      partial aggregate and a shuffle keyed by (column, value). Exact
      by contract, but the scan multiplies by the column count: right
      as a maintenance-window tool on narrow tables, wrong for wide
      tables at scale (it is why the exact mode scales ~4.5×/decade).
    - ``exact=False``: HyperLogLog++ (``approx_count_distinct``, default
      ``rsd=0.05``) per column — partial-aggregable sketches, NO expand,
      no per-value shuffle: one scan, one 1-row exchange of N sketch
      registers. The 100 TB / wide-table mode; same machinery as the
      x80 HLL rollup family. NDVs are estimates (±rsd relative error);
      n_rows/n_null stay exact in both modes.

    The 1-row result explodes into per-column rows without touching the
    driver."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        nd = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs.append(nd.cast("long").alias(f"_nd_{i}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"_nn_{i}")
        )
    row = df.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_nd_{i}").alias("nd"),
                F.col(f"_nn_{i}").alias("nn"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.col("_n"), F.explode(cells).alias("c")).select(
        F.col("c.column").alias("column"),
        F.col("_n").alias("n_rows"),
        F.col("c.nd").alias("n_distinct"),
        F.col("c.nn").alias("n_null"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier set: one
    row per equivalence class (the distinct combination of quasi-
    identifier values) with its size, the number of distinct sensitive
    values it carries (l-diversity), and an ``at_risk`` flag for classes
    smaller than ``k`` — the re-identification exposure report a
    training-data release gate runs before publishing user-derived
    records.

    One hash aggregation keyed by the quasi columns; output is
    O(equivalence classes), never O(rows), and the distinct-sensitive
    count rides the same pass (Catalyst expand rewrite), so the whole
    audit is a single scan at any scale. The reference has no privacy
    surface; north-star governance utility.
    """
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.countDistinct(sensitive_col).cast("long").alias("l_diversity"),
        (F.count(F.lit(1)) < F.lit(k)).alias("at_risk"),
    )


def benford_profile(
    df: DataFrame, col: str, group_col: "str | None" = None
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic anomaly screen for amount columns (fabricated or
    re-binned monetary data drifts off the log curve long before any
    per-row rule fires). Returns per (group,) digit 1–9: ``n`` (exact
    count), ``pct_e6`` (observed share, parts-per-million — exact
    integer arithmetic: 1e6·n/total truncated), and ``benford_e6``
    (the expected log10(1+1/d) share in ppm, a constant literal both
    engines share). Deviation scoring (chi-square, MAD) is a trivial
    consumer-side fold over the 9 rows.

    First digit via string form of the absolute value — engine-exact
    for integers and exact-decimal inputs; one hash aggregate keyed by
    (group, digit), map-side combinable, O(groups × 9) output.

    Domain: values whose magnitude rounds to zero at scale 6 (|v| <
    5e-7) or overflows DECIMAL(38,6) extract NO digit and are excluded
    like exact zeros (the digit filter below — without it they'd pool
    into a NULL-digit row and skew every real digit's share). pct_e6
    uses integral DIV, exact up to 2^63/1e6 ≈ 9.2e12 rows per group."""
    d = F.substring(
        F.regexp_replace(
            F.abs(F.col(col)).try_cast("decimal(38,6)").cast("string"),
            r"[0.]*",
            "",
        ),
        1,
        1,
    ).try_cast("int")  # '' (|v| rounds to 0 at scale 6) -> NULL, filtered
    keys = ([F.col(group_col).alias("grp")] if group_col else []) + [
        d.alias("digit")
    ]
    grouped = (
        df.where(F.abs(F.col(col)) > 0)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("digit").isNotNull())
    )
    tot_keys = ["grp"] if group_col else []
    w = (
        F.sum("n").over(Window.partitionBy(*tot_keys))
        if tot_keys
        else F.sum("n").over(Window.partitionBy())
    )
    import math

    benford = F.create_map(
        *[
            x
            for dd in range(1, 10)
            for x in (
                F.lit(dd),
                F.lit(int(math.log10(1 + 1 / dd) * 1_000_000)),
            )
        ]
    )
    return (
        grouped.withColumn("_total", w)
        .select(
            *(["grp"] if group_col else []),
            "digit",
            "n",
            # integral DIV, not float division + floor: the documented
            # "exact truncated ratio" contract must survive groups past
            # 2^53/1e6 rows where double division starts rounding
            F.expr("(1000000 * n) DIV _total").cast("long").alias("pct_e6"),
            benford[F.col("digit")].cast("long").alias("benford_e6"),
        )
    )


def inclusion_coefficient(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: "str | None" = None,
) -> DataFrame:
    """Inclusion-dependency strength of one candidate foreign key: the
    fraction of the child column's DISTINCT non-null values present in
    the parent column — 1.0 means child ⊆ parent (an FK candidate),
    anything lower quantifies referential breakage. With x96's FD
    profile this completes the two classic schema-discovery profiles
    (functional + inclusion dependencies) a lakehouse catalog mines.

    One row ``(dependency, n_child_distinct, n_contained, coeff_e6)``;
    coeff in exact ppm (integral DIV, like benford_profile). Plan:
    both sides reduce to their distinct key sets FIRST (map-side
    combine), the containment test is ONE left join carrying a hit
    flag, and both counts come out of a single final aggregate — no
    scalar-subquery cross join. At 100 TB the distincts are the only
    data-scale passes; the join runs at NDV scale."""
    c = (
        child.select(F.col(child_col).alias("_k"))
        .where(F.col("_k").isNotNull())
        .distinct()
    )
    p = (
        parent.select(F.col(parent_col).alias("_k"))
        .where(F.col("_k").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    label = name or f"{child_col}->{parent_col}"
    return (
        c.join(p, "_k", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_child_distinct"),
            # coalesce the OUTER sum too: over zero rows SUM is NULL,
            # but the contract (and the x127 oracle's COUNT FILTER) is 0
            F.coalesce(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))), F.lit(0)
            )
            .cast("long")
            .alias("n_contained"),
        )
        .select(
            F.lit(label).alias("dependency"),
            "n_child_distinct",
            "n_contained",
            F.expr(
                "CASE WHEN n_child_distinct = 0 THEN NULL "
                "ELSE (1000000 * n_contained) DIV n_child_distinct END"
            )
            .cast("long")
            .alias("coeff_e6"),
        )
    )


def chi_square_screen(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Per-cell chi-square contribution table for the (``col_a`` ×
    ``col_b``) contingency — the categorical-association screen: which
    cells of the cross-tab depart most from independence (o vs
    e = row_total·col_total/N). Drift detection between a categorical
    label and a suspected confounder (source × language, split ×
    quality-bucket) reads the top contributors, not a single summary
    statistic — per-cell rows also keep the output engine-exact, with
    no cross-cell float summation whose order an engine could pick
    differently.

    Output: (a, b, observed, expected_milli, contrib) where
    expected_milli = floor(1000·rt·ct / N) (integer-exact, computed as
    the overflow-safe decomposition q·ct + (r·ct) div N with
    q = (1000·rt) div N, r = (1000·rt) mod N — every intermediate stays
    under N², i.e. BIGINT-safe to ~3e9 rows) and contrib =
    round((o·N − rt·ct)² / (N·rt·ct), 6) — the ×N-scaled cell term of
    χ² = Σ (o−e)²/e. The difference (o·N − rt·ct) is an exact BIGINT
    (bounded by N²); its square and the denominator are computed in
    DOUBLE factor-by-factor (a 64-bit n·rt·ct product would silently
    wrap past ~2M rows with heavy margins) with the same operand order
    in both engines, so round(·, 6) matches bit-for-bit. One groupBy
    over the table, then O(cells) windows — the data-bearing stage is a
    single hash aggregation."""
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    w_a = Window.partitionBy("a")
    w_b = Window.partitionBy("b")
    w_all = Window.partitionBy()
    t = (
        cells.withColumn("rt", F.sum("observed").over(w_a).cast("long"))
        .withColumn("ct", F.sum("observed").over(w_b).cast("long"))
        .withColumn("n", F.sum("observed").over(w_all).cast("long"))
    )
    diff = (F.col("observed") * F.col("n") - F.col("rt") * F.col("ct")).cast(
        "long"
    )
    contrib = F.round(
        (diff.cast("double") * diff.cast("double"))
        / (
            F.col("n").cast("double")
            * F.col("rt").cast("double")
            * F.col("ct").cast("double")
        ),
        6,
    )
    return t.select(
        "a",
        "b",
        "observed",
        F.expr(
            "((1000 * rt) div n) * ct + (((1000 * rt) % n) * ct) div n"
        )
        .cast("long")
        .alias("expected_milli"),
        contrib.alias("contrib"),
    )


def quantile_normalize(
    df: DataFrame,
    score: Column,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source score calibration by quantile normalization: replace
    each document's raw score with the GLOBAL score at the same
    within-source quantile, so one global threshold means the same
    thing for every source. Per-source quality scores are not
    comparable raw — a source whose scorer runs hot would dominate any
    global cut; rank-based remapping is the standard fix before x26-
    style quantile gates are applied globally.

    Exact nearest-rank contract (all integer arithmetic): a document at
    within-source rank r of n_s (ascending score, ties by id) is mapped
    to the global value at sorted index ``ceil(r·N/n_s) − 1``. Scores
    must be integer-typed so rank arithmetic and the mapped values are
    engine-exact. The rank product r·N bounds the corpus at
    N < isqrt(2⁶³) ≈ 3.04·10⁹ rows — past that the int64 arithmetic
    (and the DuckDB oracle's) would overflow, so a plan-folded guard
    raises loudly instead (the kmeans 2⁵³ precedent).

    Scale posture: the within-source rank is a window partitioned by
    source (parallel); the global order comes from
    :func:`relational.zip_with_index` — range-partition + two-pass
    offsets, NO single-partition window anywhere (a bare
    ``Window.orderBy`` funnels 100 TB through one task); N rides the
    plan as a broadcast 1-row aggregate (the x130 denominator pattern —
    no extra driver-side scan); the final mapping is an equi-join on
    the target index. Three shuffles, all keyed and parallel.
    """
    from samba_spark.operators.guards import plan_assert
    from samba_spark.operators.relational import zip_with_index

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        score.cast("long").alias("_s"),
    )
    w = Window.partitionBy("_g").orderBy("_s", "_id")
    ranked = base.withColumn("_r", F.row_number().over(w).cast("long"))
    sizes = base.groupBy("_g").agg(F.count("*").alias("_n"))
    tot = base.agg(F.count("*").alias("_nt"))
    g = zip_with_index(
        base.select(F.col("_s").alias("_gs"), F.col("_id").alias("_gid")),
        ["_gs", "_gid"],
        "_gidx",
    ).select("_gidx", "_gs")
    target = (
        ranked.join(F.broadcast(sizes), "_g")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_nt",
            plan_assert(
                F.col("_nt"),
                F.col("_nt") > F.lit(3_037_000_499),
                "quantile_normalize: corpus has ",
                F.col("_nt").cast("string"),
                " rows — past isqrt(2^63) the r*N rank arithmetic "
                "overflows int64",
            ),
        )
        .withColumn(
            "_tidx",
            (F.expr("(_r * _nt + _n - 1) div _n") - F.lit(1)).cast("long"),
        )
    )
    return (
        target.join(g, target["_tidx"] == g["_gidx"])
        .select(
            F.col("_id").alias(id_col),
            F.col("_g").alias(group_col),
            F.col("_s").alias("raw_score"),
            F.col("_r").alias("src_rank"),
            F.col("_gs").alias("calibrated_score"),
        )
        .orderBy(id_col)
    )
