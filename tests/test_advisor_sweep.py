"""Advisor-in-CI (VERDICT r5 item 8): sweep plans/advisor.advise() over
EVERY declared query's plan at sf0.001 and fail on any finding not in
the documented-legitimate allowlist below (SCALE.md "Standing
self-audit"). A new query (or a regression in an old one) that plans a
cartesian product, a single-partition exchange, or a row-at-a-time
Python UDF now fails the suite instead of waiting for the per-round
manual sweep.

Allowlist semantics: name -> set of rules that are DOCUMENTED as
legitimate for that query. Every entry is one of the adjudicated
families from SCALE.md:

* ``cartesian``        — the declared q11 cross join; 1-row broadcast
  aggregates (scalar-subquery thresholds / corpus totals: q20, q42,
  q52, q54, q72, x25, x38, x39, x75, x93, x97, x99); brute-force
  scoring against a broadcast ≤5-row query set (x10); the group-pairs
  self-join over the DISTINCT GROUP LIST in x123's KMV set algebra
  (#event-types rows, metadata scale — the sketch replaced the data);
  x130's 1-row weight-denominator broadcast over the per-source table.
* ``single_partition`` — global single-row final aggregates and
  metadata-sized offset/carry ladders (#partitions / #buckets / #days
  rows, never data): q28, q34, q49, q54, q57, q68–q70, q72, x38–x40,
  x45, x59, x63, x65, x66, x75, x93, x96, x97, x99, x100, x115, x117,
  q20, q52, x25.
* ``python_row_udf``   — x72 only: the UDTF-surface query whose whole
  point is pinning the deliberate slow path.
"""

from __future__ import annotations



ALLOWED: dict[str, set[str]] = {
    "q11_cross_join": {"cartesian"},
    "q20_scalar_subquery": {"cartesian", "single_partition"},
    "q28_zip": {"single_partition"},
    "q34_global_agg": {"single_partition"},
    "q42_salted_join": {"cartesian"},
    "q49_tpch_q6": {"single_partition"},
    "q52_integrity_audit": {"cartesian", "single_partition"},
    "q54_skew_window": {"cartesian", "single_partition"},
    "q57_tpch_q14": {"single_partition"},
    "q68_tpch_q15": {"single_partition"},
    "q69_tpch_q17": {"single_partition"},
    "q70_tpch_q19": {"single_partition"},
    "q72_tpch_q22": {"cartesian", "single_partition"},
    "x10_cosine_topk": {"cartesian"},
    "x25_salient_terms": {"cartesian", "single_partition"},
    "x38_search_topk": {"cartesian", "single_partition"},
    "x39_skew_profile": {"cartesian", "single_partition"},
    "x40_funnel": {"single_partition"},
    "x45_deep_funnel": {"single_partition"},
    "x59_concurrency": {"single_partition"},
    "x63_avro_roundtrip": {"single_partition"},
    "x65_covariance_matrix": {"single_partition"},
    "x66_quality_audit": {"single_partition"},
    "x72_udtf_leading_tokens": {"python_row_udf"},
    "x75_bpe_merge_round": {"cartesian", "single_partition"},
    "x93_lm_fluency": {"cartesian", "single_partition"},
    "x96_fd_profile": {"single_partition"},
    "x97_join_size_estimate": {"cartesian", "single_partition"},
    "x99_hybrid_rrf": {"cartesian", "single_partition"},
    "x100_table_profile": {"single_partition"},
    "x115_skyline": {"single_partition"},
    "x117_table_profile_approx": {"single_partition"},
    "x123_kmv_set_ops": {"cartesian"},
    # one 1-row final aggregate per inclusion-dependency candidate (the
    # global-aggregate family; inputs are NDV-reduced key sets)
    "x127_inclusion_profile": {"single_partition"},
    # the 1-row isqrt-weight denominator broadcast back over the
    # O(#sources) per-group table (scalar-subquery family)
    "x130_temperature_mixture": {"cartesian", "single_partition"},
    # the grand-total window over the CELLS table (|A|×|B| rows — 15 at
    # any SF; the data-bearing stage is the groupBy before it)
    "x131_chi_square_screen": {"single_partition"},
    # brute scoring against the broadcast ≤5-row query-code set (the x10
    # family) — SQ8 corpus codes are the big side, queries broadcast
    "x134_int8_ann": {"cartesian"},
    # ADC scoring against the broadcast ≤5-row query set (the x10
    # family) — PQ corpus codes are the big side, queries broadcast
    "x136_pq_ann": {"cartesian"},
    # stage-1 prefix scoring against the broadcast ≤5-row query set
    # (x10 family); stage 2 runs on the shortlist only
    "x139_truncated_rerank": {"cartesian"},
    # composes two x10-family broadcast-query scorers (exact truth arm
    # + two-stage results arm); the metric joins are O(queries × k)
    "x140_retrieval_metrics": {"cartesian", "single_partition"},
    # stage-1 JL-projected scoring against the broadcast ≤5-row query
    # set (x10 family); stage 2 runs on the shortlist only
    "x144_random_projection": {"cartesian"},
    # the x65-family 1-row global scatter aggregate (the only shuffle;
    # the eigen-iteration runs on the driver over that metadata row)
    "x147_pca_power": {"single_partition"},
    # metric aggregates over the k×|labels| contingency table (the x131
    # cells-table family): 1-row final aggregates crossJoined together
    "x150_clustering_metrics": {"cartesian", "single_partition"},
    # the x130 broadcast-denominator family plus the largest-remainder
    # rank window over the O(sources) per-group table
    "x151_mixture_plan": {"cartesian", "single_partition"},
    # zip_with_index's prefix-sum window over #partitions rows (the q28
    # two-pass offset family — data rows never pass through it) plus
    # the broadcast 1-row N denominator (the x130 scalar family)
    "x153_quantile_normalize": {"cartesian", "single_partition"},
    # the broadcast 1-row edge-count m (the x130 scalar family); the
    # LPA rounds feeding it localCheckpoint, so their aggregates are
    # metadata-side by the time the metric plan is analyzed
    "x154_modularity": {"cartesian", "single_partition"},
}


def test_advisor_sweep_no_new_findings(spark, sf_smoke):
    from samba_spark.plans.advisor import advise
    from samba_spark.queries import ALL_QUERIES

    violations: list[str] = []
    errors: list[str] = []
    for name, spec in ALL_QUERIES.items():
        try:
            findings = advise(spec.fn(spark, sf_smoke))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        allowed = ALLOWED.get(name, set())
        for f in findings:
            if f.rule not in allowed:
                violations.append(f"{name}: {f.rule} — {f.evidence[:160]}")
    assert not errors, "\n".join(errors)
    assert not violations, (
        "NEW undocumented plan hazards (adjudicate: fix the plan, or if "
        "the shape is legitimate, document it in SCALE.md AND add it to "
        "ALLOWED):\n" + "\n".join(violations)
    )
