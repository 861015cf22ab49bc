"""Declared query surface (SURVEY.md §2.3/§2.4, FIXTURES.md).

``ALL_QUERIES`` maps query name → QuerySpec(spark_fn, oracle_sql). The
spark_fn is idiomatic DataFrame code (the operator under test); oracle_sql
is the ANSI-SQL equivalent DuckDB runs on the same parquet for the
correctness gate.

Ordering contract: the driver's correctness artifact records the FIRST 50
entries of ``ALL_QUERIES``. Round-3 rotation (VERDICT r2 item 2): queries
that were driver-green in rounds 1–2 move to ``AUX_QUERIES``; a 5-query
sentinel core stays in-window (prov contract q24, fixed-oracle q39, perf
canaries q41/q43/x3 — the twice-green family representatives
q7/q9/q14/q21/q23/q25/q31/q47 rotated out to maximize first-time rows);
the freed 45 slots hold every previously never-driver-checked query
(x14–x43, q48–q62). Every AUX entry remains under the local DuckDB parity
harness in tests/test_declared_queries.py, which runs ALL oracle-bearing
queries regardless of window position.

Round-4 rotation (VERDICT r3 item 1): every round-3 rotated-in entry came
back green in CORRECTNESS_r03 (45 green + q24/x14 rows-only by design), so
all 45 moved to ``AUX_QUERIES``; the freed slots now hold 45 of the 67
never-driver-checked round-3 additions, prioritized per the verdict:
streaming state (q73/q78/q83/q84/q85), codecs (x44/x63/x73/x74), the
Spark-4 surface (x70/x83–x86, q77/q79–q82), TPC-H completion (q63–q72),
the r3 sketch family (x80–x82/x87), and the highest-risk remaining ops
(x48/x49/x53/x55/x60/x65/x71/x72/x75/x77/x79, q75).

Round-5 rotation (VERDICT r4 item 1): the round-4 window came back
50/50 green (49 full + q24 rows-only by design), so all 45 rotated-in
entries moved to ``AUX_QUERIES``; the freed slots hold 45 of the
62-query backlog, oldest-first per the verdict: every round-2/3
residual (x45–x47, x50–x52, x54, x56–x59, x61, x62, x64, x66–x69,
x76, x78, q74, q76 — 22 entries) then the highest-risk round-4
additions (multimodal dedup x88–x92, mining/profiling
x95/x96/x100/x107, graph x105/x114, events x108–x110, dedup
x111–x113, q87–q92 — 23 entries).

Round-6 rotation backlog (the 21 residual never-driver-checked
queries): x93, x94, x97–x99, x101–x104, x106, x115, x116, q93–q97,
plus the round-5 additions x117 (approx table profile), x118 (bitmap
sliding distinct), x119 (canonical-URL dedup), and x120 (native XML
round-trip). All 21 fit one window; every query stays under the local DuckDB parity harness
(tools/parity_sweep.py + tests) in every round regardless of window
position.
"""

from samba_spark.queries.declared import DECLARED, QuerySpec
from samba_spark.queries.extensions import EXTENSIONS
from samba_spark.queries.extras import EXTRAS
from samba_spark.queries.modern import MODERN
from samba_spark.queries.patterns import PATTERNS
from samba_spark.queries.tpch import TPCH

# Sentinel core: kept in-window as regression canaries across rounds.
# Trimmed to 5 this round (q7/q9/q14/q21/q23/q25/q31/q47 have been
# driver-green twice; the local DuckDB parity harness still runs them every
# round) so the freed slots go to queries that have NEVER had a driver row.
_SENTINELS = [
    "q24_provenance_lineage",  # provenance contract (rows-only by design)
    "q39_training_pipeline",   # pipeline composition (oracle cast fixed r3)
    "q41_pagerank",            # graph family + perf canary
    "q43_stream_join",         # stream-stream join + perf canary
    "x3_minhash_lsh_dedup",    # dedup family + perf canary
]

# Round-5 rotation: 45 slots, every entry below has NEVER had a driver
# row. Priority order follows VERDICT r4 item 1: the oldest residuals
# (rounds 2–3) first, then the highest-risk round-4 additions.
_ROTATED_IN = [
    # round-2/3 residuals (oldest never-driver-checked first)
    "x45_deep_funnel",
    "x46_retention_monthly",
    "x47_trailing_window",
    "x50_quantization_stats",
    "x51_time_rollup",
    "x52_filtered_topk",
    "x54_binned_quantiles",
    "x56_attribution",
    "x57_inverted_index",
    "x58_anomaly",
    "x59_concurrency",
    "x61_transition_matrix",
    "x62_trend_slope",
    "x64_zorder_stats",
    "x66_quality_audit",
    "x67_edit_distance",
    "x68_brand_cooccurrence",
    "x69_gap_fill",
    "x76_corpus_report",
    "x78_sequence_pattern",
    "q74_point_in_time",
    "q76_unpivot",
    # multimodal dedup (round-4 additions, highest-risk first)
    "x88_semantic_prune",
    "x89_phash_dedup",
    "x90_audio_fp_dedup",
    "x91_approx_percentile",
    "x92_frame_sample",
    # mining / profiling
    "x95_frequent_itemsets",
    "x96_fd_profile",
    "x100_table_profile",
    "x107_linear_model",
    # graph
    "x105_lpa_communities",
    "x114_personalized_pagerank",
    # event analytics
    "x108_changepoint",
    "x109_winsorize",
    "x110_sliding_distinct",
    # dedup at scale
    "x111_incremental_lsh",
    "x112_containment",
    "x113_feature_hashing",
    # modern SQL / time series
    "q87_parameterized_sql",
    "q88_shortest_paths",
    "q89_delta_join",
    "q90_interpolate_daily",
    "q91_stream_full_outer_join",
    "q92_twap",
]

_WINDOW_NAMES = _SENTINELS + _ROTATED_IN

_FULL = {**DECLARED, **EXTRAS, **EXTENSIONS, **TPCH, **MODERN, **PATTERNS}

CONTRACT_QUERIES = {k: _FULL[k] for k in _WINDOW_NAMES}
AUX_QUERIES = {k: v for k, v in _FULL.items() if k not in CONTRACT_QUERIES}

ALL_QUERIES = {**CONTRACT_QUERIES, **AUX_QUERIES}

__all__ = [
    "DECLARED",
    "EXTRAS",
    "EXTENSIONS",
    "CONTRACT_QUERIES",
    "AUX_QUERIES",
    "ALL_QUERIES",
    "QuerySpec",
]
