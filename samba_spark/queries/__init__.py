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

Round-4 rotation backlog: queries ADDED after the window was pinned
(x44–x87, q63–q85) have no driver row yet — they are the candidates for
the next rotation, swapping out whichever rotated-in entries come back
green in CORRECTNESS_r03.
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

# Never driver-checked before round 3: every one of these gets a hard row.
_ROTATED_IN = [
    "x14_ivf_topk",
    "x15_sequence_pack",
    "x16_decontaminate",
    "x17_top_terms",
    "x18_repetition",
    "x19_hash_split",
    "x20_source_cap",
    "x21_label_centroids",
    "x22_sessionize",
    "x23_json_extract",
    "x24_redact",
    "x25_salient_terms",
    "x26_quantile_filter",
    "x27_dedup_incremental",
    "x28_length_histogram",
    "x29_chunk_documents",
    "x30_merge_upsert",
    "x31_cross_source_overlap",
    "x32_weighted_sample",
    "x33_collocations",
    "x34_corpus_diff",
    "x35_repeated_spans",
    "x36_token_budget_cap",
    "x37_norm_stats",
    "x38_search_topk",
    "x39_skew_profile",
    "x40_funnel",
    "x41_retention_cohorts",
    "x42_wav_roundtrip",
    "x43_png_roundtrip",
    "q48_tpch_q1",
    "q49_tpch_q6",
    "q50_tpch_q3",
    "q51_stream_static_join",
    "q52_integrity_audit",
    "q53_provenance_counts",
    "q54_skew_window",
    "q55_asof_forward",
    "q56_tpch_q18",
    "q57_tpch_q14",
    "q58_tpch_q5",
    "q59_transitive_lineage",
    "q60_tpch_q10",
    "q61_tpch_q16",
    "q62_column_lineage",
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
