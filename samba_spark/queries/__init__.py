"""Declared query surface (SURVEY.md §2.3/§2.4, FIXTURES.md).

``ALL_QUERIES`` maps query name → QuerySpec(spark_fn, oracle_sql). The
spark_fn is idiomatic DataFrame code (the operator under test); oracle_sql
is the ANSI-SQL equivalent DuckDB runs on the same parquet for the
correctness gate.

Ordering contract: the driver's correctness artifact records the FIRST 50
entries, so ``ALL_QUERIES`` lists the 50 queries that need a hard driver
signal first (all of DECLARED, the non-redundant EXTRAS, line-mode pipe,
and extension operators x1–x13), and ``AUX_QUERIES`` last. Every AUX entry
is either redundant with an in-window query (q33 cube ≡ q7 grouping-sets
family, q44 stream-dedup ≡ q31+distinct), rows-only by design (q29 HLL,
q30 sampling, x14 estimator-trained IVF), or was already driver-green in
round 1 (q27, q28, q34, q36–q38 — see CORRECTNESS_r01.json); all of them
stay under the local DuckDB parity harness in tests/test_declared_queries.
"""

from samba_spark.queries.declared import DECLARED, QuerySpec
from samba_spark.queries.extensions import EXTENSIONS
from samba_spark.queries.extras import EXTRAS

_AUX_NAMES = [
    "q27_cogroup",
    "q28_zip",
    "q29_approx_count_distinct",
    "q30_sample_by",
    "q33_cube",
    "q34_global_agg",
    "q36_pivot",
    "q37_percentiles",
    "q38_string_agg",
    "q44_stream_dedup",
    "x14_ivf_topk",
    # round-2 additions: oracle-checked locally (tests/test_declared_queries
    # runs every oracle-bearing AUX entry); the 50-slot driver window was
    # already allocated to operators that had no hard signal in round 1.
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
    "q48_tpch_q1",
    "q49_tpch_q6",
    "q50_tpch_q3",
    "x32_weighted_sample",
    "x33_collocations",
    "x34_corpus_diff",
    "q51_stream_static_join",
    "x35_repeated_spans",
    "x36_token_budget_cap",
    "x37_norm_stats",
    "x38_search_topk",
    "x39_skew_profile",
    "q52_integrity_audit",
    "x40_funnel",
    "x41_retention_cohorts",
    "x42_wav_roundtrip",
    "x43_png_roundtrip",
]

_FULL = {**DECLARED, **EXTRAS, **EXTENSIONS}

CONTRACT_QUERIES = {k: v for k, v in _FULL.items() if k not in _AUX_NAMES}
AUX_QUERIES = {k: _FULL[k] for k in _AUX_NAMES}

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
