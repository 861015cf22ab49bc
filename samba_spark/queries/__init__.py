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

Round-5 rotation backlog (the 62 residual never-driver-checked queries —
27 from rounds 3–4 plus the 35 round-4 additions x93–x116/q88–q97 — to
rotate in once the round-4 window comes back green): x45–x47, x50–x52,
x54, x56–x59, x61, x62, x64, x66–x69, x76, x78, x88–x116, q74, q76,
q87–q97. That is 62 entries for 45 free slots: round 5 rotates in 45
(prioritizing the oldest never-checked entries), round 6 retires the
last 17; every query stays under the local DuckDB parity harness
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

# Round-4 rotation: 45 slots, every entry below has NEVER had a driver
# row (added after the round-3 window was pinned). Priority order follows
# VERDICT r3: streaming state, codecs, Spark-4 surface, TPC-H completion,
# sketches, then the highest-risk remaining extensions.
_ROTATED_IN = [
    # streaming state
    "q73_stream_cdc",
    "q78_stateful_processor",
    "q83_watermark_dedup",
    "q84_chained_stateful",
    "q85_stream_outer_join",
    # codecs
    "x44_png_pixel_pipeline",
    "x63_avro_roundtrip",
    "x73_audio_frames",
    "x74_mp4_boxes",
    # Spark-4 SQL/API surface
    "x70_variant_extract",
    "x83_python_datasource",
    "x84_observed_metrics",
    "x85_arrow_stats",
    "x86_arrow_cogroup",
    "q77_recursive_cte",
    "q79_pipe_sql",
    "q80_collation",
    "q81_try_functions",
    "q82_sql_scripting",
    # TPC-H completion
    "q63_tpch_q4",
    "q64_tpch_q7",
    "q65_tpch_q8",
    "q66_tpch_q12",
    "q67_tpch_q13",
    "q68_tpch_q15",
    "q69_tpch_q17",
    "q70_tpch_q19",
    "q71_tpch_q21",
    "q72_tpch_q22",
    # mergeable sketches
    "x80_hll_rollup",
    "x81_approx_topk",
    "x82_bitmap_distinct",
    "x87_sketch_persistence",
    # highest-risk remaining extensions
    "x48_bloom_dedup",
    "x49_scd2_history",
    "x53_parquet_manifest",
    "x55_triangle_count",
    "x60_rare_token_pairs",
    "x65_covariance_matrix",
    "x71_incremental_agg",
    "x72_udtf_leading_tokens",
    "x75_bpe_merge_round",
    "x77_scd2_lookup",
    "x79_stratified_split",
    "q75_run_diff",
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
