"""M4 extension operators: oracle matches where declared, semantic
invariants for the rows-only ops."""

import pytest
from pyspark.sql import functions as F

from samba_spark.queries.extensions import EXTENSIONS
from tests.oracle_util import compare, duckdb_conn

ORACLE = [n for n, s in EXTENSIONS.items() if s.oracle]
ROWS_ONLY = [n for n, s in EXTENSIONS.items() if not s.oracle]


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duckdb_conn(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE)
def test_extension_oracle_match(spark, sf_smoke, duck, name):
    spec = EXTENSIONS[name]
    compare(spec.fn(spark, sf_smoke), duck, spec.oracle)


def test_no_rows_only_extensions_remain():
    """Every extension query carries a DuckDB oracle since round 6 (x14
    was the last graduation) — a new oracle-less entry should be a
    deliberate, documented decision, not an accident."""
    assert ROWS_ONLY == []


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf_smoke):
    """sf0.001 documents have no exact dup texts; synthesize some — copy 10
    docs under fresh ids (+1M), plus near-dups with one word appended."""
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    base = docs.limit(10)
    exact = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    near = base.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat("text", F.lit(" extraword")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(exact).unionByName(near)


def test_minhash_dedup_finds_dups(spark, docs_with_dups):
    """Exact dups (identical signatures) must always cluster; near-dups
    (one word in ~128 changed) should too at 16-band/64-hash settings."""
    from samba_spark.operators.dedup import minhash_lsh_dedup

    clusters = {
        r.doc_id: r.cluster_id for r in minhash_lsh_dedup(docs_with_dups).collect()
    }
    paired_exact = sum(
        1 for i in range(10) if clusters.get(i) == clusters.get(i + 1_000_000)
        and clusters.get(i) is not None
    )
    assert paired_exact == 10, f"exact dup pairs clustered: {paired_exact}/10"
    paired_near = sum(
        1 for i in range(10) if clusters.get(i) == clusters.get(i + 2_000_000)
        and clusters.get(i) is not None
    )
    assert paired_near >= 8, f"near dup pairs clustered: {paired_near}/10"


def test_simhash_identical_for_dups(spark, docs_with_dups):
    from samba_spark.operators.dedup import simhash

    sigs = {r.doc_id: r.simhash for r in simhash(docs_with_dups).collect()}
    for i in range(10):
        assert sigs[i] == sigs[i + 1_000_000]
        # near-dup: small Hamming distance
        assert bin(sigs[i] ^ sigs[i + 2_000_000]).count("1") <= 12


def test_ann_recall_against_exact(spark, sf_smoke):
    """LSH ANN should retrieve a reasonable fraction of the exact top-10
    (including each query itself at rank 1)."""
    from samba_spark.queries.extensions import x_ann_lsh_topk, x_cosine_topk

    exact = {
        (r.query_id, r.vec_id) for r in x_cosine_topk(spark, sf_smoke).collect()
    }
    approx_rows = x_ann_lsh_topk(spark, sf_smoke).collect()
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    self_hits = {r for r in approx_rows if r.query_id == r.vec_id}
    assert len(self_hits) == 5  # every query finds itself in its own bucket
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"ANN recall suspiciously low: {recall}"


def test_ivf_beats_lsh_recall(spark, sf_smoke):
    """IVF (data-adaptive cells) must dominate sign-LSH recall at similar
    probe budgets, and always finds each query itself."""
    from samba_spark.queries.extensions import (
        x_ann_lsh_topk,
        x_cosine_topk,
        x_ivf_topk,
    )

    exact = {(r.query_id, r.vec_id) for r in x_cosine_topk(spark, sf_smoke).collect()}
    ivf_rows = x_ivf_topk(spark, sf_smoke).collect()
    ivf = {(r.query_id, r.vec_id) for r in ivf_rows}
    lsh = {
        (r.query_id, r.vec_id) for r in x_ann_lsh_topk(spark, sf_smoke).collect()
    }
    assert sum(1 for q, v in ivf if q == v) == 5
    ivf_recall = len(exact & ivf) / len(exact)
    lsh_recall = len(exact & lsh) / len(exact)
    assert ivf_recall >= lsh_recall
    assert ivf_recall >= 0.5, f"IVF recall too low: {ivf_recall}"


def test_entry_contract_includes_extensions(spark):
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert "x1_dedup_exact" in qs and "x10_cosine_topk" in qs
    assert set(os_) <= set(qs)
    # md5 hash family: the full LSH pipeline is oracle-replicated in DuckDB
    assert "x3_minhash_lsh_dedup" in qs and "x3_minhash_lsh_dedup" in os_
    assert "x4_simhash" in os_ and "x5_ngram_jaccard" in os_
    # seeded plane literals make sign-LSH oracle-replayable too
    assert "x11_ann_lsh_topk" in os_ and "x12_embedding_neardup" in os_
    # pinned-quantizer mode (round 6) made x14 fully oracle-checkable;
    # the trained-KMeans mode stays engine-specific and is exercised by
    # test_ivf_beats_lsh_recall
    assert "x14_ivf_topk" in os_


# -- x15-x17 training-pipeline ops -----------------------------------------
def test_pack_sequences_conservation_and_order(spark, sf_smoke):
    """Packing must conserve documents and tokens, and sequences within a
    source must cover disjoint, increasing doc ranges (assignment is
    monotone in the group's doc order)."""
    from samba_spark.operators.packing import pack_sequences
    from samba_spark.operators.textual import tokens_col
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    packed = pack_sequences(docs, budget=256).collect()
    n_docs = docs.count()
    total_toks = docs.select(
        F.sum(F.size(tokens_col(F.col("text")))).alias("t")
    ).collect()[0].t
    assert sum(r.n_docs for r in packed) == n_docs
    assert sum(r.seq_tokens for r in packed) == total_toks
    by_source = {}
    for r in packed:
        by_source.setdefault(r.source, []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: r.seq_id)
        for a, b in zip(rows, rows[1:]):
            assert a.last_doc < b.first_doc


def test_pack_sequences_no_single_partition_exchange(spark, sf_smoke):
    """The grouped running total must stay parallel: no global-window
    SinglePartition exchange anywhere in the plan (the 100 TB posture that
    motivated the two-pass scheme)."""
    from samba_spark.operators.packing import pack_sequences
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    plan = pack_sequences(docs, budget=256)._jdf.queryExecution().toString()
    assert "SinglePartition" not in plan


def test_decontaminate_flags_planted_overlap(spark, sf_smoke):
    """A corpus doc that copies benchmark text must be flagged; untouched
    synthetic corpus docs sharing no 5-gram must not be."""
    from samba_spark.operators.textual import decontaminate
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    benchmark = docs.where(F.col("source") == "src0")
    bench_row = benchmark.orderBy("doc_id").limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(10_000_000, bench_row.text)], "doc_id long, text string"
    )
    clean = spark.createDataFrame(
        [(10_000_001, "zz1 zz2 zz3 zz4 zz5 zz6 zz7")],
        "doc_id long, text string",
    )
    corpus = planted.unionByName(clean)
    out = {r.doc_id: r for r in decontaminate(corpus, benchmark, n=5).collect()}
    assert out[10_000_000].contaminated and out[10_000_000].n_overlap >= 1
    assert not out[10_000_001].contaminated


def test_decontaminate_broadcasts_benchmark(spark, sf_smoke):
    """The benchmark n-gram probe must be a broadcast join — the corpus
    side of the contamination check never shuffles."""
    from samba_spark.operators.textual import decontaminate
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    df = decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )
    plan = df._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_top_terms_rank_window_is_deterministic(spark, sf_smoke):
    """Equal-count terms must rank by term text; ranks are 1..k dense per
    source."""
    from samba_spark.operators.textual import top_terms
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    rows = top_terms(docs, k=10).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.term_count > b.term_count or (
                a.term_count == b.term_count and a.term < b.term
            )


def test_assign_split_is_partitioning_independent(spark, sf_smoke):
    """Split assignment is a pure function of the key: identical labels on
    any partition layout (unlike randomSplit), all rows labeled, and all
    three splits non-empty at fixture scale."""
    from samba_spark.operators.mixing import assign_split
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    a = {r.doc_id: r.split for r in assign_split(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in assign_split(docs.repartition(7), "doc_id").collect()
    }
    assert a == b
    assert None not in a.values()
    assert {"train", "val", "test"} == set(a.values())
    n = len(a)
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.8 * n <= n_train <= 0.97 * n  # ~90% ± hash noise


def test_cap_per_group_enforces_k_and_is_stable(spark, sf_smoke):
    from samba_spark.operators.mixing import cap_per_group
    from samba_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_smoke, ["documents"])["documents"]
    kept = cap_per_group(docs, "source", 7, "doc_id")
    rows = kept.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(s) <= 7 for s in per.values())
    again = {
        (r.source, r.doc_id)
        for r in cap_per_group(docs.repartition(5), "source", 7, "doc_id").collect()
    }
    assert {(r.source, r.doc_id) for r in rows} == again


def test_vector_centroids_match_numpy(spark, sf_smoke):
    import numpy as np

    from samba_spark.operators.vectorops import vector_centroids
    from samba_spark.sources.tables import load_tables

    embs = load_tables(spark, sf_smoke, ["embeddings"])["embeddings"]
    got = {r.label: (r.centroid, r.n_vecs) for r in vector_centroids(embs).collect()}
    pdf = embs.toPandas()
    for label, grp in pdf.groupby("label"):
        want = np.mean(np.stack(grp["embedding"].map(np.asarray)), axis=0)
        cent, n = got[label]
        assert n == len(grp)
        assert np.allclose(cent, want, atol=1e-9)


def test_normalize_vectors_unit_norm(spark, sf_smoke):
    import math

    from samba_spark.operators.vectorops import normalize_vectors
    from samba_spark.sources.tables import load_tables

    embs = load_tables(spark, sf_smoke, ["embeddings"])["embeddings"]
    rows = normalize_vectors(embs).select("unit").limit(50).collect()
    for r in rows:
        norm = math.sqrt(sum(x * x for x in r.unit))
        assert abs(norm - 1.0) < 1e-9


def test_repetition_stats_on_known_text(spark):
    from samba_spark.operators.textual import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "w x y z")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].n_tokens == 4 and out[1].n_distinct == 2
    assert out[1].top_count == 3 and abs(out[1].top_frac - 0.75) < 1e-12
    assert abs(out[1].dup_frac - 0.5) < 1e-12
    assert out[2].dup_frac == 0.0 and out[2].top_count == 1


def test_sessionize_known_gaps(spark):
    """Constructed event stream with known gaps: sessions split exactly at
    >gap boundaries; micro-second precision (a 300.000001s gap splits, a
    300.0s gap does not)."""
    from samba_spark.operators.sessionize import sessionize

    rows = [
        # user 1: 3 events, gaps 300s (no split) then 300.000001s (split)
        (1, 0),
        (1, 300_000_000),
        (1, 600_000_001),
        # user 2: single event
        (2, 0),
    ]
    df = spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    out = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize(df, gap_seconds=300).collect()
    }
    by_user1 = sorted(
        sid for (u, _), sid in out.items() if u == 1
    )
    assert by_user1 == [1, 1, 2]
    assert [sid for (u, _), sid in out.items() if u == 2] == [1]


def test_sessionize_partitioning_independent(spark, sf_smoke):
    """Session assignment must not depend on input partitioning."""
    from samba_spark.operators.sessionize import session_stats
    from samba_spark.sources.tables import load_tables

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    a = session_stats(events).orderBy("user_id", "session_id").collect()
    b = (
        session_stats(events.repartition(17))
        .orderBy("user_id", "session_id")
        .collect()
    )
    assert a == b


def test_json_field_null_on_missing_and_malformed(spark):
    from samba_spark.operators.semistructured import with_json_fields

    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"other": 1}',), ("not json",), (None,)],
        "props string",
    )
    out = with_json_fields(df, "props", {"k": ("k", "long")}).select("k")
    assert [r.k for r in out.collect()] == [7, None, None, None]


def test_redact_pattern_order_and_delta(spark):
    """Email redacts as one <EMAIL> (not digit-fragments); char_delta is
    the exact length difference."""
    from samba_spark.operators.textual import redaction_stats

    df = spark.createDataFrame(
        [(1, "mail bob99@x.co ip 10.0.0.1 n 42"), (2, "clean text")],
        "id long, t string",
    )
    out = {r.id: r for r in redaction_stats(df, "t", key="id").collect()}
    assert out[1].t_redacted == "mail <EMAIL> ip <IP> n <NUM>"
    assert out[1].char_delta == len("mail bob99@x.co ip 10.0.0.1 n 42") - len(
        "mail <EMAIL> ip <IP> n <NUM>"
    )
    assert out[1].was_redacted and not out[2].was_redacted
    assert out[2].char_delta == 0


def test_canonicalize_url_hand_cases(spark):
    """Each normalization axis hand-checked: case, default ports,
    fragments, tracking params, param sort, trailing slash, empty query,
    and the non-axes (path case preserved, :8080 kept, b=2 kept)."""
    from samba_spark.operators.textual import canonicalize_url

    cases = [
        # (raw, expected canonical)
        ("HTTPS://WWW.Ex.COM:443/Docs/A/?b=2&utm_source=t&a=1#frag",
         "https://www.ex.com/Docs/A?a=1&b=2"),
        ("http://Ex.com:80/x?utm_campaign=1",            # query empties
         "http://ex.com/x"),
        ("https://ex.com:8080/x",                        # non-default port kept
         "https://ex.com:8080/x"),
        ("http://ex.com:443/x",                          # 443 NOT default for http
         "http://ex.com:443/x"),
        ("https://ex.com/a/b/?ref=feed&z=9&a=1",
         "https://ex.com/a/b?a=1&z=9"),
        ("https://ex.com/p?utm_source&x=1",              # VALUELESS tracking
         "https://ex.com/p?x=1"),
        ("https://ex.com/p?ref",                         # bare ref empties query
         "https://ex.com/p"),
        ("https://ex.com/p?refresh=1",                   # prefix NOT over-matched
         "https://ex.com/p?refresh=1"),
        ("https://ex.com", "https://ex.com"),            # bare host
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_url_dedup_groups_collapses_variants(spark):
    from samba_spark.operators.textual import url_dedup_groups

    df = spark.createDataFrame(
        [
            (1, "HTTPS://EX.com:443/p?utm_source=a&x=1"),
            (2, "https://ex.com/p/?x=1"),
            (3, "https://ex.com/p?x=1#sec"),
            (4, "https://ex.com/q?x=1"),
        ],
        "id long, url string",
    )
    got = {
        r.canonical_url: (r.n_dups, r.keep_id)
        for r in url_dedup_groups(df, "url", "id").collect()
    }
    assert got == {
        "https://ex.com/p?x=1": (3, 1),
        "https://ex.com/q?x=1": (1, 4),
    }


def test_salient_terms_prefers_rare_terms(spark):
    """A term unique to one doc must outrank a term every doc shares, even
    at equal tf (df in the denominator)."""
    from samba_spark.operators.textual import salient_terms

    docs = spark.createDataFrame(
        [
            (1, "shared shared unique unique", "x", "s", 0),
            (2, "shared shared aaaa aaaa", "x", "s", 0),
            (3, "shared shared bbbb bbbb", "x", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    top = {
        r.doc_id: r.term
        for r in salient_terms(docs, k=1).collect()
    }
    assert top == {1: "unique", 2: "aaaa", 3: "bbbb"}


def test_filter_top_quantile_exact_fraction(spark):
    """With 8 rows and num/den = 1/4, exactly 2 survive per group — the
    highest-scored, ties by doc_id."""
    from samba_spark.operators.mixing import filter_top_quantile

    rows = [(i, "g", 100 - i) for i in range(8)] + [(10 + i, "h", 5) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    kept = filter_top_quantile(df, "source", F.col("n_chars"), 1, 4)
    got = {(r.source, r.doc_id) for r in kept.collect()}
    # group g: scores 100..93 → doc_id 0,1 win; group h: all tied at 5 →
    # lowest doc_ids 10 win (1/4 of 4 = 1 row)
    assert got == {("g", 0), ("g", 1), ("h", 10)}


def test_dedup_incremental_drops_seen_content(spark):
    """Incoming docs whose text exists in the corpus are dropped; in-batch
    dups collapse to the lowest doc_id."""
    from samba_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        "doc_id long, text string",
    )
    out = {r.keep_doc_id: r.n_batch_dups for r in dedup_incremental(incoming, corpus).collect()}
    assert out == {11: 2, 13: 1}


def test_bloom_dedup_matches_plain_anti_join(spark):
    """The bloom prefilter is a physical optimization only: output is
    bit-identical to dedup_incremental, even with a tiny m that forces
    false positives through the verify anti-join."""
    from samba_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i % 7}") for i in range(30)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(100 + i, f"doc {i % 11}") for i in range(40)],
        "doc_id long, text string",
    )
    plain = sorted(
        (r.keep_doc_id, r.n_batch_dups)
        for r in dedup_incremental(incoming, corpus).collect()
    )
    # m=16 → heavy false-positive pressure: everything funnels into the
    # verify anti-join, result must not change
    for m in (16, 1 << 18):
        bloom = sorted(
            (r.keep_doc_id, r.n_batch_dups)
            for r in dedup_incremental_bloom(incoming, corpus, m=m).collect()
        )
        assert bloom == plain, (m, bloom, plain)


def test_bloom_dedup_broadcasts_position_set(spark):
    """The position set reaches the probe as a broadcast (no shuffle of
    the batch on bloom positions), and the corpus side of the probe join
    is the ≤m-row position relation, not the digest table."""
    from samba_spark.operators.dedup import dedup_incremental_bloom

    corpus = spark.createDataFrame(
        [(i, f"c {i}") for i in range(50)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(100 + i, f"b {i}") for i in range(50)], "doc_id long, text string"
    )
    from samba_spark.plans.inspect import plan_string

    plan = plan_string(dedup_incremental_bloom(incoming, corpus))
    assert "BroadcastHashJoin" in plan, plan[:1200]


def test_parquet_manifest_matches_duckdb_metadata(spark, sf_smoke):
    """Footer-only manifest equals DuckDB's parquet_file_metadata /
    parquet_metadata over the same files — full value parity, done here
    because the declared query is rows-only (oracle SQL cannot embed the
    fixture path portably)."""
    import duckdb
    from samba_spark.sources.manifest import table_manifest

    got = {
        r.file_name: (r.n_rows, r.n_row_groups, r.n_columns, r.min_key, r.max_key)
        for r in table_manifest(spark, sf_smoke, stats_column="o_orderkey").collect()
    }
    con = duckdb.connect()
    meta = con.execute(
        "SELECT regexp_extract(file_name, '([^/]+)$', 1), num_rows, "
        "num_row_groups FROM parquet_file_metadata(?)",
        [f"{sf_smoke}/*.parquet"],
    ).fetchall()
    assert len(got) == len(meta) > 0
    for fname, n_rows, n_rg in meta:
        assert got[fname][0] == n_rows, fname
        assert got[fname][1] == n_rg, fname
    ncols = dict(
        con.execute(
            "SELECT regexp_extract(file_name, '([^/]+)$', 1), "
            "COUNT(DISTINCT path_in_schema) FROM parquet_metadata(?) GROUP BY 1",
            [f"{sf_smoke}/*.parquet"],
        ).fetchall()
    )
    for fname, (r, g, c, mn, mx) in got.items():
        assert c == ncols[fname], fname
    stats = con.execute(
        "SELECT regexp_extract(file_name, '([^/]+)$', 1), "
        "MIN(CAST(stats_min_value AS BIGINT)), MAX(CAST(stats_max_value AS BIGINT)) "
        "FROM parquet_metadata(?) WHERE path_in_schema = 'o_orderkey' GROUP BY 1",
        [f"{sf_smoke}/*.parquet"],
    ).fetchall()
    assert len(stats) == 1  # only orders has o_orderkey
    fname, mn, mx = stats[0]
    assert (got[fname][3], got[fname][4]) == (mn, mx)
    # files without the stats column report NULL min/max
    assert all(
        v[3] is None and v[4] is None for k, v in got.items() if k != fname
    )


def test_binned_quantiles_bracket_exact(spark):
    """Histogram estimate is the upper bucket edge: it is ≥ the true
    quantile and within one bucket width of it."""
    from samba_spark.operators.sketch import binned_quantiles

    rows = [("t", float(v) / 100) for v in range(1, 1001)]  # 0.01..10.00
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.p_pct: r.est_cents
        for r in binned_quantiles(df, "v", "g", quantiles=(50, 95, 99)).collect()
    }
    # true p-quantile of 1..1000 cents is p*10 cents; bucket width 25
    for p in (50, 95, 99):
        true_cents = p * 10
        assert true_cents <= got[p] <= true_cents + 25, (p, got[p])


def test_time_rollup_conservation_and_plan(spark, sf_smoke):
    """Every grain partitions the same events: counts at each level sum to
    the grand total; one Expand + one aggregate exchange (not three scans)."""
    from samba_spark.operators.sessionize import time_rollup
    from samba_spark.sources.tables import load_tables

    events = load_tables(spark, sf_smoke, ["events"])["events"]
    out = time_rollup(events).collect()
    agg = {}
    for r in out:
        n, c = agg.get(r.grain, (0, 0))
        agg[r.grain] = (n + r.n_events, c + r.sum_cents)
    assert agg["minute"] == agg["hour"] == agg["day"] == agg["all"]

    from samba_spark.plans.inspect import plan_summary

    s = plan_summary(time_rollup(events))
    assert "Expand" in s["plan"], s["plan"][:800]
    # rollup aggregate = exactly one exchange; a three-groupBy rewrite
    # would show three
    assert s["n_exchanges"] == 1, s["plan"][:1200]
    assert s["n_hash_aggregates"] >= 2  # partial + final (map-side combine)


def test_quantization_stats_vs_numpy(spark):
    """int8 audit agrees with a numpy reference; zero vectors produce
    all-zero codes and zero error instead of NULL/NaN."""
    import numpy as np
    from samba_spark.operators.vectorops import quantization_stats

    vecs = [
        ("a", [0.5, -1.0, 0.25]),
        ("a", [2.0, 0.0, -2.0]),
        ("b", [0.0, 0.0, 0.0]),  # zero vector: guard path
    ]
    df = spark.createDataFrame(vecs, "label string, embedding array<double>")
    got = {r.label: r for r in quantization_stats(df).collect()}

    def ref(v):
        v = np.asarray(v, dtype=np.float64)
        m = np.abs(v).max()
        if m == 0:
            return 0, 0, 0, 0
        q = np.floor(v * 127 / m + 0.5)  # HALF_UP, matches both engines
        q = np.where(v < 0, np.ceil(v * 127 / m - 0.5), q)
        err = np.abs(v - q * m / 127).max()
        return int(q.sum()), int(q.min()), int(q.max()), int(np.floor(err * 1e9))

    a1 = ref(vecs[0][1]); a2 = ref(vecs[1][1])
    assert (got["a"].sum_q, got["a"].min_q, got["a"].max_q) == (
        a1[0] + a2[0], min(a1[1], a2[1]), max(a1[2], a2[2])
    )
    assert got["a"].max_err_e9 == max(a1[3], a2[3])
    assert (got["b"].sum_q, got["b"].min_q, got["b"].max_q, got["b"].max_err_e9) == (0, 0, 0, 0)


def test_scd2_history_islands(spark):
    """Consecutive equal attr values collapse into one validity row;
    versions restart per key; a value that recurs after a change opens a
    NEW island (type-2, not distinct-values)."""
    from samba_spark.operators.merge import scd2_history

    rows = [
        # key, seq, attr  — A: a,a,b,a  → 3 islands; B: NULL,NULL,c → 2
        ("A", 1, "a"), ("A", 2, "a"), ("A", 3, "b"), ("A", 4, "a"),
        ("B", 1, None), ("B", 2, None), ("B", 3, "c"),
    ]
    df = spark.createDataFrame(rows, "k string, seq long, v string")
    got = [
        (r.k, r.version, r.attr, r.effective_from, r.effective_to, r.n_rows)
        for r in scd2_history(df, "k", ["seq"], "v").orderBy("k", "version").collect()
    ]
    assert got == [
        ("A", 1, "a", 1, 2, 2),
        ("A", 2, "b", 3, 3, 1),
        ("A", 3, "a", 4, 4, 1),
        ("B", 1, None, 1, 2, 2),
        ("B", 2, "c", 3, 3, 1),
    ]


def test_length_histogram_bucket_boundaries(spark):
    """Bucket = floor(log2 n)+1 via length(bin(n)): 1→1, 2→2, 3→2, 4→3,
    1023→10, 1024→11 — the power-of-two boundaries land exactly."""
    from samba_spark.operators.textual import length_histogram

    rows = [(i, "s", n) for i, n in enumerate([1, 2, 3, 4, 1023, 1024])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        (r.len_bucket): r.n_docs
        for r in length_histogram(df).collect()
    }
    assert got == {1: 1, 2: 2, 3: 1, 10: 1, 11: 1}


def test_chunk_documents_windows_and_overlap(spark):
    """chunk=4, stride=2 over 6 tokens → starts 0,2,4; the last window is
    short; digests are md5 of the space-joined window; empty docs vanish."""
    import hashlib

    from samba_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "   "), (3, "x")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk=4, stride=2).orderBy(
        "doc_id", "chunk_id"
    ).collect()
    got = [(r.doc_id, r.chunk_id, r.start, r.chunk_len, r.chunk_digest) for r in rows]
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got == [
        (1, 0, 0, 4, md5("a b c d")),
        (1, 1, 2, 4, md5("c d e f")),
        (1, 2, 4, 2, md5("e f")),
        (3, 0, 0, 1, md5("x")),
    ]


def test_chunk_documents_with_text_roundtrip(spark):
    from samba_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "p q r")], "doc_id long, text string")
    rows = chunk_documents(df, chunk=2, stride=2, with_text=True).orderBy(
        "chunk_id"
    ).collect()
    assert [r.chunk_text for r in rows] == ["p q", "r"]


def test_merge_upsert_update_wins(spark):
    from samba_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "v1"), (2, "v1"), (3, "v1")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "v2"), (4, "v2")], "k long, v string"
    )
    got = {r.k: r.v for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {1: "v1", 2: "v2", 3: "v1", 4: "v2"}


def test_cross_source_overlap_known_bigrams(spark):
    """src A='a b c' (bigrams: 'a b','b c'), src B='a b d' ('a b','b d')
    → shared 1, sizes 2 and 2, jaccard 1/3. A pair with no shared shingle
    emits no row."""
    from samba_spark.operators.dedup import cross_source_overlap

    df = spark.createDataFrame(
        [(1, "A", "a b c"), (2, "B", "a b d"), (3, "C", "zz qq")],
        "doc_id long, source string, text string",
    )
    rows = cross_source_overlap(df, n=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.source_a, r.source_b, r.n_shared, r.n_a, r.n_b) == ("A", "B", 1, 2, 2)
    assert r.jaccard == round(1 / 3, 6)


def test_weighted_sample_deterministic_and_rate_bound(spark):
    """The same key set always survives; missing groups keep 100%; the
    kept fraction tracks the target rate (hash uniformity at n=2000)."""
    from samba_spark.operators.mixing import weighted_sample

    rows = [(i, "heavy" if i % 2 == 0 else "rare") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept1 = sorted(
        r.doc_id for r in weighted_sample(df, "doc_id", {"heavy": 0.3}).collect()
    )
    kept2 = sorted(
        r.doc_id for r in weighted_sample(df, "doc_id", {"heavy": 0.3}).collect()
    )
    assert kept1 == kept2
    heavy = [i for i in kept1 if i % 2 == 0]
    rare = [i for i in kept1 if i % 2 == 1]
    assert len(rare) == 1000  # untouched group keeps everything
    assert 0.2 <= len(heavy) / 1000 <= 0.4  # ~0.3 within hash noise


def test_weighted_sample_subset_stability(spark):
    """A key kept at rate r is also kept at every higher rate — thresholds
    nest, so raising a source's weight only ADDS documents (stable
    incremental mixing)."""
    from samba_spark.operators.mixing import weighted_sample

    df = spark.createDataFrame(
        [(i, "s") for i in range(500)], "doc_id long, source string"
    )
    low = {r.doc_id for r in weighted_sample(df, "doc_id", {"s": 0.2}).collect()}
    high = {r.doc_id for r in weighted_sample(df, "doc_id", {"s": 0.6}).collect()}
    assert low <= high


def test_collocations_counts_and_topk(spark):
    from samba_spark.operators.textual import collocations

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog")],
        "doc_id long, text string",
    )
    rows = {(r.w1, r.w2): (r.n_ab, r.n_a, r.n_b) for r in collocations(df, top_k=10).collect()}
    # 'the cat' twice; unigrams: the=2, cat=2, sat=1, ran=1, a=1, dog=1
    assert rows[("the", "cat")] == (2, 2, 2)
    assert rows[("cat", "sat")] == (1, 2, 1)
    assert rows[("a", "dog")] == (1, 1, 1)
    assert ("dog", None) not in rows  # single-tail tokens emit no bigram


def test_snapshot_diff_statuses(spark):
    from samba_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_repeated_spans_planted_duplicate(spark):
    """A 3-token span shared by two docs is flagged at both positions; a
    span repeated only WITHIN one doc is not; short tails never match."""
    from samba_spark.operators.dedup import repeated_spans

    df = spark.createDataFrame(
        [
            (1, "common span here unique one"),
            (2, "zz common span here qq"),
            (3, "self self self self self self"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    rows = repeated_spans(df, n=3, stride=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.start)
    # 'common span here' at doc1 start 0 and doc2 start 1
    assert 0 in by_doc.get(1, set())
    assert 1 in by_doc.get(2, set())
    # doc3's spans repeat only within itself -> no cross-doc flag
    assert 3 not in by_doc
    # doc4 has <3 tokens -> nothing
    assert 4 not in by_doc


def test_cap_tokens_per_group_budget_and_determinism(spark):
    """Each group keeps ~budget tokens (straddler included), hash order is
    stable across runs, and an untouched group under budget keeps all."""
    from pyspark.sql import functions as F

    from samba_spark.operators.mixing import cap_tokens_per_group
    from samba_spark.operators.textual import tokens_col

    rows = [(i, "big", "w " * 50) for i in range(40)] + [
        (100 + i, "small", "w w w") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = cap_tokens_per_group(df, "doc_id", 500)
    agg = {
        r.source: (r.n, r.t)
        for r in kept.withColumn(
            "_nt", F.size(tokens_col(F.col("text")))
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_nt").alias("t"))
        .collect()
    }
    # 'big': 50-token docs against a 500 budget -> exactly 10 kept
    # (tok_before of the 10th is 450 < 500; of the 11th is 500, excluded)
    assert agg["big"] == (10, 500)
    assert agg["small"] == (3, 9)  # under budget: all kept
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(
        r.doc_id for r in cap_tokens_per_group(df, "doc_id", 500).collect()
    )
    assert ids1 == ids2


def test_norm_stats_known_vectors(spark):
    """Unit vectors → norm 1.0; a 3-4-5 triangle → norm 5; zero vector →
    norm 0. Quantized stats match the analytic values."""
    from samba_spark.operators.vectorops import norm_stats

    rows = [
        (0, [1.0, 0.0]),
        (0, [0.0, 1.0]),
        (1, [3.0, 4.0]),
        (2, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        r.label: (r.n_vecs, r.min_norm_e6, r.max_norm_e6, r.avg_norm)
        for r in norm_stats(df).collect()
    }
    assert got[0] == (2, 1_000_000, 1_000_000, 1.0)
    assert got[1] == (1, 5_000_000, 5_000_000, 5.0)
    assert got[2] == (1, 0, 0, 0.0)


def test_search_topk_ranking(spark):
    """Rarer terms contribute more; tf multiplies; zero-hit docs are
    excluded; absent query terms contribute nothing."""
    from samba_spark.operators.textual import search_topk

    df = spark.createDataFrame(
        [
            (1, "rare common common"),
            (2, "common"),
            (3, "rare rare"),
            (4, "nothing here"),
        ],
        "doc_id long, text string",
    )
    rows = search_topk(df, ["rare", "common", "ghost"], k=10).collect()
    scores = {r.doc_id: r.score for r in rows}
    # N=4, df(rare)=2 -> idf 2_000_000; df(common)=2 -> 2_000_000
    assert scores[1] == 1 * 2_000_000 + 2 * 2_000_000
    assert scores[2] == 2_000_000
    assert scores[3] == 2 * 2_000_000
    assert 4 not in scores
    assert [r.doc_id for r in rows] == [1, 3, 2]  # desc score, asc id


def test_skew_profile_hot_key(spark):
    from samba_spark.plans.layout import skew_profile

    rows = [(1,)] * 80 + [(2,)] * 15 + [(3,)] * 5
    df = spark.createDataFrame(rows, "k long")
    got = [(r.k, r.n_rows, r.share_ppm) for r in skew_profile(df, "k", top=2).collect()]
    assert got == [(1, 80, 800_000), (2, 15, 150_000)]


def test_integrity_audit_detects_planted_orphans(spark, tmp_path, sf_smoke):
    """An orphaned child row shows up in n_orphans; clean fixtures are 0."""
    from samba_spark.queries.extensions import q52_integrity_audit

    rows = {r.relationship: r.n_orphans for r in q52_integrity_audit(spark, sf_smoke).collect()}
    assert set(rows) == {
        "lineitem->orders", "orders->customer", "customer->nation", "nation->region"
    }
    assert all(v == 0 for v in rows.values())  # fixture is referentially clean


def test_funnel_strict_ordering(spark):
    """A user whose purchase precedes their click does NOT count at the
    purchase step; per-user times are the earliest valid progression."""
    import datetime as dt

    from samba_spark.operators.sessionize import funnel, funnel_counts

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: clean signup->click->purchase
        (1, "signup", t(0)), (1, "click", t(10)), (1, "purchase", t(20)),
        # u2: purchase BEFORE click -> stops at click
        (2, "signup", t(0)), (2, "purchase", t(5)), (2, "click", t(10)),
        # u3: click before signup doesn't count; later click does
        (3, "click", t(0)), (3, "signup", t(5)), (3, "click", t(6)),
        # u4: never signs up
        (4, "click", t(1)), (4, "purchase", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    counts = {r.step: r.n_users for r in funnel_counts(df, ["signup", "click", "purchase"]).collect()}
    assert counts == {"step0_signup": 3, "step1_click": 3, "step2_purchase": 1}
    times = {r.user_id: (r.t0, r.t1) for r in funnel(df, ["signup", "click"]).collect()}
    assert times[3] == (t(5), t(6))  # pre-signup click ignored


def test_funnel_nullable_progression(spark):
    """funnel() returns every step-0 user with NULL times from the first
    step they failed to reach (monotone progression), in ONE events scan."""
    import datetime as dt

    from samba_spark.operators.sessionize import funnel, funnel_counts

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, "signup", t(0)), (1, "click", t(10)), (1, "purchase", t(20)),
        (2, "signup", t(0)), (2, "purchase", t(5)), (2, "click", t(10)),
        (4, "click", t(1)), (4, "purchase", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.user_id: (r.t0, r.t1, r.t2) for r in
           funnel(df, ["signup", "click", "purchase"]).collect()}
    assert got == {
        1: (t(0), t(10), t(20)),
        2: (t(0), t(10), None),  # purchase-before-click: stops at click
    }  # u4 never signed up -> no row

    # the O(k²) round-2 shape re-scanned events once per prefix; the
    # single-pass rewrite must reference the events relation exactly once
    plan = funnel_counts(df, ["signup", "click", "purchase"])._jdf.queryExecution().optimizedPlan().toString()
    scans = plan.count("LogicalRDD") + plan.count("Relation [")
    assert scans == 1, f"expected 1 events scan, got {scans}:\n{plan}"


def test_retention_cohorts_month_calendar(spark):
    """Month granularity uses calendar months: Jan 1 cohort active Mar 1
    is offset 2 (59 days div 30 would wrongly give 1, colliding with
    February)."""
    import datetime as dt

    from samba_spark.operators.sessionize import retention_cohorts

    rows = [
        (1, dt.datetime(2023, 1, 1)), (1, dt.datetime(2023, 3, 1)),
        (2, dt.datetime(2023, 1, 15)), (2, dt.datetime(2023, 2, 28)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort), r.period_offset): r.n_users
        for r in retention_cohorts(df, granularity="month").collect()
    }
    assert got == {
        ("2023-01-01", 0): 2,
        ("2023-01-01", 1): 1,  # u2 in February
        ("2023-01-01", 2): 1,  # u1 in March — NOT merged with February
    }

    import pytest as _pytest
    with _pytest.raises(ValueError):
        retention_cohorts(df, granularity="day")


def test_retention_cohorts_triangle(spark):
    """Two cohorts; a user active in weeks 0 and 2 counts at offsets 0 and
    2 only; cohorts never gain users at offset 0 < later cohorts' users."""
    import datetime as dt

    from samba_spark.operators.sessionize import retention_cohorts

    w = lambda k, d=0: dt.datetime(2024, 1, 1 + 7 * k + d, 12)  # Mondays
    rows = [
        (1, w(0)), (1, w(2)),          # cohort wk0, back in wk2
        (2, w(0)), (2, w(0, 1)),       # cohort wk0, active only wk0
        (3, w(1)), (3, w(2)),          # cohort wk1, retained wk2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort), r.period_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_trailing_window_boundary_inclusive(spark):
    """RANGE frame boundary: an event exactly window_seconds earlier is
    INCLUDED (closed lower bound); one microsecond-older-than-window is
    not. Epoch-micros arithmetic keeps this engine-exact."""
    import datetime as dt

    from samba_spark.operators.sessionize import trailing_window_count

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(seconds=3600)),       # exactly 1h later
        (3, 1, t0 + dt.timedelta(seconds=7201)),       # 1h+1s after #2
        (4, 2, t0),                                    # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.n_trailing
           for r in trailing_window_count(df).collect()}
    assert got == {1: 1, 2: 2, 3: 1, 4: 1}


def test_rare_token_blocking_finds_planted_neardup(spark):
    """Two docs differing by one token out of ten (Jaccard 9/11 ≈ 82%)
    pair up at pct=80 via a shared rare token; the unrelated doc never
    appears. Exact counts asserted."""
    from samba_spark.operators.dedup import rare_token_blocking_pairs

    base = "alpha bravo charlie delta echo foxtrot golf hotel india "
    rows = [
        (1, base + "juliet"),
        (2, base + "kilo"),
        (3, "zulu yankee xray whiskey victor uniform tango sierra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 10 tokens -> 8 3-shingles; only the last shingle differs: 7/9 = 78%
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.n_union)
        for r in rare_token_blocking_pairs(df, min_jaccard_pct=70).collect()
    }
    assert got == {(1, 2): (7, 9)}


def test_rare_token_blocking_exact_dup_and_threshold(spark):
    from samba_spark.operators.dedup import rare_token_blocking_pairs

    rows = [(1, "aa bb cc dd"), (2, "aa bb cc dd"), (3, "aa bb ee ff")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # exact dup: shingle jaccard 100 ≥ 50; doc 3 shares no 3-shingle
    got = {(r.doc_a, r.doc_b) for r in rare_token_blocking_pairs(df).collect()}
    assert got == {(1, 2)}


def test_quality_audit_counts_and_uniqueness(spark):
    from pyspark.sql import functions as F

    from samba_spark.operators.quality import key_uniqueness, quality_audit

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 0.0), (None, 3.0)],
        "k long, v double",
    )
    out = {
        r.check_name: (r.n_violations, r.n_rows, r.passed)
        for r in quality_audit(
            df,
            {
                "k_not_null": F.col("k").isNull(),
                "v_positive": ~(F.col("v") > 0),
            },
        ).collect()
    }
    assert out == {"k_not_null": (1, 4, False), "v_positive": (2, 4, False)}
    u = key_uniqueness(df, "k").collect()[0]
    # count_distinct ignores the NULL key: 4 rows, 2 distinct non-null, 2 "dups"
    assert (u.n_rows, u.n_distinct, u.n_duplicates) == (4, 2, 2)


def test_semantic_prune_keeps_one_rep_per_cluster(spark):
    """semantic_prune: exactly one survivor (the min id) per near-dup
    cluster with the right n_merged; vectors with no near-duplicate
    survive untouched with n_merged=1."""
    from samba_spark.operators.simsearch import semantic_prune

    base = [1.0] + [0.0] * 63
    tilt = [0.99, 0.141] + [0.0] * 62  # cosine(base, tilt) ≈ 0.99
    ortho = [0.0, 1.0] + [0.0] * 62
    anti = [-1.0] + [0.0] * 63
    rows = [
        (10, base), (11, base), (12, tilt),   # cluster {10,11,12}
        (20, ortho), (21, ortho),             # cluster {20,21}
        (30, anti),                           # singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.n_merged
        for r in semantic_prune(df, threshold=0.9).collect()
    }
    assert got == {10: 3, 20: 2, 30: 1}


def test_lm_fluency_semantics(spark):
    """Hand-checkable corpus: 'a b' repeated is maximally predictable, a
    one-off word salad is not; the fixed-point arithmetic must equal the
    add-one-smoothed bigram model computed by hand."""
    from samba_spark.operators.textual import lm_fluency

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "c d e"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in lm_fluency(docs).collect()}
    # corpus: tokens a,b x3 each; c,d,e x1. V=5.
    # bigrams: (a,b)x3, (b,a)x2, (c,d), (d,e)
    p_ab = (1_000_000 * (3 + 1)) // (3 + 5)
    p_ba = (1_000_000 * (2 + 1)) // (3 + 5)
    assert out[1].n_bigrams == 5
    assert out[1].fluency == 3 * p_ab + 2 * p_ba
    assert out[1].avg_fluency == (3 * p_ab + 2 * p_ba) // 5
    p_cd = (1_000_000 * 2) // (1 + 5)
    assert out[2].fluency == 2 * p_cd
    assert out[1].avg_fluency > out[2].avg_fluency


def test_rrf_fuse_semantics(spark):
    """Overlap gets both contributions; single-ranking items get one;
    the fixed-point quantization matches hand arithmetic."""
    from samba_spark.operators.simsearch import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["id", "rank"])
    b = spark.createDataFrame([(20, 1), (40, 2)], ["id", "rank"])
    got = {r.id: r for r in rrf_fuse([a, b], "id").collect()}
    assert got[20].rrf == 1_000_000 // 62 + 1_000_000 // 61
    assert got[10].rrf == 1_000_000 // 61
    assert got[40].rrf == 1_000_000 // 62
    assert got[40].rank_0 is None and got[40].rank_1 == 2
    assert set(got) == {10, 20, 30, 40}


def test_ewma_integer_fold(spark):
    from pyspark.sql import functions as F

    from samba_spark.operators.sessionize import ewma

    df = spark.createDataFrame(
        [("u1", 1, 1), ("u1", 2, 5), ("u1", 3, 9), ("u1", 4, 3), ("u2", 1, 7)],
        ["user", "t", "v"],
    )
    got = {
        r.user: r
        for r in ewma(df, "user", ["t"], F.col("v")).collect()
    }
    # u1: 1 -> (1+5)//2=3 -> (3+9)//2=6 -> (6+3)//2=4
    assert got["u1"].ewma == 4
    assert got["u1"].n_events == 4
    assert got["u1"].last_value == 3
    # single observation: EWMA is the observation itself
    assert got["u2"].ewma == 7 and got["u2"].n_events == 1


def test_ewma_order_sensitivity(spark):
    from pyspark.sql import functions as F

    from samba_spark.operators.sessionize import ewma

    # same multiset, different order -> different fold result proves the
    # series is genuinely ordered by the order columns, not arrival
    asc = [("u", i, v) for i, v in enumerate([10, 0, 0, 0])]
    desc = [("u", i, v) for i, v in enumerate([0, 0, 0, 10])]
    r_asc = ewma(spark.createDataFrame(asc, ["u", "t", "v"]), "u", ["t"], F.col("v")).collect()[0].ewma
    r_desc = ewma(spark.createDataFrame(desc, ["u", "t", "v"]), "u", ["t"], F.col("v")).collect()[0].ewma
    assert r_asc == 1   # 10 -> 5 -> 2 -> 1
    assert r_desc == 5  # 0 -> 0 -> 0 -> (0+10)//2


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucketed overlap join == brute-force non-equi join, including
    intervals that span several buckets (dedup) and touch-at-boundary
    pairs (inclusive predicate)."""
    import datetime as dt

    from samba_spark.operators.relational import interval_overlap_join

    base = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [
            ("L1", ts(0), ts(90)),     # spans 2 hourly buckets
            ("L2", ts(200), ts(210)),
            ("L3", ts(600), ts(660)),
        ],
        ["l_id", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            ("R1", ts(60), ts(120)),   # overlaps L1 in both buckets
            ("R2", ts(90), ts(95)),    # touches L1 exactly at its end
            ("R3", ts(211), ts(300)),  # just after L2 — no match
            ("R4", ts(650), ts(700)),
        ],
        ["r_id", "rs", "re"],
    )
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re"
        ).collect()
    )
    rows_l = left.collect()
    rows_r = right.collect()
    expected = sorted(
        (l.l_id, r.r_id)
        for l in rows_l
        for r in rows_r
        if l.ls <= r.re and r.rs <= l.le
    )
    assert got == expected
    assert ("L1", "R1") in got and ("L1", "R2") in got
    assert ("L2", "R3") not in got
    # multi-bucket overlap must appear exactly once
    assert len(got) == len(set(got))


def test_strip_boilerplate_removes_frequent_chunks(spark):
    from samba_spark.operators.textual import strip_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "a b c x1 y1 z1"),
            (2, "a b c x2 y2 z2"),
            (3, "a b c"),
            (4, "p q r s t u"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.asDict()
        for r in strip_boilerplate(docs, n=3, max_df=2).collect()
    }
    # "a b c" appears in 3 docs (> max_df=2): stripped everywhere
    assert got[1]["cleaned"] == "x1 y1 z1"
    assert got[1]["n_chunks"] == 2 and got[1]["n_removed"] == 1
    assert got[2]["cleaned"] == "x2 y2 z2"
    # doc 3 is pure boilerplate: survives with empty text
    assert got[3]["cleaned"] == "" and got[3]["n_removed"] == 1
    # doc 4 shares nothing: untouched
    assert got[4]["cleaned"] == "p q r s t u"
    assert got[4]["n_removed"] == 0


def test_strip_boilerplate_partial_tail_chunk(spark):
    from samba_spark.operators.textual import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.asDict()
        for r in strip_boilerplate(docs, n=3, max_df=2).collect()
    }
    # 4 tokens -> chunks "a b c" + tail "d"; nothing frequent
    assert got[1]["n_chunks"] == 2 and got[1]["cleaned"] == "a b c d"
    assert got[2]["n_chunks"] == 1 and got[2]["cleaned"] == "e f"


def test_length_bucket_stats_arithmetic(spark):
    """x129 batch economics on hand-countable docs: bucket assignment,
    ceil batch count, padding, basis-point utilization — including a
    bucket LONGER than the budget (capacity clamps to one doc per
    batch, the batch stretches) and an over-long doc dropped."""
    from samba_spark.operators.packing import length_bucket_stats

    rows = [
        (1, "a b c"),                 # 3 tokens  -> bucket 16
        (2, "w " * 10),               # 10 tokens -> bucket 16
        (3, "w " * 100),              # 100       -> bucket 128
        (4, "w " * 100),              # 100       -> bucket 128
        (5, "w " * 100),              # 100       -> bucket 128
        (6, "w " * 300),              # 300       -> bucket 512 > budget
        (7, "w " * 40000),            # over the top bucket: dropped
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.bucket_len: r
        for r in length_bucket_stats(docs, budget=256).collect()
    }
    assert set(out) == {16, 128, 512}
    b16 = out[16]   # cap=16, 2 docs -> 1 batch of 16 slots * 16 tokens
    assert (b16.n_docs, b16.total_tokens, b16.pad_tokens) == (2, 13, 19)
    assert (b16.n_batches, b16.util_bp) == (1, (10000 * 13) // 256)
    b128 = out[128]  # cap=2, 3 docs -> 2 batches, 4 slots * 128 tokens
    assert (b128.n_docs, b128.n_batches) == (3, 2)
    assert b128.util_bp == (10000 * 300) // (2 * 2 * 128)
    b512 = out[512]  # cap clamps to 1; batch stretches to 512 tokens
    assert (b512.n_docs, b512.n_batches) == (1, 1)
    assert b512.util_bp == (10000 * 300) // 512


def test_temperature_mixture_lifts_small_sources(spark):
    """x130: α=0.5 weights — the small source's epoch count exceeds the
    big source's (the whole point of temperature sampling), and the
    integer arithmetic is exactly isqrt-proportional."""
    import math

    from samba_spark.operators.mixing import temperature_mixture

    rows = [(i, "big", "w " * 100) for i in range(100)] + [
        (1000 + i, "small", "w " * 100) for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.source: r for r in temperature_mixture(df, token_budget=5200).collect()}
    nb, ns = 100 * 100, 4 * 100
    wb, ws = math.isqrt(nb), math.isqrt(ns)
    assert (out["big"].w_num, out["small"].w_num) == (wb, ws)
    assert out["big"].alloc_tokens == (5200 * wb) // (wb + ws)
    assert out["small"].alloc_tokens == (5200 * ws) // (wb + ws)
    # epochs: small sees its data more often than big
    assert out["small"].epochs_bp > out["big"].epochs_bp


def test_chi_square_screen_known_table(spark):
    """x131 on a hand-computed 2x2: contributions match (o·N − rt·ct)² /
    (N·rt·ct) exactly, and a perfectly independent table contributes 0."""
    from samba_spark.operators.quality import chi_square_screen

    # observed: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=10  N=60
    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 10
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {(r.a, r.b): r for r in chi_square_screen(df, "a", "b").collect()}
    n = 60
    totals = {"x": 40, "y": 20, "p": 40, "q": 20}
    for (a, b), o in {("x","p"):30, ("x","q"):10, ("y","p"):10, ("y","q"):10}.items():
        rt, ct = totals[a], totals[b]
        diff = o * n - rt * ct
        assert out[(a, b)].expected_milli == (1000 * rt * ct) // n
        assert abs(out[(a, b)].contrib - round(diff * diff / (n * rt * ct), 6)) < 1e-9
    # independent table -> all contributions zero
    ind = spark.createDataFrame(
        [("x", "p")] * 20 + [("x", "q")] * 20 + [("y", "p")] * 10 + [("y", "q")] * 10,
        ["a", "b"],
    )
    assert all(r.contrib == 0.0 for r in chi_square_screen(ind, "a", "b").collect())


def test_common_substring_pairs_winnowed_spans(spark):
    """x132: winnowed fingerprint selection finds the shared span at ANY
    alignment (the spans below sit at alignment difference 10, which a
    fixed stride-4 sample would MISS — selection is content-keyed, so
    both docs pick the same windows); winnow=1 selects every window and
    reports the exact span length; disjoint docs report nothing; the
    df-cap drops boilerplate shared by too many docs."""
    from samba_spark.operators.dedup import common_substring_pairs

    shared = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMN"  # 50 chars
    rows = [
        (1, "PREFIXONE " + shared + " SUFFIXONE padding padding padding"),
        (2, "totally other start " + shared + " different tail here xx"),
        (3, "no overlap with anything else at all in this one body"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # winnow=1: every window selected -> exact span (flanking spaces: 52)
    out = {(r.doc_a, r.doc_b): r for r in
           common_substring_pairs(docs, window=32, min_len=48, winnow=1).collect()}
    assert set(out) == {(1, 2)}
    assert out[(1, 2)].span_len == 52
    # winnow=8 at misaligned offsets (alignment diff 10, not 0 mod 8):
    # detection guaranteed, reported >= 52 - 2*(8-1) = 38
    out8 = {(r.doc_a, r.doc_b): r for r in
            common_substring_pairs(docs, window=32, min_len=38, winnow=8).collect()}
    assert (1, 2) in out8 and out8[(1, 2)].span_len >= 38
    # boilerplate cap: the same span in 5 docs with max_df=4 reports nothing
    many = spark.createDataFrame(
        [(i, f"doc{i} unique lead-in {shared} unique tail {i}") for i in range(5)],
        ["doc_id", "text"],
    )
    assert (
        common_substring_pairs(many, window=32, min_len=48, winnow=1, max_df=4)
        .count() == 0
    )
    # parameter validation
    with pytest.raises(ValueError, match="winnow"):
        common_substring_pairs(docs, window=32, min_len=48, winnow=0)


def test_theil_sen_shrugs_off_outliers(spark):
    """x133: the median-of-pairwise-slopes estimator recovers the exact
    trend of a clean line AND of a line with a wild outlier (which drags
    OLS), on both odd and even pair counts."""
    from samba_spark.operators.sessionize import theil_sen_trend

    rows = [("a", x, 3 * x + 10) for x in range(10)]
    rows[5] = ("a", 5, 1000)  # outlier
    rows += [("b", x, -2 * x + 100) for x in range(8)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r.g: r for r in theil_sen_trend(df, "g", "x", "y").collect()}
    assert (out["a"].slope, out["a"].intercept, out["a"].n_pairs) == (
        3.0, 10.0, 45,
    )
    assert (out["b"].slope, out["b"].intercept, out["b"].n_pairs) == (
        -2.0, 100.0, 28,
    )


def test_theil_sen_rejects_duplicate_x(spark):
    """ADVICE r7: non-rolled-up input (duplicate (group, x) rows) used to
    be SILENTLY dropped by the a.x < b.x pair filter, skewing the median
    — now a plan-folded raise_error fires loudly, consistent with the
    dtype ValueError."""
    from samba_spark.operators.sessionize import theil_sen_trend

    rows = [("a", x, 3 * x) for x in range(5)] + [("a", 2, 999)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    # AQE can wrap USER_RAISED_EXCEPTION in a multi-failure SparkException
    # (both the slope and intercept branches hit the guard) — match the
    # message, not the wrapper type
    with pytest.raises(Exception, match="ROLLED UP"):
        theil_sen_trend(df, "g", "x", "y").collect()


def test_int8_quantized_topk_recall_and_exactness(spark, sf_smoke):
    """x134: SQ8 codes are engine-exact integers in [-127, 127]; each
    query's own vector ranks first (self-similarity survives
    quantization); recall@10 vs exact cosine stays high."""
    from samba_spark.operators import simsearch as S
    from samba_spark.queries.extensions import _embs, _queries_df

    embs = _embs(spark, sf_smoke)
    qs = _queries_df(embs)
    out = S.int8_quantize_topk(embs, qs, k=10)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rs in by_q.items():
        assert len(rs) == 10
        top = min(rs, key=lambda r: r.rank)
        assert top.vec_id == qid, "self-match must rank first"
    # quantized cosine tracks exact cosine within quantization error
    # (max-abs calibration; the fixture's random unclustered vectors put
    # many top-10 gaps INSIDE that error band, so recall@10 here is a
    # floor, not the clustered-real-data figure)
    from pyspark.sql import functions as F

    q8 = S.int8_quantize_topk(embs, qs, k=1000).select(
        "query_id", "vec_id", "sim8"
    )
    exact_all = S.cosine_topk(embs, qs, k=1000).select(
        "query_id", "vec_id", "sim"
    )
    err = (
        q8.join(exact_all, ["query_id", "vec_id"])
        .agg(
            F.max(F.abs(F.col("sim8") - F.col("sim"))).alias("mx"),
            F.avg(F.abs(F.col("sim8") - F.col("sim"))).alias("av"),
        )
        .collect()[0]
    )
    assert err.av <= 0.03, f"SQ8 mean cosine error too high: {err.av}"
    assert err.mx <= 0.15, f"SQ8 max cosine error too high: {err.mx}"
    exact = S.cosine_topk(embs, qs, k=10).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    got = {q: {r.vec_id for r in rs} for q, rs in by_q.items()}
    rec = sum(len(ex[q] & got[q]) for q in ex) / sum(len(v) for v in ex.values())
    assert rec >= 0.7, f"SQ8 recall@10 too low: {rec}"


def test_int8_pinned_scales_parity_and_clamp(spark, sf_smoke):
    """x134 serving mode (VERDICT r7 item 4 / ADVICE r7): pinned
    ``scales=`` skips the eager calibration scan and reproduces the
    recalibrated output EXACTLY when given the same calibration
    constants; out-of-envelope queries saturate to ±127 instead of
    emitting invalid int8 codes; bad scale vectors fail loudly."""
    from pyspark.sql import functions as F

    from samba_spark.operators import simsearch as S
    from samba_spark.queries.extensions import _embs, _queries_df

    embs = _embs(spark, sf_smoke)
    qs = _queries_df(embs)
    # calibrate once in Python with the training-mode formula (per-dim
    # max |x|, float comparisons only — exact)
    vecs = [r.embedding for r in embs.select("embedding").collect()]
    ndim = len(vecs[0])
    scales = [
        max(abs(float(v[d])) for v in vecs) or 1.0 for d in range(ndim)
    ]
    trained = sorted(
        tuple(r) for r in S.int8_quantize_topk(embs, qs, k=10).collect()
    )
    pinned = sorted(
        tuple(r)
        for r in S.int8_quantize_topk(embs, qs, k=10, scales=scales).collect()
    )
    assert pinned == trained, "pinned scales must replay training codes"

    # out-of-envelope query saturates in pinned mode (the fixture
    # queries are corpus rows, so scale them up 10x to leave the
    # calibration envelope)
    hot = qs.limit(1).select(
        "query_id",
        F.transform("q_embedding", lambda x: x * 10.0).alias("q_embedding"),
    )
    hot_codes = (
        S.int8_quantize_topk(embs, hot, k=1, scales=scales)
        .select("qscore")
        .collect()
    )
    assert hot_codes, "saturated query must still rank"
    # saturation bound: |dot| <= ndim * 127 * 127
    assert abs(hot_codes[0].qscore) <= ndim * 127 * 127

    # validation: empty / non-positive / NaN scales and dim mismatch
    with pytest.raises(ValueError, match="non-empty"):
        S.int8_quantize_topk(embs, qs, scales=[])
    with pytest.raises(ValueError, match="positive"):
        S.int8_quantize_topk(embs, qs, scales=[1.0, -2.0] + [1.0] * (ndim - 2))
    with pytest.raises(ValueError, match="positive"):
        S.int8_quantize_topk(embs, qs, scales=[float("nan")] * ndim)
    with pytest.raises(Exception, match="does not match"):
        S.int8_quantize_topk(embs, qs, k=1, scales=[1.0] * (ndim + 3)).collect()


def test_bpe_apply_matches_reference_tokenizer(spark):
    """x135: the chained-replace tokenizer over the wrapped-token
    encoding equals a reference carry-pass BPE on adversarial words
    (same-symbol merges, chained merges, consecutive pairs) — including
    the two cases the naive single-separator encoding gets wrong."""
    from collections import Counter

    from samba_spark.operators.textual import bpe_apply_tokens

    def bpe_ref(word, ms):
        syms = list(word)
        for a, b in ms:
            out, p = [], None
            for x in syms:
                if p == a and x == b:
                    out.append(a + b)
                    p = None
                else:
                    if p is not None:
                        out.append(p)
                    p = x
            if p is not None:
                out.append(p)
            syms = out
        return syms

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("aa", "a"),
              ("e", "r"), ("a", "n")]
    text = ("the theater then aan aaa aaaa ran randy hetraanenan "
            "abab anan thethe er era")
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = {r.token: r.n for r in bpe_apply_tokens(docs, merges).collect()}
    exp = Counter()
    for w in text.split():
        exp.update(bpe_ref(w, merges))
    assert got == dict(exp)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid merge"):
        bpe_apply_tokens(docs, [("A", "b")])
    with _pytest.raises(ValueError, match="invalid merge"):
        bpe_apply_tokens(docs, [("", "b")])
    with _pytest.raises(ValueError, match="duplicate merge"):
        bpe_apply_tokens(docs, [("a", "b"), ("c", "d"), ("a", "b")])
    with _pytest.raises(ValueError, match="impl"):
        bpe_apply_tokens(docs, [("a", "b")], impl="vectorized")


def _bpe_ref_carry_pass(word, ms):
    """Reference sequential BPE: one left-to-right non-overlapping
    carry-pass per merge, in rank order — the ground truth both
    execution paths must match."""
    syms = list(word)
    for a, b in ms:
        out, p = [], None
        for x in syms:
            if p == a and x == b:
                out.append(a + b)
                p = None
            else:
                if p is not None:
                    out.append(p)
                p = x
        if p is not None:
            out.append(p)
        syms = out
    return syms


def test_bpe_segment_word_fuzz_vs_reference():
    """x135 scan path (VERDICT r7 item 5): the pair-index + rank-heap
    kernel is bit-identical to the reference carry-pass over 20k random
    words against a CHAINED random vocabulary (merges whose outputs feed
    later merges — the case where heap bookkeeping could diverge from
    strict rank order)."""
    import random

    from samba_spark.operators.textual import bpe_segment_word

    rng = random.Random(135)
    for trial in range(20):
        symbols = ["a", "b", "c"]
        merges = []
        seen = set()
        while len(merges) < 30:
            a, b = rng.choice(symbols), rng.choice(symbols)
            if (a, b) in seen:
                continue
            seen.add((a, b))
            merges.append((a, b))
            symbols.append(a + b)  # chained: later merges can use it
        for _ in range(1000):
            w = "".join(rng.choice("abc") for _ in range(rng.randint(1, 14)))
            assert bpe_segment_word(w, merges) == _bpe_ref_carry_pass(
                w, merges
            ), (w, merges)


def test_bpe_scan_path_matches_replace_path(spark):
    """Both execution paths produce identical (token, n) tables on the
    fixture vocabulary and adversarial text; auto dispatch picks scan
    past BPE_REPLACE_MAX_MERGES (visible as a MapInPandas node)."""
    from collections import Counter

    from samba_spark.operators.textual import (
        BPE_REPLACE_MAX_MERGES,
        bpe_apply_tokens,
    )

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("aa", "a"),
              ("e", "r"), ("a", "n")]
    text = ("the theater then aan aaa aaaa ran randy hetraanenan "
            "abab anan thethe er era")
    docs = spark.createDataFrame([(1, text), (2, text + " thee eraan")],
                                 ["doc_id", "text"])
    rep = {r.token: r.n for r in
           bpe_apply_tokens(docs, merges, impl="replace").collect()}
    scan = {r.token: r.n for r in
            bpe_apply_tokens(docs, merges, impl="scan").collect()}
    assert scan == rep
    exp = Counter()
    for w in (text + " " + text + " thee eraan").split():
        exp.update(_bpe_ref_carry_pass(w, merges))
    assert rep == dict(exp)

    # large-vocabulary auto dispatch: >512 merges routes to mapInPandas
    big = list(merges)
    seen = set(big)
    for i in range(BPE_REPLACE_MAX_MERGES + 10):
        # padding pairs over symbols that never occur adjacently enough
        # to matter — the dispatch is what's under test, plus end-to-end
        # equality with the reference at a >512-merge vocabulary
        a, b = f"q{i}x", f"z{i}y"
        big.append((a, b))
        seen.add((a, b))
    auto = bpe_apply_tokens(docs, big, impl="auto")
    assert "mapinpandas" in auto._jdf.queryExecution().toString().lower()
    assert {r.token: r.n for r in auto.collect()} == rep


def test_pq_topk_pinned_codebooks_parity_and_selfmatch(spark, sf_smoke):
    """x136: pinned ``codebooks=`` replays the training-mode output
    exactly (the serving split); queries that ARE codebook seeds
    reconstruct losslessly, so self-match ranks first; bad codebook
    shapes fail loudly."""
    from samba_spark.operators import simsearch as S
    from samba_spark.queries.extensions import _embs, _queries_df

    embs = _embs(spark, sf_smoke)
    qs = _queries_df(embs)
    trained = sorted(
        tuple(r) for r in S.pq_topk(embs, qs, k=10, m=8, n_centroids=16).collect()
    )
    # derive the same deterministic codebook in Python (subvectors of
    # the 16 smallest vec_ids) and pin it
    seeds = embs.orderBy("vec_id").limit(16).collect()
    dsub = len(seeds[0].embedding) // 8
    cb = [
        [[float(r.embedding[j * dsub + t]) for t in range(dsub)] for r in seeds]
        for j in range(8)
    ]
    pinned = sorted(
        tuple(r) for r in S.pq_topk(embs, qs, k=10, m=8, codebooks=cb).collect()
    )
    assert pinned == trained, "pinned codebooks must replay training output"
    # queries 0-4 are codebook seeds: their codes reconstruct exactly,
    # so ADC cosine(q, recon(q)) = 1 and self ranks first (ties break
    # to the lowest vec_id, which is the query itself)
    top = {
        r.query_id: r.vec_id
        for r in S.pq_topk(embs, qs, k=1, m=8, codebooks=cb).collect()
    }
    assert top == {q: q for q in range(5)}

    import pytest as _pytest

    # ivf_topk argument contract: training knobs are mutually exclusive
    # with the pinned quantizer (a silently-dead n_centroids hid bugs)
    with _pytest.raises(ValueError, match="one or the other"):
        S.pq_topk(embs, qs, m=8, n_centroids=16, codebooks=cb)
    with _pytest.raises(ValueError, match="subspaces"):
        S.pq_topk(embs, qs, m=8, codebooks=cb[:4])
    with _pytest.raises(ValueError, match="centroids"):
        S.pq_topk(embs, qs, m=8, codebooks=[b[:1] for b in cb])
    ragged = [list(b) for b in cb]
    ragged[3] = [cv[:-1] for cv in ragged[3]]
    with _pytest.raises(ValueError, match="dim"):
        S.pq_topk(embs, qs, m=8, codebooks=ragged)
    bad = [[list(cv) for cv in b] for b in cb]
    bad[0][0][0] = float("inf")
    with _pytest.raises(ValueError, match="non-finite"):
        S.pq_topk(embs, qs, m=8, codebooks=bad)
    with _pytest.raises(Exception, match="does not match"):
        S.pq_topk(embs, qs, k=1, m=8,
                  codebooks=[[cv + [0.0] for cv in b] for b in cb]).collect()


def test_minhash_probe_frozen_semantics(spark):
    """x137: an exact-copy probe matches its corpus source with all 64
    positions agreeing; a mutated probe still matches with partial
    agreement; an unrelated probe is absent; delta<->delta pairs are out
    of scope (ingest is x111's job); bad parameters fail loudly."""
    from samba_spark.operators.dedup import (
        lsh_band_index,
        minhash_probe_frozen,
        minhash_signatures,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs for the long winter"),
        (3, "sphinx of black quartz judge my vow said the tired examiner"),
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    frozen_bands = lsh_band_index(corpus)
    frozen_sigs = minhash_signatures(corpus)
    delta = spark.createDataFrame(
        [
            (101, corpus_rows[0][1]),                       # exact copy of 1
            (102, corpus_rows[1][1].replace("five", "six")),  # near copy of 2
            (103, "completely unrelated text about spark catalyst plans"),
            (104, corpus_rows[0][1]),                       # delta dup of 101
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in minhash_probe_frozen(
            frozen_bands, frozen_sigs, delta, min_agree=8
        ).collect()
    }
    assert out[101].match_id == 1
    assert out[101].n_agree == 64 and out[101].est_jaccard == 1.0
    # md5 family: positions are CORRELATED (monotone linear permutations
    # — see the operator docstring), so a near-dup sharing the smallest
    # shingle hash can agree on all 64 positions; assert the match, not
    # a partial-agreement band
    assert out[102].match_id == 2 and out[102].n_agree >= 8
    assert 103 not in out, "unrelated probe must not match"
    # 104 matches corpus doc 1 (via the same signature), NOT delta doc 101
    assert out[104].match_id == 1

    # xxhash64 family: independent per-position hashes — est_jaccard is
    # the calibrated MinHash estimate, so the mutated probe agrees on
    # SOME but not all positions (true jaccard ~0.5 over 13 shingles)
    # 32 bands × 2 rows: at jaccard ~0.5 a 4-row band only matches with
    # p≈0.08 each (≈24% chance of NO candidate across 16 bands); 2-row
    # bands make candidate recall ~certain for this assertion
    fb_x = lsh_band_index(corpus, bands=32, hash_family="xxhash64")
    fs_x = minhash_signatures(corpus, hash_family="xxhash64")
    out_x = {
        r.doc_id: r
        for r in minhash_probe_frozen(
            fb_x, fs_x, delta, bands=32, min_agree=8, hash_family="xxhash64"
        ).collect()
    }
    assert out_x[101].n_agree == 64
    assert out_x[102].match_id == 2 and 8 <= out_x[102].n_agree < 64
    assert 103 not in out_x

    with pytest.raises(ValueError, match="divide"):
        minhash_probe_frozen(frozen_bands, frozen_sigs, delta, bands=7)
    with pytest.raises(ValueError, match="min_agree"):
        minhash_probe_frozen(frozen_bands, frozen_sigs, delta, min_agree=0)
    with pytest.raises(ValueError, match="max_bucket"):
        minhash_probe_frozen(frozen_bands, frozen_sigs, delta, max_bucket=0)

    # layout guards fire LOUDLY instead of silently deflating n_agree /
    # returning empty: a frozen signature of the wrong length (index
    # built with different num_hashes) and an index band id outside the
    # probe's band layout
    from pyspark.sql import functions as F

    truncated_sigs = frozen_sigs.select(
        "doc_id", F.slice("sig", 1, 32).alias("sig")
    )
    with pytest.raises(Exception, match="different minhash parameters"):
        minhash_probe_frozen(
            frozen_bands, truncated_sigs, delta, min_agree=8
        ).collect()
    shifted_bands = frozen_bands.select(
        "doc_id", (F.col("band") + 16).alias("band"), "band_hash"
    )
    with pytest.raises(Exception, match="different band layout"):
        minhash_probe_frozen(
            shifted_bands, frozen_sigs, delta, min_agree=8
        ).collect()


def test_quality_model_score_exact_and_validation(spark):
    """x138: the logit equals the hand-computed weighted feature sum on
    a known document; absent features are skipped (not zero-weighted);
    unknown features and non-finite weights fail loudly."""
    from samba_spark.operators.textual import (
        QUALITY_MODEL_FEATURES,
        quality_model_score,
    )

    text = "The quick brown fox, it is 42 YEARS old! And the end."
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    toks = text.lower().strip().split()
    n_words = len(toks)
    c = max(len(text), 1)
    stop = {"the", "and", "of", "to", "a", "in", "is", "on", "for", "it"}
    import re as _re

    p = len(_re.sub(r"[a-zA-Z0-9\s]", "", text))
    s = sum(1 for w in toks if w in stop)
    d = len(_re.sub(r"[^0-9]", "", text))
    u = len(_re.sub(r"[^A-Z]", "", text))
    weights = {
        "length_norm": 1.5,
        "punct_ratio": -4.0,
        "stopword_ratio": 2.0,
        "digit_ratio": -1.0,
        "caps_ratio": -0.5,
    }
    # fold in catalog order, exactly as the operator does
    exp = -0.25
    feats = {
        "length_norm": min(n_words, 100) / 100.0,
        "punct_ratio": p / c,
        "stopword_ratio": s / max(n_words, 1),
        "digit_ratio": d / c,
        "caps_ratio": u / c,
    }
    for name in QUALITY_MODEL_FEATURES:
        exp = exp + weights[name] * feats[name]
    row = quality_model_score(docs, weights, bias=-0.25, threshold=0.9).collect()[0]
    assert row.score == exp
    assert row.keep == (exp >= 0.9)

    # subset weights: only the named features contribute
    row2 = quality_model_score(docs, {"punct_ratio": -4.0}, bias=1.0).collect()[0]
    assert row2.score == 1.0 + -4.0 * feats["punct_ratio"]

    with pytest.raises(ValueError, match="unknown features"):
        quality_model_score(docs, {"sentiment": 1.0})
    with pytest.raises(ValueError, match="non-finite"):
        quality_model_score(docs, {"punct_ratio": float("nan")})
    with pytest.raises(ValueError, match="non-finite"):
        quality_model_score(docs, {"punct_ratio": 1.0}, bias=float("inf"))


def test_truncated_rerank_degenerate_equals_brute_force(spark, sf_smoke):
    """x139: with shortlist >= corpus size the prefilter cannot drop
    anything, so the two-stage output equals exact cosine_topk rows
    (minus the extra sim_pre column); self-match ranks first; parameter
    validation is loud."""
    from samba_spark.operators import simsearch as S
    from samba_spark.queries.extensions import _embs, _queries_df

    embs = _embs(spark, sf_smoke)
    qs = _queries_df(embs)
    n = embs.count()
    two = S.truncated_rerank_topk(
        embs, qs, k=10, prefilter_dim=8, shortlist=n
    )
    brute = S.cosine_topk(embs, qs, k=10)
    assert sorted(
        (r.query_id, r.vec_id, r.sim, r.rank) for r in two.collect()
    ) == sorted(tuple(r) for r in brute.collect())
    # lossy shortlist still keeps the self-match at rank 1 (prefix
    # cosine of a vector with itself is 1.0 -> always shortlisted)
    lossy = S.truncated_rerank_topk(embs, qs, k=1, prefilter_dim=8, shortlist=5)
    assert {r.query_id: r.vec_id for r in lossy.collect()} == {
        q: q for q in range(5)
    }
    with pytest.raises(ValueError, match="shortlist"):
        S.truncated_rerank_topk(embs, qs, k=10, shortlist=5)
    with pytest.raises(ValueError, match="prefilter_dim"):
        S.truncated_rerank_topk(embs, qs, prefilter_dim=0)


def test_retrieval_metrics_hand_fixture(spark):
    """x140: recall@k / reciprocal-rank arithmetic on a hand-checked
    fixture, including the no-hit and missing-from-results queries."""
    from samba_spark.operators.simsearch import retrieval_metrics

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (3, 30, 1)],
        ["query_id", "vec_id", "rank"],
    )
    results = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (2, 21, 1)],
        ["query_id", "vec_id", "rank"],
    )
    out = {r.query_id: r for r in retrieval_metrics(results, truth, k=2).collect()}
    assert set(out) == {1, 2, 3}
    r1 = out[1]
    assert (r1.n_relevant, r1.n_retrieved, r1.n_hits) == (2, 2, 1)
    assert r1.recall_at_k == 0.5
    assert r1.first_hit_rank == 1 and r1.reciprocal_rank == 1.0
    r2 = out[2]  # retrieved 1 wrong item: zero hits
    assert (r2.n_relevant, r2.n_retrieved, r2.n_hits) == (1, 1, 0)
    assert r2.recall_at_k == 0.0
    assert r2.first_hit_rank is None and r2.reciprocal_rank == 0.0
    r3 = out[3]  # query absent from results entirely
    assert (r3.n_relevant, r3.n_retrieved, r3.n_hits) == (1, 0, 0)

    with pytest.raises(ValueError, match="k must be"):
        retrieval_metrics(results, truth, k=0)


def test_ivf_pq_pinned_parity_and_full_probe_equivalence(spark, sf_smoke):
    """x141: probing ALL cells removes the gate, so ivf_pq_topk equals
    pq_topk exactly (same codebooks -> same ADC cosine ranking); pinned
    quantizers replay training mode; the training-vs-pinned knobs are
    mutually exclusive and layout mismatches fail loudly."""
    from samba_spark.operators import simsearch as S
    from samba_spark.queries.extensions import _embs, _queries_df

    embs = _embs(spark, sf_smoke)
    qs = _queries_df(embs)
    full_probe = S.ivf_pq_topk(embs, qs, k=10, m=8, n_cells=4, n_probe=4)
    flat = S.pq_topk(embs, qs, k=10, m=8)
    assert sorted(tuple(r) for r in full_probe.collect()) == sorted(
        tuple(r) for r in flat.collect()
    )
    # pinned quantizers replay the trained defaults
    seeds = embs.orderBy("vec_id").limit(16).collect()
    dsub = len(seeds[0].embedding) // 8
    cb = [
        [[float(r.embedding[j * dsub + t]) for t in range(dsub)] for r in seeds]
        for j in range(8)
    ]
    cells = [[float(v) for v in r.embedding] for r in seeds[:4]]
    trained = sorted(
        tuple(r) for r in S.ivf_pq_topk(embs, qs, k=10, m=8).collect()
    )
    pinned = sorted(
        tuple(r)
        for r in S.ivf_pq_topk(
            embs, qs, k=10, m=8, cell_centroids=cells, codebooks=cb
        ).collect()
    )
    assert pinned == trained

    with pytest.raises(ValueError, match="one or the other"):
        S.ivf_pq_topk(embs, qs, n_cells=4, cell_centroids=cells)
    with pytest.raises(ValueError, match="one or the other"):
        S.ivf_pq_topk(embs, qs, n_centroids=16, codebooks=cb)
    with pytest.raises(ValueError, match="n_probe"):
        S.ivf_pq_topk(embs, qs, n_cells=2, n_probe=5)
    with pytest.raises(ValueError, match="n_probe"):
        S.ivf_pq_topk(embs, qs, n_probe=0)
    with pytest.raises(ValueError, match="PQ"):
        S.ivf_pq_topk(
            embs, qs, cell_centroids=[c[:32] for c in cells], codebooks=cb
        )


def test_truncated_rerank_rejects_clamping_prefilter(spark, sf_smoke):
    """Review finding: prefilter_dim beyond the vector dimension used to
    clamp silently (brute force at 2x cost) — now a plan-folded error."""
    from samba_spark.operators import simsearch as S
    from samba_spark.queries.extensions import _embs, _queries_df

    embs = _embs(spark, sf_smoke)
    qs = _queries_df(embs)
    with pytest.raises(Exception, match="smaller than prefilter_dim"):
        S.truncated_rerank_topk(
            embs, qs, k=10, prefilter_dim=999, shortlist=50
        ).collect()


def test_minhash_index_persistence_roundtrip(spark, tmp_path):
    """save/load/probe triple: the persisted index carries its build
    parameters, probe_minhash_index replays them (a layout mismatch is
    impossible via the path API), and an index without meta is rejected
    with the contract spelled out."""
    from samba_spark.operators.dedup import (
        load_minhash_index,
        minhash_probe_frozen,
        probe_minhash_index,
        save_minhash_index,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs for the long winter"),
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    path = str(tmp_path / "idx")
    # non-default layout: 32 hashes, 8 bands
    save_minhash_index(corpus, path, num_hashes=32, bands=8)
    bands_df, sigs_df, meta = load_minhash_index(spark, path)
    # band_buckets is the r12 layout-version field (0 = flat layout);
    # "_"-prefixed keys are load's private pass-through stash (dataset
    # schemas cached so meta-reusing loads skip inference jobs) — not
    # part of the persisted layout contract
    assert {k: v for k, v in meta.items() if not k.startswith("_")} == {
        "n": 3,
        "num_hashes": 32,
        "bands": 8,
        "hash_family": "md5",
        "band_buckets": 0,
    }
    assert bands_df.count() == 2 * 8
    assert sigs_df.select(F.size("sig")).distinct().collect()[0][0] == 32

    delta = spark.createDataFrame(
        [(101, corpus_rows[0][1])], ["doc_id", "text"]
    )
    out = probe_minhash_index(spark, path, delta, min_agree=8).collect()
    assert len(out) == 1 and out[0].match_id == 1 and out[0].n_agree == 32
    # the same probe through the raw API with DEFAULT (wrong) layout
    # params trips the sig-length guard instead of silently missing
    with pytest.raises(Exception, match="different minhash parameters"):
        minhash_probe_frozen(bands_df, sigs_df, delta, min_agree=8).collect()

    with pytest.raises(ValueError, match="build parameters"):
        load_minhash_index(spark, str(tmp_path / "nowhere"))
    with pytest.raises(ValueError, match="divide"):
        save_minhash_index(corpus, path, num_hashes=64, bands=7)


# --- ngram_novelty (x148) ---------------------------------------------------
def test_ngram_novelty_attribution_order(spark):
    """First-coverage attribution under the lexicographic order: a
    shingle shared by srcA and srcB is novel only for srcA."""
    from samba_spark.operators.textual import ngram_novelty

    rows = [
        (1, "alpha beta gamma delta", "srcA"),
        (2, "alpha beta gamma epsilon", "srcB"),   # 'alpha beta gamma' seen
        (3, "zeta eta theta iota", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out["srcA"]["n_distinct"] == out["srcA"]["n_novel"] == 2
    assert out["srcA"]["novelty_ratio"] == 1.0
    # srcB: doc2 has 2 shingles (1 shared), doc3 has 2 — distinct 4, novel 3
    assert out["srcB"]["n_distinct"] == 4 and out["srcB"]["n_novel"] == 3
    assert out["srcB"]["novelty_ratio"] == 0.75


def test_ngram_novelty_totals_conserve(spark, sf_smoke):
    """Σ n_novel over sources = global distinct shingle count."""
    from pyspark.sql import functions as F

    from samba_spark.operators.dedup import shingles
    from samba_spark.operators.textual import ngram_novelty

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = ngram_novelty(docs, n=3).collect()
    total_novel = sum(r["n_novel"] for r in out)
    global_distinct = (
        shingles(docs, 3).select("shingle").distinct().count()
    )
    assert total_novel == global_distinct
    # first source in the order is all-novel by construction
    first = min(out, key=lambda r: r["source"])
    assert first["n_novel"] == first["n_distinct"]


def test_ngram_novelty_partitioning_independent(spark, sf_smoke):
    from samba_spark.operators.textual import ngram_novelty

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = ngram_novelty(docs).collect()
    b = ngram_novelty(docs.repartition(13)).collect()
    assert a == b


# --- mixture_plan (x151) ------------------------------------------------------
def test_mixture_plan_conserves_budget_exactly(spark, sf_smoke):
    """Σ target_tokens == budget for budgets that do and don't divide
    evenly — the Hamilton largest-remainder property x130's floor
    allocation lacks."""
    from samba_spark.operators.mixing import mixture_plan

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    for budget in (1_000_000, 999_983, 7):
        out = mixture_plan(docs, token_budget=budget).collect()
        assert sum(r["target_tokens"] for r in out) == budget, budget


def test_mixture_plan_epochs_ceiling_and_rate(spark):
    from samba_spark.operators.mixing import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "e f g h i j k l m n o p", "s2")],
        "doc_id long, text string, source string",
    )
    # tokens: s1=4, s2=12; weights isqrt: 2, 3; budget 10:
    # base: 10*2//5=4, 10*3//5=6; rem 0,0 -> no bonus; targets 4, 6
    out = {r["source"]: r for r in mixture_plan(docs, token_budget=10).collect()}
    assert out["s1"]["target_tokens"] == 4 and out["s2"]["target_tokens"] == 6
    assert out["s1"]["epochs"] == 1   # ceil(4/4)
    assert out["s2"]["epochs"] == 1   # ceil(6/12)
    assert out["s1"]["rate"] == 1.0 and out["s2"]["rate"] == 0.5
    # budget 11: one leftover token; remainders (11*2)%5=2, (11*3)%5=3
    # -> s2 gets the bonus
    out = {r["source"]: r for r in mixture_plan(docs, token_budget=11).collect()}
    assert out["s1"]["target_tokens"] == 4 and out["s2"]["target_tokens"] == 7


def test_mixture_plan_remainder_tie_breaks_to_smallest_source(spark):
    """Equal remainders: the lexicographically smallest source wins the
    leftover token."""
    from samba_spark.operators.mixing import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a b c d", "sA"), (2, "e f g h", "sB")],
        "doc_id long, text string, source string",
    )
    # both sources: 4 tokens, w=2, den=4; budget 5: base 2 each, rem 2
    # each, one leftover -> sA
    out = {r["source"]: r for r in mixture_plan(docs, token_budget=5).collect()}
    assert out["sA"]["target_tokens"] == 3 and out["sB"]["target_tokens"] == 2


def test_mixture_plan_zero_budget_and_validation(spark, sf_smoke):
    import pytest as _pytest

    from samba_spark.operators.mixing import mixture_plan

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    out = mixture_plan(docs, token_budget=0).collect()
    assert all(r["target_tokens"] == 0 and r["epochs"] == 0 for r in out)
    with _pytest.raises(ValueError, match="token_budget=-1"):
        mixture_plan(docs, token_budget=-1)
