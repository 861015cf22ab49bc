"""Spark-4 surface operators: VARIANT columns, incremental aggregate
maintenance, Python UDTF."""

from pyspark.sql import functions as F

from samba_spark.operators.merge import merge_partial_aggs
from samba_spark.operators.semistructured import to_variant, variant_field


def test_variant_field_missing_and_malformed(spark):
    """try_variant_get semantics: missing field → NULL, failed cast →
    NULL; present field extracts typed."""
    df = spark.createDataFrame(
        [('{"k": 7, "s": "x"}',), ('{"other": 1}',), ('{"k": "notanint"}',)],
        ["props"],
    )
    v = to_variant(df, "props")
    out = v.select(
        variant_field("props_v", "k", "long").alias("k"),
        variant_field("props_v", "s").alias("s"),
    ).collect()
    assert [r.k for r in out] == [7, None, None]
    assert [r.s for r in out] == ["x", None, None]


def test_merge_partial_aggs_equals_full_rescan(spark, sf_smoke):
    """Folding per-batch partial aggregates must equal the full aggregate,
    regardless of how the input is split (3-way split here, folded
    incrementally like daily batches)."""
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def agg(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).alias("cents"),
        )

    parts = [agg(orders.where(F.col("o_orderkey") % 3 == i)) for i in range(3)]
    maintained = parts[0]
    for p in parts[1:]:
        maintained = merge_partial_aggs(
            maintained, p, ["o_orderpriority"], ["n", "cents"]
        )
    full = agg(orders)
    got = {r.o_orderpriority: (r.n, r.cents) for r in maintained.collect()}
    want = {r.o_orderpriority: (r.n, r.cents) for r in full.collect()}
    assert got == want


def test_udtf_leading_tokens_contract(spark):
    """Empty tokens consume positions but are not emitted; limit caps the
    scan; NULL text yields no rows."""
    from samba_spark.functions.udtf_ops import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a  b c"), (2, None), (3, " ")], ["id", "text"]
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.id, t.token, t.pos FROM udtf_docs d, "
        "LATERAL leading_tokens(d.text, 10) t ORDER BY d.id, t.pos"
    ).collect()
    assert [(r.id, r.token, r.pos) for r in rows] == [
        (1, "a", 1),
        (1, "b", 3),  # position 2 was the empty token between two spaces
        (1, "c", 4),
    ]


def test_frame_features_drops_trailing_partial_frame(spark):
    """401 samples at frame_len=160 → 2 full frames, trailing 81 samples
    dropped; features are exact integers of the synthesized waveform."""
    from samba_spark.operators.multimodal import frame_features, synth_pcm_wavs

    df = spark.createDataFrame([(7,)], ["doc_id"])
    wavs = synth_pcm_wavs(df, n_samples=401)
    rows = frame_features(wavs, frame_len=160).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1]
    want0 = [((7 * 31 + i * 17) % 4096) - 2048 for i in range(160)]
    assert rows[0].sum_abs == sum(abs(s) for s in want0)
    assert rows[0].peak == max(abs(s) for s in want0)


def test_mp4_box_walk_largesize_and_errors():
    """The box walker handles the 64-bit largesize escape and rejects
    truncated/non-BMFF blobs."""
    import struct

    import pytest

    from samba_spark.operators.multimodal import mp4_bytes, parse_boxes

    blob = mp4_bytes(24, 40)
    assert parse_boxes(blob) == [("ftyp", 16, 0), ("free", 24, 16), ("mdat", 40, 40)]
    big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 24) + b"\x00" * 8
    assert parse_boxes(blob + big)[-1] == ("mdat", 24, 80)
    with pytest.raises(ValueError):
        parse_boxes(b"\x00\x00\x00\x10junk" + b"\x00" * 8)
    with pytest.raises(ValueError):
        parse_boxes(blob[:-4])  # truncated mdat


def test_merge_latest_batch_order_independent(spark):
    """Folding CDC batches in any arrival order yields the same snapshot —
    the invariant that makes retries/backfills safe (plain update-wins
    merges do NOT have it)."""
    from functools import reduce

    from samba_spark.streaming.ops import merge_latest

    rows = [
        (1, 10, "a"), (1, 30, "c"), (1, 20, "b"),
        (2, 5, "x"), (2, 7, "y"),
    ]
    batches = [
        spark.createDataFrame([r], ["user_id", "ts", "val"]) for r in rows
    ]
    empty = batches[0].limit(0)

    def fold(order):
        return {
            (r.user_id, r.ts, r.val)
            for r in reduce(
                lambda acc, b: merge_latest(acc, b, ["user_id"], ["ts"]),
                [batches[i] for i in order],
                empty,
            ).collect()
        }

    want = {(1, 30, "c"), (2, 7, "y")}
    assert fold([0, 1, 2, 3, 4]) == want
    assert fold([4, 3, 2, 1, 0]) == want
    assert fold([2, 0, 4, 1, 3]) == want


def test_bpe_merge_round_counts_exactly(spark):
    """Distinct-token pairs never self-overlap, so pair_count equals
    adjacency occurrences; equal-token adjacencies are excluded; token
    accounting is exact."""
    from samba_spark.operators.textual import bpe_merge_round

    df = spark.createDataFrame(
        [
            (1, "a b a b x"),   # (a,b) twice
            (2, "a b c c c"),   # (a,b) once; (c,c) run excluded
            (3, "z"),           # too short for pairs, still 1 token
        ],
        ["doc_id", "text"],
    )
    r = bpe_merge_round(df).collect()[0]
    assert (r.pair_left, r.pair_right) == ("a", "b")
    assert r.pair_count == 3
    assert r.tokens_before == 11
    assert r.tokens_after == 8
    assert r.docs_affected == 2


def test_bpe_train_matches_python_reference(spark):
    """3 trainer rounds equal a pure-Python greedy reference on a crafted
    corpus: same chosen pairs, same counts, same final tokenization."""
    from samba_spark.operators.textual import bpe_train

    corpus = {
        1: "the quick fox the quick dog",
        2: "the quick the quick the quick",
        3: "dog fox dog",
    }

    def ref_round(toks):
        from collections import Counter

        c = Counter()
        for l in toks.values():
            for x, y in zip(l, l[1:]):
                if x != y:
                    c[(x, y)] += 1
        if not c:
            return None
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        out = {}
        for k, l in toks.items():
            res, i = [], 0
            while i < len(l):
                if i + 1 < len(l) and l[i] == a and l[i + 1] == b:
                    res.append(a + "_" + b)
                    i += 2
                else:
                    res.append(l[i])
                    i += 1
            out[k] = res
        return (a, b, n), out

    toks = {k: v.split(" ") for k, v in corpus.items()}
    want_merges = []
    for _ in range(3):
        r = ref_round(toks)
        if r is None:
            break
        m, toks = r
        want_merges.append(m)

    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    merges, final = bpe_train(df, n_merges=3)
    got = [(m["pair_left"], m["pair_right"], m["pair_count"]) for m in merges]
    assert got == want_merges
    got_toks = {r.doc_id: list(r.tokens) for r in final.collect()}
    assert got_toks == toks


def test_read_json_tracked_quarantines_corrupt_lines(spark, tmp_path):
    """PERMISSIVE + corrupt-record column: clean + quarantined = input
    lines; malformed lines keep their raw text."""
    from pyspark.sql import types as T

    from samba_spark.sources.readers import read_json_tracked

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "{broken json\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": "notanint", "v": "c"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = read_json_tracked(spark, str(p), schema).cache()
    clean = df.where("_corrupt_record IS NULL")
    bad = df.where("_corrupt_record IS NOT NULL")
    assert df.count() == 4
    assert clean.count() == 2
    assert bad.count() == 2
    raws = {r._corrupt_record for r in bad.collect()}
    assert "{broken json" in raws


def test_cdc_snapshot_time_travel(spark, tmp_path):
    """Versioned snapshots are readable per batch id; key coverage grows
    monotonically toward the final snapshot."""
    import os

    from samba_spark.streaming.ops import read_cdc_snapshot, run_cdc_snapshot

    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10, "a")], ["user_id", "ts", "event_id"]
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(1, 20, "b"), (2, 5, "c")], ["user_id", "ts", "event_id"]
    ).coalesce(1).write.mode("append").parquet(src)
    work = str(tmp_path / "work")
    final = run_cdc_snapshot(
        spark, src, work, keys=("user_id",), order_cols=("ts", "event_id")
    )
    latest = read_cdc_snapshot(spark, work)
    assert {(r.user_id, r.ts) for r in latest.collect()} == {
        (r.user_id, r.ts) for r in final.collect()
    }
    keysets = []
    for v in (0, 1):
        snap = read_cdc_snapshot(spark, work, version=v)
        keysets.append({r.user_id for r in snap.collect()})
    assert keysets[0] <= keysets[1]
    assert keysets[1] == {1, 2}


def test_read_parquet_evolved_merges_added_column(spark, tmp_path):
    """Era-1 files lack the column era-2 added; the evolved read exposes
    the merged schema with NULLs for old rows and no rewrite."""
    from samba_spark.sources.readers import read_parquet_evolved

    era1 = str(tmp_path / "era1")
    era2 = str(tmp_path / "era2")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.parquet(era1)
    spark.createDataFrame(
        [(2, "b", 9)], ["id", "v", "added"]
    ).write.parquet(era2)
    df = read_parquet_evolved(spark, era1, era2)
    assert set(df.columns) == {"id", "v", "added"}
    rows = {r.id: r.added for r in df.collect()}
    assert rows == {1: None, 2: 9}
