"""Round-9 LLM-pipeline legs: exact-substring dedup (Lee-et-al
ExactSubstr semantic, dedup.exact_substring_dedup) and session-level
trajectory dedup (sessionize.session_dedup).

Oracle parity for x156/x157 runs in test_declared_queries.py; these pin
the operator contracts the oracle can't see: alignment independence,
the remove-ALL-occurrences variant, short-doc passthrough, gap
splitting, and trajectory-class election.
"""

from __future__ import annotations

import datetime as dt

import pytest

from samba_spark.operators.dedup import exact_substring_dedup
from samba_spark.operators.sessionize import session_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substring_removes_all_occurrences(spark):
    dup = "a b c d e f g h"  # exactly 8 tokens
    df = _docs(
        spark,
        [
            (1, f"start {dup} end one"),
            (2, f"{dup} trailer two"),
            (3, "totally unique text with no repeats here at all"),
        ],
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, 8).collect()}
    # the duplicated run is cut from BOTH docs (conservative variant),
    # wherever it sits (alignment-independent: offset 1 vs offset 0)
    assert "a b c" not in out[1]["clean_text"]
    assert "a b c" not in out[2]["clean_text"]
    assert out[3]["clean_text"] == (
        "totally unique text with no repeats here at all"
    )
    assert out[3]["n_removed"] == 0
    assert out[1]["n_removed"] == 8 and out[2]["n_removed"] == 8
    # the non-duplicated context survives in order
    assert out[1]["clean_text"] == "start end one"
    assert out[2]["clean_text"] == "trailer two"


def test_exact_substring_short_docs_pass_through(spark):
    df = _docs(spark, [(1, "too short"), (2, "too short")])
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, 8).collect()}
    # identical docs, but no 8-token window exists: untouched
    assert out[1]["clean_text"] == "too short"
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


def test_exact_substring_long_overlap_removes_whole_run(spark):
    # a 10-token duplicated run: overlapping 8-grams cover all 10
    run = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = _docs(spark, [(1, f"u1 {run} u2"), (2, f"v1 v2 {run}")])
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, 8).collect()}
    assert out[1]["clean_text"] == "u1 u2"
    assert out[1]["n_removed"] == 10
    assert out[2]["clean_text"] == "v1 v2"
    assert out[2]["n_removed"] == 10


def test_exact_substring_self_repeat_counts(spark):
    # the same 8-gram twice in ONE doc is a duplicate too (global
    # occurrence count, per the paper) — both occurrences cut
    dup = "a b c d e f g h"
    df = _docs(
        spark,
        [(1, f"{dup} mid1 mid2 {dup}"), (2, "other text entirely here")],
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, 8).collect()}
    assert out[1]["clean_text"] == "mid1 mid2"
    assert out[1]["n_removed"] == 16


def test_exact_substring_normalization(spark):
    # case/whitespace-insensitive matching (the _normalized contract
    # every dedup operator shares)
    df = _docs(
        spark,
        [(1, "A  B c d E f g H tail"), (2, "a b C D e F G h coda")],
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, 8).collect()}
    assert out[1]["clean_text"] == "tail"
    assert out[2]["clean_text"] == "coda"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_session_dedup_elects_lowest(spark):
    # two users, identical click|buy trajectories → user 1 keeps
    df = _events(
        spark,
        [
            (1, _t(0), 1, "click"),
            (2, _t(1), 1, "buy"),
            (3, _t(0), 2, "click"),
            (4, _t(1), 2, "buy"),
        ],
    )
    out = {
        (r["user_id"], r["session_id"]): r
        for r in session_dedup(df, gap_seconds=1800).collect()
    }
    assert out[(1, 1)]["kept"] is True
    assert out[(2, 1)]["kept"] is False
    assert out[(1, 1)]["dup_count"] == 2 == out[(2, 1)]["dup_count"]
    assert out[(1, 1)]["sig"] == out[(2, 1)]["sig"]
    assert out[(1, 1)]["n_events"] == 2


def test_session_dedup_gap_splits_sessions(spark):
    # 31-minute silence breaks the session; the two singleton "click"
    # sessions are the SAME trajectory class, first one survives
    df = _events(
        spark,
        [(1, _t(0), 1, "click"), (2, _t(31), 1, "click")],
    )
    rows = session_dedup(df, gap_seconds=1800).collect()
    assert len(rows) == 2
    by_sid = {r["session_id"]: r for r in rows}
    assert by_sid[1]["kept"] is True and by_sid[2]["kept"] is False
    assert by_sid[1]["dup_count"] == 2


def test_session_dedup_order_within_session_is_exact(spark):
    # click|buy and buy|click are DIFFERENT trajectories — both kept
    df = _events(
        spark,
        [
            (1, _t(0), 1, "click"),
            (2, _t(1), 1, "buy"),
            (3, _t(0), 2, "buy"),
            (4, _t(1), 2, "click"),
        ],
    )
    rows = session_dedup(df, gap_seconds=1800).collect()
    assert all(r["kept"] for r in rows)
    assert all(r["dup_count"] == 1 for r in rows)


def test_session_dedup_partitioning_independent(spark):
    import random

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        minute = 0
        for _ in range(rng.randint(2, 8)):
            minute += rng.choice([1, 2, 40])
            rows.append(
                (eid, base + dt.timedelta(minutes=minute), u,
                 rng.choice(["a", "b", "c"]))
            )
            eid += 1
    df = _events(spark, rows)
    a = session_dedup(df).collect()
    b = session_dedup(df.repartition(13)).collect()
    assert a == b


def test_session_dedup_separator_in_event_type_no_collision(spark):
    # ADVICE r9: under the raw '|' join, ["a|b"] and ["a","b"] produced
    # the same signature and falsely deduped; per-element hashing makes
    # the join injective. The two trajectories must be DISTINCT classes.
    df = _events(
        spark,
        [
            (1, _t(0), 1, "a|b"),
            (2, _t(0), 2, "a"),
            (3, _t(1), 2, "b"),
        ],
    )
    rows = session_dedup(df, gap_seconds=1800).collect()
    assert len(rows) == 2
    sigs = {r["user_id"]: r["sig"] for r in rows}
    assert sigs[1] != sigs[2]
    assert all(r["kept"] for r in rows)
    assert all(r["dup_count"] == 1 for r in rows)


def test_exact_substring_pretokenized_composition_one_corpus_scan(
    spark, sf_smoke, tmp_path
):
    """Pin the docstring's escape hatch (VERDICT r9 item 6): at scale
    the tokenized corpus is materialized ONCE (one corpus scan + one
    write) and all four plan branches feed from the materialization.
    Asserts (a) the dedup plan never references the original corpus
    parquet — the corpus is scanned exactly once, by the
    materialization step; (b) the branch scans of the tokenized table
    are column-pruned to (doc_id, text); (c) the composed result is
    row-identical to running the operator on the raw corpus."""
    from pyspark.sql import functions as F

    corpus_path = str(tmp_path / "corpus")
    tokened_path = str(tmp_path / "tokenized")
    docs = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .where(F.col("doc_id") < 120)
        .select("doc_id", "text")
    )
    docs.write.parquet(corpus_path)

    corpus = spark.read.parquet(corpus_path)
    # the materialization pass: normalize + tokenize + space-join once
    corpus.select(
        "doc_id",
        F.array_join(
            F.filter(
                F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "),
                lambda x: x != F.lit(""),
            ),
            " ",
        ).alias("text"),
    ).write.parquet(tokened_path)

    out = exact_substring_dedup(spark.read.parquet(tokened_path))
    # the composed plan reads ONLY the materialized tokenized table —
    # the raw corpus was scanned exactly once, by the materialization
    files = out.inputFiles()
    assert files, "expected file-backed scans"
    assert all(tokened_path + "/" in f for f in files), files
    assert not any(corpus_path + "/" in f for f in files), files
    # every branch scan is column-pruned to (a subset of) the two live
    # columns — one branch needs only text (the duplicated-window
    # count), which is even tighter pruning
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    schemas = [m.group(1).strip() for m in re.finditer(r"ReadSchema: ([^\n]*)", plan)]
    assert schemas
    for s in schemas:
        assert s in (
            "struct<doc_id:bigint,text:string>",
            "struct<text:string>",
            "struct<doc_id:bigint>",
        ), s
    want = exact_substring_dedup(spark.read.parquet(corpus_path)).collect()
    assert out.collect() == want


# ---- x162: keep-one-canonical ExactSubstr ---------------------------------
from samba_spark.operators.dedup import exact_substring_keep_one


def test_keep_one_preserves_exactly_one_copy(spark):
    dup = "a b c d e f g h"  # exactly 8 tokens
    df = _docs(
        spark,
        [
            (1, f"{dup} one tail"),
            (2, f"lead {dup} two coda"),
        ],
    )
    out = {r["doc_id"]: r for r in exact_substring_keep_one(df).collect()}
    # canonical class occurrence = lowest (doc_id, wpos): doc 1 keeps it
    assert out[1]["clean_text"] == f"{dup} one tail"
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "lead two coda"
    assert out[2]["n_removed"] == 8


def test_keep_one_self_repeat_keeps_first_occurrence(spark):
    dup = "a b c d e f g h"
    df = _docs(spark, [(1, f"{dup} mid {dup}")])
    out = exact_substring_keep_one(df).collect()[0]
    # the first occurrence (wpos 0) is canonical; windows STRADDLING
    # the middle are unique, so only the second full occurrence goes
    assert out["clean_text"].startswith(dup)
    assert out["n_removed"] == 8
    # the remove-ALL sibling cuts both occurrences
    all_out = exact_substring_dedup(df).collect()[0]
    assert all_out["n_removed"] >= 16


def test_keep_one_removes_no_more_than_remove_all(spark, sf_smoke):
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .where(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    keep = {r["doc_id"]: r["n_removed"]
            for r in exact_substring_keep_one(docs).collect()}
    alln = {r["doc_id"]: r["n_removed"]
            for r in exact_substring_dedup(docs).collect()}
    assert set(keep) == set(alln)
    assert all(keep[d] <= alln[d] for d in keep)
    # and at least one canonical copy was actually preserved somewhere
    assert sum(keep.values()) < sum(alln.values()) or sum(alln.values()) == 0


def test_keep_one_short_docs_pass_through(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    out = {r["doc_id"]: r for r in exact_substring_keep_one(df).collect()}
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


# ---- x163: SFT curation chain ---------------------------------------------
from samba_spark.operators.sessionize import sft_curation


def _mk_session(rows, uid, t0_minute, types):
    eid = max((r[0] for r in rows), default=0) + 1
    for k, ty in enumerate(types):
        rows.append((eid + k, _t(t0_minute, k), uid, ty))


def test_sft_curation_screens_and_dedup(spark):
    rows = []
    _mk_session(rows, 1, 0, ["click", "buy"])        # kept (canonical)
    _mk_session(rows, 2, 0, ["click", "buy"])        # dup trajectory -> out
    _mk_session(rows, 3, 0, ["click"])               # singleton -> screened
    _mk_session(rows, 4, 0, ["view"] * 4)            # one type -> screened
    _mk_session(rows, 5, 0, ["view"] * 60)           # too long -> screened
    _mk_session(rows, 6, 0, ["view", "click", "buy"])  # kept
    out = sft_curation(_events(spark, rows), gap_seconds=1800)
    got = {(r["user_id"], r["session_id"]): r for r in out.collect()}
    assert set(got) == {(1, 1), (6, 1)}
    assert got[(1, 1)]["dup_count"] == 2
    assert got[(1, 1)]["first_type"] == "click"
    assert got[(6, 1)]["n_types"] == 3


def test_sft_curation_cap_per_first_type(spark):
    rows = []
    for u in range(1, 8):
        # distinct second types -> 7 distinct trajectories, same first_type
        _mk_session(rows, u, 0, ["click", f"t{u}"])
    out = sft_curation(
        _events(spark, rows), gap_seconds=1800, cap_per_first_type=3
    )
    assert out.count() == 3
    assert all(r["first_type"] == "click" for r in out.collect())


def test_sft_curation_repartition_stable(spark):
    import random

    rng = random.Random(11)
    rows = []
    for u in range(1, 30):
        types = [rng.choice(["a", "b", "c", "d"]) for _ in range(rng.randint(1, 6))]
        _mk_session(rows, u, rng.randint(0, 50), types)
    df = _events(spark, rows)
    a = sft_curation(df, cap_per_first_type=5).collect()
    b = sft_curation(df.repartition(17), cap_per_first_type=5).collect()
    assert a == b


# ---- x165: incremental sessionization --------------------------------------
from samba_spark.operators.sessionize import sessionize, sessionize_incremental


def _sess_rows(df):
    return sorted(
        (r["user_id"], r["event_id"], r["session_id"]) for r in df.collect()
    )


def test_incremental_sessionize_matches_batch(spark, tmp_path):
    import random

    rng = random.Random(13)
    rows, eid = [], 0
    for u in range(8):
        minute = 0
        for _ in range(rng.randint(3, 12)):
            minute += rng.choice([1, 5, 40, 90])
            rows.append((eid, _t(0) + dt.timedelta(minutes=minute), u, "e"))
            eid += 1
    df = _events(spark, rows)
    cutoff = _t(0) + dt.timedelta(minutes=120)
    store = str(tmp_path / "store")
    sessionize_incremental(spark, store, df.where(f"ts < '{cutoff}'"))
    sessionize_incremental(spark, store, df.where(f"ts >= '{cutoff}'"))
    got = _sess_rows(spark.read.parquet(store))
    want = _sess_rows(
        sessionize(df, gap_seconds=1800).select(
            "user_id", "event_id", "session_id"
        )
    )
    assert got == want


def test_incremental_sessionize_continues_tail_session(spark, tmp_path):
    # events 10 min apart across the cutoff: ONE session
    df = _events(
        spark, [(1, _t(0), 1, "a"), (2, _t(10), 1, "b"), (3, _t(20), 1, "c")]
    )
    store = str(tmp_path / "store")
    sessionize_incremental(spark, store, df.where("event_id <= 2"))
    out = sessionize_incremental(spark, store, df.where("event_id = 3"))
    assert [(r["event_id"], r["session_id"]) for r in out.collect()] == [(3, 1)]
    # and a 31-min silence starts session 2
    df2 = _events(spark, [(4, _t(51), 1, "d")])
    out2 = sessionize_incremental(spark, store, df2)
    assert out2.collect()[0]["session_id"] == 2


def test_incremental_sessionize_new_user_in_delta(spark, tmp_path):
    store = str(tmp_path / "store")
    sessionize_incremental(spark, store, _events(spark, [(1, _t(0), 1, "a")]))
    out = sessionize_incremental(
        spark, store, _events(spark, [(2, _t(5), 2, "a")])
    )
    assert out.collect()[0]["session_id"] == 1


def test_incremental_sessionize_rejects_late_data(spark, tmp_path):
    store = str(tmp_path / "store")
    sessionize_incremental(spark, store, _events(spark, [(1, _t(30), 1, "a")]))
    with pytest.raises(Exception, match="predates its user's stored maximum"):
        sessionize_incremental(
            spark, store, _events(spark, [(2, _t(10), 1, "b")])
        ).collect()
