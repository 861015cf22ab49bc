"""Property-based invariants (hypothesis) for the extension operators —
random inputs, Python-reference semantics. Heavier strategies are kept
small: each example pays Spark job overhead, so the value is in the shape
coverage (empty strings, unicode, duplicate rows), not the example count.
"""

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab c.\tZ9é")),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


@settings(**_SETTINGS)
@given(_texts)
def test_dedup_exact_partitions_by_text(spark, texts):
    """Exact dedup: one keeper per distinct text, keeper is the min doc_id,
    group sizes sum to the row count."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    from samba_spark.operators.dedup import dedup_exact

    out = dedup_exact(docs).collect()
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    assert len(out) == len(by_text)
    expected = {min(ids): len(ids) for ids in by_text.values()}
    assert {r.keep_doc_id: r.n_dups for r in out} == expected


@settings(**_SETTINGS)
@given(_texts)
def test_fingerprint_collision_iff_normalized_equal(spark, texts):
    """fingerprint(x) == fingerprint(y) ⇔ normalized(x) == normalized(y)
    (md5 collisions are not a realistic hypothesis input)."""
    import re

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    from samba_spark.operators.textual import fingerprint

    fps = {r.doc_id: r.fp for r in fingerprint(docs).collect()}

    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            assert (fps[i] == fps[j]) == (norm(a) == norm(b)), (a, b)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-5, max_value=5, allow_nan=False, width=32
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_cosine_topk_matches_python_reference(spark, vecs):
    """Brute-force cosine top-k agrees with a NumPy-free Python reference
    on ranking (sim rounded to 6, ties by vec_id — the declared contract)."""
    from samba_spark.operators.simsearch import cosine_topk

    # skip degenerate all-zero vectors (norm 0 → NaN sim on both sides is
    # fine, but ranking NaNs is not part of the contract)
    if any(all(x == 0 for x in v) for v in vecs):
        return
    embs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    queries = embs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    got = [
        (r.vec_id, r.rank)
        for r in cosine_topk(embs, queries, k=len(vecs))
        .orderBy("rank")
        .collect()
    ]

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return round(d / (na * nb), 6)

    q = vecs[0]
    ref = sorted(
        range(len(vecs)), key=lambda i: (-cos(q, vecs[i]), i)
    )
    assert [v for v, _ in got] == ref


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_connected_components_matches_union_find(spark, edge_list):
    """Connected components agrees with a driver-side union-find on
    arbitrary small graphs (self-loops and duplicate edges included)."""
    from samba_spark.operators.graph import connected_components

    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r.vertex: r.component for r in connected_components(edges).collect()
    }

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}
    assert got == expected


@settings(**_SETTINGS)
@given(_texts)
def test_chunking_conservation(spark, texts):
    """Non-overlapping chunking (stride == chunk) partitions the token
    stream exactly: chunk lengths sum to the token count and the joined
    chunk texts reassemble the normalized document."""
    from samba_spark.operators.chunking import chunk_documents
    from samba_spark.operators.textual import tokens_col

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    toks = {
        r.doc_id: r.t
        for r in docs.select("doc_id", tokens_col(F.col("text")).alias("t")).collect()
    }
    chunks = chunk_documents(docs, chunk=3, stride=3, with_text=True).collect()
    per_doc = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert sum(r.chunk_len for r in rows) == len(toks[doc_id])
        assert " ".join(r.chunk_text for r in rows) == " ".join(toks[doc_id])
    # zero-token docs emit nothing; everything else emits >= 1 chunk
    for doc_id, t in toks.items():
        assert (doc_id in per_doc) == (len(t) > 0)


@settings(**_SETTINGS)
@given(_texts)
def test_merge_upsert_idempotent(spark, texts):
    """Applying the same update batch twice equals applying it once, and
    the merged key set is the union of base and update keys."""
    from samba_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["k", "v"]
    )
    updates = spark.createDataFrame(
        [(i, t + "!") for i, t in enumerate(texts) if i % 2 == 0]
        + [(len(texts) + 1, "new")],
        ["k", "v"],
    )
    once = {(r.k, r.v) for r in merge_upsert(base, updates, ["k"]).collect()}
    twice = {
        (r.k, r.v)
        for r in merge_upsert(
            merge_upsert(base, updates, ["k"]), updates, ["k"]
        ).collect()
    }
    assert once == twice
    assert {k for k, _ in once} == set(range(len(texts))) | {len(texts) + 1}


@settings(**_SETTINGS)
@given(_texts)
def test_snapshot_diff_self_is_empty(spark, texts):
    from samba_spark.operators.merge import snapshot_diff

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    assert snapshot_diff(docs, docs).count() == 0


@settings(**_SETTINGS)
@given(_texts)
def test_bloom_dedup_equals_plain_on_random_corpora(spark, texts):
    """dedup_incremental_bloom is output-identical to dedup_incremental on
    arbitrary corpora, including under a tiny m that forces every doc
    through the false-positive verify path."""
    from samba_spark.operators.dedup import (
        dedup_incremental,
        dedup_incremental_bloom,
    )

    half = max(1, len(texts) // 2)
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts[:half])], ["doc_id", "text"]
    )
    incoming = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(texts[half:] or ["x"])],
        ["doc_id", "text"],
    )
    plain = sorted(
        (r.keep_doc_id, r.n_batch_dups)
        for r in dedup_incremental(incoming, corpus).collect()
    )
    bloom = sorted(
        (r.keep_doc_id, r.n_batch_dups)
        for r in dedup_incremental_bloom(incoming, corpus, m=8).collect()
    )
    assert bloom == plain


_runs = st.lists(
    st.tuples(st.sampled_from(["k1", "k2"]), st.sampled_from(["a", "b", None])),
    min_size=1,
    max_size=14,
)


@settings(**_SETTINGS)
@given(_runs)
def test_scd2_history_invariants(spark, rows):
    """SCD2 islands partition each key's rows: n_rows sums to the key's
    row count, versions are contiguous 1..k, consecutive islands differ in
    attr, and ranges don't overlap in the sequence order."""
    from samba_spark.operators.merge import scd2_history

    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, seq long, v string")
    out = sorted(
        (
            (r.k, r.version, r.attr, r.effective_from, r.effective_to, r.n_rows)
            for r in scd2_history(df, "k", ["seq"], "v").collect()
        )
    )
    per_key = {}
    for k, i, v in data:
        per_key.setdefault(k, []).append((i, v))
    for k, seq in per_key.items():
        islands = [r for r in out if r[0] == k]
        assert [r[1] for r in islands] == list(range(1, len(islands) + 1))
        assert sum(r[5] for r in islands) == len(seq)
        for a, b in zip(islands, islands[1:]):
            assert a[2] != b[2]  # consecutive islands differ
            assert a[4] < b[3]  # ranges ordered, non-overlapping
        # replay the reference islanding
        ref = []
        for i, v in sorted(seq):
            if not ref or ref[-1][0] != v:
                ref.append([v, 1])
            else:
                ref[-1][1] += 1
        assert [(r[2], r[5]) for r in islands] == [tuple(x) for x in ref]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(min_value=0.01, max_value=50.0, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
def test_binned_quantiles_bracket_property(spark, values):
    """Histogram quantile estimate is ≥ the true quantile and within one
    bucket width above the bucket containing it."""
    from samba_spark.operators.sketch import binned_quantiles

    df = spark.createDataFrame([("g", float(v)) for v in values], "g string, v double")
    got = {
        r.p_pct: r.est_cents
        for r in binned_quantiles(df, "v", "g", quantiles=(50, 99)).collect()
    }
    n = len(values)
    s = sorted(values)
    for p in (50, 99):
        # true quantile = smallest x with rank(x) >= ceil(p*n/100)
        import math as m

        true_v = s[m.ceil(p * n / 100) - 1]
        true_cents = true_v * 100
        assert got[p] >= true_cents - 1e-6, (p, got[p], true_cents)
        assert got[p] <= (m.floor(true_cents / 25) + 1) * 25 + 1e-6, (
            p,
            got[p],
            true_cents,
        )


_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=0,
    max_size=24,
)


@settings(**_SETTINGS)
@given(_edges)
def test_triangle_count_matches_brute_force(spark, edge_list):
    """Degree-ordered wedge closure equals the O(n³) reference count on
    random multigraphs (self-loops, duplicates, both directions)."""
    from itertools import combinations

    from samba_spark.operators.graph import triangle_count

    canon = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    verts = sorted({v for e in canon for v in e})
    expected = {}
    for x, y, z in combinations(verts, 3):
        if {(x, y), (x, z), (y, z)} <= canon:
            for v in (x, y, z):
                expected[v] = expected.get(v, 0) + 1
    if not edge_list:
        return
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.vertex: r.n_triangles for r in triangle_count(df).collect()}
    assert got == expected


_events = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user
        st.integers(0, 2000),                   # seconds offset
        st.sampled_from(["view", "click", "purchase"]),
        st.floats(0.0, 99.0, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(_events)
def test_attribution_matches_python_reference(spark, rows):
    """First/last-touch credit matrix equals a per-user sequential replay:
    same touches, same conversion counts, same cents."""
    import datetime as dt

    from samba_spark.operators.sessionize import attribution

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, u, t0 + dt.timedelta(seconds=s), et, v)
        for i, (u, s, et, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    expected = {}
    by_user = {}
    for i, u, ts, et, v in data:
        by_user.setdefault(u, []).append((ts, i, et, v))
    for u, evs in by_user.items():
        first = last = None
        for ts, i, et, v in sorted(evs):
            if et == "purchase" and first is not None:
                key = (first, last)
                c, cents = expected.get(key, (0, 0))
                expected[key] = (c + 1, cents + round(v * 100))
            if et != "purchase":
                last = et
                if first is None:
                    first = et
    got = {
        (r.first_touch, r.last_touch): (r.n_conversions, r.value_cents)
        for r in attribution(df).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(_events)
def test_concurrency_profile_matches_global_sweep(spark, rows):
    """Day-bucketed carry-ladder sweep equals the naive single-pass
    global sweep, including intervals crossing day boundaries."""
    import datetime as dt

    from samba_spark.operators.sessionize import concurrency_profile

    t0 = dt.datetime(2024, 1, 1, 23, 50)  # near midnight: force crossings
    data = [
        (i, u, t0 + dt.timedelta(seconds=s * 60), et, v)
        for i, (u, s, et, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    pts = []
    for i, _, ts, _, _ in data:
        pts.append((ts, 1, i))
        pts.append((ts + dt.timedelta(seconds=300), -1, i))
    run, best = 0, {}
    for t, d, i in sorted(pts):
        run += d
        day = t.replace(hour=0, minute=0, second=0, microsecond=0)
        best[day] = max(best.get(day, -(10 ** 9)), run)
    got = {r.day: r.max_concurrency for r in concurrency_profile(df).collect()}
    assert got == best


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200_000),
            st.sampled_from(["a", "b"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bitmap_distinct_matches_python_reference(spark, pairs):
    """Bucketed bitmap distinct == Python set cardinality per group, for
    ids spanning multiple 32768-bit buckets."""
    from samba_spark.operators.sketches import bitmap_distinct

    df = spark.createDataFrame(pairs, ["uid", "grp"])
    got = {
        r["grp"]: r["n_distinct"]
        for r in bitmap_distinct(df, ["grp"], "uid").collect()
    }
    want = {}
    for uid, grp in pairs:
        want.setdefault(grp, set()).add(uid)
    assert got == {g: len(s) for g, s in want.items()}


@settings(**_SETTINGS)
@given(
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=50),
    st.integers(min_value=0, max_value=100),
)
def test_stratified_split_proportion_property(spark, labels, pct):
    """For every stratum: train == floor(pct·n/100) exactly, at any pct."""
    from samba_spark.operators.mixing import stratified_exact_split

    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(labels)], ["id", "label"]
    )
    out = stratified_exact_split(df, "id", ["label"], train_pct=pct).collect()
    per = {}
    for r in out:
        a, b = per.setdefault(r["label"], [0, 0])
        per[r["label"]] = [a + (r["split"] == "train"), b + 1]
    from collections import Counter

    totals = Counter(labels)
    for label, (n_train, n_all) in per.items():
        assert n_all == totals[label]
        assert n_train == (pct * totals[label]) // 100


@settings(**_SETTINGS)
@given(
    st.lists(
        st.sampled_from(["view", "click", "purchase", "error"]),
        min_size=1,
        max_size=30,
    )
)
def test_journey_pattern_matches_python_re(spark, etypes):
    """Regex conversion count over the journey string == Python re on the
    same sequence (single user, ts ordered by event_id)."""
    import datetime as dt
    import re

    from samba_spark.operators.sketches import (
        journey_string,
        pattern_match_counts,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=i), i, et)
        for i, et in enumerate(etypes)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    j = journey_string(df)
    got = j.select(pattern_match_counts(j, "vc*p").alias("n")).collect()[0]["n"]
    want = len(re.findall("vc*p", "".join(e[0] for e in etypes)))
    assert got == want


_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),     # price
        st.integers(min_value=0, max_value=10),     # size
    ),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(_points)
def test_skyline_matches_bruteforce(spark, pts):
    from samba_spark.operators.relational import skyline_2d

    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    got = {
        (r.price, r.size, r.id)
        for r in skyline_2d(df, "price", "size", "id", bucket_width=7)
        .collect()
    }

    def dominated(r):
        return any(
            s[1] <= r[1] and s[2] >= r[2] and (s[1] < r[1] or s[2] > r[2])
            for s in rows
        )

    nd = [r for r in rows if not dominated(r)]
    # operator keeps the min-id representative per (price, size) point
    want = {}
    for i, p, s in nd:
        want[(p, s)] = min(want.get((p, s), i), i)
    assert got == {(p, s, i) for (p, s), i in want.items()}


_cent_series = st.lists(
    st.integers(min_value=-10_000, max_value=10_000),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(_cent_series)
def test_mad_outliers_matches_python_reference(spark, cents):
    import datetime

    from samba_spark.operators.sessionize import mad_outliers

    rows = [
        (i, datetime.datetime(2026, 1, 1), "g", c / 100.0)
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )
    got = {r.event_id for r in mad_outliers(df).collect()}

    def interp_median_x2(vals):
        s = sorted(vals)
        n = len(s)
        if n % 2:
            return 2 * s[n // 2]
        return s[n // 2 - 1] + s[n // 2]

    med2 = interp_median_x2(cents)
    dev2 = [abs(2 * c - med2) for c in cents]
    mad4 = interp_median_x2(dev2)
    want = {
        i for i, d in enumerate(dev2) if d * 2 * 10000 > 44478 * mad4
    }
    assert got == want


@settings(**_SETTINGS)
@given(_cent_series)
def test_cusum_matches_python_reference(spark, cents):
    import datetime

    from samba_spark.operators.sessionize import cusum_changepoint

    rows = [
        (i, datetime.datetime(2026, 1, 1 + i // 4, 6, i % 4), "g", c / 100.0)
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )
    r = cusum_changepoint(df).collect()[0]
    n, tot = len(cents), sum(cents)
    best = max(
        (abs(n * sum(cents[:k]) - k * tot), -k)
        for k in range(1, n + 1)
    )
    assert (r.n, r.d_abs, r.k_star) == (n, best[0], -best[1])


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),    # day offset
            st.integers(min_value=0, max_value=5),    # events that day
        ),
        min_size=1,
        max_size=8,
    )
)
def test_interpolation_matches_python_reference(spark, spec):
    import datetime

    from samba_spark.operators.sessionize import interpolate_daily_counts

    rows, eid = [], 0
    counts = {}
    for day_off, n in spec:
        counts[day_off] = counts.get(day_off, 0) + n
        for _ in range(n):
            rows.append(
                (eid, datetime.datetime(2026, 2, 1 + day_off), 1, "e", 0.0, "")
            )
            eid += 1
    counts = {d: n for d, n in counts.items() if n > 0}
    if not rows:
        return
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        r.day.day - 1: (r.observed, r.count_x1000)
        for r in interpolate_daily_counts(df).collect()
    }
    d0, d1 = min(counts), max(counts)
    for d in range(d0, d1 + 1):
        if d in counts:
            assert got[d] == (True, counts[d] * 1000)
        else:
            p = max(x for x in counts if x < d)
            nx = min(x for x in counts if x > d)
            num = counts[p] * 1000 * (nx - p) + (counts[nx] - counts[p]) * 1000 * (d - p)
            assert got[d] == (False, num // (nx - p))
    assert set(got) == set(range(d0, d1 + 1))


@settings(**_SETTINGS)
@given(_cent_series)
def test_winsorize_matches_python_reference(spark, cents):
    import datetime

    from samba_spark.operators.sessionize import winsorize_audit

    rows = [
        (i, datetime.datetime(2026, 3, 1), "g", c / 100.0)
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "event_type", "value"]
    )
    r = winsorize_audit(df).collect()[0]

    def q20(vals, p):
        # (n-1)p interpolation, scaled x20 (exact for p on the 1/20 grid)
        s = sorted(vals)
        pos = (len(s) - 1) * p
        lo, frac = int(pos), pos - int(pos)
        v = s[lo] if frac == 0 else s[lo] * (1 - frac) + s[lo + 1] * frac
        return round(v * 20)

    lo20, hi20 = q20(cents, 0.05), q20(cents, 0.95)
    c20 = [c * 20 for c in cents]
    assert (r.lo20, r.hi20) == (lo20, hi20)
    assert r.n_clipped_low == sum(1 for c in c20 if c < lo20)
    assert r.n_clipped_high == sum(1 for c in c20 if c > hi20)
    assert r.sum_winsorized20 == sum(
        min(max(c, lo20), hi20) for c in c20
    )


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),   # minutes offset
            st.integers(min_value=-5000, max_value=5000),  # cents
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
def test_twap_matches_python_reference(spark, ticks):
    import datetime

    from samba_spark.operators.sessionize import time_weighted_average

    base = datetime.datetime(2026, 3, 2)
    rows = [
        (i, base + datetime.timedelta(minutes=m), 7, "e", c / 100.0)
        for i, (m, c) in enumerate(sorted(ticks))
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    r = time_weighted_average(df).collect()[0]
    ordered = sorted(ticks)
    num = den = 0
    for (m0, c0), (m1, _) in zip(ordered, ordered[1:]):
        held = (m1 - m0) * 60 * 1_000_000
        num += c0 * held
        den += held
    assert (r.twap_num, r.twap_den) == (num, den)


_url_parts = st.tuples(
    st.sampled_from(["http", "https", "HTTP", "HTTPS", "hTtPs"]),
    st.text(alphabet=st.sampled_from(list("abEx.")), min_size=1, max_size=8),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(
        st.sampled_from(["Docs", "p", "A9", "x"]), min_size=0, max_size=3
    ),
    st.booleans(),  # trailing slash
    st.lists(
        st.sampled_from(
            ["a=1", "b=2", "z=", "utm_source=x", "utm_campaign=9",
             "ref=feed", "gclid=g1", "B=3"]
        ),
        min_size=0,
        max_size=4,
    ),
    st.sampled_from(["", "#frag", "#a?b=2"]),
)


@settings(**_SETTINGS)
@given(st.lists(_url_parts, min_size=1, max_size=8))
def test_canonicalize_url_matches_python_reference(spark, parts):
    """canonicalize_url vs a pure-Python reference implementing the same
    contract (fragment drop, scheme+host lowercase, default-port strip,
    tracking-param filter + sort, trailing-slash strip) over randomly
    composed URLs — including fragment text containing '?', empty param
    values, repeated params, and mixed-case schemes."""
    import re

    from samba_spark.operators.textual import (
        TRACKING_PARAM_RE,
        canonicalize_url,
    )

    def py_canon(url: str) -> str:
        no_frag = re.sub(r"#.*$", "", url)
        base = re.sub(r"\?.*$", "", no_frag)
        m = re.search(r"\?(.*)$", no_frag)
        query = m.group(1) if m else ""
        hm = re.match(r"^([^/]*//[^/]*)", base)
        head = hm.group(1).lower() if hm else ""
        if head.startswith("https://"):
            head = re.sub(r":443$", "", head)
        else:
            head = re.sub(r":80$", "", head)
        path = re.sub(r"/$", "", re.sub(r"^[^/]*//[^/]*", "", base))
        kept = sorted(
            p for p in query.split("&")
            if p != "" and not re.match(TRACKING_PARAM_RE, p)
        )
        return head + path + ("?" + "&".join(kept) if kept else "")

    urls = []
    for scheme, host, port, segs, slash, params, frag in parts:
        u = f"{scheme}://{host}{port}"
        if segs:
            u += "/" + "/".join(segs)
        if slash:
            u += "/"
        if params:
            u += "?" + "&".join(params)
        u += frag
        urls.append(u)
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["i", "url"]
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == py_canon(u), (u, got[i], py_canon(u))


_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=150),   # minute offset
        st.integers(min_value=0, max_value=70000),  # id spans 3 bitmap buckets
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_events)
def test_sliding_distinct_paths_match_python_reference(spark, rows):
    """Both sliding-distinct physical paths (triple fan-out x110 and
    bucket-bitmap x118) must equal the brute-force Python window count on
    random events — ids crossing 32768-bucket boundaries, duplicate
    (group, minute, id) rows, windows spanning the 59-minute boundary."""
    import datetime

    from samba_spark.operators.sketches import (
        sliding_distinct,
        sliding_distinct_bitmap,
    )

    base = datetime.datetime(2026, 7, 1, 0, 0)
    data = [
        (i, base + datetime.timedelta(minutes=m), uid, g, 0.0)
        for i, (m, uid, g) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    expected = {}
    minutes = {(g, m) for m, _, g in rows}
    for g, m in minutes:
        ids = {u for m2, u, g2 in rows if g2 == g and m - 59 <= m2 <= m}
        expected[(g, base + datetime.timedelta(minutes=m))] = len(ids)
    for op in (sliding_distinct, sliding_distinct_bitmap):
        got = {
            (r.event_type, r.minute): r.n_distinct
            for r in op(df, group_col="event_type").collect()
        }
        assert got == expected, op.__name__


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=30),
    st.lists(st.integers(0, 80), min_size=1, max_size=20),
)
def test_bloom_never_false_negative(spark, corpus_ids, probe_ids):
    """For ANY corpus/probe pair: every probe key that IS in the corpus
    must verdict maybe_dup (the structural zero-false-negative
    guarantee), whatever the overlap shape, duplicates included."""
    from samba_spark.operators.sketches import (
        bloom_filter_table,
        bloom_probe,
    )

    corpus = spark.createDataFrame(
        [(f"k{v}",) for v in corpus_ids], ["k"]
    )
    probe = spark.createDataFrame(
        [(i, f"k{v}") for i, v in enumerate(probe_ids)], ["id", "k"]
    )
    bloom = bloom_filter_table(corpus, "k")
    verdicts = {
        r.id: r.status for r in bloom_probe(bloom, probe, "k", "id").collect()
    }
    present = set(corpus_ids)
    for i, v in enumerate(probe_ids):
        if v in present:
            assert verdicts[i] == "maybe_dup", (i, v)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=60),
    st.lists(st.integers(0, 200), min_size=1, max_size=60),
)
def test_kmv_exact_regime_matches_set_algebra(spark, a_keys, b_keys):
    """Below k distinct hashes the KMV sketch IS the set: est_a/est_b/
    est_union/est_inter must equal the true set cardinalities for any
    input pair (duplicates collapse)."""
    from samba_spark.operators.sketches import (
        kmv_set_ops_pairwise,
        kmv_sketch,
    )

    rows = [("A", v) for v in a_keys] + [("B", v) for v in b_keys]
    df = spark.createDataFrame(rows, ["g", "k"])
    sk = kmv_sketch(df, "g", "k", k=256)
    out = kmv_set_ops_pairwise(sk, k=256).collect()
    sa, sb = set(a_keys), set(b_keys)
    assert len(out) == 1
    r = out[0]
    assert (r.est_a, r.est_b, r.est_union, r.est_inter) == (
        len(sa), len(sb), len(sa | sb), len(sa & sb),
    )
