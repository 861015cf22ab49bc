"""deletion_neighborhood_pairs: SymSpell-style edit-distance-1 join."""

from pyspark.sql import functions as F


def _pairs(spark, words, **kw):
    from samba_spark.operators.dedup import deletion_neighborhood_pairs

    df = spark.createDataFrame([(w,) for w in words], ["s"])
    return {
        (r.s_a, r.s_b): r.distance
        for r in deletion_neighborhood_pairs(df, "s", **kw).collect()
    }


def test_finds_all_edit1_kinds(spark):
    got = _pairs(
        spark,
        ["spark", "spa rk", "sprk", "spork", "flink", "flinx", "duck"],
    )
    # deletion, insertion, substitution all land at distance 1
    assert got[("spark", "sprk")] == 1       # deletion
    assert got[("spa rk", "spark")] == 1     # insertion
    assert got[("spark", "spork")] == 1      # substitution
    assert got[("flink", "flinx")] == 1
    # unrelated words never pair
    assert not any("duck" in p for p in got)


def test_excludes_distance_two(spark):
    # 'ab' vs 'ba' share deletion variant 'a' but lev = 2: must be
    # filtered by the exact verify stage.
    got = _pairs(spark, ["ab", "ba"])
    assert got == {}


def test_exact_duplicates_pair_at_zero_distance_absent(spark):
    # dictionary input is distinct strings; identical strings collapse
    # upstream, so s_a < s_b means no self pairs
    got = _pairs(spark, ["same", "same"])
    assert got == {}


def test_brute_force_parity(spark):
    import itertools

    words = [
        "alpha", "alpha1", "alhpa", "alpa", "aalpha", "beta", "betta",
        "bet", "gamma", "gamm", "gama", "delta",
    ]

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        tuple(sorted((a, b))): 1
        for a, b in itertools.combinations(words, 2)
        if lev(a, b) == 1
    }
    got = _pairs(spark, words)
    assert got == want


def test_incremental_lsh_only_delta_pairs(spark):
    from samba_spark.operators.dedup import (
        dedup_incremental_lsh,
        lsh_band_index,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words about spark plans and shuffles"
    docs = spark.createDataFrame(
        [
            (0, dup),        # indexed corpus
            (2, other),      # indexed corpus
            (4, other),      # indexed corpus (even-even dup: must NOT emit)
            (1, dup),        # delta: dup of indexed 0
            (3, dup),        # delta: dup of 0 and 1 (delta-delta pair too)
        ],
        ["doc_id", "text"],
    )
    index = lsh_band_index(docs.where("doc_id % 2 = 0"))
    delta = docs.where("doc_id % 2 = 1")
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental_lsh(index, delta).collect()
    }
    # delta<->corpus and delta<->delta pairs, never corpus<->corpus
    assert got == {(0, 1), (0, 3), (1, 3)}


def test_containment_finds_quoted_paragraph(spark):
    from samba_spark.operators.dedup import ngram_containment_pairs

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    big = (
        "intro words here before the quote "
        + quote
        + " and plenty of trailing commentary words follow the quoted part"
    )
    docs = spark.createDataFrame(
        [
            (1, quote),                      # small doc
            (2, big),                        # contains it verbatim
            (3, "unrelated corpus text about engines and plans"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_a, r.doc_b): r
        for r in ngram_containment_pairs(docs).collect()
    }
    assert (1, 2) in got
    r = got[(1, 2)]
    # every 3-shingle of the quote appears in the big doc
    assert r.n_inter == r.n_small
    assert r.containment == 1.0
    assert not any(3 in p for p in got)


def test_feature_hash_vectors_match_reference(spark):
    import hashlib

    from samba_spark.operators.textual import feature_hash_vectors

    text = "spark spark plan shuffle plan spark"
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = feature_hash_vectors(docs).collect()[0]
    want = [0] * 32
    for t in text.split():
        want[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 32] += 1
    assert list(r.vec) == want
    assert r.nnz == sum(1 for c in want if c) and r.max_count == max(want)
