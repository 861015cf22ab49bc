"""Frequent-itemset mining (operators/mining.frequent_itemsets)."""

from itertools import combinations

import pytest

from samba_spark.operators.mining import frequent_itemsets


def _run(spark, baskets, min_support, max_size=3):
    df = spark.createDataFrame(baskets, ["bk", "it"])
    rows = frequent_itemsets(df, "bk", "it", min_support, max_size).collect()
    return {r.itemset: (r.size, r.support) for r in rows}


def test_hand_checkable_with_frequent_triple(spark):
    # beer+diaper+chips in 3 of 5 baskets; milk in 2; soda once.
    baskets = []
    for bk, items in enumerate(
        [
            ["beer", "diaper", "chips"],
            ["beer", "diaper", "chips", "milk"],
            ["beer", "diaper", "chips"],
            ["beer", "milk"],
            ["soda"],
        ]
    ):
        baskets += [(bk, it) for it in items]
    got = _run(spark, baskets, min_support=3)
    assert got["beer"] == (1, 4)
    assert got["chips"] == (1, 3)
    assert got["diaper"] == (1, 3)
    assert "milk" not in got and "soda" not in got
    assert got["beer|chips"] == (2, 3)
    assert got["beer|diaper"] == (2, 3)
    assert got["chips|diaper"] == (2, 3)
    assert got["beer|chips|diaper"] == (3, 3)
    assert sum(1 for s, _ in got.values() if s == 3) == 1


def test_downward_closure_and_bruteforce(spark):
    # Deterministic pseudo-random baskets; compare against brute force.
    n_items = 8
    baskets = [
        (bk, f"i{i}")
        for bk in range(30)
        for i in range(n_items)
        if (bk * 7 + i * 13) % 5 < 2 or i == bk % n_items
    ]
    min_sup = 8
    got = _run(spark, baskets, min_sup)

    by_bk: dict[int, set] = {}
    for bk, it in baskets:
        by_bk.setdefault(bk, set()).add(it)
    expected = {}
    items = sorted({it for _, it in baskets})
    for size in (1, 2, 3):
        for combo in combinations(items, size):
            s = sum(1 for v in by_bk.values() if set(combo) <= v)
            if s >= min_sup:
                expected["|".join(combo)] = (size, s)
    assert got == expected
    # downward closure: every frequent set's subsets are frequent
    for key, (size, _) in got.items():
        parts = key.split("|")
        for sub in combinations(parts, size - 1):
            if sub:
                assert "|".join(sub) in got


def test_duplicate_rows_collapse_and_max_size(spark):
    baskets = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = _run(spark, baskets, min_support=2, max_size=2)
    assert got == {"a": (1, 2), "b": (1, 2), "a|b": (2, 2)}
    with pytest.raises(ValueError):
        _run(spark, baskets, 1, max_size=4)


def test_basket_cap_skew_guard(spark):
    """One pathological 10k-item basket (50M uncapped pairs in a single
    task) completes in bounded time under max_basket_items, and the cap
    never inflates supports: every reported itemset's support is ≤ the
    exact support and ≥ what the other (uncapped) baskets alone give."""
    import time

    normal = [
        (bk, f"i{i}") for bk in range(50) for i in range(bk % 4, bk % 4 + 3)
    ]
    monster = [(999, f"m{i}") for i in range(10_000)] + [
        (999, "i0"), (999, "i1"), (999, "i2")
    ]
    df = spark.createDataFrame(normal + monster, ["bk", "it"])
    t0 = time.monotonic()
    rows = frequent_itemsets(
        df, "bk", "it", min_support=5, max_basket_items=64
    ).collect()
    elapsed = time.monotonic() - t0
    got = {r.itemset: (r.size, r.support) for r in rows}
    assert elapsed < 120  # uncapped, the 50M-pair task dominates far beyond
    # supports never exceed the exact value (cap can only drop pairs);
    # L1 (size 1) stays exact — the cap only gates pair/triple enumeration
    by_bk: dict[int, set] = {}
    for bk, it in normal + monster:
        by_bk.setdefault(bk, set()).add(it)
    for key, (size, sup) in got.items():
        parts = set(key.split("|"))
        exact = sum(1 for v in by_bk.values() if parts <= v)
        assert sup <= exact
        if size == 1:
            assert sup == exact  # L1 is cap-exempt


def test_basket_cap_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["bk", "it"])
    with pytest.raises(ValueError):
        frequent_itemsets(df, "bk", "it", 1, max_basket_items=1)
