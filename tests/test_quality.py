

def test_fd_profile_holds_and_violations(spark):
    from samba_spark.operators.quality import fd_profile

    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 11),
            (2, "b", 20),
            (2, "c", 20),
            (3, "d", 30),
        ],
        ["k", "s", "v"],
    )
    got = {
        r.fd: r.asDict()
        for r in fd_profile(
            df,
            {
                "k->s": (["k"], "s"),      # fails: k=2 maps to {b,c}
                "k->v": (["k"], "v"),      # fails: k=1 maps to {10,11}
                "s->k": (["s"], "k"),      # holds
                "k,s->v": (["k", "s"], "v"),  # fails only on (1,a)
            },
        ).collect()
    }
    assert got["k->s"]["violating_groups"] == 1
    assert got["k->s"]["max_rhs_distinct"] == 2
    assert not got["k->s"]["holds"]
    assert got["k->v"]["violating_groups"] == 1 and not got["k->v"]["holds"]
    assert got["s->k"]["holds"] and got["s->k"]["n_groups"] == 4
    assert got["k,s->v"]["violating_groups"] == 1
    assert got["k,s->v"]["n_groups"] == 4


def test_fd_profile_null_rhs(spark):
    from samba_spark.operators.quality import fd_profile

    # count_distinct ignores NULLs: a group with {NULL, 'x'} has nd=1.
    df = spark.createDataFrame(
        [(1, None), (1, "x"), (2, None)], ["k", "v"]
    )
    got = {r.fd: r for r in fd_profile(df, {"k->v": (["k"], "v")}).collect()}
    assert got["k->v"].holds
    assert got["k->v"].n_groups == 2


def test_k_anonymity_classes_and_risk(spark):
    from samba_spark.operators.quality import k_anonymity

    df = spark.createDataFrame(
        [
            ("US", "A", 1), ("US", "A", 1), ("US", "A", 2),
            ("US", "A", 2), ("US", "A", 3),          # size 5, l=3: safe
            ("US", "B", 1), ("US", "B", 1),          # size 2, l=1: risk
            ("FR", "A", 9),                          # size 1, l=1: risk
        ],
        ["nation", "segment", "sensitive"],
    )
    got = {
        (r.nation, r.segment): r.asDict()
        for r in k_anonymity(
            df, ["nation", "segment"], "sensitive", k=5
        ).collect()
    }
    assert got[("US", "A")]["class_size"] == 5
    assert got[("US", "A")]["l_diversity"] == 3
    assert not got[("US", "A")]["at_risk"]
    assert got[("US", "B")]["class_size"] == 2
    assert got[("US", "B")]["at_risk"]
    assert got[("FR", "A")]["at_risk"]


def test_benford_profile_counts_and_shares(spark):
    """Digit extraction handles decimals, zeros-in-value, and negatives;
    shares are floor(1e6*n/total); groups get independent totals."""
    from pyspark.sql import functions as F

    from samba_spark.operators.quality import benford_profile

    rows = [
        ("a", 123.45), ("a", 0.042), ("a", -20.0), ("a", 105.5),
        ("a", 900.0), ("b", 7.0), ("b", 70.0), ("b", 0.0),
        # rounds to 0.000000 at scale 6: excluded like an exact zero,
        # must NOT pool into a NULL-digit row that skews b's shares
        ("b", 4e-7),
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        (r.grp, r.digit): (r.n, r.pct_e6)
        for r in benford_profile(df, "v", group_col="g").collect()
    }
    # group a: digits 1 (123.45, 105.5), 4 (0.042), 2 (-20.0), 9 (900)
    assert out[("a", 1)] == (2, 400000)
    assert out[("a", 4)] == (1, 200000)
    assert out[("a", 2)] == (1, 200000)
    assert out[("a", 9)] == (1, 200000)
    # group b: 0.0 is excluded; both values lead with 7
    assert out[("b", 7)] == (2, 1000000)
    assert ("b", 0) not in out
    benford_1 = [
        r.benford_e6
        for r in benford_profile(df, "v").collect()
        if r.digit == 1
    ]
    assert benford_1 == [301029] * len(benford_1)


# --- char_entropy_profile (x145) -------------------------------------------
def test_char_entropy_degenerate_text_fails_gate(spark):
    from samba_spark.operators.textual import char_entropy_profile

    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaa"),          # one symbol: 0 bits
        (2, "abababababababababab"),          # two symbols: ~1 bit
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, ""),                               # empty: 0 bits by contract
        (5, "     "),                          # whitespace-only: 0 bits
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in char_entropy_profile(docs, gate_bits=3.0).collect()
    }
    assert out[1]["entropy_bits"] == 0.0 and not out[1]["keep"]
    assert 0.9 < out[2]["entropy_bits"] < 1.1 and not out[2]["keep"]
    assert out[3]["entropy_bits"] > 3.5 and out[3]["keep"]
    for d in (4, 5):
        assert out[d]["n_chars"] == 0
        assert out[d]["entropy_bits"] == 0.0 and not out[d]["keep"]


def test_char_entropy_partitioning_independent(spark, sf_smoke):
    from samba_spark.operators.textual import char_entropy_profile

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = char_entropy_profile(docs).collect()
    b = char_entropy_profile(docs.repartition(13)).collect()
    assert a == b


def test_char_entropy_case_and_whitespace_normalized(spark):
    from samba_spark.operators.textual import char_entropy_profile

    docs = spark.createDataFrame(
        [(1, "AB ab"), (2, "ab   ab")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in char_entropy_profile(docs).collect()}
    # both normalize to "ab ab": identical histograms
    assert out[1]["entropy_bits"] == out[2]["entropy_bits"]
    assert out[1]["n_chars"] == out[2]["n_chars"] == 5


def test_char_entropy_gate_validation(spark, sf_smoke):
    import pytest as _pytest

    from samba_spark.operators.textual import char_entropy_profile

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    with _pytest.raises(ValueError, match="gate_bits=-1"):
        char_entropy_profile(docs, gate_bits=-1)


# --- quantile_normalize (x153) -----------------------------------------------
def test_quantile_normalize_identical_distributions_fixed_point(spark):
    """Two sources with THE SAME score multiset: calibration is (close
    to) the identity — each rank maps back to the same value."""
    from pyspark.sql import functions as F

    from samba_spark.operators.quality import quantile_normalize

    rows = []
    for i, v in enumerate([10, 20, 30, 40]):
        rows.append((i, "sA", v))
        rows.append((100 + i, "sB", v))
    docs = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = quantile_normalize(docs, F.col("n")).collect()
    for r in out:
        assert r["calibrated_score"] == r["raw_score"]


def test_quantile_normalize_hot_scorer_recalibrated(spark):
    """A source whose scorer runs 10x hot gets mapped onto the global
    scale: its top document no longer outranks every other source's."""
    from pyspark.sql import functions as F

    from samba_spark.operators.quality import quantile_normalize

    rows = [(i, "cool", v) for i, v in enumerate([1, 2, 3, 4])]
    rows += [(10 + i, "hot", v) for i, v in enumerate([10, 20, 30, 40])]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = {r["doc_id"]: r for r in quantile_normalize(docs, F.col("n")).collect()}
    # both top-ranked docs calibrate to the same global value (rank 4/4
    # -> global index 7 -> value 40)
    assert out[3]["calibrated_score"] == out[13]["calibrated_score"] == 40
    # and both bottom-ranked docs to the same value (idx 1 -> 2)
    assert out[0]["calibrated_score"] == out[10]["calibrated_score"]


def test_quantile_normalize_partitioning_independent(spark, sf_smoke):
    from pyspark.sql import functions as F

    from samba_spark.operators.quality import quantile_normalize

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    a = quantile_normalize(docs, F.col("n_chars")).collect()
    b = quantile_normalize(docs.repartition(13), F.col("n_chars")).collect()
    assert a == b


def test_quantile_normalize_no_global_data_window(spark, sf_smoke):
    """The plan must not funnel data rows through a single-partition
    window: every row_number window over DATA rows is partitioned by
    source (`windowspecdefinition(_g#...`); the only un-partitioned
    window is zip_with_index's prefix sum over #partitions rows, which
    computes sum(_n), never row_number."""
    from pyspark.sql import functions as F

    from samba_spark.operators.quality import quantile_normalize

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    plan = (
        quantile_normalize(docs, F.col("n_chars"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    rn_lines = [ln for ln in plan.split("\n") if "row_number()" in ln]
    assert rn_lines, "expected a row_number window in the plan"
    for ln in rn_lines:
        assert "windowspecdefinition(_g#" in ln, (
            "row_number window over data rows is not partitioned by "
            f"source — the 100 TB single-task funnel: {ln}"
        )
