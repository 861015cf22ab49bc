

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
