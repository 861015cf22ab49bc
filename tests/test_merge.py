

def test_delta_join_identity_both_sides(spark):
    """(A_old ⋈ B_old) ∪ delta_join == (A_old∪ΔA) ⋈ (B_old∪ΔB), with
    duplicate keys on both sides so every one of the three delta terms
    contributes rows."""
    from samba_spark.operators.merge import delta_join

    a_old = spark.createDataFrame([(1, "ao1"), (2, "ao2"), (2, "ao3")], ["k", "av"])
    a_new = spark.createDataFrame([(1, "an1"), (3, "an2")], ["k", "av"])
    b_old = spark.createDataFrame([(1, "bo1"), (3, "bo2")], ["k", "bv"])
    b_new = spark.createDataFrame([(2, "bn1"), (3, "bn2")], ["k", "bv"])

    snapshot = a_old.join(b_old, "k")
    fresh = delta_join(a_old, a_new, b_old, b_new, ["k"])
    maintained = sorted(map(tuple, snapshot.unionByName(fresh).collect()))
    full = sorted(
        map(
            tuple,
            a_old.unionByName(a_new)
            .join(b_old.unionByName(b_new), "k")
            .collect(),
        )
    )
    assert maintained == full
    assert len(maintained) > len(sorted(map(tuple, snapshot.collect())))


def test_delta_join_empty_deltas_add_nothing(spark):
    from samba_spark.operators.merge import delta_join

    a = spark.createDataFrame([(1, "a")], ["k", "av"])
    b = spark.createDataFrame([(1, "b")], ["k", "bv"])
    empty_a = a.limit(0)
    empty_b = b.limit(0)
    assert delta_join(a, empty_a, b, empty_b, ["k"]).count() == 0
