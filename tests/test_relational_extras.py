"""Readers/sinks + relational compositions (cogroup/zip/asof/range/lookup)
and a property-based check that the provenance wrapper is semantically
transparent."""

import os

import pytest
from pyspark.sql import functions as F

from samba_spark.operators import relational as R
from samba_spark.sources import readers


def test_text_round_trip(spark, tmp_path):
    df = spark.createDataFrame([("hello",), ("world",)], "value string")
    out = str(tmp_path / "txt")
    readers.write_text(df, out)
    back = readers.read_text(spark, out)
    assert sorted(r.value for r in back.collect()) == ["hello", "world"]


def test_csv_json_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    csv_p, json_p = str(tmp_path / "c"), str(tmp_path / "j")
    readers.write_csv(df, csv_p)
    readers.write_json(df, json_p)
    assert sorted(map(tuple, readers.read_csv(spark, csv_p).collect())) == [
        (1, "a"),
        (2, "b"),
    ]
    assert sorted(
        map(tuple, readers.read_json(spark, json_p).select("id", "name").collect())
    ) == [(1, "a"), (2, "b")]


def test_read_binary(spark, tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"\x00\x01\x02")
    df = readers.read_binary(spark, str(p))
    row = df.collect()[0]
    assert bytes(row.content) == b"\x00\x01\x02"
    assert row.length == 3


def test_wholetext(spark, tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("line1\nline2\n")
    df = readers.read_text(spark, str(p), wholetext=True)
    assert df.collect()[0].value == "line1\nline2\n"


def test_cogroup_collect(spark):
    l = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    r = spark.createDataFrame([(1, 10.0), (3, 30.0)], "k int, w double")
    cg = {row.k: row for row in R.cogroup_collect(l, r, "k").collect()}
    assert sorted(x.v for x in cg[1].left_values) == ["a", "b"]
    assert [x.w for x in cg[1].right_values] == [10.0]
    assert cg[2].right_values == []
    assert cg[3].left_values == []


def test_zip_dataframes_alignment(spark):
    a = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "i int, x string")
    b = spark.createDataFrame([(30, "C"), (10, "A"), (20, "B")], "j int, y string")
    z = R.zip_dataframes(a, b, [F.col("i")], [F.col("j")])
    assert sorted((r.x, r.y) for r in z.collect()) == [
        ("a", "A"),
        ("b", "B"),
        ("c", "C"),
    ]


def test_asof_join_semantics(spark):
    """Backward as-of: latest right ts <= left ts; inclusive at equality;
    null when no prior right row."""
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 2, 50)], "id long, k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 100, "r100"), (1, 200, "r200"), (2, 60, "r60")],
        "k long, t long, tag string",
    )
    out = {
        r.id: r.tag_asof
        for r in R.asof_join(
            left, right, on="k", left_ts="t", right_ts="t", right_cols=["tag"]
        ).collect()
    }
    assert out == {1: "r100", 2: "r200", 3: None}


def test_lookup_pushdown(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    rows = R.lookup(df, "n_nationkey", 7)
    assert len(rows) == 1 and rows[0].n_nationkey == 7


def test_wrapper_transparency_property(engine, spark):
    """Property: for arbitrary small datasets, a wrapped
    filter→select→groupBy pipeline returns exactly what the plain DataFrame
    pipeline returns (provenance must never change results)."""
    from hypothesis import given, settings, strategies as st

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=-100, max_value=100),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=0,
        max_size=30,
    )

    @settings(max_examples=10, deadline=None)
    @given(rows_strategy)
    def check(rows):
        df = spark.createDataFrame(rows, "v long, k long") if rows else (
            spark.createDataFrame([], "v long, k long")
        )
        plain = (
            df.where(F.col("v") > 0)
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        wrapped = (
            engine.create_dataframe(rows, "v long, k long")
            if rows
            else engine.create_dataframe([], "v long, k long")
        )
        got = (
            wrapped.with_elements()
            .where(F.col("v") > 0)
            .group_by("k")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, plain))

    check()


def test_orc_round_trip_with_pushdown(spark, sf_smoke, tmp_path):
    """ORC round trip preserves rows; filters push into the ORC scan just
    like parquet (same columnar reader contract)."""
    from samba_spark.plans.inspect import plan_summary
    from samba_spark.sources.readers import read_orc, write_orc

    nation = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    filtered = back.where("n_nationkey >= 10").select("n_name")
    pushed = " | ".join(plan_summary(filtered)["pushed_filters"])
    assert "n_nationkey" in pushed


def test_functions_namespace(spark):
    """samba_spark.functions: column primitives compute what they claim."""
    from samba_spark import functions as SF

    row = (
        spark.range(1)
        .select(
            SF.md5_base32(F.lit("hello")).alias("h"),
            SF.cosine_sim(
                F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(1.0), F.lit(0.0))
            ).alias("cos"),
            SF.whitespace_tokens(F.lit("  A  b\tc ")).alias("toks"),
            SF.normalized_text(F.lit("  A  b\tc ")).alias("norm"),
        )
        .collect()[0]
    )
    assert row.h == 1564557354  # == DuckDB ('0x'||substr(md5('hello'),1,8))
    assert abs(row.cos - 1.0) < 1e-12
    assert row.toks == ["a", "b", "c"]
    assert row.norm == "a b c"


def test_xml_round_trip(spark, sf_smoke, tmp_path):
    """XML source (Spark 4 built-in): write → read inverts with an
    explicit schema; values survive typed."""
    from pyspark.sql import types as T

    from samba_spark.sources.readers import read_xml, write_xml

    nation = spark.read.parquet(f"{sf_smoke}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    path = str(tmp_path / "nation_xml")
    write_xml(nation, path, row_tag="nation")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
        ]
    )
    back = read_xml(spark, path, row_tag="nation", schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_asof_join_directions(spark):
    """backward picks the latest at-or-before, forward the earliest
    at-or-after, nearest the closer of the two (ties -> backward)."""
    import datetime as dt

    from samba_spark.operators.relational import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 1, t(10)), (2, 1, t(30)), (3, 2, t(5))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(8), "a"), (1, t(12), "b"), (1, t(29), "c"), (1, t(31), "d")],
        "k long, ts timestamp, v string",
    )

    def run(direction):
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["v"], direction=direction,
        )
        return {r.lid: r.v_asof for r in out.collect()}

    assert run("backward") == {1: "a", 2: "c", 3: None}
    assert run("forward") == {1: "b", 2: "d", 3: None}
    # lid=1: bwd delta 2s vs fwd delta 2s -> tie -> backward ("a")
    # lid=2: bwd delta 1s beats fwd delta 1s -> tie -> backward ("c")
    assert run("nearest") == {1: "a", 2: "c", 3: None}

    # asymmetric case: bwd 5s vs fwd 1s -> forward wins
    left2 = spark.createDataFrame([(9, 1, t(28))], "lid long, k long, ts timestamp")
    out2 = asof_join(
        left2, right, on="k", left_ts="ts", right_ts="ts",
        right_cols=["v"], direction="nearest",
    )
    assert {r.lid: r.v_asof for r in out2.collect()} == {9: "c"}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  right_cols=["v"], direction="sideways")


def test_scd2_collapse_semantics(spark):
    """Consecutive same-state runs collapse; a re-appearing state opens a
    NEW version (SCD2, not latest-wins); valid_to chains to the next
    version's valid_from and is NULL on the current one."""
    import datetime

    from samba_spark.operators.relational import scd2_collapse

    t = lambda m: datetime.datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, "a", t(0), 0), (1, "a", t(1), 1), (1, "b", t(2), 2),
        (1, "a", t(3), 3), (2, "x", t(0), 4),
    ]
    df = spark.createDataFrame(rows, ["k", "st", "ts", "eid"])
    out = [
        (r.k, r.st, r.valid_from.minute,
         None if r.valid_to is None else r.valid_to.minute, r.version)
        for r in scd2_collapse(df, "k", "st", "ts", tiebreak=["eid"])
        .orderBy("k", "version")
        .collect()
    ]
    assert out == [
        (1, "a", 0, 2, 1), (1, "b", 2, 3, 2), (1, "a", 3, None, 3),
        (2, "x", 0, None, 1),
    ]
    # SAME-timestamp adjacent islands: versioning must follow the island
    # id (monotone in the (ts, tiebreak) order), not the tied valid_from
    tied = spark.createDataFrame(
        [(3, "p", t(5), 1), (3, "q", t(5), 2)], ["k", "st", "ts", "eid"]
    )
    out2 = [
        (r.st, r.version, r.valid_to is None)
        for r in scd2_collapse(tied, "k", "st", "ts", tiebreak=["eid"])
        .orderBy("version")
        .collect()
    ]
    assert out2 == [("p", 1, False), ("q", 2, True)]
