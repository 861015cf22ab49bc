"""Python Data Source (format('filegroup')) tests: reader partition
planning, suffix filtering, and the writer round trip."""

import os

from pyspark.sql import functions as F


def _register(spark):
    from samba_spark.sources import pydatasource

    pydatasource.register(spark)


def _mk_tree(root):
    data = {
        "alpha": {"a.txt": b"aaa", "b.txt": b"bb", "skip.log": b"zz"},
        "beta": {"c.txt": b"cccc"},
    }
    for g, files in data.items():
        os.makedirs(os.path.join(root, g))
        for name, content in files.items():
            with open(os.path.join(root, g, name), "wb") as f:
                f.write(content)
    return data


def test_reader_one_partition_per_group_and_suffix_filter(spark, tmp_path):
    _register(spark)
    root = str(tmp_path / "fg")
    _mk_tree(root)
    df = (
        spark.read.format("filegroup")
        .option("path", root)
        .option("suffix", ".txt")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one per group dir
    rows = {(r["group"], r["name"]): (r["size"], bytes(r["content"])) for r in df.collect()}
    assert rows == {
        ("alpha", "a.txt"): (3, b"aaa"),
        ("alpha", "b.txt"): (2, b"bb"),
        ("beta", "c.txt"): (4, b"cccc"),
    }


def test_writer_round_trip(spark, tmp_path):
    _register(spark)
    src = str(tmp_path / "src")
    _mk_tree(src)
    out = str(tmp_path / "out")
    df = spark.read.format("filegroup").option("path", src).load()
    df.write.format("filegroup").option("path", out).mode("overwrite").save()
    # commit marker counts every written file
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == df.count()
    back = spark.read.format("filegroup").option("path", out).load()
    a = {(r["group"], r["name"], bytes(r["content"])) for r in df.collect()}
    b = {(r["group"], r["name"], bytes(r["content"])) for r in back.collect()}
    assert a == b


def test_reader_composes_with_relational_ops(spark, tmp_path):
    """The per-file grain joins/aggregates like any table."""
    _register(spark)
    root = str(tmp_path / "fg2")
    _mk_tree(root)
    df = spark.read.format("filegroup").option("path", root).load()
    agg = {
        r["group"]: r["total"]
        for r in df.groupBy("group").agg(F.sum("size").alias("total")).collect()
    }
    assert agg == {"alpha": 7, "beta": 4}

def test_writer_overwrite_clears_stale_files(spark, tmp_path):
    """Overwrite must replace the destination root wholesale: files from a
    previous save that are not re-emitted must NOT survive (ADVICE r3 —
    the old writer opened files individually and left stale siblings)."""
    _register(spark)
    out = str(tmp_path / "out_ovr")
    full = spark.createDataFrame(
        [("g1", "keep.txt", 4, b"new!"), ("g1", "stale.txt", 3, b"old"),
         ("g2", "gone.txt", 3, b"old")],
        "group string, name string, size bigint, content binary",
    )
    full.write.format("filegroup").option("path", out).mode("overwrite").save()
    assert os.path.isfile(os.path.join(out, "g1", "stale.txt"))

    # second overwrite emits a strict subset — everything else must vanish
    sub = full.where("name = 'keep.txt'")
    sub.write.format("filegroup").option("path", out).mode("overwrite").save()
    assert os.path.isfile(os.path.join(out, "g1", "keep.txt"))
    assert not os.path.exists(os.path.join(out, "g1", "stale.txt"))
    assert not os.path.exists(os.path.join(out, "g2"))
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == 1
    # staging root is gone after commit
    assert not os.path.exists(out + ".fgwrite.tmp")
