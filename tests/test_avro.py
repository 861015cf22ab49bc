"""Clean-room Avro container codec: golden-bytes encoding checks against
the public spec, container round trips (both codecs, nulls, timestamps),
and the distributed Spark read/write surface."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from samba_spark.sources.avro import (
    _write_long,
    _Reader,
    read_avro,
    read_container,
    read_schema,
    write_avro,
)


def _enc_long(n):
    buf = bytearray()
    _write_long(buf, n)
    return bytes(buf)


def test_long_golden_bytes():
    """Spec examples: zigzag + varint. 0→00, -1→01, 1→02, -2→03, 2→04,
    -64→7f, 64→80 01."""
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(-64) == b"\x7f"
    assert _enc_long(64) == b"\x80\x01"


def test_long_roundtrip_extremes():
    for n in (0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        r = _Reader(_enc_long(n))
        assert r.read_long() == n, n


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_spark_roundtrip_all_types(spark, tmp_path, codec):
    rows = [
        (1, 1.5, "alpha", True, b"\x00\xff", dt.datetime(2024, 1, 2, 3, 4, 5, 123456)),
        (2, None, None, None, None, None),
        (-(2**40), -0.25, "", False, b"", dt.datetime(1969, 12, 31, 23, 59, 59)),
    ]
    df = spark.createDataFrame(
        rows,
        "k long, d double, s string, b boolean, raw binary, ts timestamp",
    )
    out = str(tmp_path / f"avro_{codec}")
    n = write_avro(df, out, codec=codec)
    assert n == 3
    back = read_avro(spark, out)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())


def test_spark_roundtrip_multi_partition_fixture(spark, sf_smoke, tmp_path):
    """orders at sf0.001 through 4 partitions: row-exact round trip, one
    container file per non-empty partition, schema preserved."""
    orders = (
        spark.read.parquet(f"{sf_smoke}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate")
        .repartition(4)
    )
    out = str(tmp_path / "orders_avro")
    n = write_avro(orders, out)
    assert n == orders.count()
    back = read_avro(spark, out)
    assert back.count() == n
    # integer-sum parity (order-independent) + exact multiset equality;
    # a float SUM would differ by accumulation order across partitionings
    assert (
        orders.agg(F.sum("o_orderkey")).collect()
        == back.agg(F.sum("o_orderkey")).collect()
    )
    assert sorted(map(tuple, orders.collect())) == sorted(map(tuple, back.collect()))


def test_container_schema_and_corruption(tmp_path, spark):
    df = spark.createDataFrame([(1, "x")], "k long, s string")
    out = str(tmp_path / "one")
    write_avro(df, out, codec="null")
    import os

    f = [p for p in os.listdir(out) if p.endswith(".avro")][0]
    path = os.path.join(out, f)
    sch = read_schema(path)
    assert [fld["name"] for fld in sch["fields"]] == ["k", "s"]
    data = open(path, "rb").read()
    assert read_container(data) == [(1, "x")]
    # flip one byte inside the trailing sync marker → loud failure
    corrupted = data[:-1] + bytes([data[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync"):
        read_container(corrupted)
