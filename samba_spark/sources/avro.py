"""Avro Object Container File source/sink — clean-room, pure-stdlib codec.

Spark proper ships Avro as an external module (the spark-avro jar is not
bundled in the pyspark wheel), so this environment has no JVM datasource
for it; rather than leave the format uncovered, the container format and
binary encoding are implemented here directly from the public Avro 1.11
specification (same discipline as the WAV/PNG codecs in
operators/multimodal.py — struct-level, no third-party library).

Supported surface — the subset a columnar interchange actually uses:

- records of ``null/boolean/int/long/float/double/string/bytes``
- nullable fields as the standard ``["null", T]`` union
- ``timestamp-micros`` / ``local-timestamp-micros`` logical types (Spark
  TimestampType / TimestampNTZType; values are the micros Arrow hands to
  the Python worker — symmetric on round-trip, document the tz if LTZ
  files cross systems)
- codecs ``null`` and ``deflate`` (raw DEFLATE, per spec)

Scale shape: the WRITER runs one task per input partition (each task
streams its Arrow batches into one container file — one Avro block per
batch, so memory is bounded by the batch size); the READER fans the file
list across executors exactly like sources/manifest.py, one decode task
per file slice. No driver-side row handling in either direction.

All codec functions are factory-made (qualnames not importable), so
cloudpickle ships them BY VALUE into executor closures — they must work
in sessions that never exported this package to worker PYTHONPATH (the
driver's plain SparkSession; the rule every mapInPandas body in this
repo follows).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"


def _make_codec():
    """Build the whole binary/container codec as nested functions (shipped
    by value into executor closures). Only stdlib inside."""
    import datetime as dt
    import json as _json
    import struct
    import zlib

    MAGIC = b"Obj\x01"

    def write_long(buf, n):
        # zigzag + base-128 varint (spec: binary encoding, long)
        z = (n << 1) ^ (n >> 63)
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                buf.append(b | 0x80)
            else:
                buf.append(b)
                break

    def write_bytes(buf, b):
        write_long(buf, len(b))
        buf.extend(b)

    def write_string(buf, s):
        write_bytes(buf, s.encode("utf-8"))

    class Reader:
        __slots__ = ("data", "pos")

        def __init__(self, data):
            self.data = data
            self.pos = 0

        def read_long(self):
            z, shift = 0, 0
            while True:
                b = self.data[self.pos]
                self.pos += 1
                z |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            return (z >> 1) ^ -(z & 1)

        def read_bytes(self):
            n = self.read_long()
            out = self.data[self.pos : self.pos + n]
            self.pos += n
            return out

        def read_fixed(self, n):
            out = self.data[self.pos : self.pos + n]
            self.pos += n
            return out

    def encoder(avro_type):
        """fn(buf, non-null python value) for one field's base type."""
        if isinstance(avro_type, dict):
            if avro_type.get("logicalType") in (
                "timestamp-micros",
                "local-timestamp-micros",
            ):
                return lambda buf, v: write_long(buf, v.value // 1000)
            avro_type = avro_type["type"]
        if avro_type in ("long", "int"):
            return lambda buf, v: write_long(buf, int(v))
        if avro_type == "double":
            return lambda buf, v: buf.extend(struct.pack("<d", float(v)))
        if avro_type == "float":
            return lambda buf, v: buf.extend(struct.pack("<f", float(v)))
        if avro_type == "string":
            return lambda buf, v: write_string(buf, str(v))
        if avro_type == "bytes":
            return lambda buf, v: write_bytes(buf, bytes(v))
        if avro_type == "boolean":
            return lambda buf, v: buf.append(1 if v else 0)
        raise TypeError(f"avro codec: unsupported type {avro_type!r}")

    def decoder(avro_type):
        if isinstance(avro_type, dict):
            if avro_type.get("logicalType") in (
                "timestamp-micros",
                "local-timestamp-micros",
            ):
                epoch = dt.datetime(1970, 1, 1)
                return lambda r: epoch + dt.timedelta(microseconds=r.read_long())
            avro_type = avro_type["type"]
        if avro_type in ("long", "int"):
            return lambda r: r.read_long()
        if avro_type == "double":
            return lambda r: struct.unpack("<d", r.read_fixed(8))[0]
        if avro_type == "float":
            return lambda r: struct.unpack("<f", r.read_fixed(4))[0]
        if avro_type == "string":
            return lambda r: r.read_bytes().decode("utf-8")
        if avro_type == "bytes":
            return lambda r: bytes(r.read_bytes())
        if avro_type == "boolean":
            return lambda r: r.read_fixed(1) == b"\x01"
        raise TypeError(f"avro codec: unsupported type {avro_type!r}")

    def split_nullable(field_type):
        """avro field type → (base_type, nullable)."""
        if isinstance(field_type, list):  # ["null", T]
            return next(t for t in field_type if t != "null"), True
        return field_type, False

    def write_header(out, schema, codec, sync):
        buf = bytearray()
        buf.extend(MAGIC)
        write_long(buf, 2)  # metadata map: one block, two entries
        write_string(buf, "avro.schema")
        write_bytes(buf, _json.dumps(schema).encode())
        write_string(buf, "avro.codec")
        write_bytes(buf, codec.encode())
        write_long(buf, 0)  # map terminator
        buf.extend(sync)
        out.write(bytes(buf))

    def read_meta(r):
        """Parse magic + metadata map + sync from a Reader."""
        if r.read_fixed(4) != MAGIC:
            raise ValueError("not an Avro object container file (bad magic)")
        meta = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # negative count => block byte-size follows (spec)
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_bytes().decode()
                meta[k] = r.read_bytes()
        return meta, r.read_fixed(16)

    def read_container(data):
        """Decode one container file → list of row tuples (field order of
        the embedded schema)."""
        r = Reader(data)
        meta, sync = read_meta(r)
        schema = _json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        decs, nullable = [], []
        for f in schema["fields"]:
            ft, nul = split_nullable(f["type"])
            nullable.append(nul)
            decs.append(decoder(ft))
        rows = []
        while r.pos < len(r.data):
            count = r.read_long()
            size = r.read_long()
            block = r.read_fixed(size)
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec {codec!r}")
            br = Reader(block)
            for _ in range(count):
                row = []
                for dec, nul in zip(decs, nullable):
                    if nul:
                        row.append(None if br.read_long() == 0 else dec(br))
                    else:
                        row.append(dec(br))
                rows.append(tuple(row))
            if r.read_fixed(16) != sync:
                raise ValueError("avro sync marker mismatch (corrupt block)")
        return rows

    return {
        "write_long": write_long,
        "Reader": Reader,
        "encoder": encoder,
        "decoder": decoder,
        "split_nullable": split_nullable,
        "write_header": write_header,
        "read_meta": read_meta,
        "read_container": read_container,
    }


_C = _make_codec()

# public/testing surface (by-value serializable: all factory-made)
read_container = _C["read_container"]
_write_long = _C["write_long"]
_Reader = _C["Reader"]


# ------------------------------------------------------- schema translation

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_schema(schema: T.StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(f.dataType, T.TimestampNTZType):
            base = {"type": "long", "logicalType": "local-timestamp-micros"}
        else:
            try:
                base = _SPARK_TO_AVRO[type(f.dataType)]
            except KeyError:
                raise TypeError(
                    f"avro codec: unsupported Spark type {f.dataType} "
                    f"(field {f.name!r}); supported: "
                    f"{sorted(t.__name__ for t in _SPARK_TO_AVRO)} + timestamp"
                )
        fields.append(
            {"name": f.name, "type": ["null", base] if f.nullable else base}
        )
    return {"type": "record", "name": name, "fields": fields}


def _spark_schema(avro: dict) -> T.StructType:
    rev = {v: k for k, v in _SPARK_TO_AVRO.items()}
    out = []
    for f in avro["fields"]:
        ft, nullable = _C["split_nullable"](f["type"])
        if isinstance(ft, dict) and ft.get("logicalType") == "timestamp-micros":
            dt = T.TimestampType()
        elif isinstance(ft, dict) and ft.get("logicalType") == "local-timestamp-micros":
            dt = T.TimestampNTZType()
        elif isinstance(ft, dict):
            dt = rev[ft["type"]]()
        else:
            dt = rev[ft]()
        out.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(out)


def read_schema(path: str) -> dict:
    """Read just the embedded schema of one file (header is ~KB;
    driver-side)."""
    with open(path, "rb") as fh:
        head = fh.read(65536)
    meta, _ = _C["read_meta"](_C["Reader"](head))
    if "avro.schema" not in meta:
        raise ValueError("avro.schema missing from container metadata")
    return json.loads(meta["avro.schema"])


# ------------------------------------------------------------ Spark surface


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> int:
    """Sink: one container file per input partition under ``path``
    (``part-<pid>.avro``). Streams Arrow batches — one Avro block per
    batch — so a task never holds its whole partition. Returns total
    rows written."""
    os.makedirs(path, exist_ok=True)
    schema = _avro_schema(df.schema)
    names = [f["name"] for f in schema["fields"]]
    encs, nullable = [], []
    for f in schema["fields"]:
        ft, nul = _C["split_nullable"](f["type"])
        nullable.append(nul)
        encs.append(_C["encoder"](ft))
    write_long = _C["write_long"]
    write_header = _C["write_header"]

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import pandas as _pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fpath = os.path.join(path, f"part-{pid:05d}.avro")
        sync = bytes([(pid * 31 + i * 7 + 13) % 256 for i in range(16)])
        out = None
        n_rows = 0
        for batch in batches:
            if out is None:
                out = open(fpath, "wb")
                write_header(out, schema, codec, sync)
            block = bytearray()
            cols = [batch[n] for n in names]
            for vals in zip(*(c.tolist() for c in cols)):
                for v, enc, nul in zip(vals, encs, nullable):
                    is_null = v is None or (
                        not isinstance(v, (bytes, str, list)) and _pd.isna(v)
                    )
                    if nul:
                        if is_null:
                            write_long(block, 0)
                            continue
                        write_long(block, 1)
                    enc(block, v)
                n_rows += 1
            payload = bytes(block)
            if codec == "deflate":
                comp = zlib.compressobj(wbits=-15)
                payload = comp.compress(payload) + comp.flush()
            head = bytearray()
            write_long(head, len(batch))
            write_long(head, len(payload))
            out.write(bytes(head))
            out.write(payload)
            out.write(sync)
        if out is not None:
            out.close()
            yield _pd.DataFrame({"path": [fpath], "n_rows": [n_rows]})

    written = df.mapInPandas(_write, "path string, n_rows long").collect()
    return int(sum(r.n_rows for r in written))


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Source: decode every ``*.avro`` under ``path`` (or the single
    file), schema taken from the first file's header (driver reads ~KB),
    decode fanned across executors one task per file slice."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    avro_schema = read_schema(files[0])
    spark_schema = _spark_schema(avro_schema)
    names = [f.name for f in spark_schema.fields]
    decode = _C["read_container"]

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for batch in batches:
            for p in batch["path"]:
                with open(p, "rb") as fh:
                    rows = decode(fh.read())
                yield _pd.DataFrame(rows, columns=names)

    n_slices = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(n_slices)
    return paths_df.mapInPandas(_read, spark_schema)
