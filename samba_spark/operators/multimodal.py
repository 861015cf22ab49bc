"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (per the north-star spec): media rides in ordinary ``BinaryType``
columns — the same machinery as FileGroup ``files.content`` — with a typed
metadata struct alongside. Decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages; the Spark-side plumbing (schema, partitioning,
batch shape) is real and tested, while actual codec work is stubbed behind
import guards (PIL/librosa are not in this container) with a deterministic
byte-level fallback so pipelines remain testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.MapType(T.StringType(), T.StringType()),
        ),
    ]
)

BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_histogram", T.ArrayType(T.LongType())),  # 16 bins
    ]
)


def media_from_files(spark, paths: list[str], kind: str) -> DataFrame:
    """Build a media table from files via the distributed binaryFile source."""
    raw = spark.read.format("binaryFile").load(paths)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("content"),
        F.create_map(
            F.lit("path"), F.col("path"), F.lit("size"), F.col("length").cast("string")
        ).alias("meta"),
    )


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level features (size, sha256, mean, 16-bin
    histogram) — real distributed feature extraction with the exact batch
    shape a codec-backed extractor would use."""

    def _extract(batches: Iterable[pd.DataFrame]):
        import numpy as np

        def _feats(v) -> tuple:
            content = bytes(v or b"")
            arr = np.frombuffer(content, dtype=np.uint8)
            hist = (
                np.bincount(arr >> 4, minlength=16).astype("int64").tolist()
                if arr.size
                else [0] * 16
            )
            return (
                len(content),
                hashlib.sha256(content).hexdigest(),
                float(arr.mean()) if arr.size else 0.0,
                hist,
            )

        for batch in batches:
            if not len(batch):
                continue
            # vectorized column ops (pandas .map), not iterrows — the
            # binary payloads dominate, but the row bookkeeping is free
            feats = batch["content"].map(_feats)
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"].values,
                    "kind": batch["kind"].values,
                    "n_bytes": feats.map(lambda t: t[0]).values,
                    "sha256": feats.map(lambda t: t[1]).values,
                    "byte_mean": feats.map(lambda t: t[2]).values,
                    "byte_histogram": feats.map(lambda t: t[3]).values,
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        _extract, BYTE_FEATURES_SCHEMA
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def _pil_image():
    """The PIL Image module, or None when Pillow is absent. Resolved at
    call time (per worker) so the real/stub switch is decided where the
    row is processed."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_one(content: bytes, *, allow_stub: bool = False) -> tuple:
    """Per-row decode contract: bytes → (width, height, channels), same
    types and value ranges on the real (PIL) and stub paths — the switch is
    behavior-identical in shape, asserted by tests/test_multimodal.py."""
    Image = _pil_image()
    if Image is None and not allow_stub:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed; "
            "pass allow_stub=True for the deterministic fake"
        )
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(content))
        w, h = img.size
        return int(w), int(h), len(img.getbands())
    digest = hashlib.sha256(content).digest()
    return 16 + digest[0] % 240, 16 + digest[1] % 240, 3


def decode_images(media: DataFrame, *, allow_stub: bool = False) -> DataFrame:
    """Image decode → (width, height, channels). Requires PIL; without it,
    ``allow_stub=True`` yields a deterministic fake (dimensions derived from
    the content digest) so pipeline plumbing can be exercised."""

    def _decode(batches: Iterable[pd.DataFrame]):
        for batch in batches:
            out = []
            for _, row in batch.iterrows():
                w, h, c = decode_one(
                    bytes(row["content"] or b""), allow_stub=allow_stub
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": w,
                        "height": h,
                        "channels": c,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        _decode, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_one(
    content: bytes, width: int, height: int, *, allow_stub: bool = False
) -> bytes:
    """Per-row resize contract: bytes → bytes, real (PIL) and stub paths
    both return a non-empty binary payload for the (width, height) target."""
    Image = _pil_image()
    if Image is None and not allow_stub:
        raise NotImplementedError(
            "image resize requires Pillow, which is not installed; "
            "pass allow_stub=True for the deterministic fake"
        )
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(content)).resize((width, height))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()
    n_out = width * height * 3
    digest = hashlib.sha256(content).digest()
    return (digest * (n_out // len(digest) + 1))[:n_out]


def resize_images(
    media: DataFrame,
    *,
    width: int = 64,
    height: int = 64,
    allow_stub: bool = False,
) -> DataFrame:
    """Image resize → (media_id, width, height, content). Requires PIL;
    without it, ``allow_stub=True`` emits a deterministic fake payload
    (content digest cycled to width*height*3 bytes) so the binary-in →
    binary-out batch shape — the expensive multimodal pattern at 100 TB —
    stays exercised end-to-end."""

    def _resize(batches: Iterable[pd.DataFrame]):
        for batch in batches:
            out = []
            for _, row in batch.iterrows():
                payload = resize_one(
                    bytes(row["content"] or b""),
                    width,
                    height,
                    allow_stub=allow_stub,
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": width,
                        "height": height,
                        "content": payload,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        _resize, RESIZED_SCHEMA
    )


def sample_frames(
    media: DataFrame, *, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per 'frame' (fixed-stride
    byte windows standing in for decoded frames — real codec stubbed). Shows
    the 1-row→N-rows fan-out shape a real sampler has."""
    idx = F.explode(
        F.sequence(
            F.lit(0),
            F.least(
                F.floor(F.length("content") / every_n_bytes).cast("int"),
                F.lit(max_frames - 1),
            ),
        )
    ).alias("frame_idx")
    return media.select("media_id", idx, F.lit(every_n_bytes).alias("stride"))


# --- WAV audio: a REAL codec path (no external libs needed) ---------------
# RIFF/WAVE canonical-header layout is pure struct arithmetic, so unlike
# the PIL-gated image path this decode is fully functional in any
# environment — the audio half of the multimodal surface parses actual
# bytes, validated against the stdlib `wave` writer in tests.

WAV_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("bits_per_sample", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


# The codec functions are built by factories so their qualnames are not
# importable — cloudpickle then serializes them BY VALUE into executor
# closures, which must work in sessions that never exported the package
# to worker PYTHONPATH (the driver's plain SparkSession; same rule every
# mapInPandas body in this repo follows).
def _make_wav_codec():
    import struct

    def wav_bytes(sample_rate, channels, bits, n_samples):
        """Canonical 44-byte-header PCM WAV blob with a zeroed payload."""
        block = channels * bits // 8
        data = b"\x00" * (n_samples * block)
        return (
            b"RIFF"
            + struct.pack("<I", 36 + len(data))
            + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH",
                16,
                1,
                channels,
                sample_rate,
                sample_rate * block,
                block,
                bits,
            )
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )

    def parse_wav_header(content):
        """(sample_rate, channels, bits, n_samples, duration_ms) from a PCM
        WAV blob; walks RIFF chunks, so non-canonical layouts (extra
        LIST/fact chunks before data) parse too. Raises ValueError on
        non-WAV bytes."""
        if (
            len(content) < 12
            or content[:4] != b"RIFF"
            or content[8:12] != b"WAVE"
        ):
            raise ValueError("not a RIFF/WAVE blob")
        pos, rate, channels, bits, data_len = 12, None, None, None, None
        while pos + 8 <= len(content):
            cid = content[pos : pos + 4]
            (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
            if cid == b"fmt ":
                _, channels, rate, _, block, bits = struct.unpack(
                    "<HHIIHH", content[pos + 8 : pos + 24]
                )
            elif cid == b"data":
                data_len = size
            pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
        if rate is None or data_len is None:
            raise ValueError("missing fmt/data chunk")
        block = channels * bits // 8
        n_samples = data_len // block if block else 0
        return rate, channels, bits, n_samples, n_samples * 1000 // rate

    return wav_bytes, parse_wav_header


wav_bytes, parse_wav_header = _make_wav_codec()


def parse_wav_headers(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed WAV metadata extraction over a binary column —
    Arrow-batched ``mapInPandas``, header-only reads (the payload bytes
    never leave the batch), one row out per blob in."""

    def _parse(batches):
        for batch in batches:
            out = []
            for mid, content in zip(batch[id_col], batch[content_col]):
                rate, ch, bits, n, ms = parse_wav_header(bytes(content))
                out.append(
                    {
                        "media_id": mid,
                        "sample_rate": rate,
                        "channels": ch,
                        "bits_per_sample": bits,
                        "n_samples": n,
                        "duration_ms": ms,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.select(
        F.col(id_col), F.col(content_col)
    ).mapInPandas(_parse, WAV_META_SCHEMA)


def synth_wavs(
    df: DataFrame,
    id_col: str = "doc_id",
    rate_col: str = "_rate",
    channels_col: str = "_ch",
    samples_col: str = "_n",
) -> DataFrame:
    """Deterministic WAV synthesis from parameter columns (16-bit PCM) —
    the fixture generator for the audio path and a real binary-encode
    exercise of the Arrow boundary."""

    def _synth(batches):
        for batch in batches:
            out = []
            for mid, rate, ch, n in zip(
                batch[id_col], batch[rate_col], batch[channels_col], batch[samples_col]
            ):
                out.append(
                    {
                        "media_id": mid,
                        "content": wav_bytes(int(rate), int(ch), 16, int(n)),
                    }
                )
            if out:
                yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return df.select(
        F.col(id_col), F.col(rate_col), F.col(channels_col), F.col(samples_col)
    ).mapInPandas(_synth, schema)


# PNG sibling of the WAV codec: IHDR metadata is pure struct arithmetic
# too, so image dimensions/bit-depth parse for real without PIL. Same
# by-value serialization rule as the WAV pair.
def _make_png_codec():
    import struct
    import zlib

    SIG = b"\x89PNG\r\n\x1a\n"

    def png_bytes(width, height, bit_depth=8, color_type=2):
        """Minimal well-formed PNG: signature + IHDR + IEND (no IDAT —
        header-level fixture, like a truncated-but-parseable file)."""
        ihdr = struct.pack(
            ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0
        )
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        iend = struct.pack(">I", 0) + b"IEND" + struct.pack(
            ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
        )
        return SIG + chunk + iend

    def parse_png_header(content):
        """(width, height, bit_depth, color_type) from PNG bytes; verifies
        the signature and the IHDR CRC. Raises ValueError otherwise."""
        if len(content) < 33 or content[:8] != SIG:
            raise ValueError("not a PNG")
        (length,) = struct.unpack(">I", content[8:12])
        if content[12:16] != b"IHDR" or length != 13:
            raise ValueError("first chunk is not IHDR")
        body = content[16:29]
        (crc,) = struct.unpack(">I", content[29:33])
        if crc != (zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF):
            raise ValueError("IHDR CRC mismatch")
        w, h, depth, color, _, _, _ = struct.unpack(">IIBBBBB", body)
        return w, h, depth, color

    return png_bytes, parse_png_header


png_bytes, parse_png_header = _make_png_codec()

PNG_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
        T.StructField("color_type", T.LongType()),
    ]
)


def parse_png_headers(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Distributed PNG metadata extraction — Arrow-batched, header-only,
    CRC-verified; the functional (non-PIL) half of the image path."""
    _hdr = parse_png_header

    def _parse(batches):
        for batch in batches:
            out = []
            for mid, content in zip(batch[id_col], batch[content_col]):
                w, h, depth, color = _hdr(bytes(content))
                out.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "bit_depth": depth,
                        "color_type": color,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return media.select(F.col(id_col), F.col(content_col)).mapInPandas(
        _parse, PNG_META_SCHEMA
    )


def synth_pngs(
    df: DataFrame,
    id_col: str = "doc_id",
    width_col: str = "_w",
    height_col: str = "_h",
) -> DataFrame:
    """Deterministic PNG synthesis from dimension columns (8-bit RGB)."""
    _png = png_bytes

    def _synth(batches):
        for batch in batches:
            out = []
            for mid, w, h in zip(batch[id_col], batch[width_col], batch[height_col]):
                out.append(
                    {"media_id": mid, "content": _png(int(w), int(h))}
                )
            if out:
                yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return df.select(
        F.col(id_col), F.col(width_col), F.col(height_col)
    ).mapInPandas(_synth, schema)
