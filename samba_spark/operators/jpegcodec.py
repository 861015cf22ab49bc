"""Baseline JPEG (SOF0) codec — pure stdlib + numpy, no PIL.

Closes the non-PNG pixel-decode gap (VERDICT r6 what's-missing #3) the
same way the PNG pixel codec did (multimodal._make_png_pixel_codec):
a REAL codec that executes in any environment, wired into the media
operators' decode/resize paths, with an arithmetically-replayable
fixture for the external oracle (x128).

Scope (documented contract, loud failures outside it):

- **Decoder**: baseline sequential DCT (SOF0) only — progressive
  (SOF2) and the arithmetic/lossless SOF variants raise. 8-bit sample
  precision. Grayscale, and YCbCr with ANY sampling factors (4:4:4,
  4:2:2, 4:2:0, ... — chroma planes are replication-upsampled) in ONE
  interleaved scan; single-component scans are supported for grayscale
  only (a multi-component frame written as separate per-plane scans
  raises). Restart markers (DRI/RSTn) honored. This covers the
  overwhelming majority of real-world JPEGs. Malformed/truncated
  streams raise ValueError (the decode/resize fallthrough contract).
- **Encoder**: grayscale (1 channel) or RGB (3 channels, stored 4:4:4
  YCbCr) with the Annex K example quantization tables (quality-50) and
  the Annex K typical Huffman tables. The encoder exists to synthesize
  deterministic fixtures and to round-trip the decoder in tests; it is
  not a rate/quality-tuned production encoder.

Determinism: the DCT/IDCT are float64 matrix products of a constant
basis (IEEE-reproducible everywhere); quantization rounds half away
from zero, pixel reconstruction rounds with floor(x + 0.5) then clamps
to [0, 255]. On constant 8x8 blocks the whole pipeline collapses to
exact integer arithmetic (only the DC coefficient survives), which is
what lets x128's DuckDB oracle replay decoded pixel VALUES bit-for-bit
— see :func:`decoded_constant_block_value`.

Public-knowledge provenance: ITU-T T.81 (the JPEG spec, Annex F/K) and
the JFIF spec; tables below are the Annex K examples. The reference
system has no image surface at all (SURVEY §2 north-star extension).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1/K.2 example quantization tables (quality 50), raster order.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# Zigzag scan: _ZIGZAG[k] = raster index of the k-th zigzag position.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8-point DCT-II basis: FDCT is M @ block @ M.T, IDCT is
# M.T @ coef @ M. Constant basis → IEEE-identical on every platform.
_N = np.arange(8)
_DCT_M = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) / 2.0
_DCT_M[0, :] /= np.sqrt(2.0)


def _make_jpeg_codec(
    QUANT_LUMA=QUANT_LUMA,
    QUANT_CHROMA=QUANT_CHROMA,
    _ZIGZAG=_ZIGZAG,
    _DCT_M=_DCT_M,
    _DC_LUMA=_DC_LUMA,
    _DC_CHROMA=_DC_CHROMA,
    _AC_LUMA=_AC_LUMA,
    _AC_CHROMA=_AC_CHROMA,
):
    """Factory wrapping the whole codec so the public functions are
    CLOSURES, which cloudpickle ships BY VALUE into executors (the repo
    convention for codec paths — see multimodal._make_png_pixel_codec):
    a module-level function would pickle by reference and require
    samba_spark on every executor's import path. The default-argument
    binding turns the module-level tables into closure-captured locals
    under their original names."""
    def _build_codes(bits, vals):
        """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C."""
        codes, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return codes


    def _build_decoder(bits, vals):
        """(BITS, HUFFVAL) → {(length, code): symbol} for MSB-first decode."""
        table, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                table[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        return table


    def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
        """Round half away from zero — the declared quantizer rule (x128's
        oracle replays it as trunc(x + sign*0.5))."""
        r = coef / q
        return (np.sign(r) * np.floor(np.abs(r) + 0.5)).astype(np.int32)


    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self._acc = 0
            self._n = 0

        def write(self, code: int, length: int):
            self._acc = (self._acc << length) | (code & ((1 << length) - 1))
            self._n += length
            while self._n >= 8:
                self._n -= 8
                byte = (self._acc >> self._n) & 0xFF
                self.out.append(byte)
                if byte == 0xFF:  # byte stuffing (F.1.2.3)
                    self.out.append(0x00)

        def flush(self):
            if self._n:
                pad = 8 - self._n
                self.write((1 << pad) - 1, pad)


    def _category(v: int) -> int:
        return int(v).bit_length() if v >= 0 else int(-v).bit_length()


    def _encode_coeff_bits(v: int, cat: int) -> int:
        return v if v >= 0 else v + (1 << cat) - 1


    def _extend(bits_val: int, cat: int) -> int:
        if cat == 0:
            return 0
        return bits_val if bits_val >= (1 << (cat - 1)) else bits_val - (1 << cat) + 1


    def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        return np.stack(
            [
                0.299 * r + 0.587 * g + 0.114 * b,
                128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
            ],
            axis=-1,
        )


    def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.stack([r, g, b], axis=-1)


    def _round_clamp(a: np.ndarray) -> np.ndarray:
        """floor(x + 0.5) then clamp to [0,255] — the declared pixel rule."""
        return np.clip(np.floor(a + 0.5), 0, 255).astype(np.uint8)


    # ---------------------------------------------------------------- encode


    def encode_jpeg_baseline(
        width: int,
        height: int,
        channels: int,
        raw: bytes,
        *,
        subsampling: str = "444",
        restart_interval: int = 0,
    ) -> bytes:
        """8-bit interleaved pixels → complete baseline JFIF JPEG. Grayscale
        (channels=1, one luma component) or RGB (channels=3, stored as
        YCbCr at ``subsampling`` "444" or "420" — 4:2:0 averages each 2x2
        chroma neighborhood). ``restart_interval`` > 0 emits a DRI marker
        and RSTn every N MCUs (the decoder resyncs and resets DC
        predictors). Annex K quantization + Huffman tables."""
        if channels not in (1, 3):
            raise ValueError("encode_jpeg_baseline supports 1 or 3 channels")
        if subsampling not in ("444", "420"):
            raise ValueError("subsampling must be '444' or '420'")
        sub = subsampling == "420" and channels == 3
        px = np.frombuffer(bytes(raw), dtype=np.uint8)
        if px.size != width * height * channels:
            raise ValueError(
                f"raw pixel buffer is {px.size} bytes, want "
                f"{width * height * channels}"
            )
        px = px.reshape(height, width, channels).astype(np.float64)
        # comps: (comp id, quant id, sampling h, sampling v, plane)
        if channels == 3:
            ycc = _rgb_to_ycbcr(px)
            if sub:
                # average each 2x2 chroma neighborhood on an even-padded grid
                ew = width + (width & 1)
                eh = height + (height & 1)
                cpad = np.pad(
                    ycc[..., 1:], ((0, eh - height), (0, ew - width), (0, 0)),
                    mode="edge",
                )
                half = (
                    cpad.reshape(eh // 2, 2, ew // 2, 2, 2).mean(axis=(1, 3))
                )
                comps = [
                    (1, 0, 2, 2, ycc[..., 0]),
                    (2, 1, 1, 1, half[..., 0]),
                    (3, 1, 1, 1, half[..., 1]),
                ]
            else:
                comps = [
                    (1, 0, 1, 1, ycc[..., 0]),
                    (2, 1, 1, 1, ycc[..., 1]),
                    (3, 1, 1, 1, ycc[..., 2]),
                ]
        else:
            comps = [(1, 0, 1, 1, px[..., 0])]
        hmax = max(c[2] for c in comps)
        vmax = max(c[3] for c in comps)
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))

        out = bytearray(b"\xff\xd8")  # SOI
        # JFIF APP0
        app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        # DQT (both tables when color)
        for tq, q in ([(0, QUANT_LUMA)] + ([(1, QUANT_CHROMA)] if channels == 3 else [])):
            zz = bytes(int(q.flat[_ZIGZAG[k]]) for k in range(64))
            out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tq]) + zz
        # SOF0
        sof = struct.pack(">BHHB", 8, height, width, len(comps))
        for cid, tq, ch_, cv in [(c[0], c[1], c[2], c[3]) for c in comps]:
            sof += bytes([cid, (ch_ << 4) | cv, tq])
        out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        # DHT
        tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
        if channels == 3:
            tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
        for tc_th, (bits, vals) in tables:
            body = bytes([tc_th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        # DRI
        if restart_interval:
            out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
        # SOS
        sos = bytes([len(comps)])
        for c in comps:
            sos += bytes([c[0], 0x00 if c[1] == 0 else 0x11])
        sos += b"\x00\x3f\x00"
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        dc_codes = [_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA)]
        ac_codes = [_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA)]
        quants = [QUANT_LUMA, QUANT_CHROMA]

        # pad each plane to its own block grid by edge replication
        padded = []
        for _, _, ch_, cv, plane in comps:
            pw, ph = mcus_x * 8 * ch_, mcus_y * 8 * cv
            padded.append(
                np.pad(
                    plane,
                    ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                    mode="edge",
                )
            )

        def _write_block(block, tq, ci):
            coef = _quantize(_DCT_M @ (block - 128.0) @ _DCT_M.T, quants[tq])
            flat = coef.flatten()
            zz = [int(flat[_ZIGZAG[k]]) for k in range(64)]
            diff = zz[0] - preds[ci]
            preds[ci] = zz[0]
            cat = _category(diff)
            code, ln = dc_codes[tq][cat]
            writer.write(code, ln)
            if cat:
                writer.write(_encode_coeff_bits(diff, cat), cat)
            run = 0
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[tq][0xF0]  # ZRL
                    writer.write(code, ln)
                    run -= 16
                cat = _category(v)
                code, ln = ac_codes[tq][(run << 4) | cat]
                writer.write(code, ln)
                writer.write(_encode_coeff_bits(v, cat), cat)
                run = 0
            if run:
                code, ln = ac_codes[tq][0x00]  # EOB
                writer.write(code, ln)

        writer = _BitWriter()
        preds = [0] * len(comps)
        mcu_count = 0
        rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    writer.flush()
                    out += writer.out
                    out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                    writer = _BitWriter()
                    preds = [0] * len(comps)
                for ci, (cid, tq, ch_, cv, _plane) in enumerate(comps):
                    for vb in range(cv):
                        for hb in range(ch_):
                            y0 = (my * cv + vb) * 8
                            x0 = (mx * ch_ + hb) * 8
                            _write_block(
                                padded[ci][y0 : y0 + 8, x0 : x0 + 8], tq, ci
                            )
                mcu_count += 1
        writer.flush()
        out += writer.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)


    # ---------------------------------------------------------------- decode


    class _BitReader:
        """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
        stops at any real marker and exposes it for RST handling."""

        def __init__(self, data: bytes, pos: int):
            self.data = data
            self.pos = pos
            self._acc = 0
            self._n = 0
            self.marker = None

        def _fill(self):
            d = self.data
            while self._n <= 24:
                if self.marker is not None or self.pos >= len(d):
                    self._acc = (self._acc << 8) | 0xFF  # pad past the marker
                    self._n += 8
                    continue
                byte = d[self.pos]
                if byte == 0xFF:
                    nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2
                    elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                        self.marker = nxt
                        continue
                    else:
                        self.marker = nxt
                        continue
                else:
                    self.pos += 1
                self._acc = (self._acc << 8) | byte
                self._n += 8

        def read_bit(self) -> int:
            if self._n == 0:
                self._fill()
            self._n -= 1
            return (self._acc >> self._n) & 1

        def read_bits(self, n: int) -> int:
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read_bit()
            return v

        def sync_restart(self):
            """Discard pre-marker padding bits, consume the RSTn marker, and
            byte-align. Works whether or not the lookahead already hit the
            marker: everything buffered at a restart boundary is padding by
            spec (F.1.2.3), so it is safe to drop and scan forward."""
            self._acc = 0
            self._n = 0
            if self.marker is None:
                d = self.data
                while self.pos + 1 < len(d) and not (
                    d[self.pos] == 0xFF and d[self.pos + 1] not in (0x00, 0xFF)
                ):
                    self.pos += 1
                self.marker = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if not 0xD0 <= self.marker <= 0xD7:
                raise ValueError(
                    f"invalid JPEG: expected restart marker, got 0x{self.marker:02X}"
                )
            self.pos += 2  # past FF Dn
            self.marker = None


    def _decode_symbol(br: _BitReader, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: undecodable Huffman code")


    def parse_jpeg_header(content: bytes):
        """(width, height, n_components) from the SOF0 marker — header-only,
        no entropy decode (the decode_images fast path). Raises on
        non-baseline SOF variants."""
        data = bytes(content)
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                raise ValueError("invalid JPEG: lost marker sync")
            # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
            # marker code — skip them (a spec-legal file exercised the
            # old strict scan into a spurious 'lost marker sync').
            while i + 4 <= len(data) and data[i + 1] == 0xFF:
                i += 1
            m = data[i + 1]
            if m in (0x01,) or 0xD0 <= m <= 0xD9:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if m == 0xC0:
                _, h, w, ncomp = struct.unpack(">BHHB", data[i + 4 : i + 10])
                return int(w), int(h), int(ncomp)
            if m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "only baseline sequential JPEG (SOF0) is supported "
                    f"(got SOF marker 0x{m:02X})"
                )
            i += 2 + seg_len
        raise ValueError("invalid JPEG: no SOF0 marker")


    def decode_jpeg_pixels(content: bytes):
        """Complete baseline JPEG → (width, height, channels, raw) with raw =
        8-bit interleaved pixels (grayscale or RGB). Full entropy decode:
        Huffman, dequantize, IDCT, chroma upsampling, YCbCr→RGB."""
        data = bytes(content)
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        qt: dict[int, np.ndarray] = {}
        dc_tabs: dict[int, dict] = {}
        ac_tabs: dict[int, dict] = {}
        frame = None
        restart_interval = 0
        i = 2
        scan = None
        while i + 2 <= len(data):
            if data[i] != 0xFF:
                raise ValueError("invalid JPEG: lost marker sync")
            # skip T.81 B.1.1.2 fill bytes (0xFF runs) before the marker
            # code, same as parse_jpeg_header above
            while i + 2 <= len(data) and data[i + 1] == 0xFF:
                i += 1
            m = data[i + 1]
            if m == 0xD9:
                break
            if m in (0x01,) or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            seg = data[i + 4 : i + 2 + seg_len]
            if m == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    p += 1
                    vals = np.empty(64, dtype=np.float64)
                    for k in range(64):
                        if pq:
                            vals[_ZIGZAG[k]] = struct.unpack(
                                ">H", seg[p : p + 2]
                            )[0]
                            p += 2
                        else:
                            vals[_ZIGZAG[k]] = seg[p]
                            p += 1
                    qt[tq] = vals.reshape(8, 8)
            elif m == 0xC0:  # SOF0
                _prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
                frame = {"w": int(w), "h": int(h), "comps": comps}
            elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "only baseline sequential JPEG (SOF0) is supported "
                    f"(got SOF marker 0x{m:02X})"
                )
            elif m == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    bits = list(seg[p + 1 : p + 17])
                    n = sum(bits)
                    vals = list(seg[p + 17 : p + 17 + n])
                    (ac_tabs if tc else dc_tabs)[th] = _build_decoder(bits, vals)
                    p += 17 + n
            elif m == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", seg[:2])[0]
            elif m == 0xDA:  # SOS
                ns = seg[0]
                scan_comps = []
                for c in range(ns):
                    cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan_comps.append((cs, tabs >> 4, tabs & 15))
                scan = (scan_comps, i + 2 + seg_len)
                break
            i += 2 + seg_len
        if frame is None or scan is None:
            raise ValueError("invalid JPEG: missing SOF0 or SOS")
        scan_comps, scan_start = scan
        if len(scan_comps) != len(frame["comps"]):
            raise ValueError("multi-scan JPEG (non-interleaved planes) unsupported")

        w, h = frame["w"], frame["h"]
        comps = frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        if len(comps) == 1:
            hmax = vmax = comps[0]["h"] = comps[0]["v"] = 1
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        planes = [
            np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
            for c in comps
        ]
        # map scan component ids → frame component index + huff tables
        order = []
        for cs, td, ta in scan_comps:
            idx = next(
                (k for k, fc in enumerate(comps) if fc["id"] == cs), None
            )
            if idx is None:
                raise ValueError("scan references unknown component id")
            order.append((idx, td, ta))

        br = _BitReader(data, scan_start)
        preds = [0] * len(comps)
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.sync_restart()
                    preds = [0] * len(comps)
                for idx, td, ta in order:
                    c = comps[idx]
                    q = qt[c["tq"]]
                    for v_blk in range(c["v"]):
                        for h_blk in range(c["h"]):
                            coef = np.zeros(64, dtype=np.float64)
                            t = _decode_symbol(br, dc_tabs[td])
                            diff = _extend(br.read_bits(t), t) if t else 0
                            preds[idx] += diff
                            coef[0] = preds[idx]
                            k = 1
                            while k < 64:
                                rs = _decode_symbol(br, ac_tabs[ta])
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("invalid JPEG: AC overflow")
                                coef[_ZIGZAG[k]] = _extend(br.read_bits(s), s)
                                k += 1
                            block = (
                                _DCT_M.T @ (coef.reshape(8, 8) * q) @ _DCT_M
                            ) + 128.0
                            y0 = (my * c["v"] + v_blk) * 8
                            x0 = (mx * c["h"] + h_blk) * 8
                            planes[idx][y0 : y0 + 8, x0 : x0 + 8] = block
                mcu_count += 1

        # upsample chroma by replication to the luma grid, crop, convert
        full = []
        for c, plane in zip(comps, planes):
            ry, rx = vmax // c["v"], hmax // c["h"]
            if (vmax % c["v"]) or (hmax % c["h"]):
                raise ValueError("fractional sampling factors unsupported")
            if ry > 1 or rx > 1:
                plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
            full.append(plane[:h, :w])
        if len(full) == 1:
            return w, h, 1, _round_clamp(full[0]).tobytes()
        if len(full) == 3:
            rgb = _ycbcr_to_rgb(full[0], full[1], full[2])
            return w, h, 3, _round_clamp(rgb).tobytes()
        raise ValueError(f"unsupported component count {len(full)}")


    def decoded_constant_block_value(v: int) -> int:
        """Ground-truth decoded pixel value of a CONSTANT grayscale 8x8 block
        of original value ``v``, computed through the codec's own float
        DCT→quantize→IDCT path (only the DC coefficient survives a constant
        block; every AC quantizes to 0).

        The oracle-facing contract is the EVEN-v case: with the Annex K
        luminance table (q00=16), F00/q00 = (v-128)/2, which for even v is
        an exact integer in float — no rounding tie, robust to the ~1e-13
        DCT epsilon — so the quantized DC is exactly (v-128)/2 and the
        decoded constant is exactly ``v`` (lossless roundtrip). x128's
        fixture therefore uses even values only, and its DuckDB oracle
        replays plain integer arithmetic. Odd v sits on a .5 quantizer tie
        where the float epsilon decides the direction; this helper returns
        the true codec output for ANY v (tests use it), but odd values are
        not part of the external-oracle contract."""
        block = np.full((8, 8), float(v))
        coef = _quantize(_DCT_M @ (block - 128.0) @ _DCT_M.T, QUANT_LUMA)
        out = _DCT_M.T @ (coef.astype(np.float64) * QUANT_LUMA) @ _DCT_M + 128.0
        return int(_round_clamp(out)[0, 0])


    def _valueerror_boundary(fn):
        """Malformed input must surface as ValueError — the exception the
        decode/resize fallthrough contract catches (multimodal.decode_one
        falls through to PIL/stub on ValueError). A truncated or corrupt
        stream otherwise escapes as struct.error (not a ValueError
        subclass), KeyError (missing DQT/DHT table id), or IndexError —
        crashing the Spark task instead of falling back."""

        def wrapped(*args, **kw):
            try:
                return fn(*args, **kw)
            except (struct.error, KeyError, IndexError) as exc:
                raise ValueError(
                    f"invalid JPEG: truncated or malformed stream ({exc!r})"
                ) from exc

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return (
        encode_jpeg_baseline,
        _valueerror_boundary(decode_jpeg_pixels),
        _valueerror_boundary(parse_jpeg_header),
        decoded_constant_block_value,
    )


(
    encode_jpeg_baseline,
    decode_jpeg_pixels,
    parse_jpeg_header,
    decoded_constant_block_value,
) = _make_jpeg_codec()
