"""Zero-dependency media codecs (stdlib zlib/struct/wave + numpy).

This container ships no Pillow/soundfile, but PNG, WAV and baseline
JPEG are decodable with the standard library + numpy — which turns the
multimodal pipeline's decode hooks (operators/multimodal.py) from
documented stubs into REAL paths: image rows decode actual PNG/JPEG
pixels, audio rows decode actual PCM samples, and the feature
extractors run on real content. Video (MP4/H.264) and perceptual audio
(MP3) genuinely need codec libraries and stay stubbed.

Scope (honest subset, asserted with clear errors):
- PNG: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette,
  gray+alpha, RGBA), non-interlaced, all five scanline filters
  (None/Sub/Up/Average/Paeth). Output is always HxWx3 uint8 RGB.
- WAV: PCM 16-bit via the stdlib ``wave`` module, any channel count
  (mixed down to mono float64 in [-1, 1]).
- JPEG: baseline sequential DCT (SOF0), 8-bit, 1/3 components,
  sampling factors 1-2, restart intervals; Huffman + quant tables are
  read from the stream, so foreign baseline files decode too.
  Progressive (SOF2) and arithmetic coding raise naming Pillow.

Encoders exist for test/synthesis round-trips: ``encode_png`` can emit
any filter type on every row (exercising each unfilter path) and
``encode_wav_sine`` writes deterministic PCM tones.

Everything here is per-row work executed inside Arrow-batched
mapInPandas (multimodal.extract_features) — no Spark plan impact.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (palette counts as 1 index byte pre-map)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return bool(payload) and payload[:8] == _PNG_SIG


def is_wav(payload: bytes) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(
    raw: bytes, width: int, height: int, bpp: int
) -> np.ndarray:
    """Reverse PNG scanline filtering → (height, width*bpp) uint8."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        cur = np.frombuffer(raw[pos:pos + stride], dtype=np.uint8).astype(
            np.int32
        ).copy()
        pos += stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — vectorized (no intra-row dependency)
            cur = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — left-dependency
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                if ftype == 1:
                    cur[i] = (cur[i] + left) & 0xFF
                elif ftype == 3:
                    cur[i] = (cur[i] + ((left + up) >> 1)) & 0xFF
                else:
                    cur[i] = (cur[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 RGB (stdlib zlib; subset per module doc)."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"PNG subset: need 8-bit non-interlaced gray/RGB/palette/alpha, "
            f"got depth={depth} color={color} interlace={interlace}"
        )
    bpp = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    expect = height * (1 + width * bpp)
    if len(raw) != expect:
        raise ValueError(f"PNG: decompressed {len(raw)} bytes, want {expect}")
    px = _unfilter(raw, width, height, bpp).reshape(height, width, bpp)
    if color == 2:
        return px
    if color == 6:
        return px[..., :3].copy()
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    if plte is None:
        raise ValueError("PNG: palette image without PLTE")
    return plte[px[..., 0]]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWx3 uint8 → PNG bytes, applying ``filter_type`` (0-4) to every
    scanline — decode_png(encode_png(x, f)) == x for each filter, which
    is how the tests cover every unfilter branch."""
    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3, "encode_png takes RGB"
    bpp = 3
    lines = []
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            filt = cur
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        else:
            filt = cur.copy()
            for i in range(w * bpp - 1, -1, -1):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                if filter_type == 1:
                    filt[i] = (cur[i] - left) & 0xFF
                elif filter_type == 3:
                    filt[i] = (cur[i] - ((left + up) >> 1)) & 0xFF
                else:
                    filt[i] = (cur[i] - _paeth(left, up, ul)) & 0xFF
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor pixel resize (pure numpy fancy indexing)."""
    h, w, _ = rgb.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return rgb[ys][:, xs]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 samples in [-1, 1], sample_rate)."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("WAV subset: 16-bit PCM only")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        pcm = np.frombuffer(
            wf.readframes(wf.getnframes()), dtype="<i2"
        ).astype(np.float64)
    if nch > 1:
        pcm = pcm.reshape(-1, nch).mean(axis=1)
    return pcm / 32768.0, rate


def encode_wav_sine(
    freq_hz: float, duration_ms: int, rate: int = 8000, amplitude: float = 0.5
) -> bytes:
    """Deterministic 16-bit mono PCM sine — real WAV test payloads."""
    n = int(rate * duration_ms / 1000)
    t = np.arange(n, dtype=np.float64) / rate
    pcm = (np.sin(2.0 * np.pi * freq_hz * t) * amplitude * 32767.0).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# JPEG — baseline sequential DCT (JFIF), pure stdlib + numpy
# ---------------------------------------------------------------------------
# Decoder scope: baseline (SOF0), 8-bit, 1 or 3 components, sampling
# factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, Huffman and
# quant tables read from the stream (so foreign baseline JPEGs decode,
# not just our own). Progressive (SOF2) and arithmetic coding raise.
# Encoder scope: 4:4:4 (or grayscale), quality-scaled Annex-K-style
# quant tables, self-describing canonical Huffman tables — every table
# is EMBEDDED in the output (DQT/DHT), so decode correctness never
# depends on table choice. Used for test synthesis, like encode_png.

_JPEG_QUANT_Y = np.array([  # Annex K luminance table (quality 50 base)
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_JPEG_QUANT_C = np.array([  # Annex K chrominance table
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal DCT-II basis: F = C @ f @ C.T ; f = C.T @ F @ C
_DCT_C = np.array([
    [(np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
     * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
    for u in range(8)
])


def is_jpeg(payload: bytes) -> bool:
    return len(payload) > 3 and payload[:2] == b"\xff\xd8"


def _huff_canonical(bits: list[int], values: list[int]) -> dict:
    """JPEG canonical code assignment: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, RSTn skip."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: resync there
                raise _RestartMarker(self.pos)
            else:
                # EOI (or any marker): pad with 1-bits per the spec
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_at_restart(self) -> None:
        self.buf = 0
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, pos: int):
        self.pos = pos


def _huff_decode(reader: _BitReader, table: dict) -> int:
    length, code = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman stream")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: t-bit magnitude v → signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → HxWx3 uint8 RGB (grayscale replicated)."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload")
    d = payload
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart = 0
    frame = None
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", d[pos:pos + 2])[0]
        seg = d[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("JPEG subset: 8-bit quant tables only")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8
                ).astype(np.float64)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_canonical(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG subset: baseline sequential (SOF0) only"
            )
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tdta >> 4, tdta & 15)
            pos += seglen
            return _jpeg_scan(d, pos, frame, sel, qt, huff_dc, huff_ac,
                              restart)
        pos += seglen
    raise ValueError("JPEG: no SOS scan found")


def _jpeg_scan(d, pos, frame, sel, qt, huff_dc, huff_ac, restart):
    if frame is None:
        raise ValueError("JPEG: SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    reader = _BitReader(d, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            # skip to the RSTn marker and resync byte-aligned after it
            p = reader.pos
            while d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
                p += 1
            reader.pos = p + 2
            reader.byte_align_at_restart()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            tdc, tac = sel[c["id"]]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    try:
                        blk = _decode_block(
                            reader, huff_dc[tdc], huff_ac[tac]
                        )
                    except _RestartMarker:
                        raise ValueError(
                            "JPEG: restart marker inside an MCU"
                        ) from None
                    pred[ci] += blk[0]
                    coeffs = np.zeros(64)
                    coeffs[_ZIGZAG] = blk
                    coeffs[0] = pred[ci]
                    f = _DCT_C.T @ (coeffs.reshape(8, 8) * q) @ _DCT_C
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = f + 128.0
    out = []
    for c, p in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:  # replicate-upsample chroma
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _decode_block(reader, dc_table, ac_table):
    """One 8x8 block → 64 zigzag-order coefficients; blk[0] is the DC
    DIFFERENCE (caller accumulates the predictor)."""
    blk = np.zeros(64)
    t = _huff_decode(reader, dc_table)
    blk[0] = _extend(reader.read_bits(t), t)
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC run past block end")
        blk[k] = _extend(reader.read_bits(s), s)
        k += 1
    return blk


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits


def _huff_encode_map(bits: list[int], values: list[int]) -> dict:
    """{symbol: (code, length)} under the same canonical assignment
    the decoder builds — encoder/decoder share one convention."""
    return {
        sym: (code, length)
        for (length, code), sym in _huff_canonical(bits, values).items()
    }

# self-describing uniform-length canonical tables (valid prefix codes
# with the all-ones code unused, as JPEG requires; compression is a few
# percent worse than Annex K's — irrelevant for synthesis/tests, and
# the tables travel in DHT so ANY baseline decoder reads them)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, coeffs, pred, dc_map, ac_map) -> int:
    """Quantized zigzag coeffs → entropy bits; returns new DC pred."""
    dc = int(coeffs[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_map[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeffs[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_map[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_map[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_map[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) → baseline JFIF bytes.

    4:4:4 (no chroma subsampling), quality-scaled Annex-K quant tables
    (libjpeg's scaling formula), all tables embedded — decodable by
    decode_jpeg and by any baseline JPEG decoder."""
    arr = np.asarray(rgb)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if not (1 <= quality <= 100):
        raise ValueError("quality must be in 1..100")
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    def _scaled(base):
        return np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255)
    q_tabs = [_scaled(_JPEG_QUANT_Y)] + (
        [] if gray else [_scaled(_JPEG_QUANT_C)]
    )
    # pad to 8x8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if gray:
        comps_px = [arr.astype(np.float64)]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps_px = [y, cb, cr]
    comps_px = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        for p in comps_px
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01" + b"\x00" + struct.pack(">HH", 1, 1)
            + b"\x00\x00")
    for tq, tbl in enumerate(q_tabs):
        zz = np.zeros(64, dtype=np.uint8)
        zz = tbl.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz.tobytes()
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    dc_map = _huff_encode_map(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_map = _huff_encode_map(_ENC_AC_BITS, _ENC_AC_VALS)
    for tc_th in ([(0, 0), (1, 0)] if gray else [(0, 0), (1, 0), (0, 1),
                                                 (1, 1)]):
        tc, th = tc_th
        bits = _ENC_DC_BITS if tc == 0 else _ENC_AC_BITS
        vals = _ENC_DC_VALS if tc == 0 else _ENC_AC_VALS
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (tc << 4) | th
        ) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for baseline

    bw = _BitWriter()
    pred = [0] * nc
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(nc):
                q = q_tabs[0 if ci == 0 else 1]
                blk = comps_px[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                f = _DCT_C @ (blk - 128.0) @ _DCT_C.T
                coeffs = np.rint(f / q).astype(np.int64).reshape(-1)[_ZIGZAG]
                pred[ci] = _encode_block(bw, coeffs, pred[ci], dc_map,
                                         ac_map)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
