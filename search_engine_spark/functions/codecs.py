"""Zero-dependency media codecs (stdlib zlib/struct/wave + numpy).

This container ships no Pillow/soundfile, but PNG and WAV are simple
enough to decode with the standard library — which turns the multimodal
pipeline's decode hooks (operators/multimodal.py) from documented stubs
into REAL paths: image rows decode actual PNG pixels, audio rows decode
actual PCM samples, and the feature extractors run on real content.
Video (MP4/H.264) genuinely needs a codec library and stays stubbed.

Scope (honest subset, asserted with clear errors):
- PNG: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette,
  gray+alpha, RGBA), non-interlaced, all five scanline filters
  (None/Sub/Up/Average/Paeth). Output is always HxWx3 uint8 RGB.
- WAV: PCM 16-bit via the stdlib ``wave`` module, any channel count
  (mixed down to mono float64 in [-1, 1]).

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
