"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode/feature-extract/resize/frame-sample operators.

The Spark-side machinery here is REAL and tested: schemas, Arrow batch
shape, mapInPandas partitioning, deterministic fake features. The decode
hooks are REAL for PNG, baseline JPEG and WAV via the zero-dependency
stdlib codecs (functions/codecs.py) — actual pixels and PCM samples
feed the feature extractors under ``use_real_codecs=True``. Formats
that genuinely need a codec library (progressive JPEG, WebP, MP3, MP4)
raise ``NotImplementedError`` naming the dependency (Pillow /
soundfile); swapping one in touches only ``_decode_image_real`` /
``_decode_audio_real`` — every schema and operator signature stays
fixed.

Scale notes: binary payloads ride the normal columnar path (Parquet
binary + Arrow). Decode work is embarrassingly parallel → mapInPandas
(no shuffle); feature vectors come back as array<float> ready for
operators/similarity.py. Batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so a partition of 100 MB
blobs never materializes at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),      # opaque bytes
        T.StructField("width", T.IntegerType(), True),       # typed metadata
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 32
FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "features array<float>"
)
FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame_sha256 string"


def _pil():  # optional dependency probe (importable on hosts with Pillow)
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_image_real(payload: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 RGB array.

    PNG and baseline JPEG payloads decode for real with the
    zero-dependency stdlib codec (functions/codecs.py — PNG: 8-bit
    gray/RGB/palette/alpha, all five scanline filters; JPEG: baseline
    sequential SOF0, Huffman + quant tables read from the stream,
    4:4:4/4:2:2/4:2:0). Other formats (progressive JPEG, WebP, …) go
    through Pillow when the host has it; otherwise this raises naming
    the dependency."""
    from search_engine_spark.functions.codecs import (
        decode_jpeg,
        decode_png,
        is_jpeg,
        is_png,
    )

    if is_png(payload or b""):
        return decode_png(payload)
    if is_jpeg(payload or b""):
        try:
            return decode_jpeg(payload)
        except ValueError as exc:
            if "subset" not in str(exc) and "baseline" not in str(exc):
                raise
            if _pil() is None:
                raise NotImplementedError(
                    "non-baseline JPEG decode requires Pillow "
                    "(pip install pillow); baseline JPEG decodes with "
                    "the built-in stdlib codec"
                ) from exc
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "non-PNG/JPEG image decode requires Pillow (pip install "
            "pillow); PNG and baseline JPEG decode with the built-in "
            "stdlib codec"
        )
    import io

    img = Image.open(io.BytesIO(payload))
    img.load()
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def image_features_real(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real-pixel feature vector: 4x4 grid of per-cell channel means +
    global channel means + aspect ratio, L2-normalized to `dim` floats.
    Deterministic given the decoded pixels — a stand-in embedding that
    exercises the REAL decode path end-to-end (decode → embed → ANN)."""
    arr = _decode_image_real(payload).astype(np.float64)
    h, w, _ = arr.shape
    gh, gw = max(h // 4, 1), max(w // 4, 1)
    cells = []
    for gy in range(4):
        for gx in range(4):
            cell = arr[gy * gh:(gy + 1) * gh or h, gx * gw:(gx + 1) * gw or w]
            cells.append(cell.mean() / 255.0 if cell.size else 0.0)
    feats = np.asarray(
        cells
        + [arr[..., c].mean() / 255.0 for c in range(3)]
        + [h / max(w, 1)],
        dtype=np.float64,
    )
    out = np.zeros(dim, dtype=np.float64)
    out[: min(dim, feats.size)] = feats[:dim]
    n = float(np.sqrt((out * out).sum())) or 1.0
    return (out / n).astype(np.float32)


def _decode_audio_real(payload: bytes) -> tuple[np.ndarray, int]:
    """bytes → (mono float64 samples, sample_rate). WAV/PCM-16 decodes
    for real via the stdlib codec; compressed formats (mp3/ogg/flac)
    genuinely need a codec library and raise naming it."""
    from search_engine_spark.functions.codecs import decode_wav, is_wav

    if is_wav(payload or b""):
        return decode_wav(payload)
    raise NotImplementedError(
        "non-WAV audio decode requires soundfile/torchaudio; "
        "WAV/PCM-16 decodes with the built-in stdlib codec"
    )


def audio_features_real(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real-sample audio feature vector: duration, RMS, zero-crossing
    rate, and 8 log-spaced FFT band energies, L2-normalized to ``dim``
    floats — deterministic given the decoded PCM, exercising the REAL
    decode path end-to-end (decode → embed → ANN)."""
    samples, rate = _decode_audio_real(payload)
    n = samples.size
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt((samples * samples).mean()))
    zcr = float((np.signbit(samples[1:]) != np.signbit(samples[:-1])).mean())
    spec = np.abs(np.fft.rfft(samples))
    edges = np.unique(
        np.geomspace(1, spec.size, 9).astype(np.int64).clip(1, spec.size)
    )
    bands = [float(spec[a:b].sum()) for a, b in zip(edges, edges[1:])]
    total = sum(bands) or 1.0
    feats = np.asarray(
        [n / rate, rms, zcr] + [e / total for e in bands], dtype=np.float64
    )
    out = np.zeros(dim, dtype=np.float64)
    out[: min(dim, feats.size)] = feats[:dim]
    nrm = float(np.sqrt((out * out).sum())) or 1.0
    return (out / nrm).astype(np.float32)


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: sha256 bytes → unit floats.

    Lets the full pipeline (decode → embed → ANN) run and be asserted
    end-to-end without codecs; replaced by a real encoder in production.
    """
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = raw.astype(np.float32) / np.float32(2**32)
    n = float(np.sqrt((v.astype(np.float64) ** 2).sum())) or 1.0
    return (v / n).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, use_real_codecs: bool = False
) -> DataFrame:
    """media table → per-item feature vectors via mapInPandas.

    One Arrow batch in, one out; no shuffle. ``use_real_codecs=True``
    routes image rows through the Pillow decode hook
    (:func:`image_features_real`) on hosts that have it — schemas,
    batching, and partitioning are identical either way, so swapping
    codecs never touches the plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_real_codecs:
                feats = [
                    image_features_real(p, dim).tolist()
                    if k == "image"
                    else audio_features_real(p, dim).tolist()
                    if k == "audio"
                    else fake_features(p, dim).tolist()
                    for k, p in zip(pdf["kind"], payloads)
                ]
            else:
                feats = [fake_features(p, dim).tolist() for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype("int32"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → one row per sampled frame timestamp.

    Frame *extraction* is stubbed (no codec): each frame row carries a
    deterministic content hash derived from (payload, frame_idx) so
    downstream dedup/similarity plumbing is fully exercisable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or not r.duration_ms:
                    continue
                for i, ts in enumerate(range(0, int(r.duration_ms), every_ms)):
                    frame_hash = hashlib.sha256(
                        (r.payload or b"") + i.to_bytes(4, "little")
                    ).hexdigest()
                    rows.append((r.media_id, i, ts, frame_hash))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_sha256"]
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_metadata(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planner: computes target dims JVM-side (aspect-preserving);
    the pixel work would happen in the decode hook. Pure column math —
    demonstrates metadata ops need no UDF."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: image rows carry REAL PNG
    bytes (seeded gradient pattern), audio rows REAL 16-bit WAV sines,
    video rows opaque seeded bytes (no stdlib MP4 codec exists) — so
    ``extract_features(use_real_codecs=True)`` runs genuine decodes."""
    from search_engine_spark.functions.codecs import (
        encode_png,
        encode_wav_sine,
    )

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        width = 640 + (i % 5) * 160 if kind != "audio" else None
        height = 480 + (i % 3) * 120 if kind != "audio" else None
        duration = (i % 10 + 1) * 1000 if kind != "image" else None
        if kind == "image":
            # small real pixels (payload dims decouple from the metadata
            # columns on purpose — resize planning is metadata-only)
            h, w = 8 + i % 5, 8 + i % 7
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [(yy * 31 + i) % 256, (xx * 17 + i) % 256, (yy + xx + i) % 256],
                axis=2,
            ).astype(np.uint8)
            payload = bytearray(encode_png(px, filter_type=i % 5))
        elif kind == "audio":
            payload = bytearray(
                encode_wav_sine(200.0 + 50.0 * i, 40 + (i % 4) * 20)
            )
        else:
            payload = bytearray(
                hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
            )
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                payload,
                width,
                height,
                duration,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
