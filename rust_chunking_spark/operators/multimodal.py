"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata; the Spark-side
plumbing (schemas, Arrow batch shapes, mapInPandas iteration, partition-size
control) is real and tested. Codec status per modality:

- image: REAL decode via PIL when importable (auto-selected); otherwise a
  deterministic fake decoder (seeded from the payload hash) produces stable
  pseudo-pixels, and `fake=False` without PIL raises NotImplementedError.
- audio: REAL decode via stdlib `wave` (PCM WAV -> mono float32) — always
  available, zero extra dependencies; `fake=True` keeps a seeded stand-in
  for plumbing tests. Non-PCM encodings need an external codec and raise.
- video: stays a binary payload (frame decode needs ffmpeg-class codecs the
  container doesn't ship); the image/audio batch shapes are the template.

On a real cluster: swap the decoders for torchvision/ffmpeg calls — the
mapInPandas batch shape, schema, and repartitioning strategy stay as-is.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("format", StringType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


try:                         # optional real codec: use PIL when present
    from PIL import Image as _PILImage
except ImportError:          # this container ships no image libraries
    _PILImage = None


def _fake_decode(payload: bytes, target: tuple[int, int] = (32, 32)):
    """Deterministic stand-in for an image decoder: seeded pseudo-pixels."""
    seed = int.from_bytes(hashlib.sha3_256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (*target, 3), dtype=np.uint8)


def _pil_decode(payload: bytes, target: tuple[int, int] = (32, 32)):
    """Real decode path (taken automatically when PIL is importable):
    decode -> RGB -> resize to the target grid, returning the same
    (H, W, 3) uint8 tensor shape as the fake decoder."""
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("RGB")
    orig = img.size                     # (width, height)
    img = img.resize((target[1], target[0]))
    return np.asarray(img, dtype=np.uint8), orig


def decode_and_featurize(df: DataFrame, payload_col: str = "payload",
                         id_col: str = "media_id", n_features: int = 16,
                         fake: bool = True) -> DataFrame:
    """binary payloads -> fixed-size feature vectors via mapInPandas.

    Batch shape: Arrow batches of rows; each batch decodes into a single
    numpy tensor stack so the feature reduction is one vectorized op. Output
    is a stable flat schema (IMAGE_FEATURE_SCHEMA).
    """

    def run(iterator):
        import pandas as pd
        for pdf in iterator:
            feats, ws, hs, fmts = [], [], [], []
            for payload in pdf[payload_col]:
                if payload is None:
                    feats.append(None)
                    ws.append(None)
                    hs.append(None)
                    fmts.append(None)
                    continue
                if not fake and _PILImage is None:
                    raise NotImplementedError(
                        "real image decoding requires PIL/libvips; "
                        "not available in this container")
                if not fake:
                    # width/height report the DECODED image's dimensions;
                    # features are computed on the resized target grid
                    img, (ow, oh) = _pil_decode(bytes(payload))
                else:
                    img = _fake_decode(bytes(payload))
                    oh, ow = img.shape[:2]
                h, w, _ = img.shape
                # toy feature: per-cell channel means over a grid
                g = int(np.sqrt(n_features // 3)) or 1
                cells = img[:g * (h // g), :g * (w // g)].reshape(
                    g, h // g, g, w // g, 3).mean(axis=(1, 3))
                feats.append(cells.reshape(-1)[:n_features]
                             .astype(np.float32).tolist())
                ws.append(ow)
                hs.append(oh)
                fmts.append("fake-rgb" if fake else "rgb")
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "format": fmts,
                "features": feats,
            })

    return df.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


# --------------------------------------------------------------------- audio

AUDIO_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_channels", IntegerType(), True),
    StructField("n_samples", LongType(), True),
    StructField("format", StringType(), True),
    StructField("features", ArrayType(FloatType()), True),
])

_PCM_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def _wave_decode(payload: bytes):
    """REAL audio decode via stdlib `wave` (zero extra dependencies): PCM
    WAV -> mono float32 in [-1, 1] + (sample_rate, n_channels)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        sr, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = _PCM_DTYPES.get(sw)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if sw == 1:                               # 8-bit WAV is unsigned
        x = (x - 128.0) / 128.0
    else:
        x /= float(2 ** (8 * sw - 1))
    x = x.reshape(-1, nch).mean(axis=1)       # downmix to mono
    return x, sr, nch


def _fake_audio(payload: bytes):
    """Deterministic stand-in: seeded pseudo-samples (1s mono @16kHz)."""
    seed = int.from_bytes(hashlib.sha3_256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, 16000).astype(np.float32), 16000, 1


def decode_audio_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "media_id", n_features: int = 16,
                          fake: bool = False) -> DataFrame:
    """binary WAV payloads -> per-window RMS energy features via mapInPandas.

    Same pipeline shape as the image path (Arrow batches, flat output
    schema, vectorized per-batch reduction). The real decoder is stdlib
    `wave` — always available — so unlike images there is no stubbed branch;
    `fake=True` remains for plumbing tests with non-WAV payloads. Non-PCM
    encodings (mp3/ogg) would need an external codec and raise loudly."""

    def run(iterator):
        import pandas as pd
        for pdf in iterator:
            srs, nchs, nss, fmts, feats = [], [], [], [], []
            for payload in pdf[payload_col]:
                if payload is None:
                    srs.append(None)
                    nchs.append(None)
                    nss.append(None)
                    fmts.append(None)
                    feats.append(None)
                    continue
                if fake:
                    x, sr, nch = _fake_audio(bytes(payload))
                else:
                    x, sr, nch = _wave_decode(bytes(payload))
                # per-window RMS energy over n_features equal windows
                n = len(x) - len(x) % n_features
                if n:
                    win = x[:n].reshape(n_features, -1)
                    rms = np.sqrt((win * win).mean(axis=1))
                else:
                    rms = np.zeros(n_features, dtype=np.float32)
                srs.append(sr)
                nchs.append(nch)
                nss.append(len(x))
                fmts.append("fake-pcm" if fake else "pcm")
                feats.append(rms.astype(np.float32).tolist())
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "sample_rate": pd.array(srs, dtype="Int32"),
                "n_channels": pd.array(nchs, dtype="Int32"),
                "n_samples": pd.array(nss, dtype="Int64"),
                "format": fmts,
                "features": feats,
            })

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)
