"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata; the Spark-side
plumbing (schemas, Arrow batch shapes, mapInPandas iteration, partition-size
control) is real and tested. The codec step itself is STUBBED: the container
ships no image/audio libraries, so `decode_image` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder (seeded from
the payload hash) produces stable pseudo-pixels — enough to exercise the full
distributed pipeline end to end.

On a real cluster: replace `_fake_decode` with PIL/torchvision/ffmpeg calls —
the mapInPandas batch shape, schema, and repartitioning strategy stay as-is.
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
                    img, _orig = _pil_decode(bytes(payload))
                else:
                    img = _fake_decode(bytes(payload))
                h, w, _ = img.shape
                # toy feature: per-cell channel means over a grid
                g = int(np.sqrt(n_features // 3)) or 1
                cells = img[:g * (h // g), :g * (w // g)].reshape(
                    g, h // g, g, w // g, 3).mean(axis=(1, 3))
                feats.append(cells.reshape(-1)[:n_features]
                             .astype(np.float32).tolist())
                ws.append(w)
                hs.append(h)
                fmts.append("fake-rgb" if fake else "rgb")
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "format": fmts,
                "features": feats,
            })

    return df.mapInPandas(run, IMAGE_FEATURE_SCHEMA)
