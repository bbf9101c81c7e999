"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/resize/frame-sample kernels need codec libraries that are not in
this container, so the DECODE STEP IS STUBBED (``NotImplementedError``)
behind ``fake=True`` deterministic stand-ins — but all Spark-side plumbing
is real and tested: asset schema, Arrow batch shape through ``mapInPandas``,
partitioning by asset kind, and feature-vector output schema. Swapping the
stub for Pillow/torchaudio/pyav is a one-function change per kernel.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, bytes binary, mime string, "
    "width int, height int, duration_ms long"
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "asset_id long, frame_no int, frame_hash string"


def make_assets(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake asset table (binary payload = hash-derived bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(f"{kind}|{i}".encode(), digest_size=64).digest()
        rows.append(
            (i, kind, payload, f"{kind}/x-fake", 64 + i % 32, 48 + i % 24,
             1000 * (i % 30 + 1))
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_image_real(data: bytes):  # pragma: no cover - container lacks codecs
    raise NotImplementedError(
        "image decode requires Pillow/libjpeg — not available in this "
        "container; use fake=True for the deterministic stand-in"
    )


def _decode_image_fake(data: bytes, dim: int = 8):
    """Deterministic stand-in: 'pixels' from blake2b of the payload."""
    h = hashlib.blake2b(data, digest_size=dim * 4).digest()
    return [
        int.from_bytes(h[4 * j : 4 * j + 4], "big") / 2**32 for j in range(dim)
    ]


def image_features(assets: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Arrow-batched decode + feature-extract over image assets."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out = {"asset_id": [], "width": [], "height": [], "feature": []}
            for aid, data, w, h in zip(b["asset_id"], b["bytes"], b["width"], b["height"]):
                vec = (
                    _decode_image_fake(bytes(data), dim)
                    if fake
                    else _decode_image_real(bytes(data))
                )
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(vec)
            yield pd.DataFrame(out)

    imgs = assets.filter(F.col("kind") == "image").select(
        "asset_id", "bytes", "width", "height"
    )
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 5000, fake: bool = True) -> DataFrame:
    """Video frame sampling: one row per sampled frame. Frame boundaries
    come from metadata (duration), the decode itself is stubbed — the fake
    emits a deterministic per-frame hash so downstream dedup/similarity
    plumbing can be tested end-to-end."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out = {"asset_id": [], "frame_no": [], "frame_hash": []}
            for aid, data, dur in zip(b["asset_id"], b["bytes"], b["duration_ms"]):
                if not fake:
                    raise NotImplementedError("video decode requires pyav")
                n_frames = max(1, int(dur) // every_ms)
                for fno in range(n_frames):
                    out["asset_id"].append(aid)
                    out["frame_no"].append(fno)
                    out["frame_hash"].append(
                        hashlib.blake2b(
                            bytes(data) + fno.to_bytes(4, "big"), digest_size=8
                        ).hexdigest()
                    )
            yield pd.DataFrame(out)

    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", "bytes", "duration_ms"
    )
    return vids.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def resize_plan(assets: DataFrame, max_px: int = 512) -> DataFrame:
    """Pure-metadata resize planning (native): target dims preserving
    aspect ratio — the actual pixel work happens in the stubbed kernel."""
    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    scale = F.least(F.lit(float(max_px)) / w, F.lit(float(max_px)) / h, F.lit(1.0))
    return assets.select(
        "asset_id",
        "kind",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )
