"""Multimodal column handling (north-star K7; SURVEY.md §2.11).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata beside them — the standard Spark shape for a 100 TB multimodal
training-data table (payloads inline under a size cap, else
path-references into object storage; Parquet stores both fine).

The decode/feature steps are STUBS in this container (no image/audio
libraries available): ``decode_image`` raises NotImplementedError
unless a codec is registered; ``fake_feature_extract`` is the
deterministic stand-in proving the Spark-side plumbing — schema,
batching, and UDF signature are real and unit-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULTIMODAL_SCHEMA = (
    "item_id long, payload binary, media_type string, "
    "width int, height int, embedding array<float>"
)

# codec registry: media_type -> bytes -> np.ndarray. Real deployments
# register PIL/librosa/av decoders here; this container has none.
CODECS: dict = {}


def decode_image(data: bytes, media_type: str) -> "np.ndarray":
    if media_type not in CODECS:
        raise NotImplementedError(
            f"no codec registered for {media_type!r} — image/audio libraries "
            "are unavailable in this environment; register one in "
            "jane_spark.sources.multimodal.CODECS"
        )
    return CODECS[media_type](data)


def fake_feature_extract(df: DataFrame, payload_col: str, dim: int = 8) -> DataFrame:
    """Deterministic stand-in for decode→embed: hashes payload bytes into
    a fixed-dim float vector. Arrow-batched mapInPandas — the exact
    plumbing a real decoder would use (batch shape: one row per item,
    payload bytes in, array<float> out)."""

    out_schema = "item_id long, feat array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf[payload_col]:
                b = bytes(data)
                # deterministic per-byte folding into dim buckets
                acc = np.zeros(dim, dtype=np.float64)
                for i, byte in enumerate(b[:4096]):
                    acc[i % dim] += byte
                n = max(len(b[:4096]), 1)
                feats.append((acc / n).astype(np.float32).tolist())
            yield pd.DataFrame({"item_id": pdf["item_id"], "feat": feats})

    return df.mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str,
    target_w: int,
    target_h: int,
    media_type_col: str = "media_type",
) -> DataFrame:
    """decode → resize → re-encode over mapInPandas (north-star K7).

    The pixel work needs a registered codec (CODECS); without one the
    deterministic fallback emits a payload of exactly target_w*target_h
    bytes derived from the source bytes — the schema, batch shape, and
    partition behavior are identical to the real path, so the Spark
    plumbing is fully exercised in this environment.
    """
    out_schema = "item_id long, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data, mt in zip(pdf[payload_col], pdf[media_type_col]):
                b = bytes(data)
                if mt in CODECS:
                    img = CODECS[mt](b)  # real decode path
                    raise NotImplementedError(
                        "re-encode after resize requires an encoder codec; "
                        f"decoded shape={getattr(img, 'shape', None)}"
                    )
                # deterministic fake: tile source bytes to the target size
                need = target_w * target_h
                rep = (b * (need // max(len(b), 1) + 1))[:need]
                out.append(rep)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str,
    every_n_bytes: int = 1024,
    frame_size: int = 64,
) -> DataFrame:
    """Video frame sampling shape: one input row → many frame rows
    (item_id, frame_no, frame binary). Without an av codec the frames
    are deterministic byte slices at a fixed stride — the real decoder
    drops in without touching the Spark side (same fan-out schema, same
    Arrow batching)."""
    out_schema = "item_id long, frame_no int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for item_id, data in zip(pdf["item_id"], pdf[payload_col]):
                b = bytes(data)
                for fn, off in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(item_id)
                    nos.append(fn)
                    frames.append(b[off : off + frame_size])
            yield pd.DataFrame({"item_id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(run, out_schema)
