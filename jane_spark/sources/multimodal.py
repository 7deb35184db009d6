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
