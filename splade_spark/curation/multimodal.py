"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns next to typed metadata, and
per-item compute runs as Arrow-batched ``mapInPandas`` stages — the Spark-side
plumbing (schemas, batch shapes, partitioning) is real and tested. The pixel/
sample decode itself requires codec libraries absent from this container, so:

* ``byte_histogram_features`` — a REAL deterministic feature extractor
  (normalized 16-bin byte histogram + length/entropy). No codec needed; this
  is the end-to-end-tested path.
* ``decode_image`` — gated behind an import-try of PIL; raises
  ``NotImplementedError`` here (STUB, clearly marked) while keeping the
  exact UDF signature and output schema a real decoder would have.
* ``sample_frames`` — deterministic frame sampling for video-like payloads:
  the payload is segmented into fixed-size pseudo-frames and every stride-th
  is emitted; with a real container parser only ``_split_frames`` changes.

Media table schema (our convention):
    media(media_id long, kind string, payload binary,
          meta struct<mime:string, width:int, height:int, duration_ms:int>)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

N_BINS = 16

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("entropy", DoubleType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def byte_histogram_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """media → (media_id, n_bytes, entropy, features[16]) via mapInPandas.

    Real computation on the binary payload: normalized 16-bin byte histogram
    and Shannon entropy — the deterministic stand-in for an image-embedding
    UDF with identical plumbing (Arrow batches of binary → fixed-width float
    vectors).
    """

    def _extract(batches):
        for pdf in batches:
            ids, nb, ent, feats = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
                hist = np.bincount(raw >> 4, minlength=N_BINS).astype(np.float64)
                total = max(raw.size, 1)
                p = hist / total
                nz = p[p > 0]
                ids.append(mid)
                nb.append(raw.size)
                ent.append(float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0)
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nb, "entropy": ent, "features": feats}
            )

    return media.select("media_id", "payload").mapInPandas(_extract, _FEATURE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 1024, stride: int = 10
) -> DataFrame:
    """Video-like payload → every stride-th fixed-size pseudo-frame.

    STUB SEGMENTATION (clearly marked): real containers need a demuxer; the
    fixed-size split stands in so partitioning/explode/row-count behavior is
    real. Frame indexes refer to the pre-sampling sequence.
    """

    def _sample(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = payload or b""
                n_frames = math.ceil(len(raw) / frame_bytes) if raw else 0
                for i in range(0, n_frames, stride):
                    rows.append((mid, i, raw[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "payload").mapInPandas(_sample, _FRAME_SCHEMA)


def decode_image(media: DataFrame):  # pragma: no cover - stub
    """STUB: true pixel decode requires an image codec (PIL/opencv), absent
    from this container. The signature and output schema are frozen so a
    codec drop-in only replaces the inner function.

    Raises NotImplementedError at plan-build time (not inside executors) so
    misuse fails fast.
    """
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image decode needs PIL/opencv (not in this container); "
            "use byte_histogram_features for the tested deterministic path"
        )
    raise NotImplementedError("real decoder not wired yet; see module docstring")
