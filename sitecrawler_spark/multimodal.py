"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing (schemas, partitioning, Arrow batch shapes,
mapInPandas signatures) is real and tested; the actual codec calls are
STUBBED because the image/audio libraries are not in this container:
``decode_media`` raises ``NotImplementedError`` for real codecs unless
the payload is in the deterministic FAKE container format the tests and
sitegen use (magic ``FAKE!`` header). The fake path exercises the exact
same batch shapes a PIL/ffmpeg implementation would.

Fake container layout (big-endian):
    b"FAKE!" | kind:1 (0=img,1=audio,2=video) | w:4 | h:4 | n_frames:4
    | payload bytes (w*h per frame, grayscale)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKE!"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("content_type", T.StringType()),
        ])),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def encode_fake(kind: int, w: int, h: int, n_frames: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=w * h * n_frames, dtype=np.uint8)
    return MAGIC + struct.pack(">BIII", kind, w, h, n_frames) + payload.tobytes()


def _decode_one(buf: bytes) -> tuple[int, int, int, int, np.ndarray]:
    if buf[:5] != MAGIC:
        raise NotImplementedError(
            "real image/audio codecs are not available in this container; "
            "plug PIL/ffmpeg here — only the FAKE! container is decodable"
        )
    kind, w, h, n = struct.unpack(">BIII", buf[5:18])
    arr = np.frombuffer(buf[18 : 18 + w * h * n], dtype=np.uint8)
    return kind, w, h, n, arr.reshape(n, h, w)


def decode_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract stage: binary → per-media
    features (mean intensity + a coarse histogram). Arrow batches in,
    Arrow batches out — the exact shape a real decoder plugs into."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                kind, w, h, n, frames = _decode_one(bytes(r.content))
                hist, _ = np.histogram(frames, bins=n_features, range=(0, 256))
                total = max(hist.sum(), 1)
                out.append(
                    (
                        r.media_id, r.kind, w, h, n,
                        float(frames.mean()),
                        (hist / total).astype(np.float32).tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(decode_batch, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per kept
    frame (media_id, frame_idx, frame_mean). Demonstrates the
    1-row-to-N-rows mapInPandas shape used for frame extraction."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_mean", T.DoubleType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                _k, _w, _h, n, frames = _decode_one(bytes(r.content))
                for i in range(0, n, every_nth):
                    rows.append((r.media_id, i, float(frames[i].mean())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_mean"])

    return media.filter(F.col("kind") == "video").mapInPandas(sample, schema)


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize stage (nearest-neighbor on the fake payload): binary in,
    binary out, metadata updated — the in-place transform shape."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples():
                kind, w, h, n, frames = _decode_one(bytes(r.content))
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = frames[:, ys][:, :, xs]
                buf = (
                    MAGIC
                    + struct.pack(">BIII", kind, out_w, out_h, n)
                    + resized.tobytes()
                )
                outs.append(
                    (r.media_id, r.doc_id, r.kind, buf,
                     {"width": out_w, "height": out_h, "n_frames": n,
                      "content_type": "application/x-fake"})
                )
            yield pd.DataFrame(
                outs, columns=["media_id", "doc_id", "kind", "content", "meta"]
            )

    return media.mapInPandas(resize, MEDIA_SCHEMA)


def generate_fake_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic media corpus referencing sitegen media spans."""
    rows = []
    for i in range(n):
        kind_i = i % 3
        kind = ["image", "audio", "video"][kind_i]
        w, h = (16 + i % 8, 12 + i % 5)
        frames = 1 if kind_i == 0 else 4 + i % 3
        rows.append(
            (
                f"m{i}", f"doc{i % 20}", kind,
                bytearray(encode_fake(kind_i, w, h, frames, seed + i)),
                {"width": w, "height": h, "n_frames": frames,
                 "content_type": f"application/x-fake-{kind}"},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
