"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing is REAL and tested — schemas, Arrow batch shapes,
``mapInPandas`` partition flow, metadata extraction — while the actual
codec work (JPEG decode, resampling, frame sampling) is stubbed behind
deterministic fakes / NotImplementedError, because no image/audio libraries
ship in this environment.  Swapping the stub body for PIL/ffmpeg calls
changes nothing about the distributed plan."""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
    ]
)


def to_media(df: DataFrame, payload_col: str, id_col: str, kind: str, mime: str) -> DataFrame:
    """Wrap an arbitrary binary column as a typed media frame with metadata.
    Metadata extraction is pure Column expressions (JVM)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha"),
    )


_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — real implementation would be PIL/turbojpeg decode.  Raises so
    accidental production use is loud; tests use the deterministic fake."""
    raise NotImplementedError("image codecs are not available in this environment")


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decode: 'dimensions' and an 8-dim 'feature vector'
    derived from the payload digest — stable across runs and engines."""
    d = hashlib.sha256(payload).digest()
    w = 16 + d[0] % 64
    h = 16 + d[1] % 64
    feats = (np.frombuffer(d[:32], dtype=np.uint8).astype(np.float32) / 255.0)[:8]
    return w, h, feats


def extract_image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas over the media table: Arrow-batched feature extraction.
    The partition flow, schema and batch shape are the real thing; only the
    decode call is the deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, fs = [], [], []
            for payload in pdf["payload"]:
                w, h, f = _fake_decode(bytes(payload))
                ws.append(w)
                hs.append(h)
                fs.append(f.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "features": fs,
                }
            )

    return media.mapInPandas(run, _FEAT_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB plumbing for image resize: same media schema out, payload
    replaced by a deterministic digest-derived stand-in of the target size
    (capped) — the real body is one PIL/turbojpeg call per row inside the
    same Arrow-batched loop; the distributed plan (mapInPandas over the
    media partitioning, schema preserved) is the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload in pdf["payload"]:
                d = hashlib.sha256(bytes(payload)).digest()
                size = min(width * height, 4096)
                outs.append((d * (size // len(d) + 1))[:size])
            out = pdf.copy()
            out["payload"] = outs
            out["n_bytes"] = [len(o) for o in outs]
            out["sha"] = [hashlib.sha256(o).hexdigest() for o in outs]
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


_AUDIO_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("duration_ms", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """STUB plumbing for audio feature extraction (the real body would be
    soundfile/librosa per Arrow batch): deterministic digest-derived
    'duration' and 8-dim 'embedding', same batch flow as images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            durs, fs = [], []
            for payload in pdf["payload"]:
                d = hashlib.sha256(bytes(payload)).digest()
                durs.append(100 + int.from_bytes(d[2:4], "big") % 60000)
                fs.append(
                    (np.frombuffer(d[8:16], dtype=np.uint8).astype(np.float32) / 255.0).tolist()
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "duration_ms": durs, "features": fs}
            )

    return media.mapInPandas(run, _AUDIO_FEAT_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB plumbing for frame sampling: emits (media_id, frame_no, frame)
    rows where the 'frame' is a deterministic slice of the payload — the
    real implementation would call ffmpeg per Arrow batch."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = max(1, len(data) // (every_n * 16))
                for i in range(min(n_frames, 4)):
                    ids.append(mid)
                    nos.append(i)
                    frames.append(data[i * 16 : (i + 1) * 16])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(run, schema)
