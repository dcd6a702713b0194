"""Multimodal column plumbing: media as opaque binary + typed metadata.

Media spans reference blobs (``media_ref``); at scale those blobs live in
a ``media(media_ref string, content binary, media_type string, meta
struct<...>)`` table partitioned by pmod(xxhash64(media_ref), P) so that
decode/feature stages co-partition with their references.

The actual decoders (image resize, audio resample, video frame-sample)
need codec libraries that are NOT in this environment, so the decode
kernel is stubbed: ``decode_stub=True`` (default) produces a
deterministic fake feature vector derived from the bytes; passing
``decode_stub=False`` raises NotImplementedError where the real library
call belongs. Everything Spark-side — schema, mapInPandas batching,
Arrow transfer, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_DDL",
    "synth_media_df",
    "extract_media_features",
    "resize_media",
    "sample_frames",
]

MEDIA_DDL = (
    "media_ref string, content binary, media_type string, width int, height int"
)

FEATURES_DDL = "media_ref string, media_type string, n_bytes long, feature array<float>"

RESIZED_DDL = (
    "media_ref string, media_type string, width int, height int, content binary"
)

FRAMES_DDL = "media_ref string, media_type string, frame_idx int, frame binary"


def synth_media_df(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic opaque blobs for every media span in ``docs``
    (payload = repeated md5 of the ref; typed metadata from the ref)."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    return refs.select(
        "media_ref",
        F.unhex(F.repeat(F.md5("media_ref"), 8)).alias("content"),
        F.when(F.crc32("media_ref") % 3 == 0, "image/png")
        .when(F.crc32("media_ref") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.crc32("media_ref") % 640 + 16).cast("int").alias("width"),
        (F.crc32("media_ref") % 480 + 16).cast("int").alias("height"),
    )


def _fake_decode(content: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes -> unit vector."""
    digest = hashlib.sha256(content).digest()
    arr = np.frombuffer(digest[: dim * 4], dtype=np.uint32).astype(np.float64)
    arr = arr / np.linalg.norm(arr)
    return arr.astype(np.float32)


def extract_media_features(
    media: DataFrame, dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary media content.

    Arrow-batched: each pandas batch decodes vectorized-per-row in Python
    (the unavoidable part of media decode), returning fixed-width float
    features. Real decoders slot into ``_fake_decode``'s place.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; plug a decoder in here"
                )
            feats = [
                _fake_decode(bytes(c), dim).tolist() if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(decode_batches, FEATURES_DDL)


def resize_media(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas media resize plumbing (image resize / video thumbnail).

    Same contract as ``extract_media_features``: the Spark side — Arrow
    batching, schema, one output row per input row — is real; the pixel
    kernel is a stub. With ``decode_stub=True`` the "resized" payload is
    the deterministic sha256 hex of (content || '|WxH') as ASCII bytes,
    which the driver's ``media_resize`` DuckDB oracle replays exactly;
    ``decode_stub=False`` raises where a real decoder (PIL/ffmpeg)
    slots in. Callers filter to the media types their kernel handles.
    """

    tag = f"|{width}x{height}".encode()

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires codec libraries not present "
                    "in this environment; plug a decoder in here"
                )
            resized = [
                hashlib.sha256(bytes(c) + tag).hexdigest().encode()
                if c is not None
                else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "content": resized,
                }
            )

    return media.mapInPandas(_batches, RESIZED_DDL)


def sample_frames(
    media: DataFrame,
    frame_stride: int = 64,
    max_frames: int = 16,
    decode_stub: bool = True,
) -> DataFrame:
    """mapInPandas video frame-sampling plumbing: one output row per
    sampled frame (variable fan-out per input row — exactly what a real
    frame sampler produces, which is why this is mapInPandas and not a
    1:1 pandas UDF).

    n_frames = clamp(len(content) // frame_stride, 1, max_frames); the
    stub frame payload is sha256(content || '#' || idx) hex as ASCII,
    replayed by the ``media_frame_sample`` DuckDB oracle. A real
    implementation replaces the digest with decoded frame bytes and
    frame_stride with a timestamp stride.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires codec libraries not present "
                    "in this environment; plug a decoder in here"
                )
            refs, types, idxs, frames = [], [], [], []
            for ref, mt, c in zip(
                pdf["media_ref"], pdf["media_type"], pdf["content"]
            ):
                if c is None:
                    continue
                blob = bytes(c)
                n = min(max(len(blob) // frame_stride, 1), max_frames)
                for i in range(n):
                    refs.append(ref)
                    types.append(mt)
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(blob + b"#%d" % i).hexdigest().encode()
                    )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "media_type": types,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(_batches, FRAMES_DDL)
