"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns with a metadata
struct. The Spark-side plumbing (schema, batching, partition sizing,
Arrow transfer through ``mapInPandas``) is real and tested; the actual
media decode is STUBBED — the decode libraries (Pillow/ffmpeg/…) are
not in this image — behind ``decode_media``, which raises
``NotImplementedError`` unless the deterministic fake decoder is
requested.

Scale notes: binary payloads dominate row size — the helpers
repartition by byte budget (``target_bytes_per_partition``) rather than
row count so Arrow batches stay bounded regardless of media size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "doc_id long, media binary, media_type string, media_bytes long"
FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<double>"


def attach_media(df: DataFrame, binary_col: str, media_type: str = "html",
                 id_col: str = "doc_id") -> DataFrame:
    """Normalize any binary column to the media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(binary_col).alias("media"),
        F.lit(media_type).alias("media_type"),
        F.length(binary_col).cast("long").alias("media_bytes"),
    )


def repartition_by_bytes(df: DataFrame, bytes_col: str = "media_bytes",
                         target_bytes_per_partition: int = 64 << 20) -> DataFrame:
    """Size partitions by payload bytes, not rows (media rows are fat)."""
    total = df.agg(F.sum(bytes_col)).collect()[0][0] or 0
    n = max(1, int(total // target_bytes_per_partition) + 1)
    return df.repartition(n, "doc_id")


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a feature vector.

    Real decoders are unavailable in this image — ``fake=True``
    selects the deterministic stand-in (md5-derived 8-dim float
    vector) so the distributed plumbing stays fully testable."""
    if not fake:
        raise NotImplementedError(
            f"media decode for {media_type!r} requires codec libraries "
            "not present in this environment; pass fake=True for the "
            "deterministic test decoder"
        )
    digest = hashlib.md5(payload).digest()
    arr = np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float64)
    return np.round(arr / 255.0, 4)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    One ``mapInPandas`` pass: bytes in, fixed-width float vectors out.
    The UDF signature/batch shape is exactly what a real decoder
    (resize / frame-sample / fbank) would use."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [decode_media(bytes(b), t, fake=fake).tolist()
                     for b, t in zip(pdf["media"], pdf["media_type"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["media_bytes"],
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_bytes long"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing for video-like payloads: one media row
    fans out to ``n_frames`` (doc_id, frame_idx, frame) rows via one
    Arrow-batched ``mapInPandas`` pass.

    The REAL sampler would seek container keyframes (ffmpeg) — absent
    here, the deterministic stand-in cuts the payload into n
    evenly-spaced byte slices, which exercises the exact schema,
    fan-out shape and batch sizing a keyframe sampler needs. Run
    ``repartition_by_bytes`` first so fat payloads can't blow up an
    Arrow batch."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, frames, sizes = [], [], [], []
            for d, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                n = len(b)
                for j in range(n_frames):
                    s, e = (j * n) // n_frames, ((j + 1) * n) // n_frames
                    ids.append(d)
                    idxs.append(j)
                    frames.append(b[s:e])
                    sizes.append(e - s)
            yield pd.DataFrame({
                "doc_id": np.asarray(ids, dtype=np.int64),
                "frame_idx": np.asarray(idxs, dtype=np.int32),
                "frame": frames,
                "frame_bytes": np.asarray(sizes, dtype=np.int64),
            })

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = ("doc_id long, media binary, media_type string, "
                 "media_bytes long, orig_bytes long, stride int")


def resize_media(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing for image-like payloads: one Arrow-batched
    ``mapInPandas`` pass mapping each payload to a smaller payload
    plus (orig size, stride) metadata.

    The REAL operator would decode + bilinear-resample (Pillow) —
    absent here, the deterministic stand-in decimates the byte stream
    with stride ceil(len/target) (every stride-th byte), which keeps
    the exact schema, metadata contract and batch shape a pixel
    resampler needs. Compose after ``repartition_by_bytes``."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            outs, strides, origs = [], [], []
            for payload in pdf["media"]:
                b = bytes(payload)
                stride = max(1, -(-len(b) // target_bytes))
                outs.append(b[::stride])
                strides.append(stride)
                origs.append(len(b))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": outs,
                "media_type": pdf["media_type"],
                "media_bytes": np.fromiter((len(x) for x in outs), np.int64,
                                           len(outs)),
                "orig_bytes": np.asarray(origs, dtype=np.int64),
                "stride": np.asarray(strides, dtype=np.int32),
            })

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)
