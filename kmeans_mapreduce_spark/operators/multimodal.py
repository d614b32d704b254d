"""Multimodal columns (north-star): opaque binary payloads with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (deterministic fake features / NotImplementedError
for real codecs). Everything Spark-side is real and tested: schema,
binary column handling, batch iteration, UDF signatures, partial
outputs — swap ``_decode_stub`` for PIL/librosa on a real cluster and
nothing else changes.

Scale notes: payloads live in a ``binary`` column (parquet keeps them
out of unrelated scans via column pruning); feature extraction is a
narrow mapInPandas pass — no shuffle; metadata predicates (kind,
width, n_bytes) push down to the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes LONG, byte_mean DOUBLE, decoded BOOLEAN"
)

KINDS = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: payload = md5 digest
    bytes of the text (deterministic 16-byte fake blob), kind cycles
    by doc_id, width/height derived arithmetically. Stands in for a
    real (id, bytes, metadata) multimodal parquet layout."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.lit("synthetic/v1").alias("format"),
        (F.col("doc_id") % 64 + 64).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 48).cast("int").alias("height"),
    ).withColumn("n_bytes", F.length("payload").cast("long"))


def _decode_stub(kind: str, payload: bytes):
    """Where a real decoder would go. Real codecs are unavailable in
    this container — raise for genuinely-unsupported kinds; the
    deterministic byte-level 'features' below don't need decoding."""
    if kind not in KINDS:
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    return payload  # identity 'decode' for the synthetic format


def media_embedding(media: DataFrame) -> DataFrame:
    """Payload bytes → dense float vector (one dimension per byte) —
    the deterministic stand-in for a real encoder model, with the REAL
    plumbing a GPU-batched embedder needs: binary column in, Arrow
    batch iteration, ``array<double>`` column out, narrow map (no
    shuffle). Swap the byte loop for a model forward pass and nothing
    else changes. Output: (media_id, vec ARRAY<DOUBLE>)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "vec": [
                        [float(b) for b in _decode_stub(k, bytes(p))]
                        for k, p in zip(pdf["kind"], pdf["payload"])
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, "media_id LONG, vec ARRAY<DOUBLE>"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Demonstrates the real plumbing (binary → pandas bytes → numeric
    features) with a deterministic fake feature (mean byte value)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                _decode_stub(k, bytes(p))
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            # byte values are small exact integers in float64, so the
            # numpy mean is bit-identical to a sequential sum / len
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "byte_mean": [
                        float(np.frombuffer(p, dtype=np.uint8).mean()) if len(p) else 0.0
                        for p in payloads
                    ],
                    "decoded": True,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )


def media_meta(media: DataFrame) -> DataFrame:
    """Typed-metadata projection (oracle-checkable: no binary in the
    output, so the DuckDB twin reproduces it arithmetically)."""
    return media.select("media_id", "kind", "n_bytes", "width", "height")


RESIZE_SCHEMA = (
    "media_id LONG, kind STRING, out_width INT, out_height INT, n_bytes LONG"
)

FRAME_SCHEMA = "media_id LONG, frame_idx INT, frame_bytes BINARY"


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize over binary payloads — narrow mapInPandas pass.

    Real plumbing (kind filter pushed to the scan, Arrow batches,
    per-row binary handling); the pixel work itself needs an image
    codec this container lacks, so the 'resize' deterministically
    truncates/pads the payload to width·height/256 bytes — swap the
    body for PIL `Image.resize` on a real cluster, the plan is
    unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, width * height // 256)
        for pdf in batches:
            if not len(pdf):
                continue
            resized = [
                (bytes(p) * (target // max(len(bytes(p)), 1) + 1))[:target]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_width": width,
                    "out_height": height,
                    "n_bytes": [len(r) for r in resized],
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(fn, schema=RESIZE_SCHEMA)
    )


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling: one output row per sampled 'frame'.

    Demonstrates the 1→N multimodal fan-out shape (mapInPandas emitting
    multiple rows per input). Frames are deterministic 4-byte slices of
    the payload standing in for decoded frames — swap for pyav/ffmpeg
    keyframe extraction in production; schema, batching, and the
    explode-like output contract stay identical."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(p)
                n_frames = max(len(blob) // 4, 1)
                for i in range(0, n_frames, every_n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(blob[i * 4 : i * 4 + 4] or blob[:4])
            if out_ids:
                yield pd.DataFrame(
                    {
                        "media_id": out_ids,
                        "frame_idx": out_idx,
                        "frame_bytes": out_bytes,
                    }
                )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, schema=FRAME_SCHEMA)
    )
