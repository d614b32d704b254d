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


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Demonstrates the real plumbing (binary → pandas bytes → numeric
    features) with a deterministic fake feature (mean byte value)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                _decode_stub(k, bytes(p))
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "byte_mean": [sum(p) / len(p) if len(p) else 0.0 for p in payloads],
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
