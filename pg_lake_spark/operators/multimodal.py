"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Model (SURVEY north-star): media are ``binary`` columns with a metadata
struct (mime, width/height/duration, …). Decode/feature-extraction runs
as Arrow-batched ``mapInPandas`` — the sanctioned Python path for code
that genuinely can't be a JVM expression (codec libraries). The image/
audio libs are not in this container, so the decode step is STUBBED
(deterministic fake features); the Spark-side plumbing — schema,
batching, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("payload_md5", StringType()),
    ]
)


def to_media(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap an existing column as a media table (id, payload, mime)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic byte-level features standing in for a
    real image/audio decode (libs unavailable in this container). A real
    deployment replaces this body with PIL/libav calls; the Spark
    plumbing around it is unchanged."""
    if payload is None:
        return {"n_bytes": 0, "first_byte": -1, "byte_mean": 0.0}
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "byte_mean": (sum(payload) / len(payload)) if payload else 0.0,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    ``mapInPandas`` streams Arrow record batches through Python; each
    batch is processed columnarly. Partitioning is preserved — at scale
    this is a map-only stage with no shuffle.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "first_byte": [f["first_byte"] for f in feats],
                    "byte_mean": [f["byte_mean"] for f in feats],
                    "payload_md5": pdf["payload"].map(
                        lambda p: hashlib.md5(p).hexdigest() if p is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode — intentionally unimplemented in this container.

    Raises so callers fail loudly rather than silently producing fake
    pixels; use :func:`extract_features` for the tested stub path.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv, not present in this environment; "
        "the mapInPandas plumbing to slot it into is extract_features()"
    )
