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
            # one pass over the payloads builds all four feature
            # columns — a Series.map per column walks every payload
            # through Python once per feature (r15 review)
            n_bytes, first_byte, byte_mean, md5s = [], [], [], []
            for p in pdf["payload"]:
                f = _decode_stub(p)
                n_bytes.append(f["n_bytes"])
                first_byte.append(f["first_byte"])
                byte_mean.append(f["byte_mean"])
                md5s.append(hashlib.md5(p).hexdigest() if p is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes,
                    "first_byte": first_byte,
                    "byte_mean": byte_mean,
                    "payload_md5": md5s,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
        StructField("pixel_mean", DoubleType()),
    ]
)


def _pil():
    """Optional-import hook: PIL when installed, None otherwise (this
    container ships no image codec — the Spark-side plumbing is the
    tested contract; tests/test_multimodal.py gates the real-decode test
    on availability)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode via PIL when importable — the same Arrow
    map-only stage as :func:`extract_features`, emitting per-image
    dimensions/mode/pixel-mean. Raises loudly at CALL time when no codec
    exists so callers never get silently fake pixels; use
    :func:`extract_features` for the codec-free stub path."""
    if _pil() is None:
        raise NotImplementedError(
            "image decode requires PIL, not present in this environment; "
            "the mapInPandas plumbing to slot it into is extract_features()"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        Image = _pil()
        if Image is None:
            # the call-time gate above checked the DRIVER env; this
            # closure re-resolves PIL on each EXECUTOR, where a venv
            # without Pillow must fail with the designed message, not
            # an AttributeError on None (r15 review)
            raise NotImplementedError(
                "image decode requires PIL on the executors; the driver "
                "has it but this worker environment does not"
            )
        for pdf in batches:
            rows = []
            for mid, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                if payload is None:
                    rows.append((mid, mime, None, None, None, None))
                    continue
                img = Image.open(io.BytesIO(payload))
                arr = np.asarray(img, dtype="float64")
                rows.append(
                    (mid, mime, img.width, img.height, img.mode, float(arr.mean()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "mime", "width", "height", "mode", "pixel_mean"],
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_images(media: DataFrame, *, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize plumbing (decode → resample → re-encode per batch).

    The resample itself is a deterministic STUB (payload truncated/
    cycled to width*height bytes — a stand-in for PIL's
    ``Image.resize``); the mapInPandas contract is the real thing: a
    map-only Arrow stage emitting fixed-size thumbnails whose schema a
    downstream training pipeline consumes. Swap ``_fake_resample`` for
    a codec call and nothing else changes.
    """
    target = width * height

    def _fake_resample(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        if not p:
            return bytes(target)
        reps = (target // len(p)) + 1
        return (p * reps)[:target]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                    "thumb": pdf["payload"].map(_fake_resample),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_offset", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, *, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one input row → N frame rows.

    A real implementation seeks keyframes with libav; the STUB slices
    the payload every ``every_n_bytes`` as deterministic fake frames.
    The plumbing exercised here is the fan-out shape (mapInPandas
    emitting more rows than it consumes) that frame extraction needs —
    still shuffle-free, output partitioning follows the input.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, offs, frames = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(max_frames):
                    off = i * every_n_bytes
                    if off >= len(payload):
                        break
                    ids.append(mid)
                    nos.append(i)
                    offs.append(off)
                    frames.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame_offset": offs, "frame": frames}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
