"""Multimodal plumbing tests: media wrapping, Arrow feature extraction,
resize and frame-sample stubs (schema + batch-shape contracts)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pg_lake_spark.operators import multimodal
from tests.conftest import SF_DIR, assert_matches


def _media(spark, n=50):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).filter(
        F.col("doc_id") < n
    )
    return multimodal.to_media(docs, "doc_id", "text", "text/plain")


def test_extract_features_matches_oracle(spark, duck):
    got = multimodal.extract_features(_media(spark))
    assert_matches(
        got,
        duck,
        """
        SELECT doc_id AS media_id, 'text/plain' AS mime,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
               CAST(list_aggregate(list_transform(range(1, length(text) + 1),
                    i -> ascii(substr(text, i, 1))), 'sum') AS DOUBLE) / length(text) AS byte_mean,
               md5(text) AS payload_md5
        FROM documents WHERE doc_id < 50
        """,
    )


def test_resize_fixed_size_thumbs(spark):
    out = multimodal.resize_images(_media(spark), width=8, height=8).collect()
    assert len(out) == 50
    for r in out:
        assert r.width == 8 and r.height == 8
        assert len(r.thumb) == 64  # every thumbnail exactly width*height bytes
    # deterministic: same input → same thumb
    again = multimodal.resize_images(_media(spark), width=8, height=8).collect()
    assert sorted(r.thumb for r in out) == sorted(r.thumb for r in again)


def test_sample_frames_fanout(spark):
    media = _media(spark)
    out = multimodal.sample_frames(media, every_n_bytes=100, max_frames=4)
    rows = out.collect()
    # fan-out: ≥1 frame per doc, ≤max_frames, offsets are multiples
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    src = {r.media_id: r.payload for r in media.collect()}
    assert set(by_id) == {mid for mid, p in src.items() if p}
    for mid, frames in by_id.items():
        assert 1 <= len(frames) <= 4
        for fr in frames:
            assert fr.frame_offset == fr.frame_no * 100
            expect = bytes(src[mid][fr.frame_offset : fr.frame_offset + 100])
            assert bytes(fr.frame) == expect


def test_decode_image_raises(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(_media(spark))


def test_decode_image_requires_codec_or_decodes(spark):
    """Optional-import codec hook: with PIL present decode_image is a
    real Arrow decode stage (proven on a generated PNG); without it the
    call refuses loudly at call time. Either way the wiring is proven."""
    from pg_lake_spark.operators import multimodal as mm

    if mm._pil() is None:
        with pytest.raises(NotImplementedError, match="requires PIL"):
            mm.decode_image(spark.createDataFrame([], mm.MEDIA_SCHEMA))
        return
    import io

    Image = mm._pil()
    buf = io.BytesIO()
    Image.new("RGB", (8, 4), color=(255, 0, 0)).save(buf, format="PNG")
    # MEDIA_SCHEMA field order is (media_id, payload, mime) — the old
    # (id, mime, payload) tuple could never build under this schema, so
    # the PIL-present arm of this test was dead on arrival (r15 review)
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "image/png")], mm.MEDIA_SCHEMA
    )
    row = mm.decode_image(media).collect()[0]
    assert (row.width, row.height, row.mode) == (8, 4, "RGB")
    assert row.pixel_mean == pytest.approx(255.0 / 3)
