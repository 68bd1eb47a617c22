"""Chunking / corpus-mix edge semantics pinned after the r15 review:
NULL text, NULL sources, and temperature validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_lake_spark.operators.chunking import (
    chunk_documents,
    chunk_documents_tokens,
    temperature_mix,
)


def test_chunk_documents_null_text_is_empty_chunk(spark):
    """NULL text behaves like empty text in BOTH chunk variants (the
    token variant was fixed first; the char variant emitted a
    chunk=NULL row that non-null consumers trip over)."""
    docs = spark.createDataFrame([(1, None), (2, "abcdefgh")], "doc_id int, text string")
    out = chunk_documents(docs, size=4, overlap=1).orderBy("doc_id", "chunk_id")
    rows = out.collect()
    null_doc = [r for r in rows if r.doc_id == 1]
    assert len(null_doc) == 1
    assert null_doc[0].chunk == ""  # one empty chunk, never NULL
    tok = chunk_documents_tokens(docs, size=4, overlap=1)
    assert [r.chunk for r in tok.filter("doc_id = 1").collect()] == [""]


def test_temperature_mix_excludes_null_sources(spark):
    """NULL sources can never be selected by mix_corpora's equality
    match, so counting them into the weight denominator only diluted
    every real source's quota and underfilled the mix."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["a", "a", None, None, None, "b"])],
        "id int, src string",
    )
    out = temperature_mix(df, source_col="src", temperature=1.0, target_rows=6, id_col="id")
    got = out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    by_src = {r.src: r.n for r in got}
    # weights over non-NULL rows only: a=2/3, b=1/3 of 6 -> 4 and 2,
    # capped by availability (a has 2 rows, b has 1) = everything real
    assert None not in by_src
    assert by_src == {"a": 2, "b": 1}


def test_temperature_mix_rejects_nonpositive_temperature(spark):
    df = spark.createDataFrame([(1, "a")], "id int, src string")
    with pytest.raises(ValueError, match="temperature"):
        temperature_mix(df, source_col="src", temperature=0.0, target_rows=1, id_col="id")
    with pytest.raises(ValueError, match="temperature"):
        temperature_mix(df, source_col="src", temperature=-2.0, target_rows=1, id_col="id")
