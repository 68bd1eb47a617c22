"""Product-quantization ANN (operators/quantization.py): compression
ratio, determinism, and recall against exact cosine top-k."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pg_lake_spark.operators.quantization import (
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from pg_lake_spark.operators.similarity import brute_force_topk
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def test_codebooks_shape_and_determinism(spark, emb):
    b1 = train_pq_codebooks(emb, m=8, k=16, iters=4)
    b2 = train_pq_codebooks(emb, m=8, k=16, iters=4)
    assert b1 == b2  # no RNG anywhere
    assert len(b1) == 8 and len(b1[0]) == 16 and len(b1[0][0]) == 8  # 64/8


def test_encode_compresses_and_roundtrips(spark, emb):
    books = train_pq_codebooks(emb, m=8, k=16, iters=4)
    codes = pq_encode(emb, books)
    n = emb.count()
    assert codes.count() == n
    row = codes.first()
    assert len(row.codes) == 8 and all(0 <= c < 16 for c in row.codes)


def test_pq_recall_against_exact(spark, emb):
    """ADC-only recall has a floor; with exact re-rank of the
    over-fetched candidates recall@10 must be high."""
    books = train_pq_codebooks(emb, m=16, k=32, iters=10)
    codes = pq_encode(emb, books).localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < 5)

    exact = brute_force_topk(emb, queries, k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    approx = pq_topk(codes, queries, books, k=10, exclude_self=True)
    raw_hits = sum(
        1 for r in approx.collect() if r.vec_id in truth.get(r.query_id, set())
    )
    raw_recall = raw_hits / (10 * len(truth))
    assert raw_recall >= 0.35, raw_recall  # 80-bit codes, no refine

    refined = pq_topk(codes, queries, books, k=10, rerank_with=emb, overfetch=8, exclude_self=True)
    ref_hits = sum(
        1 for r in refined.collect() if r.vec_id in truth.get(r.query_id, set())
    )
    ref_recall = ref_hits / (10 * len(truth))
    assert ref_recall >= 0.9, ref_recall


def test_ivfpq_composed_recall_and_pruning(spark, emb):
    """IVF pruning + PQ codes + exact refine: with full probe the
    composed index must recover near-exact top-k; with partial probe it
    must only ever score probed-list members (subset property)."""
    from pg_lake_spark.operators.quantization import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    # exhaustive probe + refine: recall should be ~1
    full = ivfpq_topk(
        emb, queries, k=10, n_centroids=8, n_probe=8,
        rerank_with=emb, overfetch=8, exclude_self=True,
    )
    hits = sum(1 for r in full.collect() if r.vec_id in truth.get(r.query_id, set()))
    assert hits / (10 * len(truth)) >= 0.9

    # partial probe: still k results per query, reasonable recall
    part = ivfpq_topk(
        emb, queries, k=10, n_centroids=8, n_probe=3,
        rerank_with=emb, overfetch=8, exclude_self=True,
    )
    rows = part.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.vec_id)
    assert all(len(v) == 10 for v in per_q.values())
    hits = sum(1 for r in rows if r.vec_id in truth.get(r.query_id, set()))
    assert hits / (10 * len(truth)) >= 0.5
