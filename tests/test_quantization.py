"""Product-quantization ANN (operators/quantization.py): compression
ratio, determinism, and recall against exact cosine top-k."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pg_lake_spark.operators.quantization import (
    ivfpq_topk,
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


def test_partial_topfetch_keeps_lowest_id_on_ties(spark, emb):
    """PQ maps near-dups to identical codes, so exactly-tied ADC scores
    are common; the score-only argsort cut ties at the fetch boundary
    arbitrarily, dropping the vec_id the global (score desc, vec_id)
    ranking prefers (r15 review: np.lexsort now pins it)."""
    # duplicate vectors -> identical codes -> exactly tied scores
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(20)]
    rows += [(100 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(5)]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    queries = corpus.filter("vec_id = 0")
    books = train_pq_codebooks(corpus, m=2, k=4, train_rows=64)
    codes = pq_encode(corpus, books)
    got = pq_topk(codes, queries, books, k=5, exclude_self=True).collect()
    # all of vec_ids 1..19 tie at the top score; top-5 must be 1..5
    assert [r.vec_id for r in got] == [1, 2, 3, 4, 5]


def test_ivfpq_empty_queries_raises(spark, emb):
    """ivfpq_topk silently returned an empty frame for zero queries
    while pq_topk raised — inconsistent contract (r15 review)."""
    import pytest as _pytest

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    empty_q = corpus.filter("vec_id < 0")
    books = train_pq_codebooks(corpus, m=2, k=4, train_rows=8)
    with _pytest.raises(ValueError, match="no queries"):
        ivfpq_topk(corpus, empty_q, codebooks=books, n_centroids=2, n_probe=1)


def test_rerank_broadcasts_candidates_not_corpus(spark, emb):
    """The refine step must broadcast the tiny candidate list against
    the full-corpus vector frame — without the hint Catalyst's
    stats-free estimate of the window output drives a sort-merge join
    that shuffles every corpus vector by vec_id (r16 review). Pin the
    plan: no SortMergeJoin on the corpus join."""
    books = train_pq_codebooks(emb, m=8, k=16, iters=2)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 3)
    out = pq_topk(codes, queries, books, k=5, rerank_with=emb, overfetch=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan
    # and the result is still a valid ranking
    rows = out.collect()
    assert rows and all(r.rank <= 5 for r in rows)
