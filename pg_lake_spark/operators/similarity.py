"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus with a JVM-side dot product
(``zip_with`` + ``aggregate``), then a per-query top-k window. No
Python, no driver materialization: at 100 TB the corpus side stays
partitioned and the only shuffle is the final per-query top-k.

Scale path: LSH bucketing via random hyperplanes (SimHash for vectors) —
sign bits of dot products against shared deterministic hyperplanes form
a bucket key; candidates only compare within a bucket. Hyperplanes are
derived from the vector index (deterministic, no RNG) so results are
reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Output: (query_id, vec_id, cos_sim, rank) — self-matches excluded.
    ``queries`` is broadcast (assumed small); the corpus is scanned once.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qvec")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Deterministic random-hyperplane LSH bucket id (0 .. 2^n_planes-1).

    Plane p's component j is cos(p*dim + j) — a fixed pseudo-random
    sequence identically computable in any engine (no RNG state). The
    bucket is the integer formed by the sign bits of vec·plane.
    """
    def plane_fn(offset: int):
        # single-arg lambda (two-arg would become (element, index))
        return lambda j: F.cos(j + F.lit(offset))

    bits = []
    for p in range(n_planes):
        plane = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), plane_fn(p * dim))
        bits.append(
            F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane buckets.

    Trades recall for a bucket-equi-join instead of a cross join — the
    scale path when the query set is itself large.
    """
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("cvec")
    ).withColumn("bucket", hyperplane_bucket(F.col("cvec"), dim, n_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qvec")
    ).withColumn("bucket", hyperplane_bucket(F.col("qvec"), dim, n_planes))
    scored = (
        c.join(q, "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, *, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos_sim ≥ t).

    Brute-force O(n²) block product — the exactness baseline. At corpus
    scale, run :func:`lsh_topk`'s hyperplane bucketing first and verify
    only bucket-mates; this full variant is for bounded slices and as
    the recall oracle for the LSH path.
    """
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    a = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    b = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
