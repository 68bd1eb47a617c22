"""Distributed Bloom membership operator."""
from pyspark.sql import functions as F

from pg_lake_spark.operators.membership import (
    bloom_filter_maybe,
    bloom_params,
    bloom_semi_join,
    build_bloom,
)


def test_no_false_negatives_and_fp_rate(spark):
    corpus = spark.range(0, 2000).select(F.concat(F.lit("k"), "id").alias("key"))
    m, k = bloom_params(2000, 0.01)
    bloom = build_bloom(corpus, "key", m, k)
    # members: every one of the 2000 keys must survive
    members = bloom_filter_maybe(corpus, "key", bloom, m, k)
    assert members.count() == 2000
    # non-members: FP rate near the design point (1% of 10000 ± slack)
    probe = spark.range(10_000, 20_000).select(F.concat(F.lit("k"), "id").alias("key"))
    fps = bloom_filter_maybe(probe, "key", bloom, m, k).count()
    assert fps < 10_000 * 0.03, fps


def test_bloom_semi_join_exact(spark):
    corpus = spark.range(0, 500).select((F.col("id") * 3).alias("v"))
    probe = spark.range(0, 3000).select(F.col("id").alias("v"))
    got = sorted(r.v for r in bloom_semi_join(probe, corpus, "v").collect())
    want = sorted(r.v for r in probe.join(corpus, "v", "left_semi").collect())
    assert got == want


def test_filter_is_distributed_and_small(spark):
    corpus = spark.range(0, 1000).select(F.col("id").alias("v"))
    m, k = bloom_params(1000, 0.01)
    bloom = build_bloom(corpus, "v", m, k)
    assert bloom.count() <= m // 64  # packed words, not positions


def test_count_min_sketch_bounds(spark):
    """CMS properties: never underestimates; heavy hitters estimated
    exactly or near-exactly at this width; sketch size bounded by
    depth*width cells."""
    from pg_lake_spark.operators.membership import (
        build_count_min,
        count_min_estimate,
    )

    # skewed corpus: key k appears (k+1)^2 times for k in 0..19
    rows = [(f"k{k}",) for k in range(20) for _ in range((k + 1) ** 2)]
    df = spark.createDataFrame(rows, "key string")
    width, depth = 1024, 5
    sk = build_count_min(df, "key", width=width, depth=depth)
    assert sk.count() <= width * depth
    probe = spark.createDataFrame([(f"k{k}",) for k in range(20)], "key string")
    est = {
        r.key: r.est_count
        for r in count_min_estimate(probe, "key", sk, width=width, depth=depth).collect()
    }
    true = {f"k{k}": (k + 1) ** 2 for k in range(20)}
    n_total = len(rows)
    for k, t in true.items():
        assert est[k] >= t  # CMS never underestimates
        assert est[k] <= t + 2 * n_total / width + 1
    # merged sketches (union corpus) = summed cells
    sk2 = build_count_min(df, "key", width=width, depth=depth)
    merged = (
        sk.unionByName(sk2).groupBy("row", "col").agg(F.sum("n").alias("n"))
    )
    est2 = {
        r.key: r.est_count
        for r in count_min_estimate(probe, "key", merged, width=width, depth=depth).collect()
    }
    assert all(est2[k] >= 2 * true[k] for k in true)
