"""Salted-join equivalence: result must match the plain join on skewed
data (one key holding most rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_lake_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark):
    # 90% of fact rows share key 1 (pathological skew)
    fact = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame([(1, "hot"), (10, "a"), (20, "b")], "k bigint, name string")
    plain = fact.join(dim, on=["k"]).select("k", "v", "name")
    salted = salted_join(fact, dim, on=["k"], salt_factor=4).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic_and_spreads(spark):
    """The salt is a pure function of row content (retry-stable), and a
    hot key with varying payload actually spreads across buckets."""
    from pg_lake_spark.operators.skew import _SALT

    fact = spark.range(0, 2000).select(
        F.lit(1).alias("k"), F.col("id").alias("v")
    )
    salted = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*fact.columns, F.lit(42)), F.lit(8)).cast("int")
    )
    first = {r["v"]: r[_SALT] for r in salted.collect()}
    second = {r["v"]: r[_SALT] for r in salted.collect()}
    assert first == second  # same expression, same rows → same buckets
    assert len(set(first.values())) == 8  # hot key spread over all buckets


def test_salted_left_join(spark):
    fact = spark.range(0, 100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(0, "x"), (1, "y")], "k bigint, name string")
    plain = fact.join(dim, on=["k"], how="left").select("k", "v", "name")
    salted = salted_join(fact, dim, on=["k"], how="left", salt_factor=3).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salted_join_refuses_build_visible_outer(spark):
    """right/full joins would emit every unmatched build row once per
    salt value — refused loudly (r14 review)."""
    import pytest

    fact = spark.createDataFrame([(1, 1)], "k int, v int")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="replicated"):
            salted_join(fact, dim, on=["k"], how=how)
    # left_semi still accepted and correct (dedup absorbs replication)
    semi = salted_join(fact, dim, on=["k"], how="left_semi")
    assert semi.count() == 1
