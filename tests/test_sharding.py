"""Deterministic training-shard writer (two-pass global index: no
single-partition sort, partition-local windows only)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from pg_lake_spark.operators.sharding import assign_shards, write_training_shards


def _df(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64("id") % 97 + 97).alias("n_tokens"),
    )


def test_row_sharding_exact_and_deterministic(spark):
    df = _df(spark)
    a = assign_shards(df, ["doc_id"], shard_rows=100, num_partitions=7)
    rows = a.groupBy("shard_id").count().orderBy("shard_id").collect()
    assert [r["count"] for r in rows] == [100] * 10
    # global order respected: shard of a row == doc_id // 100
    bad = a.filter(F.col("shard_id") != (F.col("doc_id") / 100).cast("long")).count()
    assert bad == 0
    # rerun-stable (different partition count, same assignment)
    b = assign_shards(df, ["doc_id"], shard_rows=100, num_partitions=3)
    assert (
        a.select("doc_id", "shard_id")
        .exceptAll(b.select("doc_id", "shard_id"))
        .count()
        == 0
    )


def test_token_budget_sharding(spark):
    df = _df(spark, 500)
    budget = 5000
    a = assign_shards(
        df, ["doc_id"], token_col="n_tokens", tokens_per_shard=budget,
        num_partitions=5,
    )
    stats = (
        a.groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("tok"))
        .orderBy("shard_id")
        .collect()
    )
    # every closed shard lands within one document of the budget
    max_doc = 97 + 96
    for r in stats[:-1]:
        assert budget - max_doc < r.tok <= budget + max_doc, (r.shard_id, r.tok)
    # exact global cumulative semantics: shard boundaries are the
    # running-total partition of the ordered corpus
    pdf = df.orderBy("doc_id").toPandas()
    pdf["cum"] = pdf["n_tokens"].cumsum()
    want = ((pdf["cum"] - 1) // budget).astype(int).tolist()
    got = [r.shard_id for r in a.orderBy("doc_id").select("shard_id").collect()]
    assert got == want


def test_write_training_shards_layout(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _df(spark, 300)
    manifest = write_training_shards(df, out, ["doc_id"], shard_rows=100)
    assert {k: v["rows"] for k, v in manifest.items()} == {0: 100, 1: 100, 2: 100}
    dirs = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out, "shard_id=*")))
    assert dirs == ["shard_id=0", "shard_id=1", "shard_id=2"]
    # one data file per shard
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1
    # manifest persisted alongside
    disk = json.load(open(os.path.join(out, "_shard_manifest.json")))
    assert disk == {str(k): v for k, v in manifest.items()}
    # reading back preserves content
    back = spark.read.parquet(out)
    assert back.count() == 300


def test_arg_validation(spark):
    df = _df(spark, 10)
    with pytest.raises(ValueError, match="exactly one"):
        assign_shards(df, ["doc_id"])
    with pytest.raises(ValueError, match="token_col"):
        assign_shards(df, ["doc_id"], tokens_per_shard=10)


def test_write_training_shards_file_uri(spark, tmp_path):
    """r14 review: the manifest sidecar must land on the filesystem the
    DATA went to — a file: URI output (the minimal non-plain-path case)
    must not crash the post-write manifest step."""
    df = _df(spark, 30)
    out_local = str(tmp_path / "shards_uri")
    manifest = write_training_shards(df, "file:" + out_local, ["doc_id"], shard_rows=10)
    disk = json.load(open(os.path.join(out_local, "_shard_manifest.json")))
    assert disk == {str(k): v for k, v in manifest.items()}


def test_token_budget_sharding_null_tokens(spark):
    """NULL token values must behave as 0 in the window cumsum (pass 1
    already tolerated them) — unguarded, an all-NULL partition prefix
    made __cum NULL -> shard_id NULL, silently landing rows in
    __HIVE_DEFAULT_PARTITION__ and crashing the manifest's int(None)
    AFTER the distributed write (r15 review)."""
    df = spark.createDataFrame(
        [(0, None), (1, 50), (2, None), (3, 60)], "doc_id int, n_tokens int"
    )
    a = assign_shards(
        df, ["doc_id"], token_col="n_tokens", tokens_per_shard=100,
        num_partitions=2,
    )
    rows = {r.doc_id: r.shard_id for r in a.collect()}
    assert None not in rows.values()
    # cums 0,50,50,110 -> bands 0,0,0,1
    assert rows == {0: 0, 1: 0, 2: 0, 3: 1}


def test_write_training_shards_null_tokens_manifest(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, None), (1, 50), (2, 60)], "doc_id int, n_tokens int"
    )
    manifest = write_training_shards(
        df, str(tmp_path / "shards"), ["doc_id"],
        token_col="n_tokens", tokens_per_shard=100,
    )
    assert sum(v["rows"] for v in manifest.values()) == 3


def test_manifest_survives_all_null_token_shard(spark, tmp_path):
    """A shard holding ONLY NULL-token rows sums to NULL — the manifest
    must count it as 0 tokens, matching the assignment cumsum, instead
    of crashing int(None) after the distributed write (r15 self-review:
    the cumsum coalesce fix missed the manifest aggregate)."""
    df = spark.createDataFrame(
        [(0, None), (1, 200)], "doc_id int, n_tokens int"
    )
    manifest = write_training_shards(
        df, str(tmp_path / "shards_nullshard"), ["doc_id"],
        token_col="n_tokens", tokens_per_shard=100,
    )
    # doc 0 (NULL->0 tokens) closes shard 0 alone; doc 1 band-skips
    assert manifest[0] == {"rows": 1, "tokens": 0}
    assert manifest[1]["rows"] == 1 and manifest[1]["tokens"] == 200
