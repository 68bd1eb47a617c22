"""Incremental file-list pipeline (pg_incremental's
create_file_list_pipeline parity): batch discovery, exactly-once via
snapshot summaries, transforms, batching."""

from __future__ import annotations

import os

from pg_lake_spark.lakehouse.table import LakeTable
from pg_lake_spark.streaming.file_pipeline import FileListPipeline


def _write_log(dirp, name, rows):
    p = os.path.join(dirp, name)
    with open(p, "w") as fh:
        fh.write("k,v\n")
        for k, v in rows:
            fh.write(f"{k},{v}\n")
    return p


def test_incremental_ingest_exactly_once(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    _write_log(str(logs), "a.csv", [(1, "x"), (2, "y")])
    _write_log(str(logs), "b.csv", [(3, "z")])

    t = LakeTable.create(spark, str(tmp_path / "t"), "k int, v string")
    pipe = FileListPipeline(
        "proc-logs", str(logs / "*.csv"), t, fmt="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    stats = pipe.run_pending(spark)
    assert stats == {"files": 2, "batches": 1, "rows": 3}
    assert t.to_df().count() == 3

    # no new files -> no-op
    assert pipe.run_pending(spark)["files"] == 0

    # a new file arrives: ONLY it is processed
    _write_log(str(logs), "c.csv", [(4, "w"), (5, "q")])
    stats = pipe.run_pending(spark)
    assert stats == {"files": 1, "batches": 1, "rows": 2}
    assert sorted(r.k for r in t.to_df().collect()) == [1, 2, 3, 4, 5]

    # a FRESH pipeline object rebuilds the processed set from the
    # table's snapshot summaries (crash-restart exactly-once)
    pipe2 = FileListPipeline(
        "proc-logs", str(logs / "*.csv"), t, fmt="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    assert pipe2.discover() == []
    assert pipe2.run_pending(spark)["files"] == 0
    assert t.to_df().count() == 5


def test_batching_and_transform(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    for i in range(5):
        _write_log(str(logs), f"f{i}.csv", [(i, f"s{i}")])
    t = LakeTable.create(spark, str(tmp_path / "t"), "k int, v string, src string")

    def keep_source(df):
        from pyspark.sql import functions as F

        return df.select("k", "v", F.element_at(F.split("_filename", "/"), -1).alias("src"))

    pipe = FileListPipeline(
        "batched", str(logs / "*.csv"), t, fmt="csv", max_batch_size=2,
        transform=keep_source,
        reader_options={"header": True, "inferSchema": True},
    )
    stats = pipe.run_pending(spark)
    assert stats["files"] == 5 and stats["batches"] == 3 and stats["rows"] == 5
    got = {(r.k, r.src) for r in t.to_df().collect()}
    assert got == {(i, f"f{i}.csv") for i in range(5)}
    # a different pipeline name over the same table tracks independently
    other = FileListPipeline("other", str(logs / "*.csv"), t, fmt="csv")
    assert len(other.discover()) == 5


def test_training_data_prep_example(spark, tmp_path):
    """The end-to-end prep pipeline (dedup -> quality -> decontam ->
    temperature mix -> token-budget shards) runs at sf0.001 and every
    stage's report is consistent: counts only shrink through the
    filters, the mix hits its target within one row per source, and
    the shard manifest's row total equals the mixed row count."""
    import json
    import os
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from training_data_prep import prepare_corpus

    out = str(tmp_path / "prep")
    r = prepare_corpus(spark, "/root/testdata/sf0.001", out)
    assert r["input_rows"] >= r["dedup"]["output_rows"]
    assert r["dedup"]["output_rows"] - r["quality_dropped"] >= r["decontaminated_rows"] >= r["mixed_rows"] > 0
    manifest = json.load(open(os.path.join(out, "shards", "_shard_manifest.json")))
    assert sum(v["rows"] for v in manifest.values()) == r["mixed_rows"]
    assert len(manifest) == r["shards"]
