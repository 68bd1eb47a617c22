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


# ---------------------------------------------------------------------------
# r13 review fixes
# ---------------------------------------------------------------------------

def test_pipeline_bookkeeping_survives_snapshot_expiry(spark, tmp_path):
    """The processed-file set lives in table PROPERTIES: snapshot
    expiry (max_snapshot_age / VACUUM) deletes old summaries, and the
    summary-only bookkeeping re-ingested every expired file."""
    from pg_lake_spark.lakehouse import maintenance

    logs = tmp_path / "logs"
    logs.mkdir()
    _write_log(str(logs), "a.csv", [(1, "x")])
    _write_log(str(logs), "b.csv", [(2, "y")])
    t = LakeTable.create(spark, str(tmp_path / "t"), "k int, v string")
    pipe = FileListPipeline(
        "exp-logs", str(logs / "*.csv"), t, fmt="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    assert pipe.run_pending(spark)["files"] == 2
    t.append(spark.createDataFrame([(99, "manual")], "k int, v string"))
    maintenance.expire_snapshots(t, max_age_s=0)  # drops pipeline snapshots
    # a FRESH pipeline instance (restart) must not re-ingest
    pipe2 = FileListPipeline(
        "exp-logs", str(logs / "*.csv"), t, fmt="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    assert pipe2.run_pending(spark)["files"] == 0
    assert t.to_df().count() == 3


def test_pipeline_concurrent_runs_ingest_once(spark, tmp_path, monkeypatch):
    """Two overlapping run_pending calls (cron overlap, two processes)
    must ingest each file ONCE: the commit-lock precondition makes the
    loser abort and re-discover."""
    from pg_lake_spark.lakehouse import catalog as cat

    logs = tmp_path / "logs"
    logs.mkdir()
    _write_log(str(logs), "a.csv", [(1, "x"), (2, "y")])
    t = LakeTable.create(spark, str(tmp_path / "t"), "k int, v string")
    pipe = FileListPipeline(
        "race-logs", str(logs / "*.csv"), t, fmt="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    orig = t._write_data_files
    fired = []

    def hijack(df):
        out = orig(df)
        if not fired:
            fired.append(1)
            # a concurrent run on a second handle wins the race
            t2 = LakeTable(spark, t.location, cat.read_current_metadata(t.location))
            FileListPipeline(
                "race-logs", str(logs / "*.csv"), t2, fmt="csv",
                reader_options={"header": True, "inferSchema": True},
            ).run_pending(spark)
        return out

    monkeypatch.setattr(t, "_write_data_files", hijack)
    pipe.run_pending(spark)
    t.refresh()
    assert t.to_df().count() == 2, "overlapping runs double-ingested"
    from pg_lake_spark.lakehouse.maintenance import find_unreferenced_files

    assert find_unreferenced_files(t) == []  # loser's staging cleaned


def test_pipeline_filename_column_semantics(spark, tmp_path):
    """_filename reaches the transform as the DECODED source path (one
    multi-path read; the per-file loop is gone for spark formats), and
    a source that already HAS _filename refuses loudly."""
    import pytest

    logs = tmp_path / "logs dir"  # space: decode must normalize
    logs.mkdir()
    p = _write_log(str(logs), "a.csv", [(1, "x")])
    seen = []

    def spy(df):
        seen.extend(r._filename for r in df.select("_filename").collect())
        return df

    t = LakeTable.create(spark, str(tmp_path / "t"), "k int, v string")
    pipe = FileListPipeline(
        "fn-logs", str(logs / "*.csv"), t, fmt="csv", transform=spy,
        reader_options={"header": True, "inferSchema": True},
    )
    assert pipe.run_pending(spark)["rows"] == 1
    assert seen == [p]

    bad = tmp_path / "bad"
    bad.mkdir()
    with open(bad / "b.csv", "w") as fh:
        fh.write("k,_filename\n1,boom\n")
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), "k int")
    pipe2 = FileListPipeline(
        "bad-logs", str(bad / "*.csv"), t2, fmt="csv",
        reader_options={"header": True},
    )
    with pytest.raises(ValueError, match="_filename"):
        pipe2.run_pending(spark)


def test_pipeline_rejects_bad_batch_size(spark, tmp_path):
    import pytest

    t = LakeTable.create(spark, str(tmp_path / "t"), "k int")
    with pytest.raises(ValueError, match="max_batch_size"):
        FileListPipeline("z", "/tmp/*.csv", t, max_batch_size=0)


def test_glob_metachars_in_filenames(spark, tmp_path):
    """A discovered file whose NAME contains glob metacharacters must
    ingest: DataFrameReader.load() re-parses paths as globs, so an
    unescaped app[2024-01-15].csv threw 'Illegal file pattern' on every
    run and wedged the pipeline forever (r15 review)."""
    logs = tmp_path / "globby"
    logs.mkdir()
    _write_log(str(logs), "app[2024-01-15].csv", [(1, "x")])
    _write_log(str(logs), "plain.csv", [(2, "y")])

    t = LakeTable.create(spark, str(tmp_path / "tg"), "k int, v string")
    pipe = FileListPipeline(
        "glob-logs", str(logs / "*.csv"), t, fmt="csv",
        reader_options={"header": True, "inferSchema": True},
    )
    stats = pipe.run_pending(spark)
    assert stats["files"] == 2
    assert {r.k for r in t.to_df().collect()} == {1, 2}
    # second run: nothing new (the bracket file committed as done)
    assert pipe.run_pending(spark)["files"] == 0


def test_fallback_branch_rejects_filename_collision(spark, tmp_path):
    """The per-file (geo/xlsx) branch must refuse a source _filename
    column like the spark-format branch does, not silently overwrite.
    FlatGeobuf keeps attribute columns top-level, so an fgb file with a
    '_filename' attribute exercises the collision."""
    import pytest
    from pyspark.sql import functions as F

    from pg_lake_spark.functions.spatial import st_geomfromtext
    from pg_lake_spark.sources.flatgeobuf import write_flatgeobuf_df

    logs = tmp_path / "fgblogs"
    logs.mkdir()
    src = spark.createDataFrame([(1, "user-data")], "k int, _filename string").select(
        "k", "_filename", st_geomfromtext(F.lit("POINT(0 0)")).alias("geometry")
    )
    write_flatgeobuf_df(src, str(logs / "a.fgb"), geom_col="geometry")
    t = LakeTable.create(spark, str(tmp_path / "tf"), "k int")
    pipe = FileListPipeline("fgb-logs", str(logs / "*.fgb"), t, fmt="fgb")
    with pytest.raises(ValueError, match="_filename"):
        pipe.run_pending(spark)
