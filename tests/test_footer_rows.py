"""_footer_rows must read exact counts from BOTH table layouts —
a single ``<table>.parquet`` file (the testdata layout) and a
directory of part files (any real lakehouse table). The r16 verdict
flagged the directory case returning None, which silently re-enabled
the operators' probe job exactly where tables are big (guide §6).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pg_lake_spark.queries.datapipe import _footer_rows


def _write(path: str, n: int, start: int = 0) -> None:
    pq.write_table(pa.table({"x": list(range(start, start + n))}), path)


def test_single_file_layout(tmp_path):
    _write(str(tmp_path / "docs.parquet"), 37)
    assert _footer_rows(str(tmp_path), "docs") == 37


def test_directory_layout_sums_part_footers(tmp_path):
    d = tmp_path / "docs.parquet"
    d.mkdir()
    _write(str(d / "part-0.parquet"), 10)
    _write(str(d / "part-1.parquet"), 25, start=10)
    # non-parquet sidecars (e.g. _SUCCESS) must be ignored
    (d / "_SUCCESS").write_text("")
    assert _footer_rows(str(tmp_path), "docs") == 35


def test_partitioned_directory_layout(tmp_path):
    d = tmp_path / "docs.parquet"
    (d / "dt=2024").mkdir(parents=True)
    (d / "dt=2025").mkdir(parents=True)
    _write(str(d / "dt=2024" / "part-0.parquet"), 7)
    _write(str(d / "dt=2025" / "part-0.parquet"), 11)
    assert _footer_rows(str(tmp_path), "docs") == 18


def test_missing_table_returns_none(tmp_path):
    assert _footer_rows(str(tmp_path), "nope") is None


def test_corrupt_file_returns_none(tmp_path):
    (tmp_path / "bad.parquet").write_bytes(b"not parquet")
    assert _footer_rows(str(tmp_path), "bad") is None
