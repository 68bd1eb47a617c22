"""Shared fixtures: one SparkSession per test session, a DuckDB oracle
connection with the corpus views pre-registered (mirroring the driver's
harness), and the canonical result comparator (sorted, None-last, 1e-3
float tolerance — reference test_common/helpers/comparisons.py:39-127).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from pg_lake_spark.session import TABLES, get_spark

SF_DIR = os.environ.get("PG_LAKE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pg_lake_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def canonicalize(rows, colnames):
    """Sort columns by name, normalize values, sort rows (None-last)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        if hasattr(v, "isoformat"):  # date/datetime
            return v.isoformat()
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return float(v)
        except ImportError:
            pass
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]

    def key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    return sorted(out, key=key), [colnames[i] for i in order]


def assert_matches(spark_df, duck_con, duck_sql, tol=1e-3):
    """Differential check: Spark DataFrame vs DuckDB oracle SQL."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(duck_sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), f"column mismatch: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duck={len(d_rows)}"

    s_canon, _ = canonicalize(s_rows, s_cols)
    d_canon, _ = canonicalize(d_rows, d_cols)
    for i, (sr, dr) in enumerate(zip(s_canon, d_canon)):
        assert len(sr) == len(dr)
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if isinstance(sv, float) and isinstance(dv, float):
                denom = max(abs(sv), abs(dv), 1.0)
                assert abs(sv - dv) / denom <= tol, (
                    f"row {i} col {j}: {sv} != {dv} (tol {tol})\nspark: {sr}\nduck:  {dr}"
                )
            else:
                assert sv == dv, f"row {i} col {j}: {sv!r} != {dv!r}\nspark: {sr}\nduck:  {dr}"
