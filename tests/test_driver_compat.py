"""Regression tests for driver-session compatibility.

Round-1 failure mode: the correctness driver builds its own vanilla
SparkSession (no ``nanosAsLong`` conf) and calls query functions
directly; ``load_tables`` must therefore self-configure via runtime-
settable SQL confs and must not eagerly read tables a query never
touches (one bad table sank all 50 round-1 checks).
"""

from __future__ import annotations

import pytest

from pg_lake_spark.session import _RUNTIME_CONFS, LazyTables, load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def vanilla_confs(spark):
    """Simulate the driver's vanilla session: unset our runtime confs."""
    saved = {k: spark.conf.get(k, None) for k in _RUNTIME_CONFS}
    for k in _RUNTIME_CONFS:
        try:
            spark.conf.unset(k)
        except Exception:
            pass
    # Drop the memoized LazyTables so load_tables re-applies confs.
    if hasattr(spark, "_pg_lake_tables"):
        spark._pg_lake_tables.clear()
    yield spark
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)


def test_load_tables_self_configures(vanilla_confs):
    spark = vanilla_confs
    t = load_tables(spark, SF_DIR)
    # events is the ns-timestamp table that killed round 1.
    assert t["events"].count() > 0
    assert dict(t["events"].dtypes)["ts"].startswith("timestamp")


def test_load_tables_is_lazy(spark):
    t = load_tables(spark, SF_DIR)
    assert isinstance(t, LazyTables)
    # Materialize one table; cache holds only that one.
    t._cache.clear()
    t["nation"]
    assert set(t._cache) == {"nation"}


def test_load_tables_cached_per_session_and_dir(spark):
    a = load_tables(spark, SF_DIR)
    b = load_tables(spark, SF_DIR)
    assert a is b
    c = load_tables(spark, "/root/testdata/sf0.01")
    assert c is not a


def test_missing_table_raises_keyerror_only_on_access(spark, tmp_path):
    t = load_tables(spark, str(tmp_path))
    with pytest.raises(KeyError):
        t["lineitem"]
    assert "lineitem" not in t
    assert len(t) == 0
