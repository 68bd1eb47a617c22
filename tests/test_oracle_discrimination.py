"""Every oracle must be able to FAIL: discrimination floor for the
registry's DuckDB side.

The r16 audit found three gates that could not fail at any scale factor
(s_except's nationkey EXCEPT was empty everywhere, j_semi_anti's anti
legs were constant 0/full-table, cb_phrase_lexical_order projected a
constant vector) — each had been certified green for rounds while
checking nothing. This module pins the floor at the driver's check
scale (sf0.01), DuckDB-only so it costs seconds:

  - no oracle returns 0 rows (a 0-row expectation is satisfied by any
    always-empty bug);
  - no oracle returns >1 rows with EVERY column constant (a constant
    frame is satisfied by any always-that-constant bug).

1-row aggregate results are fine — their values are data-dependent
sums/counts, so the value hash still discriminates.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pg_lake_spark.queries import QUERIES

SF_DIR = os.environ.get("PG_LAKE_TEST_SF01_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# Rows whose oracle legitimately violates a floor, with the reason.
# KEEP THIS EMPTY unless a genuinely-justified exception appears; a
# name listed here is a name the differential check cannot fully trust.
ALLOWED_EMPTY: dict[str, str] = {}
ALLOWED_CONSTANT: dict[str, str] = {}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_is_vacuous_at_driver_scale(con):
    empties, constants, errors = [], [], []
    for name, spec in QUERIES.items():
        sql = getattr(spec, "oracle", None)
        if not sql:
            continue
        try:
            df = con.execute(sql).fetch_df()
        except Exception as exc:  # noqa: BLE001 — collect, report once
            errors.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if len(df) == 0 and name not in ALLOWED_EMPTY:
            empties.append(name)
        elif len(df) > 1 and name not in ALLOWED_CONSTANT:
            if all(df[c].nunique(dropna=False) <= 1 for c in df.columns):
                constants.append(name)
    assert not errors, f"oracles failed to run: {errors[:5]}"
    assert not empties, f"0-row (vacuous) oracles at sf0.01: {empties}"
    assert not constants, (
        f"all-constant multi-row oracles at sf0.01: {constants}"
    )
