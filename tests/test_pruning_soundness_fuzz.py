"""Differential soundness fuzz for the file-pruning core.

The invariant pruning lives or dies by: ``file_matches(f, preds, spec)``
may return False ONLY when no row in the file satisfies the WHERE.
DuckDB evaluates the same WHERE over each file's actual rows as the
arbiter. A missed prune (keeping a file with no matching rows) is
allowed — pruning is sound, never complete — but a single wrong prune
is a correctness bug (the r13 dirty-literal and r14 quote-masking
findings were both in this family).

Pure Python + DuckDB (no Spark): file_matches and the transforms are
driver-side code, so 200 seeded WHEREs x 8 files check in seconds.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import duckdb

from pg_lake_spark.lakehouse.catalog import DataFile
from pg_lake_spark.lakehouse.pruning import file_matches, parse_where
from pg_lake_spark.lakehouse.transforms import TRANSFORMS

_BASE_TS = datetime(2024, 1, 1)

_SPEC = [
    {"transform": "day", "param": None, "column": "ts"},
    {"transform": "bucket", "param": 4, "column": "id"},
]


def _rows():
    rnd = random.Random(20260816)
    rows = []
    names = ["alpha", "b AND c", "it's", "x OR y", "", "Smith, John", None]
    for i in range(160):
        rows.append(
            {
                "id": i,
                "v": round(rnd.uniform(-50, 50), 3) if rnd.random() > 0.1 else None,
                "name": rnd.choice(names),
                "ts": _BASE_TS + timedelta(hours=rnd.randrange(0, 96)),
                "flag": rnd.choice([True, False, None]),
            }
        )
    return rows


def _files(rows):
    """Group rows into files by their partition tuple, with real stats."""
    groups: dict[tuple, list[dict]] = {}
    for r in rows:
        key = tuple(
            TRANSFORMS[pf["transform"]][1](r[pf["column"]], pf.get("param"))
            for pf in _SPEC
        )
        groups.setdefault(key, []).append(r)
    files = []
    for key, grp in groups.items():
        stats = {}
        for col in ("id", "v", "name", "ts", "flag"):
            vals = [r[col] for r in grp if r[col] is not None]
            stats[col] = {
                "min": min(vals) if vals else None,
                "max": max(vals) if vals else None,
                "null_count": sum(1 for r in grp if r[col] is None),
            }
        partition = {
            ("ts_day" if pf["transform"] == "day" else "id_bucket4"): k
            for pf, k in zip(_SPEC, key)
        }
        files.append(
            (
                DataFile(
                    path=f"f{key}",
                    row_count=len(grp),
                    size_bytes=0,
                    partition=partition,
                    stats=stats,
                ),
                grp,
            )
        )
    return files


def _gen_where(rnd: random.Random) -> str:
    def lit(col):
        if col == "id":
            return str(rnd.randrange(-5, 170))
        if col == "v":
            return str(round(rnd.uniform(-60, 60), 2))
        if col == "flag":
            return rnd.choice(["true", "false"])
        if col == "ts":
            t = _BASE_TS + timedelta(hours=rnd.randrange(-4, 100))
            form = rnd.choice(
                ["'{}'", "TIMESTAMP '{}'"]
            )
            return form.format(t.strftime("%Y-%m-%d %H:%M:%S"))
        s = rnd.choice(
            ["alpha", "b AND c", "it''s", "x OR y", "zzz", "Smith, John"]
        )
        return f"'{s}'"

    def conjunct():
        col = rnd.choice(["id", "v", "name", "ts", "flag"])
        kind = rnd.random()
        if kind < 0.15:
            return f"{col} IS {'NOT ' if rnd.random() < 0.5 else ''}NULL"
        if kind < 0.3 and col in ("id", "v", "ts"):
            a, b = lit(col), lit(col)
            return f"{col} BETWEEN {a} AND {b}"
        if kind < 0.45 and col in ("id", "name"):
            vals = ", ".join(lit(col) for _ in range(rnd.randrange(1, 4)))
            return f"{col} IN ({vals})"
        op = rnd.choice(["=", "!=", "<", "<=", ">", ">="])
        return f"{col} {op} {lit(col)}"

    return " AND ".join(conjunct() for _ in range(rnd.randrange(1, 4)))


def test_pruning_never_drops_a_matching_file():
    rows = _rows()
    files = _files(rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, v DOUBLE, name VARCHAR, ts TIMESTAMP, flag BOOLEAN)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?, ?)",
        [(r["id"], r["v"], r["name"], r["ts"], r["flag"]) for r in rows],
    )
    rnd = random.Random(0xDEC0DE)
    checked = pruned = 0
    for _ in range(200):
        where = _gen_where(rnd)
        preds = parse_where(where)
        if preds is None:
            continue  # declined to prune: sound by definition
        checked += 1
        for f, grp in files:
            if file_matches(f, preds, _SPEC):
                continue
            pruned += 1
            ids = tuple(r["id"] for r in grp)
            n = con.execute(
                f"SELECT count(*) FROM t WHERE id IN {ids} AND ({where})"
            ).fetchone()[0]
            assert n == 0, (
                f"UNSOUND PRUNE: file {f.path} dropped for {where!r} "
                f"but {n} of its rows match"
            )
    # the fuzz must actually exercise both paths
    assert checked >= 100, f"only {checked} parseable WHEREs"
    assert pruned >= 50, f"only {pruned} prune decisions exercised"


def test_pruning_sound_with_string_bucket_spec():
    """Same arbiter, but files partitioned by bucket(4, name) — the r14
    typed-bucket path (string murmur) feeding equality/IN pruning, NULL
    names grouping under a NULL partition value."""
    rows = _rows()
    spec = [{"transform": "bucket", "param": 4, "column": "name"}]
    groups: dict[object, list[dict]] = {}
    for r in rows:
        key = TRANSFORMS["bucket"][1](r["name"], 4)
        groups.setdefault(key, []).append(r)
    files = []
    for key, grp in groups.items():
        vals = [r["name"] for r in grp if r["name"] is not None]
        stats = {
            "name": {
                "min": min(vals) if vals else None,
                "max": max(vals) if vals else None,
                "null_count": sum(1 for r in grp if r["name"] is None),
            }
        }
        files.append(
            (
                DataFile(
                    path=f"nb{key}", row_count=len(grp), size_bytes=0,
                    partition={"name_bucket4": key}, stats=stats,
                ),
                grp,
            )
        )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, name VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(r["id"], r["name"]) for r in rows]
    )
    rnd = random.Random(0xB0CCE)
    names = ["alpha", "b AND c", "it''s", "x OR y", "zzz", "Smith, John"]
    pruned = 0
    for _ in range(120):
        if rnd.random() < 0.5:
            where = f"name = '{rnd.choice(names)}'"
        else:
            vals = ", ".join(f"'{rnd.choice(names)}'" for _ in range(rnd.randrange(1, 4)))
            where = f"name IN ({vals})"
        preds = parse_where(where)
        assert preds is not None
        for f, grp in files:
            if file_matches(f, preds, spec):
                continue
            pruned += 1
            ids = tuple(r["id"] for r in grp)
            n = con.execute(
                f"SELECT count(*) FROM t WHERE id IN {ids} AND ({where})"
            ).fetchone()[0]
            assert n == 0, f"UNSOUND string-bucket prune: {f.path} for {where!r}"
    assert pruned >= 100, f"only {pruned} prune decisions exercised"
