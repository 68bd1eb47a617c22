"""Deterministic differential fuzz of the PG-exact shims.

The reference pins operator semantics with a per-type parametrized
corpus (operator_pushdown/, 21 files); here we generate a few hundred
randomized cases (fixed seed) per family, evaluate the whole batch once
on each engine, and compare — same discipline, lower ceremony.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from pg_lake_spark.functions.pg import pg_div, pg_mod, pg_substring, pg_to_char

SEED = 20260813


def test_intdiv_mod_fuzz(spark):
    rng = random.Random(SEED)
    cases = [(rng.randint(-10**9, 10**9), rng.choice([i for i in range(-50, 51) if i]))
             for _ in range(500)]
    df = spark.createDataFrame(cases, "a bigint, b bigint")
    got = df.select(pg_div("a", "b").alias("d"), pg_mod("a", "b").alias("m")).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    want = con.sql("SELECT a // b, a % b FROM t").fetchall()
    # DuckDB // floors toward -inf; PG truncates toward zero — adjust
    for (a, b), g, (dd_div, dd_mod) in zip(cases, got, want):
        pg_expected = int(a / b) if b else None  # trunc toward zero
        assert g.d == pg_expected, (a, b, g.d, pg_expected)
        assert g.m == a - pg_expected * b, (a, b)


def test_substring_fuzz(spark):
    rng = random.Random(SEED)
    alpha = "abcdefg hij😀é"
    cases = []
    for _ in range(300):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        cases.append((s, rng.randint(-8, 12), rng.randint(0, 15)))
    df = spark.createDataFrame(cases, "s string, st int, ln int")
    got = [r.r for r in df.select(pg_substring("s", F.col("st"), F.col("ln")).alias("r")).collect()]

    # PG model: 1-indexed infinite window [st, st+ln) intersected with
    # the string. DuckDB diverges for st < 1 (counts from the END — the
    # very deviation the reference patches via substring_pg,
    # duckdb_pglake_extension.cpp:157), so the oracle for negative
    # starts is this model, and DuckDB only for st >= 1.
    def pg_model(s, st, ln):
        return "".join(
            ch for i, ch in enumerate(s, start=1) if st <= i < st + ln
        )

    assert got == [pg_model(*c) for c in cases]

    pos = [(s, st, ln) for s, st, ln in cases if st >= 1]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR, st INT, ln INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", pos)
    want = [r[0] for r in con.sql("SELECT substring(s, st, ln) FROM t").fetchall()]
    assert [pg_model(*c) for c in pos] == want


def test_to_char_fuzz(spark):
    rng = random.Random(SEED)
    from datetime import datetime, timedelta

    base = datetime(1995, 1, 1)
    stamps = [base + timedelta(days=rng.randint(0, 4000), seconds=rng.randint(0, 86399))
              for _ in range(200)]
    patterns = ["YYYY-MM-DD", "YYYY-MM-DD HH24:MI:SS", "DD Mon YYYY", "HH12:MI am"]
    df = spark.createDataFrame([(s,) for s in stamps], "ts timestamp_ntz")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in stamps])
    for pat in patterns:
        got = [r.r for r in df.select(pg_to_char("ts", pat).alias("r")).collect()]
        # DuckDB strftime specifiers equivalent per pattern
        duck_fmt = {
            "YYYY-MM-DD": "%Y-%m-%d",
            "YYYY-MM-DD HH24:MI:SS": "%Y-%m-%d %H:%M:%S",
            "DD Mon YYYY": "%d %b %Y",
            "HH12:MI am": "%I:%M %p",
        }[pat]
        want = [r[0] for r in con.sql(f"SELECT strftime(ts, '{duck_fmt}') FROM t").fetchall()]
        if pat == "HH12:MI am":
            want = [w.lower() for w in want]  # PG 'am' renders lowercase
        assert got == want, f"pattern {pat}"


def test_to_date_parses_case_variant_text_fields(spark):
    """PG parses to_date case-insensitively, so 'MON'/'month' are the
    idiomatic spellings in ported SQL — the segment compiler regressed
    them to plan-time NotImplementedError even though Spark's parser
    (built parseCaseInsensitive) reads '15 JAN 2024' through 'MMM'
    fine (r15 self-review). Day-of-week fields still refuse: Spark >=3
    cannot parse E/EEEE at all."""
    import datetime

    import pytest

    from pg_lake_spark.functions.pg import pg_to_date, pg_to_timestamp

    df = spark.createDataFrame(
        [("15 JAN 2024", "15 january 2024", "03:30 pm")],
        "a string, b string, c string",
    )
    row = df.select(
        pg_to_date("a", "DD MON YYYY").alias("u"),
        pg_to_date("b", "DD month YYYY").alias("l"),
        pg_to_timestamp("c", "HH12:MI am").alias("t"),
    ).collect()[0]
    assert row.u == datetime.date(2024, 1, 15)
    assert row.l == datetime.date(2024, 1, 15)
    assert (row.t.hour, row.t.minute) == (15, 30)
    with pytest.raises(NotImplementedError):
        pg_to_date("a", "DAY DD MON YYYY")  # day-of-week: unparseable


def test_regexp_replace_backref_after_escaped_backslash(spark):
    """'\\\\' then '\\1' is a literal backslash followed by a REAL
    backreference — the old lookbehind detector treated the pair's
    second backslash as an escape prefix, took the literal-splice
    branch, and emitted the two characters '\\1' (r15 self-review).
    The g and non-g paths must agree."""
    from pg_lake_spark.functions.pg import pg_regexp_replace

    df = spark.createDataFrame([("xay",)], "s string")
    repl = "\\\\\\1"  # PG replacement text: \\ then \1
    row = df.select(
        pg_regexp_replace("s", "(a)", repl).alias("first"),
        pg_regexp_replace("s", "(a)", repl, "g").alias("glob"),
    ).collect()[0]
    assert row.first == "x\\ay"
    assert row.glob == "x\\ay"


def test_stale_lock_takeover(spark, tmp_path):
    """A crashed writer's lock must not wedge the table (CommitLock
    staleness takeover, catalog.py)."""
    import os
    import time as _time

    from pg_lake_spark.lakehouse.catalog import CommitLock
    from pg_lake_spark.lakehouse.table import LakeTable

    t = LakeTable.create_from_dataframe(
        spark, str(tmp_path / "locked"), spark.createDataFrame([(1,)], "id bigint")
    )
    lock_path = str(tmp_path / "locked" / "_lake_metadata" / "commit.lock")
    with open(lock_path, "w") as f:
        f.write("99999")  # fake dead writer
    old = _time.time() - 3600
    os.utime(lock_path, (old, old))
    with CommitLock(str(tmp_path / "locked"), timeout_s=5, stale_s=300):
        pass  # takeover succeeded
    t.append(spark.createDataFrame([(2,)], "id bigint"))
    assert t.to_df().count() == 2


def test_chunking_covers_every_character(spark):
    """Every document character appears in some chunk; consecutive
    chunks overlap by exactly `overlap` except possibly the last."""
    from pg_lake_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 200), (3, "c" * 201), (4, "d" * 350), (5, "e" * 351)],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, size=200, overlap=50).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = {1: 10, 2: 200, 3: 201, 4: 350, 5: 351}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert rows[0].n_chunks == len(rows)
        covered = sum(len(r.chunk) for r in rows) - 50 * (len(rows) - 1)
        assert covered == lens[doc_id]  # full coverage, exact overlap
    assert [len(by_doc[d]) for d in sorted(by_doc)] == [1, 1, 2, 2, 3]  # 350 fits in 2, 351 needs 3


def test_stratified_sample_rates_and_mix_quotas(spark):
    from pg_lake_spark.operators.chunking import mix_corpora, stratified_sample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, grp string")
    got = stratified_sample(df, stratum_col="grp", fraction=0.1, id_col="id")
    counts = {r.grp: r.n for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 90, "small": 10}  # every stratum at the same rate
    # determinism
    again = stratified_sample(df, stratum_col="grp", fraction=0.1, id_col="id")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in again.collect())

    mixed = mix_corpora(
        df, source_col="grp", weights={"big": 0.5, "small": 0.5},
        target_rows=300, id_col="id",
    )
    mcounts = {r.grp: r.n for r in mixed.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # big meets its 150 quota; small has only 100 rows and contributes all
    assert mcounts == {"big": 150, "small": 100}


def test_paragraph_dedup_and_decontaminate(spark):
    from pg_lake_spark.operators.dedup import (
        decontaminate_flags,
        paragraph_dedup_groups,
    )

    docs = spark.createDataFrame(
        [
            (1, "intro text\n\nCOMMON FOOTER\n\nbody one"),
            (2, "other intro\n\nCOMMON FOOTER"),
            (3, "unique paragraph only"),
        ],
        "doc_id bigint, text string",
    )
    groups = paragraph_dedup_groups(docs, "doc_id", "text").collect()
    # the shared footer appears twice across two docs, kept by doc 1
    footer = [r for r in groups if r.n_copies == 2]
    assert len(footer) == 1 and footer[0].n_docs == 2 and footer[0].keep_doc == 1
    assert sum(r.n_copies for r in groups) == 6  # total paragraphs
    assert len(groups) == 5  # distinct paragraph texts

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words with no overlap at all here"),
        ],
        "doc_id bigint, text string",
    )
    evalset = spark.createDataFrame(
        [(99, "quick brown fox jumps over the lazy dog benchmark")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.contaminated for r in decontaminate_flags(
        train, evalset, id_col="doc_id", text_col="text", shingle_n=8
    ).collect()}
    assert got == {1: True, 2: False}


def test_token_chunking_coverage(spark):
    from pg_lake_spark.operators.chunking import chunk_documents_tokens

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),
         (2, " ".join(f"w{i}" for i in range(100))),
         (3, " ".join(f"w{i}" for i in range(101)))],
        "doc_id bigint, text string",
    )
    out = chunk_documents_tokens(docs, size=50, overlap=10).collect()
    by = {}
    for r in out:
        by.setdefault(r.doc_id, []).append(r)
    for rows in by.values():
        rows.sort(key=lambda r: r.chunk_id)
    # 100 tokens needs 3 windows: two cover only 50+50-10=90
    assert [len(by[d]) for d in sorted(by)] == [1, 3, 3]
    # token coverage with exact overlap
    lens = {1: 10, 2: 100, 3: 101}
    for d, rows in by.items():
        total = sum(r.n_tokens for r in rows) - 10 * (len(rows) - 1)
        assert total == lens[d]
        assert rows[0].chunk.startswith("w0 ")
        assert rows[-1].chunk.endswith(f"w{lens[d]-1}")


def test_token_chunking_null_and_empty_text(spark):
    """r14 review: NULL text must chunk like empty text — one empty
    chunk with n_tokens=0. Unguarded, greatest/least SKIP the NULL that
    size() propagates, so a NULL doc reported n_tokens=size (512
    phantom tokens inflating token-budgeted shard assignment)."""
    from pg_lake_spark.operators.chunking import chunk_documents_tokens

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in chunk_documents_tokens(docs, size=512, overlap=64).collect()}
    assert len(out) == 4  # one chunk per doc
    for d in (1, 2, 3):
        assert out[d].n_tokens == 0, f"doc {d}: phantom tokens"
        assert out[d].chunk == ""
        assert out[d].n_chunks == 1
    assert out[4].n_tokens == 2 and out[4].chunk == "one two"


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below random text; natural-ish
    prose lands between; empty text yields null."""
    import random as _r
    import string

    rng = _r.Random(7)
    rand_text = "".join(rng.choice(string.ascii_letters + " ") for _ in range(5000))
    df = spark.createDataFrame(
        [
            (1, "spam " * 1000),
            (2, rand_text),
            (3, ("the quick brown fox jumps over the lazy dog. " * 40)[:1500]),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    from pg_lake_spark.operators.textstats import compression_ratio

    got = {r.doc_id: r for r in compression_ratio(df, "doc_id", "text").collect()}
    assert got[1].ratio < 0.05          # pure repetition
    assert got[2].ratio > 0.6           # near-random
    assert 0.01 < got[3].ratio < 0.3    # templated prose
    assert got[4].ratio is None and got[4].n_bytes is None
    assert got[2].n_bytes == 5000


def test_regexp_replace_first_only_fuzz(spark):
    """PG/DuckDB replace only the FIRST match without 'g'; the shim
    must agree with DuckDB across randomized texts and patterns."""
    rng = random.Random(SEED)
    from pg_lake_spark.functions.pg import pg_regexp_replace

    alpha = "abc12 xy"
    cases = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 20))) for _ in range(300)]
    pats = ["a", "[abc]", "(\\d)", "x?y", "ab"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    sel = []
    for i, p in enumerate(pats):
        sel.append(pg_regexp_replace("s", p, "<>").alias(f"f{i}"))
        sel.append(pg_regexp_replace("s", p, "<>", "g").alias(f"g{i}"))
    got = df.select(*sel).collect()
    con = duckdb.connect()
    for c, row in zip(cases, got):
        for i, p in enumerate(pats):
            want_f = con.sql("SELECT regexp_replace(?, ?, '<>')", params=[c, p]).fetchone()[0]
            want_g = con.sql("SELECT regexp_replace(?, ?, '<>', 'g')", params=[c, p]).fetchone()[0]
            assert row[f"f{i}"] == want_f, (c, p, row[f"f{i}"], want_f)
            assert row[f"g{i}"] == want_g, (c, p, row[f"g{i}"], want_g)


def test_regexp_replace_literal_dollar_and_backslash(spark):
    from pg_lake_spark.functions.pg import pg_regexp_replace

    df = spark.createDataFrame([("price here",)], "s string")
    r = df.select(
        pg_regexp_replace("s", "price", "US$5").alias("a"),
        pg_regexp_replace("s", "here", "US$5", "g").alias("b"),
    ).collect()[0]
    assert r.a == "US$5 here" and r.b == "price US$5"


def test_pg_div_exact_beyond_double(spark):
    """r14: ((a - a%b)/b).cast('long') routed through DOUBLE division —
    wrong past 2^53 (and it flipped -(2^63-1)/1 to -2^63)."""
    vals = [
        ((1 << 62) + 3, 3),
        (-(1 << 62) - 5, 7),
        (-9223372036854775807, 1),
        ((1 << 53) + 1, 2),
        (-7, 2),
        (7, -2),
    ]
    df = spark.createDataFrame(vals, "a bigint, b bigint")
    got = [r.d for r in df.select(pg_div("a", "b").alias("d")).collect()]
    def trunc(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q
    assert got == [trunc(a, b) for a, b in vals]


def test_pg_date_bin_exact_and_negative(spark):
    """Exact pmod binning: negative deltas floor toward the origin."""
    from datetime import datetime
    from pg_lake_spark.functions.pg import pg_date_bin
    from pyspark.sql import functions as F

    rows = [
        (datetime(2024, 3, 1, 10, 44, 59),),
        (datetime(2024, 3, 1, 10, 45, 0),),
        (datetime(1969, 12, 31, 23, 59, 59),),  # negative delta
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [
        r.b for r in df.select(
            pg_date_bin("15 minutes", "ts", "1970-01-01 00:00:00").alias("b")
        ).collect()
    ]
    assert got == [
        datetime(2024, 3, 1, 10, 30, 0),
        datetime(2024, 3, 1, 10, 45, 0),
        datetime(1969, 12, 31, 23, 45, 0),
    ]
