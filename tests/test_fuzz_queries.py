"""Differential relational-query fuzz: generated ANSI SQL runs through
BOTH Spark (over the session's registered lake views) and the DuckDB
oracle, results compared exactly.

This extends the expression-level fuzz (test_fuzz_pg_semantics.py) to
whole query plans — random projections, filters, joins, grouped
aggregates, HAVING and ORDER BY over the corpus — the SQLancer-style
discipline the reference applies via its differential suites. The
grammar stays inside the ANSI subset both engines parse identically,
and every query's output rows are uniquely keyed by their group-by /
key columns, so rows sort deterministically and float columns compare
with tight tolerance (no rounding-boundary flakes).
"""

from __future__ import annotations

import math
import random

import pytest

from pg_lake_spark.session import load_tables
from tests.conftest import SF_DIR

SEED = 20260814
N_QUERIES = 60

_NUM_L = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_KEY_L = ["l_returnflag", "l_linestatus", "l_linenumber"]
_NUM_O = ["o_totalprice"]
_KEY_O = ["o_orderstatus", "o_orderpriority"]


def _agg(rng, col):
    fn = rng.choice(["sum", "min", "max", "avg", "count"])
    if fn == "count":
        return f"count({col})", "bigint"
    return f"{fn}({col})", "double"


def gen_query(rng: random.Random) -> str:
    kind = rng.choice(
        ["agg_l", "agg_join", "proj_filter", "agg_having", "window", "setop", "exists",
         "full_outer", "disjunct_semi", "rollup_rank", "interval_join",
         "disjunct_bands", "cents_avgs"]
    )
    if kind == "cents_avgs":
        # exact-scaled-integer averages (the r10 wave-5 discipline):
        # conditional cents sums and integer-space-rounded averages
        # must be bit-identical across engines for ANY grouping and
        # ANY filter arm — this arm fuzzes the construct the hand-
        # written dsq27/dsq07/dsq26 rows rely on
        key = rng.choice(["l_returnflag", "l_linestatus",
                          "l_returnflag, l_linestatus"])
        cond_col = rng.choice(["l_quantity", "l_discount"])
        cut = rng.randint(5, 40) if cond_col == "l_quantity" else             rng.randint(1, 9)
        cutv = cut if cond_col == "l_quantity" else cut / 100.0
        scale = rng.choice([100, 10000])
        return (
            f"SELECT {key}, "
            f"  CAST(sum(CASE WHEN {cond_col} >= {cutv} THEN "
            f"    CAST(round(l_extendedprice * {scale}) AS BIGINT) "
            f"    ELSE 0 END) AS BIGINT) AS cond_cents, "
            f"  round(CAST(sum(CAST(round(l_extendedprice * 100) "
            f"    AS BIGINT)) AS BIGINT) * 100.0 / count(*)) / 10000.0 "
            f"    AS avg_price, "
            f"  CAST(count(*) AS BIGINT) AS n "
            f"FROM lineitem GROUP BY {key} ORDER BY {key}"
        )
    if kind == "disjunct_bands":
        # OR of conjunctive band arms SPANNING the join (the dsq13/dsq85
        # construct): Catalyst must derive each table's per-column hull
        # scan-side yet still evaluate the exact disjunction post-join —
        # a hull that over- or under-prunes changes the keyed row set
        pris = rng.sample(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            rng.randint(2, 3),
        )
        arms = []
        for pri in pris:
            plo = rng.randint(1, 300) * 1000
            phi = plo + rng.randint(20, 150) * 1000
            qlo = rng.randint(1, 30)
            qhi = qlo + rng.randint(3, 20)
            arms.append(
                f"(o_orderpriority = '{pri}' "
                f"AND o_totalprice BETWEEN {plo} AND {phi} "
                f"AND l_quantity BETWEEN {qlo} AND {qhi})"
            )
        return (
            f"SELECT l_orderkey, l_linenumber "
            f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE {' OR '.join(arms)} "
            f"ORDER BY l_orderkey, l_linenumber"
        )
    if kind == "interval_join":
        # keyed time-range self-join (the as-of / attribution family):
        # same-key pairs within a bounded interval, both engines
        # evaluate the BETWEEN on identical timestamp arithmetic
        days = rng.randint(2, 15)
        mod = rng.choice([13, 17, 23])
        return (
            f"SELECT a.o_orderkey AS a_id, b.o_orderkey AS b_id "
            f"FROM orders a JOIN orders b "
            f"  ON a.o_custkey = b.o_custkey "
            f" AND b.o_orderdate >= a.o_orderdate "
            f" AND b.o_orderdate <= a.o_orderdate + INTERVAL {days} DAY "
            f" AND a.o_orderkey <> b.o_orderkey "
            f"WHERE a.o_custkey % {mod} = 0 "
            f"ORDER BY a_id, b_id"
        )
    if kind == "rollup_rank":
        # rank-within-parent over a ROLLUP (the dsq70 construct, and
        # the r8 advisor catch: subtotal rows must share ONE window
        # partition — a constant parent key would leave each alone
        # with rank 1)
        parent, child = rng.choice(
            [("o_orderstatus", "o_orderpriority"), ("o_orderpriority", "o_orderstatus")]
        )
        mfn = rng.choice(["sum(o_totalprice)", "count(*)", "max(o_totalprice)"])
        return (
            f"WITH agg AS ("
            f"  SELECT {parent} AS p, {child} AS c, "
            f"         CAST({mfn} AS DOUBLE) AS m, "
            f"         CAST(grouping({parent}) AS INT) AS g_p, "
            f"         CAST(grouping({child}) AS INT) AS g_c "
            f"  FROM orders GROUP BY ROLLUP ({parent}, {child})"
            f") "
            f"SELECT p, c, m, g_p, g_c, "
            f"       CAST(rank() OVER (PARTITION BY g_p, g_c, "
            f"                         CASE WHEN g_c = 0 THEN p END "
            f"                         ORDER BY m DESC, c NULLS FIRST) AS BIGINT) AS rnk "
            f"FROM agg "
            f"ORDER BY g_p DESC, g_c DESC, p NULLS FIRST, rnk, c NULLS FIRST"
        )
    if kind == "full_outer":
        # two channel aggregates FULL OUTER joined + coalesce-merged
        # (the dsq78 construct): members present in only one channel
        # must survive with zero-filled counts
        st = rng.choice(["F", "O", "P"])
        price = rng.randint(150, 350) * 1000
        return (
            f"WITH a AS (SELECT o_custkey AS k, count(*) AS na FROM orders "
            f"           WHERE o_orderstatus = '{st}' GROUP BY o_custkey), "
            f"     b AS (SELECT o_custkey AS k, count(*) AS nb FROM orders "
            f"           WHERE o_totalprice > {price} GROUP BY o_custkey) "
            f"SELECT coalesce(a.k, b.k) AS k, coalesce(na, 0) AS na, "
            f"       coalesce(nb, 0) AS nb "
            f"FROM a FULL OUTER JOIN b ON a.k = b.k ORDER BY k"
        )
    if kind == "disjunct_semi":
        # membership OR IN-subquery (the dsq45 construct): the
        # disjunction blocks a plain semi-join rewrite
        st = rng.choice(["F", "O"])
        qty = rng.randint(40, 49)
        return (
            f"SELECT o_orderkey, o_custkey FROM orders "
            f"WHERE o_orderstatus = '{st}' "
            f"   OR o_orderkey IN (SELECT l_orderkey FROM lineitem "
            f"                     WHERE l_quantity > {qty}) "
            f"ORDER BY o_orderkey"
        )
    if kind == "exists":
        qty = rng.randint(35, 49)
        neg = rng.choice(["", "NOT "])
        return (
            f"SELECT o_orderkey, o_orderstatus FROM orders WHERE {neg}EXISTS ("
            f"  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            f"  AND l_quantity > {qty}"
            f") AND o_totalprice > {rng.randint(100, 300) * 1000} "
            f"ORDER BY o_orderkey"
        )
    if kind == "window":
        # rank/row_number/running-sum over a keyed partition; the
        # output is keyed by (o_orderkey) so rows sort deterministically
        part = rng.choice(_KEY_O)
        wfn = rng.choice(
            [
                f"rank() OVER (PARTITION BY {part} ORDER BY o_totalprice DESC, o_orderkey)",
                f"row_number() OVER (PARTITION BY {part} ORDER BY o_orderkey)",
                f"sum(o_totalprice) OVER (PARTITION BY {part} ORDER BY o_orderkey "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
            ]
        )
        cap = rng.randint(2, 6)
        return (
            f"SELECT o_orderkey, {part}, CAST(w AS DOUBLE) AS w FROM ("
            f"  SELECT o_orderkey, {part}, {wfn} AS w FROM orders"
            f") WHERE w <= {cap * 1000 if 'sum' in wfn else cap} "
            f"ORDER BY o_orderkey"
        )
    if kind == "setop":
        op = rng.choice(["INTERSECT", "EXCEPT", "UNION"])
        lo1, lo2 = rng.randint(1995, 1998), rng.randint(1995, 1998)
        return (
            f"SELECT o_custkey FROM orders WHERE year(o_orderdate) = {lo1} "
            f"{op} "
            f"SELECT o_custkey FROM orders WHERE year(o_orderdate) = {lo2} "
            f"ORDER BY o_custkey"
        )
    if kind == "agg_l":
        keys = rng.sample(_KEY_L, rng.randint(1, 2))
        aggs = [_agg(rng, rng.choice(_NUM_L)) for _ in range(rng.randint(1, 3))]
        sel = ", ".join(keys + [f"{a} AS agg{i}" for i, (a, _t) in enumerate(aggs)])
        pred = f"l_quantity {rng.choice(['<', '>', '<='])} {rng.randint(5, 45)}"
        return (
            f"SELECT {sel} FROM lineitem WHERE {pred} "
            f"GROUP BY {', '.join(keys)} ORDER BY {', '.join(keys)}"
        )
    if kind == "agg_join":
        keys = [rng.choice(_KEY_O), rng.choice(_KEY_L)]
        a, _ = _agg(rng, rng.choice(_NUM_L + _NUM_O))
        lo = rng.randint(1995, 1999)
        return (
            f"SELECT {keys[0]}, {keys[1]}, {a} AS agg0, count(*) AS n "
            f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE o_orderdate >= TIMESTAMP '{lo}-01-01' "
            f"GROUP BY {keys[0]}, {keys[1]} ORDER BY {keys[0]}, {keys[1]}"
        )
    if kind == "proj_filter":
        cols = ["o_orderkey"] + rng.sample(_NUM_O + _KEY_O, 2)
        cmp_v = round(rng.uniform(1000, 400000), 2)
        op = rng.choice(["<", ">", ">=", "<="])
        extra = rng.choice(
            ["", " AND o_orderstatus = 'F'", " AND o_orderpriority LIKE '1%'"]
        )
        return (
            f"SELECT {', '.join(cols)} FROM orders "
            f"WHERE o_totalprice {op} {cmp_v}{extra} ORDER BY o_orderkey"
        )
    # agg_having
    key = rng.choice(["o_custkey", "o_orderpriority"])
    thresh = rng.randint(2, 12)
    return (
        f"SELECT {key}, count(*) AS n, max(o_totalprice) AS mx "
        f"FROM orders GROUP BY {key} HAVING count(*) >= {thresh} "
        f"ORDER BY {key}"
    )


def _compare(sdf, drows, sql):
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(drows), f"{sql}\nrows {len(srows)} vs {len(drows)}"
    for sr, dr in zip(srows, drows):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) or isinstance(dv, float):
                if sv is None or dv is None:
                    assert sv is None and dv is None, (sql, sr, dr)
                else:
                    assert math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9), (sql, sr, dr)
            else:
                assert str(sv) == str(dv), (sql, sr, dr)


@pytest.mark.parametrize("batch", range(4))
def test_query_fuzz_differential(spark, duck, batch):
    rng = random.Random(SEED + batch)
    t = load_tables(spark, SF_DIR)
    for name in ("lineitem", "orders"):  # view registration is on-access
        t[name]
    for _ in range(N_QUERIES // 4):
        sql = gen_query(rng)
        sdf = spark.sql(sql)
        drows = duck.sql(sql).fetchall()
        _compare(sdf, drows, sql)


# ---------------------------------------------------------------------------
# Whitespace-hostile corpus fuzz for the text-retrieval operators
# (txt_bm25_topk / txt_unigram_surprisal shapes). The r10 trim bug
# class: tokenization must agree between Spark (Java \s) and the
# DuckDB oracle (explicit [ \t\n\v\f\r] class — RE2's \s omits
# vertical tab) on multi-space runs, mixed control whitespace,
# leading/trailing whitespace, empty and whitespace-only documents,
# and NBSP-glued words (consistently NOT whitespace in either engine).
# ---------------------------------------------------------------------------

_WS_RUNS = [" ", "  ", "   ", "\t", "\n", "\v", "\f", "\r", "\r\n",
            " \t ", "\t\v\f", "\n\n"]
_FUZZ_WORDS = ["join", "hash", "scan", "filter", "the", "of", "data",
               "spark", "merge", "rare", "a b", "x9", "plan"]


def _hostile_doc(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.06:
        return ""
    if roll < 0.12:
        return rng.choice([" ", "\t", "\v\v", " \r\n ", "\f"])
    parts = []
    if rng.random() < 0.5:
        parts.append(rng.choice(_WS_RUNS))
    for _ in range(rng.randint(1, 10)):
        parts.append(rng.choice(_FUZZ_WORDS))
        parts.append(rng.choice(_WS_RUNS))
    if rng.random() < 0.5:
        parts.pop()
    return "".join(parts)


_BM25_ORACLE = """
WITH docs AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text,
           '[ \\t\\n\\v\\f\\r]+', ' ', 'g'))), ' ') AS w
  FROM fuzzdocs
), consts AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl
  FROM docs
), q(query_id, term) AS (
  VALUES ('qa', 'join'), ('qa', 'hash'), ('qb', 'rare'), ('qb', 'scan')
), tok AS (
  SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM docs
), tf AS (
  SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
  FROM tok WHERE t IN (SELECT term FROM q) GROUP BY 1, 2, 3
), dfreq AS (
  SELECT t, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln(1 + (c.n - df + 0.5) / (df + 0.5))
           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / c.avgdl))
         ), 6) AS score
  FROM tf JOIN dfreq USING (t) JOIN q ON q.term = tf.t, consts c
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS INT) AS rnk
FROM scored QUALIFY rnk <= 5
ORDER BY query_id, rnk
"""

_SURPRISAL_ORACLE = """
WITH docs AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text,
           '[ \\t\\n\\v\\f\\r]+', ' ', 'g'))), ' ') AS w
  FROM fuzzdocs
), tok AS (
  SELECT doc_id, len(w) AS dl, unnest(w) AS t FROM docs
), corpus AS (
  SELECT t, count(*) AS c FROM tok GROUP BY 1
), total AS (
  SELECT CAST(sum(c) AS DOUBLE) AS tt FROM corpus
), tf AS (
  SELECT doc_id, dl, t, count(*) AS tf FROM tok GROUP BY 1, 2, 3
)
SELECT tf.doc_id, CAST(tf.dl AS BIGINT) AS n_tokens,
       round(sum(tf.tf * -ln(c.c / total.tt)) / tf.dl, 6) AS surprisal
FROM tf JOIN corpus c USING (t), total
GROUP BY tf.doc_id, tf.dl
ORDER BY tf.doc_id
"""


@pytest.mark.parametrize("batch", range(3))
def test_text_ops_whitespace_fuzz(spark, batch):
    import duckdb

    from pg_lake_spark.operators.textstats import (
        bm25_topk, unigram_surprisal,
    )

    rng = random.Random(SEED + 7000 + batch)
    rows = [(i, _hostile_doc(rng)) for i in range(1, 41)]
    sdf_in = spark.createDataFrame(rows, "doc_id bigint, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzzdocs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fuzzdocs VALUES (?, ?)", rows)

    out = bm25_topk(
        sdf_in, "doc_id", "text",
        {"qa": ["join", "hash"], "qb": ["rare", "scan"]}, k=5,
    )
    _compare(out, con.sql(_BM25_ORACLE).fetchall(), "bm25 fuzz")

    out2 = unigram_surprisal(sdf_in, "doc_id", "text").orderBy("doc_id")
    _compare(out2, con.sql(_SURPRISAL_ORACLE).fetchall(), "surprisal fuzz")
    con.close()


def test_bm25_large_term_set_semi_join_path(spark):
    """Past 1000 terms the operator swaps the isin literal filter for a
    broadcast semi-join; a 5k-term query set must return the same
    ranking the small-set path produces for its matching subset."""
    from pg_lake_spark.operators.textstats import bm25_topk

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha alpha beta"),
        (3, "epsilon zeta"),
        (4, "unrelated words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    small = bm25_topk(df, "doc_id", "text",
                      {"q": ["alpha", "beta"]}, k=4).collect()
    # pad the same query with 5k absent terms: forces the semi-join
    # path; absent terms contribute no rows, so scores are identical
    big_terms = ["alpha", "beta"] + [f"zzz{i}" for i in range(5000)]
    big = bm25_topk(df, "doc_id", "text", {"q": big_terms}, k=4).collect()
    assert [tuple(r) for r in small] == [tuple(r) for r in big]
