"""Property tests for the SQL front-end's quote masking and the
stats-pruning predicate parser — the two places where a keyword or
separator INSIDE a string literal historically produced silent wrong
behavior (misrouted statements, garbage pruning literals). No Spark
session needed; these are pure-Python properties.

Reference parity note: the reference gets this for free from the PG
parser (pg_lake_table's planner hooks receive parsed trees); a regex
front-end must prove the masking discipline instead.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pg_lake_spark.ddl import _mask_quoted, _shape_match
from pg_lake_spark.lakehouse.pruning import parse_where

# Fragments engineered to look like clause boundaries when unmasked.
_KEYWORDY = st.sampled_from(
    [
        "copy FROM archive",
        "a USING b",
        "x WHERE y",
        "SET z = 1",
        "DELETE FROM t",
        "1 OR 2",
        "a AND b",
        "it''s FROM here",
        "BETWEEN 1 AND 2",
        "in, a, list",
        "",
        "plain",
    ]
)
_WORD = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)


def _q(s: str) -> str:
    """Single-quote a fragment PG-style (double embedded quotes)."""
    return "'" + s.replace("'", "''") + "'"


@settings(max_examples=300, deadline=None)
@given(lit=_KEYWORDY, ident=_WORD, tag=st.sampled_from(["$$", "$fn$", "$x1$"]))
def test_mask_preserves_length_and_unquoted_text(lit, ident, tag):
    sql = (
        f'UPDATE "{ident}" SET msg = {_q(lit)}, body = {tag}{lit}{tag} '
        f"WHERE id = 1"
    )
    masked = _mask_quoted(sql)
    # span-slicing from the original is only valid if lengths line up
    assert len(masked) == len(sql)
    # every character OUTSIDE a quoted region is untouched; quoted
    # CONTENT is all 'x' (delimiters themselves survive)
    assert masked.startswith("UPDATE ")
    assert masked.endswith("WHERE id = 1")
    inner = re.search(r"'(x*)'", masked)
    assert inner is not None and len(inner.group(1)) == len(
        lit.replace("'", "''")
    )
    # no statement keyword survives inside the masked literal regions
    for m in re.finditer(r"'([^']*)'", masked):
        assert set(m.group(1)) <= {"x"}
    # the DOLLAR-quoted region masks too — including digit-bearing
    # tags like $x1$ (PG allows digits after the first tag char)
    dm = re.search(re.escape(tag) + r"(x*)" + re.escape(tag), masked)
    assert dm is not None and len(dm.group(1)) == len(lit)


@settings(max_examples=300, deadline=None)
@given(lit=_KEYWORDY)
def test_update_with_keyword_literal_routes_to_plain_update(lit):
    """A keyword inside the SET literal must never supply a FROM/WHERE
    boundary, and the groups sliced from the original must carry the
    literal verbatim."""
    from pg_lake_spark.ddl import _UPDATE, _UPDATE_FROM

    sql = f"UPDATE t SET msg = {_q(lit)} WHERE id = 1"
    assert _shape_match(_UPDATE_FROM, sql) is None
    m = _shape_match(_UPDATE, sql)
    assert m is not None
    assert m.group("assigns").strip() == f"msg = {_q(lit)}"
    assert m.group("pred").strip().rstrip(";") == "id = 1"


@settings(max_examples=300, deadline=None)
@given(lit=_KEYWORDY)
def test_delete_with_keyword_literal_routes_to_plain_delete(lit):
    from pg_lake_spark.ddl import _DELETE, _DELETE_USING

    sql = f"DELETE FROM t WHERE msg = {_q(lit)}"
    assert _shape_match(_DELETE_USING, sql) is None
    m = _shape_match(_DELETE, sql)
    assert m is not None
    assert m.group("pred").strip().rstrip(";") == f"msg = {_q(lit)}"


# ---------------------------------------------------------------------------
# parse_where: the output is either EXACTLY the declared conjunction or
# None (no pruning) — never a garbage predicate. Garbage literals are
# how the r12 DELETE-no-op bug happened.
# ---------------------------------------------------------------------------

# exclude SQL keywords: a column literally named 'or'/'and'/... is not
# valid as a bare identifier, and parse_where soundly declines the
# whole WHERE when it sees the keyword (hypothesis found 'or' in r15)
_SQL_KEYWORDS = {"or", "and", "not", "in", "is", "null", "between", "like"}
_COL = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True).filter(
    lambda c: c not in _SQL_KEYWORDS
)
_NUM = st.integers(min_value=-10**6, max_value=10**6)
_OP = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])


@settings(max_examples=300, deadline=None)
@given(
    conj=st.lists(
        st.tuples(_COL, _OP, _NUM), min_size=1, max_size=4
    )
)
def test_clean_conjunction_round_trips(conj):
    where = " AND ".join(f"{c} {op} {v}" for c, op, v in conj)
    got = parse_where(where)
    assert got == [(c, op, v) for c, op, v in conj]


@settings(max_examples=300, deadline=None)
@given(lit=_KEYWORDY, col=_COL, v=_NUM)
def test_or_and_dirty_literals_never_prune(lit, col, v):
    # top-level OR → None regardless of what the literal contains
    assert parse_where(f"{col} = {_q(lit)} OR {col} = {v}") is None
    # a clean single conjunct must round-trip to the UNESCAPED value
    # exactly, or fall back to a sound None (the AND split may break
    # multi-word literals) — never to a garbage/escaped-spelling value
    got = parse_where(f"{col} = {_q(lit)}")
    if got is not None:
        assert got == [(col, "=", lit)]


@settings(max_examples=300, deadline=None)
@given(lit=_KEYWORDY, col=_COL)
def test_in_list_with_embedded_commas_is_sound(lit, col):
    # commas inside a quoted IN element split into unbalanced-quote
    # tokens → must disable pruning, not prune on garbage
    got = parse_where(f"{col} IN ({_q(lit)}, 'z')")
    if got is not None:
        assert got == [(col, "in", (lit, "z"))]
    else:
        assert ("," in lit) or (" AND " in lit.upper()) or (
            " OR " in lit.upper()
        ) or " BETWEEN " in lit.upper()


def test_column_reference_rhs_never_prunes():
    """An UNQUOTED word on the right-hand side is a column reference,
    not a string literal — comparing stats ranges against the NAME
    would prune files that contain matching rows (review finding)."""
    assert parse_where("src = dst_col") is None
    assert parse_where("x BETWEEN lo_col AND 5") is None
    assert parse_where("x IN (a_col, 5)") is None
    # numbers, booleans and null are still clean literals
    assert parse_where("flag = true") == [("flag", "=", True)]
    assert parse_where("x = null") == [("x", "=", None)]
    assert parse_where("x = -3.5e2") == [("x", "=", -350.0)]
    assert parse_where("x BETWEEN 1 AND 2") == [("x", "between", (1, 2))]


def test_named_dollar_tags_with_digits_shield_everywhere():
    """$x1$ bodies must be opaque to all four lexer passes (PG tag
    grammar: letter/underscore then letters/digits/underscores)."""
    from pg_lake_spark.ddl import (
        _extract_returning,
        split_sql_statements,
        strip_sql_comments,
    )

    s = "SELECT $x1$a; b -- c$x1$"
    assert split_sql_statements(s) == [s]
    assert strip_sql_comments(s) == s
    assert "$x1$" in _mask_quoted(s)
    assert set(re.search(r"\$x1\$(.*)\$x1\$", _mask_quoted(s)).group(1)) == {"x"}
    # RETURNING inside a named dollar body is data, not the clause
    sql = "UPDATE t SET msg = $m$go RETURNING home$m$ WHERE id = 1"
    kept, ret = _extract_returning(sql)
    assert kept == sql and ret is None


@settings(max_examples=300, deadline=None)
@given(
    lits=st.lists(_KEYWORDY, min_size=1, max_size=4),
    tag=st.sampled_from(["'", "$$", "$x1$"]),
)
def test_split_preserves_statements_with_hostile_literals(lits, tag):
    """A script whose literals contain ';' and '--' must split into
    exactly the statements it was built from, under every quote form,
    and survive comment stripping untouched."""
    from pg_lake_spark.ddl import split_sql_statements, strip_sql_comments

    stmts = []
    for i, lit in enumerate(lits):
        body = lit + "; -- inside"
        q = (
            "'" + body.replace("'", "''") + "'"
            if tag == "'"
            else tag + body + tag
        )
        stmts.append(f"SELECT {i}, {q} AS c")
    joined = "; ".join(stmts) + ";"
    assert split_sql_statements(joined) == stmts
    assert strip_sql_comments(joined) == joined
