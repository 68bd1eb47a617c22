"""File-level pruning: min/max column stats + partition transforms.

Reference: data_file_pruning.c — ``PruneDataFiles`` (:186) evaluates
restriction clauses against per-file column bounds
(``GetColumnBoundConstraintsFromColumnStats`` :599) and against
partition-transform values (:746-1228, one bound-constraint derivation
per transform; ``bucket`` prunes on equality only). This module is the
same design: a conjunction of simple predicates is checked per file;
any unprovable predicate keeps the file (pruning must be sound, never
complete).

Predicates are ``(column, op, value)`` tuples with ops
``= != < <= > >= in between is_null not_null``; ``parse_where`` builds
them from a simple SQL-ish conjunction for ergonomic call sites.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pg_lake_spark.lakehouse.catalog import DataFile
from pg_lake_spark.lakehouse.transforms import TRANSFORMS

Predicate = tuple  # (col, op, value)

_MONOTONIC = {"identity", "year", "month", "day", "hour", "truncate"}


#: a value in a comparison conjunct must be ONE clean literal — a
#: (typed) quoted string, a number, or true/false/null. An UNQUOTED
#: word is a column reference, not a literal: ``src = dst_col`` must
#: disable pruning, not compare min/max against the string "dst_col"
#: (the same silent-no-op class as the disjunction bug). Anything
#: trailing (``'x' OR id = 2``, ``'a' || 'b'``) is also unparseable.
_CLEAN_LIT = re.compile(
    r"(?i)^(?:(?:TIMESTAMP|DATE)\s+)?'(?:[^']|'')*'$"
    r"|^[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?$"
    r"|^(?:true|false|null)$"
)


def parse_where(where: str) -> list[Predicate] | None:
    """Parse ``"a >= 5 AND b = 'x' AND c BETWEEN 1 AND 2"`` into
    predicates. Returns None when any conjunct is unparseable — callers
    must then skip pruning (sound fallback), mirroring the reference's
    behavior for non-shippable clauses.

    Only a pure CONJUNCTION prunes soundly file-by-file; a top-level
    OR must disable pruning entirely. The comparison arm also insists
    the right-hand side is one clean literal: previously
    ``msg = 'x' OR id = 2`` parsed as the single conjunct
    ``msg = "'x' OR id = 2"``, whose garbage literal pruned every
    file's stats range — a DELETE/UPDATE that silently touched zero
    rows."""
    if re.search(r"(?i)\sOR\s", re.sub(r"'(?:[^']|'')*'", "''", where)):
        return None  # disjunction (quote-masked check) → no pruning
    preds: list[Predicate] = []
    # Split conjuncts on QUOTE-MASKED offsets: an AND inside a quoted
    # literal (msg = 'a AND b' AND id = 3) previously split mid-literal
    # and soundly disabled pruning for the whole WHERE — masking keeps
    # the literal whole so the other conjuncts still prune. The
    # BETWEEN...AND masking runs on the same masked text for the same
    # reason (a bound literal may contain ' AND ').
    def _mask_quotes(s: str) -> str:
        # same-length masking so shadow offsets index into src
        return re.sub(r"'(?:[^']|'')*'", lambda m: "\x00" * len(m.group(0)), s)

    src = where.strip()
    shadow = _mask_quotes(src)
    between_ands = {
        m.span(1)
        for m in re.finditer(
            r"(?i)BETWEEN\s+(?:TIMESTAMP\s+|DATE\s+)?\S+(\s+AND\s+)", shadow
        )
    }
    parts: list[str] = []
    start = 0
    for m in re.finditer(r"(?i)\s+AND\s+", shadow):
        if m.span() in between_ands:
            continue  # the AND that belongs to a BETWEEN
        parts.append(src[start : m.start()])
        start = m.end()
    parts.append(src[start:])
    for part in parts:
        part = part.strip().rstrip(";")
        _bound = r"(?:(?:TIMESTAMP|DATE)\s+)?'(?:[^']|'')*'|\S+"
        m = re.match(
            rf"(?i)^(\w+)\s+BETWEEN\s+({_bound})\s+AND\s+({_bound})$", part
        )
        if m:
            if not (_CLEAN_LIT.match(m.group(2)) and _CLEAN_LIT.match(m.group(3))):
                return None  # column-ref or expression bound → no pruning
            preds.append((m.group(1), "between", (_lit(m.group(2)), _lit(m.group(3)))))
            continue
        m = re.match(r"(?i)^(\w+)\s+IS\s+NULL$", part)
        if m:
            preds.append((m.group(1), "is_null", None))
            continue
        m = re.match(r"(?i)^(\w+)\s+IS\s+NOT\s+NULL$", part)
        if m:
            preds.append((m.group(1), "not_null", None))
            continue
        m = re.match(r"(?i)^(\w+)\s+IN\s*\((.+)\)$", part)
        if m:
            body = m.group(2)
            # split members on QUOTE-MASKED commas so a comma inside a
            # quoted literal ('Smith, John') stays one member; each
            # member must then be one clean literal or the whole clause
            # is unparseable (no pruning)
            bshadow = _mask_quotes(body)
            toks, tstart = [], 0
            for cm in re.finditer(",", bshadow):
                toks.append(body[tstart : cm.start()].strip())
                tstart = cm.end()
            toks.append(body[tstart:].strip())
            if not all(_CLEAN_LIT.match(v) for v in toks):
                return None
            preds.append((m.group(1), "in", tuple(_lit(v) for v in toks)))
            continue
        m = re.match(r"^(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*(.+)$", part)
        if m:
            val = m.group(3).strip()
            if not _CLEAN_LIT.match(val):
                return None
            op = "!=" if m.group(2) == "<>" else m.group(2)
            preds.append((m.group(1), op, _lit(val)))
            continue
        return None
    return preds


def _lit(tok: str):
    # typed literals: TIMESTAMP '…' / DATE '…'
    m = re.match(r"(?i)^(?:TIMESTAMP|DATE)\s+'(.+)'$", tok)
    if m:
        return _coerce_temporal(m.group(1).replace("''", "'"))
    if tok.startswith("'") and tok.endswith("'"):
        # '' is PG's escaped quote: compare against the VALUE, not the
        # escaped spelling (msg = 'it''s' must not prune a file whose
        # min/max contain "it's")
        s = tok[1:-1].replace("''", "'")
        return _coerce_temporal(s)
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    if low == "null":
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


def _coerce_temporal(s: str):
    for fmt, conv in (
        ("%Y-%m-%d %H:%M:%S", datetime.strptime),
        ("%Y-%m-%dT%H:%M:%S", datetime.strptime),
        ("%Y-%m-%d %H:%M:%S.%f", datetime.strptime),
        ("%Y-%m-%dT%H:%M:%S.%f", datetime.strptime),
        ("%Y-%m-%d", lambda v, f: datetime.strptime(v, f).date()),
    ):
        try:
            return conv(s, fmt)
        except ValueError:
            continue
    return s


def _comparable(a, b):
    """Best-effort align types (date vs datetime, int vs float)."""
    if isinstance(a, datetime) and isinstance(b, date) and not isinstance(b, datetime):
        b = datetime(b.year, b.month, b.day)
    elif isinstance(b, datetime) and isinstance(a, date) and not isinstance(a, datetime):
        a = datetime(a.year, a.month, a.day)
    return a, b


def _cmp_ok(lo, hi, op, v) -> bool:
    """Could any value in [lo, hi] satisfy ``x op v``?"""
    try:
        lo, v1 = _comparable(lo, v)
        hi, v2 = _comparable(hi, v)
    except TypeError:
        return True
    try:
        if op == "=":
            return lo <= v1 <= hi
        if op == "<":
            return lo < v1
        if op == "<=":
            return lo <= v1
        if op == ">":
            return hi > v2
        if op == ">=":
            return hi >= v2
        if op == "!=":
            return not (lo == hi == v1)
    except TypeError:
        return True
    return True


def file_matches(f: DataFile, preds: list[Predicate], spec: list[dict]) -> bool:
    """Sound check: False only when stats/partition values PROVE no row
    in ``f`` can satisfy all predicates."""
    for col, op, val in preds:
        # --- column min/max stats ---------------------------------------
        st = f.stats.get(col)
        if st is not None:
            nulls = st.get("null_count")
            if op == "is_null":
                if nulls == 0:
                    return False
                continue
            if op == "not_null":
                if nulls is not None and nulls == f.row_count:
                    return False
                continue
            lo, hi = st.get("min"), st.get("max")
            if lo is not None and hi is not None:
                lo, hi = _revive(lo), _revive(hi)
                if op == "in":
                    if not any(_cmp_ok(lo, hi, "=", v) for v in val):
                        return False
                elif op == "between":
                    vlo, vhi = val
                    if not (_cmp_ok(lo, hi, ">=", vlo) and _cmp_ok(lo, hi, "<=", vhi)):
                        return False
                elif not _cmp_ok(lo, hi, op, val):
                    return False
        # --- partition transform values ---------------------------------
        for pf in spec:
            if pf["column"] != col:
                continue
            pname = _pfield_name(pf)
            if pname not in f.partition:
                continue
            pv = f.partition[pname]
            t, param = pf["transform"], pf.get("param")
            _, py_eval = TRANSFORMS[t]
            if op in ("is_null", "not_null"):
                continue
            # Any evaluation failure (un-coerced literal, type mismatch)
            # must keep the file — pruning is sound, never complete.
            # Equality/in comparisons are the dangerous ones: Python's
            # != between MISMATCHED kinds ('2024-01-05' vs date(...),
            # 123 vs '0123') silently returns True instead of raising,
            # which would prune a file that holds matching rows. Revive
            # string partition values (legacy manifests store temporals
            # as dir strings) and refuse to prune unless both sides are
            # the same comparable kind.
            if isinstance(pv, str):
                pv = _revive(pv)
            try:
                if t == "bucket":
                    if op == "=":
                        tv = py_eval(_revive(val), param)
                        if _same_kind(pv, tv) and pv != tv:
                            return False
                    elif op == "in":
                        tvs = {py_eval(_revive(v), param) for v in val}
                        if all(_same_kind(pv, x) for x in tvs) and pv not in tvs:
                            return False
                    continue
                if t in _MONOTONIC:
                    if op == "between":
                        tlo = py_eval(_revive(val[0]), param)
                        thi = py_eval(_revive(val[1]), param)
                        if tlo is not None and pv < tlo:
                            return False
                        if thi is not None and pv > thi:
                            return False
                        continue
                    tv = py_eval(_revive(val), param) if op != "in" else None
                    a, b = _comparable(pv, tv) if tv is not None else (pv, tv)
                    if op == "=":
                        if _same_kind(a, b) and a != b:
                            return False
                    if op in ("<", "<=") and tv is not None and a > b:
                        return False
                    if op in (">", ">=") and tv is not None and a < b:
                        return False
                    if op == "in":
                        tvs = {py_eval(_revive(v), param) for v in val}
                        if all(_same_kind(pv, x) for x in tvs) and pv not in tvs:
                            return False
            except (TypeError, AttributeError, ValueError):
                continue
    return True


def _same_kind(a, b) -> bool:
    """True when ``a != b`` is a PROOF of inequality (same comparable
    kind) rather than a type artifact. None keeps the existing
    semantics: a null partition value provably fails an equality."""
    if a is None or b is None:
        return True
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, bool):
        return True
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return True
    if isinstance(a, (date, datetime)) and isinstance(b, (date, datetime)):
        return True
    return type(a) is type(b)


def _pfield_name(pf: dict) -> str:
    t = pf["transform"]
    if t == "identity":
        return pf["column"]
    if pf.get("param") is not None:
        return f"{pf['column']}_{t}{pf['param']}"
    return f"{pf['column']}_{t}"


def _revive(v):
    """JSON round-trip revives ISO strings back to temporals."""
    if isinstance(v, str):
        return _coerce_temporal(v)
    return v


def prune_files(
    files: list[DataFile], preds: list[Predicate] | None, spec: list[dict]
) -> tuple[list[DataFile], int]:
    """Returns (kept_files, skipped_count) — the reference's
    ``Data Files Scanned / Skipped`` EXPLAIN observability."""
    if not preds:
        return files, 0
    kept = [f for f in files if file_matches(f, preds, spec)]
    return kept, len(files) - len(kept)


def conjunct_filter_paths(spark, frame, where: str) -> set[str] | None:
    """Shared driver-side file-list pruning core for the foreign-format
    scanners (Delta `_delta_log`, foreign Iceberg manifests): split
    ``where`` into top-level AND conjuncts with Spark's SQL parser and
    filter ``frame`` — a small (``__path``, typed partition columns)
    DataFrame — by every conjunct that analyzes against it. Returns the
    surviving path set, or None when no conjunct applied (callers skip
    pruning). Sound by construction: each applied conjunct is a
    necessary condition constant across a file, and the caller still
    applies the full predicate row-wise after the scan.
    """
    try:
        jexpr = spark._jsparkSession.sessionState().sqlParser().parseExpression(where)
    except Exception:
        return None
    conjuncts = []
    stack = [jexpr]
    while stack:
        e = stack.pop()
        if e.getClass().getSimpleName() == "And":
            stack.append(e.left())
            stack.append(e.right())
        else:
            conjuncts.append(e)
    applied = False
    for e in conjuncts:
        try:
            candidate = frame.filter(e.sql())  # analysis runs eagerly here
            # Soundness: a conjunct is a per-FILE constant only when it
            # references at least one (partition) column and is
            # deterministic. A column-free conjunct (rand() < 0.5, or a
            # constant) analyzes fine against ANY frame but evaluated
            # file-wise would drop whole files whose ROWS still satisfy
            # the full predicate.
            cond = candidate._jdf.queryExecution().analyzed().condition()
            if cond.references().isEmpty() or not cond.deterministic():
                continue
        except Exception:
            continue
        frame = candidate
        applied = True
    if not applied:
        return None
    return {r["__path"] for r in frame.select("__path").collect()}
