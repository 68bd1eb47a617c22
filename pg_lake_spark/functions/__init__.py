"""PG-compatible scalar function layer.

Reference analogue: pg_lake's expression-rewrite machinery —
rewrite_query.c (~40 rules), to_char.c (format-string compiler), and the
duckdb_pglake extension's PG-exact reimplementations
(duckdb_pglake_extension.cpp:82-157). There, rewrites happen on the
Postgres query tree before deparse; here they are plain Column-builder
functions applied at DataFrame-construction time — no custom Catalyst
rule needed (SURVEY §4 row "Expression rewrite for engine compat").
"""

from pg_lake_spark.functions.pg import (
    pg_date_trunc,
    pg_div,
    pg_mod,
    pg_substring,
    pg_to_char,
)

__all__ = ["pg_div", "pg_mod", "pg_substring", "pg_date_trunc", "pg_to_char"]
