"""Generate an sf1-scale corpus by scaling the driver's sf0.1 data 10x.

The driver's synthetic generator (TESTDATA.md, seed=42) isn't available
to re-run at sf1, so this tool replicates sf0.1 ten times with
consistent key remapping — every copy offsets each table's keys (and the
matching foreign keys) by copy_index * (max_key + 1), so join fan-outs,
selectivities and value distributions are EXACTLY those of the source
corpus at 10x the rows. Dimension tables (region, nation) stay fixed,
like real dimensional data.

Two tables get deterministic per-copy perturbation so near-duplicate
cardinalities scale linearly instead of quadratically (10 identical
copies of every document would turn each duplicate group into a 45x
cross-copy pair explosion, measuring a different workload, not a bigger
one):
- documents: a per-copy suffix token breaks cross-copy exact/near dups
  while preserving within-copy structure;
- embeddings: dimensions rotate by 7*copy positions — same norms and
  within-copy geometry, decorrelated across copies.

Usage: python tools/scale_gen.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def generate(out_dir: str, copies: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )

    offs = {
        k: con.sql(f"SELECT max({c}) + 1 FROM {t}").fetchone()[0]
        for k, (t, c) in {
            "cust": ("customer", "c_custkey"),
            "supp": ("supplier", "s_suppkey"),
            "part": ("part", "p_partkey"),
            "ord": ("orders", "o_orderkey"),
            "ev": ("events", "event_id"),
            "user": ("events", "user_id"),
            "doc": ("documents", "doc_id"),
            "vec": ("embeddings", "vec_id"),
        }.items()
    }

    def emit(name: str, select: str) -> None:
        con.execute(
            f"COPY ({select}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    copies_rel = f"range({copies}) t(i)"
    # fixed dimensions
    emit("region", "SELECT * FROM region")
    emit("nation", "SELECT * FROM nation")
    emit(
        "customer",
        f"""SELECT c_custkey + i*{offs['cust']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM customer, {copies_rel}""",
    )
    emit(
        "supplier",
        f"""SELECT s_suppkey + i*{offs['supp']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM supplier, {copies_rel}""",
    )
    emit(
        "part",
        f"""SELECT p_partkey + i*{offs['part']} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM part, {copies_rel}""",
    )
    emit(
        "orders",
        f"""SELECT o_orderkey + i*{offs['ord']} AS o_orderkey,
                   o_custkey + i*{offs['cust']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, {copies_rel}""",
    )
    emit(
        "lineitem",
        f"""SELECT l_orderkey + i*{offs['ord']} AS l_orderkey,
                   l_partkey + i*{offs['part']} AS l_partkey,
                   l_suppkey + i*{offs['supp']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, {copies_rel}""",
    )
    emit(
        "events",
        f"""SELECT event_id + i*{offs['ev']} AS event_id, ts,
                   user_id + i*{offs['user']} AS user_id,
                   event_type, value, props
            FROM events, {copies_rel}""",
    )
    emit(
        "documents",
        f"""SELECT doc_id + i*{offs['doc']} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE text || ' copytag' || i END AS text,
                   lang, source,
                   CAST(len(CASE WHEN i = 0 THEN text
                                 ELSE text || ' copytag' || i END) AS BIGINT)
                       AS n_chars
            FROM documents, {copies_rel}""",
    )
    emit(
        "embeddings",
        f"""SELECT vec_id + i*{offs['vec']} AS vec_id,
                   CAST(embedding[(i*7) % 64 + 1:] || embedding[:(i*7) % 64]
                        AS FLOAT[]) AS embedding,
                   label
            FROM embeddings, {copies_rel}""",
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pg_lake_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    generate(out, n)
