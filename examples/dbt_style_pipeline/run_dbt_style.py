"""dbt-style materialization runner over the engine's SQL surface.

This is the smoke path for the reference's dbt workflow (reference
docs/dbt.md): it executes exactly the statements dbt's `table` and
`incremental` materializations emit — CREATE TABLE ... AS SELECT for a
full build, INSERT INTO ... SELECT guarded by an is_incremental
predicate for delta loads — through ``LakeSession.execute`` (the same
entry point a dbt-spark `session`-method profile would reach). No dbt
install needed; swap this runner for real dbt by pointing dbt-spark at
the bundled profiles.yml.

Model files are plain SELECTs with a tiny header convention:
  -- materialized: table | incremental
  -- unique_key: <col>          (incremental only, informational)
and the one Jinja block dbt models actually rely on:
  {% if is_incremental %} ... {% endif %}
"""

from __future__ import annotations

import os
import re


def parse_model(path: str) -> dict:
    src = open(path).read()
    mat = re.search(r"--\s*materialized:\s*(\w+)", src)
    return {
        "name": os.path.splitext(os.path.basename(path))[0],
        "materialized": mat.group(1) if mat else "table",
        "sql": src,
    }


def render(sql: str, *, is_incremental: bool) -> str:
    """Resolve the {% if is_incremental %} block the way dbt would."""
    def repl(m: re.Match) -> str:
        return m.group(1) if is_incremental else ""

    sql = re.sub(
        r"\{%\s*if\s+is_incremental\s*%\}(.*?)\{%\s*endif\s*%\}",
        repl,
        sql,
        flags=re.DOTALL,
    )
    return "\n".join(
        line for line in sql.splitlines() if not line.strip().startswith("--")
    ).strip()


def _topo_order(models: list[dict]) -> list[dict]:
    """dbt-style DAG ordering: model B depends on model A when A's name
    appears as a relation in B's SQL (dbt gets this from ref(); plain
    name matching is the no-Jinja equivalent)."""
    names = {m["name"] for m in models}
    deps = {
        m["name"]: {
            n
            for n in names - {m["name"]}
            if re.search(rf"\b{re.escape(n)}\b", m["sql"])
        }
        for m in models
    }
    ordered: list[dict] = []
    done: set[str] = set()
    pending = sorted(models, key=lambda m: m["name"])
    while pending:
        progress = [m for m in pending if deps[m["name"]] <= done]
        if not progress:
            raise ValueError(f"model dependency cycle: {[m['name'] for m in pending]}")
        for m in progress:
            ordered.append(m)
            done.add(m["name"])
        pending = [m for m in pending if m["name"] not in done]
    return ordered


def run_models(sess, model_dir: str, *, full_refresh: bool = False) -> list[str]:
    """Build every model in ``model_dir`` in dependency order.
    Returns the executed statements."""
    models = [
        parse_model(os.path.join(model_dir, f))
        for f in sorted(os.listdir(model_dir))
        if f.endswith(".sql")
    ]
    executed: list[str] = []
    for model in _topo_order(models):
        name = model["name"]
        exists = name in sess._lake_tables
        if model["materialized"] == "incremental" and exists and not full_refresh:
            body = render(model["sql"], is_incremental=True)
            stmt = f"INSERT INTO {name} {body}"
        else:
            if exists:
                sess.execute(f"DROP TABLE {name}")
            body = render(model["sql"], is_incremental=False)
            stmt = f"CREATE TABLE {name} AS {body}"
        sess.execute(stmt)
        executed.append(stmt.split("\n")[0])
    return executed


if __name__ == "__main__":
    from pg_lake_spark.session import LakeSession

    sess = LakeSession()
    sess.register_lake_table(
        "raw_orders", "/root/testdata/sf0.001/orders.parquet", fmt="parquet"
    )
    here = os.path.join(os.path.dirname(__file__), "models")
    for s in run_models(sess, here):
        print("ran:", s)
    print(sess.sql("SELECT count(*) AS days FROM orders_daily").collect())
