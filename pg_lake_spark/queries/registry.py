"""Query registry machinery (see package docstring)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None → rows-only check
    doc: str = ""


#: name → QuerySpec; populated via the @query decorator at import time.
QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a declared query.

    ``oracle`` is ANSI/DuckDB SQL over views ``region nation customer
    supplier part orders lineitem events documents embeddings``. Column
    aliases MUST match the Spark DataFrame's column names exactly (the
    driver's comparator sorts columns by name before hashing).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
