"""Distributed Bloom-filter membership (cross-corpus dedup prefilter).

A 100 TB training-data pipeline repeatedly asks "which of these new
documents already exist in corpus A?" — an exact semi join shuffles
both corpora on the join key. A Bloom filter built over A turns that
into a map-side prefilter: only the (tiny) candidate set reaches the
exact join. Spark's SQL surface does not expose ``bloom_filter_agg``/
``might_contain`` (they are internal to runtime row-level filtering),
so this module builds the filter with plain expressions:

- **build**: k positions per key via ``xxhash64(key, seed_i) mod m``,
  packed into ``m/64`` longs by ``groupBy(pos >> 6).agg(bit_or(1 <<
  (pos & 63)))`` — the filter IS a DataFrame of (word, bits) rows, so
  construction is one map-side-combined aggregation and the filter
  never materializes on the driver.
- **probe**: each probe key explodes to its k (word, bit) pairs, joins
  the (broadcast) filter words, and counts set bits == k. No false
  negatives; false-positive rate is the standard
  ``(1 - e^(-k*n/m))^k``.

Everything is JVM-side Column arithmetic — no UDFs — so whole-stage
codegen applies end to end.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` at false-positive rate
    ``fpp`` — the textbook m = -n ln p / ln2², k = (m/n) ln2."""
    m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) & ~63  # whole words
    k = max(1, round(m / n_items * math.log(2))) if n_items else 1
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a key (independent seeded hashes)."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )


def build_bloom(df: DataFrame, key: str | Column, m_bits: int, k: int) -> DataFrame:
    """Bloom filter over ``df[key]`` as a (word long, bits long)
    DataFrame with at most m_bits/64 rows. One shuffle (partial
    bit_or map-side)."""
    key = F.col(key) if isinstance(key, str) else key
    pos = F.explode(_positions(key, m_bits, k)).alias("__pos")
    return (
        df.select(pos)
        .select(
            (F.col("__pos") / 64).cast("long").alias("word"),
            # F.shiftleft only takes a literal shift; the SQL form shifts
            # by a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
                "__bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def bloom_filter_maybe(
    probe: DataFrame,
    key: str | Column,
    bloom: DataFrame,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Rows of ``probe`` that MIGHT be members (no false negatives).

    The DISTINCT probe keys explode to k (word, bit) lookups against
    the broadcast filter; a key survives iff all k bits are set, and
    the surviving key set semi-joins back to the probe. Keyed on the
    probe value itself — NOT a generated row id — so the two
    evaluations of the probe plan (lookup side and output side) cannot
    disagree after a shuffle or task retry: identical keys hash to
    identical positions by construction, preserving the
    no-false-negatives contract. Deduping keys first also shrinks the
    lookup explode from k*|probe| to k*|distinct keys|. Adds no
    columns; preserves probe's schema.
    """
    key = F.col(key) if isinstance(key, str) else key
    keys = probe.select(key.alias("__key")).distinct()
    lookups = keys.select(
        "__key", F.explode(_positions(F.col("__key"), m_bits, k)).alias("__pos")
    ).select(
        "__key",
        (F.col("__pos") / 64).cast("long").alias("word"),
        (F.col("__pos") % 64).cast("int").alias("__bit"),
    )
    hit_keys = (
        lookups.join(F.broadcast(bloom), "word")
        .filter(F.expr("(shiftright(bits, __bit) & 1) = 1"))
        .groupBy("__key")
        .agg(F.count("*").alias("__nset"))
        .filter(F.col("__nset") == k)
        .select("__key")
    )
    # Bloom-positive keys are true matches + ~fpp noise — small by the
    # same assumption that makes the prefilter worthwhile — so the
    # semi join broadcasts and the probe side never shuffles.
    return probe.join(
        F.broadcast(hit_keys), key.eqNullSafe(F.col("__key")), "left_semi"
    )


def bloom_semi_join(
    probe: DataFrame,
    corpus: DataFrame,
    key: str,
    n_estimate: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT semi join of probe against corpus on ``key``, accelerated
    by a Bloom prefilter: only bloom-positive probe rows (true matches
    + ~fpp false positives) reach the exact join, so the big shuffle
    moves a fraction of the probe side. Equivalent to
    ``probe.join(corpus, key, "left_semi")``."""
    if n_estimate is None:
        n_estimate = corpus.count()
    m, k = bloom_params(n_estimate, fpp)
    bloom = build_bloom(corpus, key, m, k)
    maybe = bloom_filter_maybe(probe, key, bloom, m, k)
    return maybe.join(corpus.select(key).distinct(), key, "left_semi")


# ---------------------------------------------------------------------------
# Count-min frequency sketch (heavy-hitter estimation)
# ---------------------------------------------------------------------------

def _cm_cells(key: Column, width: int, depth: int) -> Column:
    """The count-min (row, col) cell coordinates for a key — ONE
    definition shared by build and probe: the sketch is only correct
    when both compute byte-identical xxhash64/pmod coordinates, and the
    two hand-synced copies were the exact build/probe drift hazard
    _positions() exists to prevent for the Bloom filter (r15 review)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("row"),
                    F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width)).alias("col"),
                )
                for d in range(depth)
            ]
        )
    )


def build_count_min(
    df: DataFrame, key: str | Column, *, width: int = 2048, depth: int = 5
) -> DataFrame:
    """Count-min sketch over ``df[key]`` as a (row, col, n) DataFrame
    with at most depth*width cells — the frequency companion to the
    Bloom filter above (same seeded-hash explode + one aggregation;
    mergeable across corpora by summing cell counts). Standard CMS
    guarantee: estimate >= true count, overestimate <= 2N/width with
    probability 1 - 2^-depth."""
    key = F.col(key) if isinstance(key, str) else key
    cells = df.select(_cm_cells(key, width, depth).alias("c"))
    return (
        cells.select("c.row", "c.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_estimate(
    probe: DataFrame, key: str | Column, sketch: DataFrame, *,
    width: int = 2048, depth: int = 5, out_col: str = "est_count"
) -> DataFrame:
    """Point-frequency estimates for probe keys: min over the key's
    depth cells (broadcast join against the sketch; absent cells read
    as 0)."""
    key_col = F.col(key) if isinstance(key, str) else key
    lookups = probe.select(
        key_col.alias("__key"), _cm_cells(key_col, width, depth).alias("c")
    ).select("__key", "c.row", "c.col")
    est = (
        lookups.join(F.broadcast(sketch), ["row", "col"], "left")
        .fillna(0, subset=["n"])
        .groupBy("__key")
        .agg(F.min("n").alias(out_col))
    )
    return est.withColumnRenamed("__key", key if isinstance(key, str) else "key")
