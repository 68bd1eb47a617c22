"""Training-data assembly operators: chunking, stratified sampling,
corpus mixing.

These complete the dataset-prep surface next to dedup/similarity/
textstats (SURVEY north-star: 'the operations a large-scale training-
data pipeline would need'). All three are pure Column expressions —
fully distributed, no UDFs, no driver loops — and every one is
deterministic (content-stable md5 ordering instead of RNG) so runs are
reproducible and oracle-checkable across engines.

Scale notes:
- chunk_documents: one generator explode per doc (n_chunks rows);
  output size is data-proportional and map-only — no shuffle at all.
- stratified_sample / mix_corpora: one window shuffle partitioned by
  the (low-cardinality) stratum key; skewed strata fall out to AQE.
  The md5 rank makes the selection a stable, content-addressed choice:
  re-running over a grown corpus keeps previously-selected rows only
  changing at the margin (md5 order is stable per id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pg_lake_spark.operators.textstats import words


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split each document into ``size``-char chunks with ``overlap``
    (the sliding-window chunking used for context-window packing and
    RAG indexing). Output: id_col, chunk_id (0-based), chunk, n_chunks.
    The final chunk may be shorter; every character is covered."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    # NULL text behaves like empty text (one empty chunk), matching
    # chunk_documents_tokens — unguarded, substring(NULL) emitted a
    # chunk=NULL row that downstream non-null consumers trip over
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.length(txt) - F.lit(overlap)) / F.lit(step))
    ).cast("int")
    return (
        docs.withColumn("n_chunks", n_chunks)
        .select(
            id_col,
            "n_chunks",
            F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
                "chunk_id", "_i"
            ),
            txt.alias("__t"),
        )
        .select(
            id_col,
            "chunk_id",
            F.expr(f"substring(__t, chunk_id * {step} + 1, {size})").alias("chunk"),
            "n_chunks",
        )
    )


def _md5_rank(id_col: str, stratum: str) -> Column:
    return F.row_number().over(
        Window.partitionBy(stratum).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )


def stratified_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Deterministic proportional sample: within each stratum keep the
    first ``ceil(fraction * stratum_size)`` rows in md5(id) order —
    every stratum is represented at the same rate (plain hash-filter
    sampling would under-represent small strata by variance)."""
    cnt = F.count(F.lit(1)).over(Window.partitionBy(stratum_col))
    keep = F.ceil(F.lit(float(fraction)) * cnt).cast("int")
    return (
        df.withColumn("__rk", _md5_rank(id_col, stratum_col))
        .withColumn("__keep", keep)
        .filter(F.col("__rk") <= F.col("__keep"))
        .drop("__rk", "__keep")
    )


def mix_corpora(
    df: DataFrame,
    *,
    source_col: str,
    weights: dict[str, float],
    target_rows: int,
    id_col: str,
) -> DataFrame:
    """Compose a fixed-size training mix: source ``s`` contributes
    ``round(weights[s] * target_rows)`` rows, chosen deterministically
    in md5(id) order (the interleaving/mixture step of pretraining
    dataset assembly — weights are the mixture proportions). Sources
    absent from ``weights`` contribute nothing; a source with fewer
    rows than its quota contributes everything it has."""
    expr = None
    for s, w in weights.items():
        q = int(round(w * target_rows))
        expr = (
            F.when(F.col(source_col) == s, q)
            if expr is None
            else expr.when(F.col(source_col) == s, q)
        )
    quota = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    return (
        df.withColumn("__rk", _md5_rank(id_col, source_col))
        .filter(F.col("__rk") <= quota)
        .drop("__rk")
    )


def chunk_documents_tokens(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Token-window chunking (whitespace tokens): the unit LLM context
    budgets are denominated in. Same coverage contract as the char
    variant — every token appears in some chunk, consecutive chunks
    overlap by ``overlap`` tokens — built from split + slice + array_join
    (map-only, no UDF, no shuffle)."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    # NULL text behaves like empty text (0 tokens, one empty chunk) —
    # unguarded, NULL propagates through size() but greatest/least SKIP
    # NULLs, so a NULL doc reported n_tokens = full `size` (phantom
    # tokens that inflate token-budgeted shard assignment downstream)
    toks = words(F.coalesce(F.col(text_col), F.lit("")))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(step))
    ).cast("int")
    return (
        docs.select(
            id_col,
            toks.alias("__toks"),
            n_chunks.alias("n_chunks"),
        )
        .select(
            id_col,
            "n_chunks",
            F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
                "chunk_id", "_i"
            ),
            "__toks",
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_id") * step + 1, size), " "
            ).alias("chunk"),
            F.least(
                F.lit(size),
                F.size("__toks") - F.col("chunk_id") * step,
            ).alias("n_tokens"),
            "n_chunks",
        )
    )


def temperature_mix(
    df: DataFrame,
    *,
    source_col: str,
    temperature: float,
    target_rows: int,
    id_col: str,
) -> DataFrame:
    """Temperature-scaled corpus mixing (the mT5/XLM-R multilingual
    sampling rule): source ``s`` with ``n_s`` rows gets sampling weight
    ``n_s^(1/T) / sum_s n_s^(1/T)`` — T=1 is proportional, T>1 flattens
    the distribution toward uniform (upweighting low-resource sources),
    T→inf is uniform. The derived weights feed :func:`mix_corpora`, so
    row choice stays deterministic (md5(id) order per source).

    Scale: one count aggregate collected to the driver — O(#sources)
    rows, a bounded reduction — then a single window-filter pass.
    """
    if temperature <= 0:
        raise ValueError(
            f"temperature must be > 0, got {temperature} (T=1 proportional, "
            "T>1 flattens toward uniform; T<=0 would invert the rule)"
        )
    # NULL sources are excluded from the mixture entirely: mix_corpora
    # selects by `source == s`, which a NULL key can never satisfy, so
    # counting NULLs into the denominator only dilutes every real
    # source's quota and underfills the mix (r15 review).
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    alpha = 1.0 / float(temperature)
    total = sum(n ** alpha for n in counts.values())
    weights = {s: (n ** alpha) / total for s, n in counts.items()}
    return mix_corpora(
        df,
        source_col=source_col,
        weights=weights,
        target_rows=target_rows,
        id_col=id_col,
    )
