"""Streaming MinHash-LSH near-duplicate candidates.

The batch LSH pipeline (operators/dedup.lsh_candidate_pairs) buckets
signatures with a groupBy — on a stream that becomes a KEYED STATEFUL
operator: each (band, bucket) bucket remembers the doc ids it has seen
and every arriving doc emits a candidate pair against each of them
(``applyInPandasWithState`` — the engine's custom-stateful-operator
surface, same as the running-totals query). Since r16 the operator is
keyed on a coarse hash of the bucket (``state_groups`` groups), each
state row holding its buckets' id lists as a dict — per-bucket
semantics unchanged, per-group fixed costs amortized
(see _make_emit_pairs).

Signature parity is exact: :func:`streaming_band_keys` computes the
SAME values as the batch ``minhash_signature_agg`` (xxhash64 folded to
32 bits, linear-permutation family (2i+1)·h + (7919i+1) mod p) but as
a pure ``transform``/``array_min`` expression — map-only, so it runs
on an unbounded stream with no aggregation state. Identical signatures
→ identical buckets → the streaming candidates equal the batch
candidates, and the batch query's exact-Jaccard oracle transfers.

Scale: the banding shuffle is the same short-key exchange as batch;
per-bucket state is the id list (bounded by bucket size — the same
quantity the batch self-join materializes). State never expires here
(dedup against ALL history is the point); production would add a
TTL/timeout for bounded retention.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pg_lake_spark.operators.dedup import word_shingles

_P = 4294967311  # smallest prime > 2^32 (matches minhash_signature_agg)
_FOLD = 4294967296


def streaming_band_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(_id, band, bucket) rows — expression-only (stream-safe) with
    batch-identical signature values."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}): leftover signature components would be silently "
            "excluded from banding (same contract as the batch "
            "lsh_candidate_pairs, which also refuses)"
        )
    rows_per_band = num_hashes // bands
    shingles = word_shingles(text_col, shingle_n)
    # Batch parity for degenerate docs: minhash_signature_agg EXPLODES
    # the shingle array, so NULL/too-short text contributes no rows.
    # Unfiltered here, every such doc would get an all-NULL signature
    # and concat_ws (which SKIPS nulls) would funnel them all into one
    # md5('') mega-bucket per band — O(n²) spurious pairs and unbounded
    # state growth for null-text corpora.
    df = df.where(F.size(shingles) > 0)

    # Signature as ONE fold (r16 opt, guide §4.1): the previous spelling
    # — num_hashes separate array_min(transform(shingles, hash_i)) trees
    # — re-built the shingle array and re-ran xxhash64 over it once PER
    # HASH after CollapseProject inlined the shared subexpression
    # (higher-order lambdas are CodegenFallback: interpreted and outside
    # common-subexpression elimination). Here each shingle is hashed
    # once, and a single aggregate() fold carries the running
    # elementwise minimum of the k affine permutations. Identical
    # values by construction: exact integer arithmetic, and min is
    # order-insensitive (measured 5.2s -> 1.4s over the sf0.1 corpus,
    # exceptAll-equal both ways).
    hashed = F.transform(
        shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_FOLD)).cast("bigint")
    )
    init = F.array(*[F.lit(_P).cast("bigint") for _ in range(num_hashes)])

    def affines(h):
        # the same linear-permutation family as minhash_signature_agg:
        # h_i(x) = (2i+1)·x + (7919i+1) mod P
        return F.array(
            *[
                (F.lit(2 * i + 1) * h + F.lit(7919 * i + 1)) % F.lit(_P)
                for i in range(num_hashes)
            ]
        )

    sig = F.aggregate(
        hashed, init, lambda acc, h: F.zip_with(acc, affines(h), lambda a, b: F.least(a, b))
    )
    signed = df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
    return signed.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("_sig", i + 1).cast("string")
                                    for i in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")


def _make_emit_pairs(max_bucket_size: int | None):
    """Pair emitter for a COARSE state group holding many (band,
    bucket) buckets (r16 opt, guide §4.2): keying the stateful
    operator on every individual bucket paid applyInPandasWithState's
    per-group fixed cost (pandas frame build + state get/update)
    ~20k times per micro-batch at sf0.1 — the dominant term of the
    drain. One state row per coarse group instead holds a
    bucket -> id-list dict (two parallel arrays in the state schema),
    and the per-bucket semantics are evaluated row-by-row inside it,
    unchanged: once a bucket has max_bucket_size members, later
    arrivals neither emit pairs nor grow its state — the streaming
    analogue of the batch _cap_buckets sub-sample (state stays
    bounded; a degenerate mega-bucket of identical boilerplate cannot
    make per-batch work quadratic). Identical documents are the
    exact-dedup stage's job."""

    def _emit_pairs(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bks, idls = state.get
            seen: dict[str, list[int]] = {b: list(l) for b, l in zip(bks, idls)}
        else:
            seen = {}
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for _id, bkey in zip(pdf["_id"], pdf["_bk"]):
                s = seen.get(bkey)
                if s is None:
                    s = seen[bkey] = []
                if max_bucket_size is not None and len(s) >= max_bucket_size:
                    continue
                _id = int(_id)
                if _id in s:
                    continue
                for other in s:
                    out_a.append(min(_id, other))
                    out_b.append(max(_id, other))
                s.append(_id)
        state.update((list(seen.keys()), list(seen.values())))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return _emit_pairs


def stream_lsh_candidates(
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_size: int | None = 5000,
    state_groups: int = 256,
) -> DataFrame:
    """Streaming candidate-pair DataFrame (id_a < id_b; a pair may
    surface from several bands — distinct() downstream, exactly like
    the batch pipeline's candidate stage). ``max_bucket_size`` bounds
    each bucket's state and pair fan-out (see _make_emit_pairs).

    ``state_groups`` (r16 opt): the stateful operator is keyed on a
    hash of (band, bucket) into this many coarse groups, not on each
    bucket — per-group fixed cost amortizes across the ~hundreds of
    buckets a group holds, while each bucket's emit/cap semantics are
    preserved inside the group (measured drain 15.8s -> 2.8s at
    sf0.1; pair set exceptAll-equal).

    HARD REQUIREMENT at scale (r16 ADVICE): a state row holds ALL of
    its group's buckets, so with the library default of 256 the
    per-row state grows ~(bands·n_docs)/256 id-list entries —
    unbounded in the corpus. Callers MUST scale it ~(bands·n_docs)/
    2048 (parquet footer row counts make this free — see
    st_stream_lsh_neardup) so a state row stays a few thousand
    entries no matter the corpus; the key space is fixed at stream
    start, so the operator cannot derive it from the first
    micro-batch itself. The value only trades group count against
    state-row size, never results."""
    banded = streaming_band_keys(
        stream_df, id_col, text_col,
        shingle_n=shingle_n, num_hashes=num_hashes, bands=bands,
    )
    # one string key per bucket: band is already baked into which md5
    # the bucket came from, but two bands CAN collide on the same md5
    # only via identical sub-signatures — keep the band prefix so the
    # coarse dict key equals the old (band, bucket) group key exactly
    keyed = banded.select(
        "_id",
        F.concat_ws("#", F.col("band").cast("string"), F.col("bucket")).alias("_bk"),
    ).withColumn("_grp", F.pmod(F.xxhash64(F.col("_bk")), F.lit(state_groups)))
    return keyed.groupBy("_grp").applyInPandasWithState(
        _make_emit_pairs(max_bucket_size),
        outputStructType="id_a long, id_b long",
        stateStructType="buckets array<string>, ids array<array<long>>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
