"""Streaming MinHash-LSH near-duplicate candidates.

The batch LSH pipeline (operators/dedup.lsh_candidate_pairs) buckets
signatures with a groupBy — on a stream that becomes a KEYED STATEFUL
operator: each (band, bucket) key remembers the doc ids it has seen
and every arriving doc emits a candidate pair against each of them
(``applyInPandasWithState`` — the engine's custom-stateful-operator
surface, same as the running-totals query).

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

    def hasher(i: int):
        return lambda s: (
            F.lit(2 * i + 1) * F.pmod(F.xxhash64(s), F.lit(_FOLD)).cast("bigint")
            + F.lit(7919 * i + 1)
        ) % F.lit(_P)

    sigs = [
        F.array_min(F.transform(shingles, hasher(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    signed = df.select(F.col(id_col).alias("_id"), *sigs)
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
                                    f"_h{i}"
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
    """Per-bucket pair emitter with a width cap: once a bucket has
    max_bucket_size members, later arrivals neither emit pairs nor grow
    the state — the streaming analogue of the batch _cap_buckets
    sub-sample (state stays bounded; a degenerate mega-bucket of
    identical boilerplate cannot make per-batch work quadratic).
    Identical documents are the exact-dedup stage's job."""

    def _emit_pairs(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: list[int] = list(state.get[0]) if state.exists else []
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for _id in pdf["_id"]:
                if max_bucket_size is not None and len(seen) >= max_bucket_size:
                    break
                _id = int(_id)
                if _id in seen:
                    continue
                for other in seen:
                    out_a.append(min(_id, other))
                    out_b.append(max(_id, other))
                seen.append(_id)
        state.update((seen,))
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
) -> DataFrame:
    """Streaming candidate-pair DataFrame (id_a < id_b; a pair may
    surface from several bands — distinct() downstream, exactly like
    the batch pipeline's candidate stage). ``max_bucket_size`` bounds
    each bucket's state and pair fan-out (see _make_emit_pairs)."""
    banded = streaming_band_keys(
        stream_df, id_col, text_col,
        shingle_n=shingle_n, num_hashes=num_hashes, bands=bands,
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_emit_pairs(max_bucket_size),
        outputStructType="id_a long, id_b long",
        stateStructType="ids array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
