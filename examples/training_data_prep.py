"""End-to-end training-data preparation pipeline.

The composed workflow a pre-training data run actually executes, built
entirely from this repo's operators — the beyond-reference surface
(SURVEY.md Phase 5) exercised as ONE pipeline rather than as isolated
queries:

    raw documents
      1. dedup        exact -> canonical-URL -> MinHash-LSH clusters
                      (operators.dedup.dedupe_corpus)
      2. quality      Gopher-rule keep mask + language ID
                      (operators.textstats)
      3. decontam     8-gram overlap vs an eval set
                      (operators.dedup.decontaminate_flags)
      4. mix          temperature-scaled source mixing (mT5/XLM-R rule)
                      (operators.chunking.temperature_mix)
      5. shard        deterministic token-budget shards
                      (operators.sharding.write_training_shards)

Every stage is a hash-partitioned aggregate, a banded-LSH path, or a
pure Column expression — no driver-side data beyond O(#sources)
weights and the O(#shards) manifest, so the same code runs at 100 TB.

Run: python examples/training_data_prep.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys


def prepare_corpus(spark, sf_dir: str, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from pg_lake_spark.operators import dedup
    from pg_lake_spark.operators.chunking import temperature_mix
    from pg_lake_spark.operators.sharding import write_training_shards
    from pg_lake_spark.operators.textstats import (
        gopher_keep,
        lang_id,
        token_count_bpe_ish,
    )
    from pg_lake_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    report: dict = {"input_rows": docs.count()}

    # 1. dedup: exact -> LSH near-dup survivors (one call, staged in
    # the scale-correct order: cheap hash dedup first so LSH sees only
    # distinct content)
    clean, dd_report = dedup.dedupe_corpus(
        docs, "doc_id", "text", near_dup=True, threshold=0.8, shingle_n=3
    )
    report["dedup"] = dd_report

    # 1b. exact-substring signal (Lee et al.): surface the corpus'
    # maximal repeated >=8-token spans for audit — at production scale
    # this list drives span-level removal; here it rides the report.
    spans = dedup.maximal_repeated_spans(
        clean, "doc_id", "text", window=8, min_docs=2
    )
    report["repeated_span_islands"] = spans.count()

    # 2. quality + language: pure Column expressions, zero Python —
    # plus the unigram-surprisal perplexity proxy (CCNet-style): drop
    # the extreme tails (boilerplate at the bottom, noise at the top).
    from pg_lake_spark.operators.textstats import unigram_surprisal

    surp = unigram_surprisal(clean, "doc_id", "text").select(
        "doc_id", "surprisal"
    )
    scored = clean.join(surp, "doc_id").select(
        "*",
        lang_id("text").alias("lang_pred"),
        gopher_keep("text").alias("quality_keep"),
        token_count_bpe_ish("text").cast("bigint").alias("n_tokens"),
    )
    bounds = scored.agg(
        F.expr("percentile_approx(surprisal, 0.02)").alias("lo"),
        F.expr("percentile_approx(surprisal, 0.98)").alias("hi"),
    ).collect()[0]
    kept = scored.filter(
        F.col("quality_keep")
        & F.col("surprisal").between(bounds.lo, bounds.hi)
    )
    report["quality_dropped"] = report["dedup"]["output_rows"] - kept.count()

    # 3. decontamination vs a held-out eval set (here: a deterministic
    # slice standing in for the benchmark suite; in production this is
    # the eval corpus). Broadcast equi-join on 8-gram shingles.
    evalset = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    flags = dedup.decontaminate_flags(
        kept, evalset, id_col="doc_id", text_col="text", shingle_n=8
    )
    kept = kept.join(flags.filter(~F.col("contaminated")), "doc_id", "left_semi")
    report["decontaminated_rows"] = kept.count()

    # 4. temperature mixing across sources (T=2 flattens toward
    # uniform, upweighting low-resource sources — the mT5 rule)
    target = max(report["decontaminated_rows"] // 2, 1)
    mixed = temperature_mix(
        kept, source_col="source", temperature=2.0, target_rows=target,
        id_col="doc_id",
    )
    report["mixed_rows"] = mixed.count()

    # 5. deterministic token-budget shards (two-pass global index; the
    # manifest is the only driver-side artifact)
    manifest = write_training_shards(
        mixed.select("doc_id", "text", "lang_pred", "source", "n_tokens"),
        os.path.join(out_dir, "shards"),
        order_by=["doc_id"],
        token_col="n_tokens",
        tokens_per_shard=50_000,
    )
    report["shards"] = len(manifest)
    return report


def main() -> None:
    from pg_lake_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_prep_out"
    spark = get_spark(app_name="training-data-prep", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    report = prepare_corpus(spark, sf_dir, out_dir)
    print(json.dumps(report, indent=1, default=str))


if __name__ == "__main__":
    main()
