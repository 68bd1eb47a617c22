"""MinHash-estimate gate recall telemetry (operators/dedup.lsh_candidate_pairs).

The ``est_gate`` option drops LSH candidate pairs whose signature-
estimated Jaccard is noisy-low before the exact shingle-verify runs.
The verdict/advisor contract for shipping it on the bench path is a
MEASURED claim, not an argument: on the bench corpus, the gated output
must equal the ungated output exactly (false-drop = 0). These tests pin
that, and pin the opt-in default (gate off unless asked).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_lake_spark.operators.dedup import lsh_candidate_pairs

SF_DIR = "/root/testdata/sf0.01"


def _pairs(spark, est_gate):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return lsh_candidate_pairs(
        docs, "doc_id", "text",
        shingle_n=2, num_hashes=12, bands=4, threshold=0.3, est_gate=est_gate,
    )


def test_auto_gate_false_drop_is_zero(spark):
    """Every pair the ungated (pure candidates-then-exact-verify) path
    emits survives the auto gate — on this corpus the gate is
    recall-exact, so the bench row may ship with est_gate='auto'."""
    ungated = {(r.id_a, r.id_b) for r in _pairs(spark, None).collect()}
    gated = {(r.id_a, r.id_b) for r in _pairs(spark, "auto").collect()}
    false_drops = ungated - gated
    assert false_drops == set(), f"gate dropped true pairs: {sorted(false_drops)[:10]}"
    # the gate must never ADD pairs either (it only filters candidates)
    assert gated == ungated


def test_gate_default_is_off(spark):
    """Library default = None: a tiny corpus where a noisy-low estimate
    COULD gate out a true pair must come back complete by default.

    Two docs sharing exactly half their shingles sit at jaccard 0.5 —
    above a 0.3 threshold but below the banding midpoint (~0.54), the
    regime the advisor flagged; the default path must verify them."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon foo bar baz qux quux"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id bigint, text string")
    # 12 single-row bands: the pair is a candidate iff ANY of the 12
    # MinHash components agree — for jaccard 1/3 that's all but certain
    # (and deterministic here: the hash family is fixed).
    kw = dict(shingle_n=1, num_hashes=12, bands=12, threshold=0.3)
    rows = lsh_candidate_pairs(df, "doc_id", "text", **kw).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert abs(rows[0].jaccard - 1 / 3) < 1e-9  # 5 shared / 15 union
    # ...while an aggressive explicit gate drops the same candidate
    # before verify (its signature agreement sits near 1/3, not 0.9) —
    # exactly the silent-loss mode that makes the gate opt-in.
    gated = lsh_candidate_pairs(df, "doc_id", "text", est_gate=0.9, **kw)
    assert gated.count() == 0


def test_explicit_float_gate_filters_estimates(spark):
    """A gate of 1.0 keeps only pairs whose FULL signature agrees —
    near-identical docs — proving the gate actually gates."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    strict = lsh_candidate_pairs(
        docs, "doc_id", "text",
        shingle_n=2, num_hashes=12, bands=4, threshold=0.3, est_gate=1.0,
    )
    loose = _pairs(spark, None)
    n_strict, n_loose = strict.count(), loose.count()
    assert n_strict <= n_loose
    # every strict survivor is a true near-dup from the loose set
    loose_pairs = {(r.id_a, r.id_b) for r in loose.collect()}
    assert {(r.id_a, r.id_b) for r in strict.collect()} <= loose_pairs
