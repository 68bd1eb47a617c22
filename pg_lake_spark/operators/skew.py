"""Skew mitigation: salted joins.

AQE's skew-join splitting (on by default in the session) handles most
skew at runtime; salting is the explicit fallback for pathological keys
— e.g. a null-like sentinel holding 30% of a 100 TB fact table — where
even a split partition exceeds executor memory.

Design: the skewed (probe) side gets a deterministic salt in
[0, salt_factor); the build side replicates each row once per salt
value. The join key becomes (key, salt), spreading one hot key over
``salt_factor`` reducers at the cost of replicating the build side —
only acceptable when the build side is the smaller one, which is also
when it helps.

The salt must be DETERMINISTIC per row, not ``F.rand``: Spark
re-evaluates nondeterministic expressions on task retry, so a retried
task could re-bucket a row mid-join and, for outer joins, emit it
twice or drop it. Hashing only the join key would put every row of the
hot key in one bucket (no spread), and ``monotonically_increasing_id``
is itself retry-unstable — so the salt is ``xxhash64`` over ALL probe
columns plus the seed: a pure function of row content, stable across
retries, spreading a hot key's rows as uniformly as their non-key
content varies. Fully identical rows share a bucket; they are
indistinguishable, so co-locating them costs spread only when a hot
key is dominated by exact duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_pg_lake_salt"


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: list[str],
    *,
    salt_factor: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the skewed side salted and the build side
    replicated ``salt_factor``×. Result equals the plain join.

    Only join types where the build side's replication cannot surface
    are accepted: inner, left (outer), left_semi, left_anti. A right or
    full join would emit every UNMATCHED build row once per salt value
    — ``salt_factor`` phantom rows — so those are refused loudly rather
    than silently wrong."""
    how_norm = how.replace("_", "").lower()
    if how_norm not in {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the build side is "
            f"replicated {salt_factor}x, so right/full joins would emit "
            "unmatched build rows once per salt value. Salt the other side "
            "or use a plain join with AQE skew handling."
        )
    l = skewed.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*skewed.columns, F.lit(seed)), F.lit(salt_factor)).cast(
            "int"
        ),
    )
    r = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = l.join(r, on=[*on, _SALT], how=how)
    return out.drop(_SALT)
