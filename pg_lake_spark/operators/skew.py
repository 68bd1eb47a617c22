"""Skew mitigation: salted joins.

AQE's skew-join splitting (on by default in the session) handles most
skew at runtime; salting is the explicit fallback for pathological keys
— e.g. a null-like sentinel holding 30% of a 100 TB fact table — where
even a split partition exceeds executor memory.

Design: the skewed (probe) side gets a uniform random salt in
[0, salt_factor); the build side replicates each row once per salt
value. The join key becomes (key, salt), spreading one hot key over
``salt_factor`` reducers at the cost of replicating the build side —
only acceptable when the build side is the smaller one, which is also
when it helps.
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
    replicated ``salt_factor``×. Result equals the plain join."""
    l = skewed.withColumn(_SALT, (F.rand(seed) * salt_factor).cast("int"))
    r = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = l.join(r, on=[*on, _SALT], how=how)
    return out.drop(_SALT)
