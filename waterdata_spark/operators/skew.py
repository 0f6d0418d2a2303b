"""Skew mitigation (SURVEY.md §4 physical design: "salting only if a
PWSID hot key emerges").

AQE's skew-join (on in the session factory) handles most skew at
runtime by splitting oversized partitions. Salting is the explicit
fallback for the cases AQE can't fix — e.g. a shuffle-hash aggregate
on a hot key, or a join where BOTH sides are large and one key
dominates (AQE splits the skewed side but still routes every matching
row of the other side to those splits).

``salted_join`` implements the classic recipe: append a salt in
[0, n) to the skewed side's key, replicate the other side n times
(one copy per salt value), join on (key, salt). Cost: the small side
is scanned/shuffled n× — so pick n ≈ (hot-key rows / target
partition rows), not a big constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, salt_col: str = "__salt") -> DataFrame:
    """Random-but-deterministic salt in [0, n) derived from the row's
    whole content hash (no rand(): keeps reruns identical)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(salt_col, F.pmod(h, F.lit(n)).cast("int"))


def replicate_for_salt(df: DataFrame, n: int, salt_col: str = "__salt") -> DataFrame:
    """One copy of every row per salt value (the build side of a
    salted join)."""
    return df.withColumn(salt_col, F.explode(F.array(*[F.lit(i) for i in range(n)])))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side,
    replicate ``other`` across all salts, join on keys+salt. Result is
    identical to the unsalted join; the hot key's rows now spread over
    ``n_salts`` reducers."""
    s = with_salt(skewed, n_salts)
    o = replicate_for_salt(other, n_salts)
    return s.join(o, on=on + ["__salt"], how=how).drop("__salt")
