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
    """Salt in [0, n) derived from the row's content hash PLUS a
    per-row disambiguator. Content hash alone would give identical
    duplicate rows of a hot key the same salt — defeating the
    mitigation exactly when hot-key rows are duplicates — so we mix in
    ``monotonically_increasing_id``. The join RESULT does not depend on
    which salt a row gets (every salt sees a full copy of the other
    side), so rerun-to-rerun salt variation is harmless."""
    h = F.xxhash64(*[F.col(c) for c in df.columns], F.monotonically_increasing_id())
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
    replicate ``other`` across all salts, join on keys+salt. For
    how='inner'/'left' the result is identical to the unsalted join;
    the hot key's rows now spread over ``n_salts`` reducers.

    how='right'/'full_outer' is rejected: every unmatched ``other`` row
    exists in all ``n_salts`` replicas and would be emitted n times
    (no matching salted row collapses the copies). Flip the argument
    order (salting is per-side) or use AQE skew-join for those shapes.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports how='inner'/'left'/'left_semi', got {how!r}: "
            "outer joins would emit unmatched replicated rows n_salts times"
        )
    s = with_salt(skewed, n_salts)
    o = replicate_for_salt(other, n_salts)
    joined = s.join(o, on=on + ["__salt"], how=how)
    return joined.drop("__salt")
