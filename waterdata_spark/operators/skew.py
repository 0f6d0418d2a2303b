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


def with_salt(
    df: DataFrame, n: int, salt_col: str = "__salt", unique_rows: bool = False
) -> DataFrame:
    """Salt in [0, n) derived from the row's content hash.

    Default: content hash ONLY — the salt is a pure function of the
    row, stable across reruns and task retries, so callers may persist
    it, diff it, or depend on it downstream. (The previous default
    mixed in ``monotonically_increasing_id``, which is partition-order
    dependent — rerun- and retry-unstable for any caller outside
    ``salted_join``; VERDICT r3 #4.)

    ``unique_rows=True`` additionally mixes a per-row disambiguator so
    IDENTICAL duplicate rows of a hot key spread across salts instead
    of all hashing to one — the right setting inside ``salted_join``,
    where the join result provably does not depend on which salt a row
    gets (every salt sees a full copy of the other side)."""
    cols = [F.col(c) for c in df.columns]
    if unique_rows:
        cols.append(F.monotonically_increasing_id())
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int"))


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
    s = with_salt(skewed, n_salts, unique_rows=True)
    o = replicate_for_salt(other, n_salts)
    joined = s.join(o, on=on + ["__salt"], how=how)
    return joined.drop("__salt")
