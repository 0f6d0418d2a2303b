"""Deduplication operators (SURVEY.md §2.4: C22-C24; extension X1).

The reference's "keep best row per key" is a sort + drop_duplicates
(down/down_water_prep.py:498-501), which relies on pandas' stable
sort. In a distributed engine that recipe is nondeterministic, so the
engine's canonical form is an explicit row_number window — same
result on one core or a thousand executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def priority_dedup(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
    rn_col: str = "__rn",
) -> DataFrame:
    """C22: keep exactly one row per key — the first under ``order_by``.

    Reference: sort desc by tiebreak, then drop_duplicates(subset=keys)
    keeping first (down/down_water_prep.py:498-501). Spark mapping:
    row_number over Window.partitionBy(keys).orderBy(order_by), keep
    rn==1. Deterministic iff order_by is a total order within each key
    group — callers should append a unique column as final tiebreak.

    Scale: one shuffle on ``keys``; AQE handles skewed keys. No
    collect, no sort of the full table (window sorts per partition
    group only).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col)
    )


def dedup_any(df: DataFrame, keys: list[str]) -> DataFrame:
    """C24: "any one row per key" — the reference documents the kept
    row as arbitrary (direct/direct_water_prep.py:130,144-145). Spark's
    dropDuplicates has exactly those semantics. For oracle tests use
    priority_dedup instead (pinned deterministic)."""
    return df.dropDuplicates(keys)


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """X1: exact content dedup at scale — keep the row with the lowest
    id per distinct content. groupBy(content)+min(id) then semi-join
    back would shuffle twice; a window does it in one shuffle on a
    hash of the content (cheap fixed-width shuffle key even for long
    text)."""
    h = F.sha2(F.concat_ws("", *[F.col(c).cast("string") for c in content_cols]), 256)
    df = df.withColumn("__h", h)
    out = priority_dedup(df, ["__h"], [F.col(id_col).asc()])
    return out.drop("__h")
