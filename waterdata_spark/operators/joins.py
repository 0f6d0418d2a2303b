"""Join helpers (SURVEY.md C16-C18).

pandas ``merge`` auto-suffixes colliding non-key columns; Spark
instead errors on ambiguous references. ``suffixed_join`` reproduces
the pandas contract declaratively: rename the right side's colliding
payload columns before the join, so downstream coalesce/consistency
operators (C14/C42) can reference ``X`` and ``X_y`` by name —
matching the reference's post-join column handling
(down/down_water_prep.py:296,302,307-313).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suffixed_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    suffix: str = "_y",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join on shared key names; right-side payload columns that
    collide with left-side names get ``suffix`` appended."""
    collisions = [c for c in right.columns if c in left.columns and c not in on]
    renamed = right
    for c in collisions:
        renamed = renamed.withColumnRenamed(c, c + suffix)
    if broadcast_right:
        renamed = F.broadcast(renamed)
    return left.join(renamed, on=on, how=how)
