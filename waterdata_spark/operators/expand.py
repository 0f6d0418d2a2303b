"""Key-expansion operator (SURVEY.md C21).

The reference duplicates dim rows — once with LOC_EPID=EPID, once
with LOC_EPID=SPID — via copy+concat (direct/direct_water_prep.py:
107-119) so a single join column covers two source keys. Idiomatic
Spark is ``stack``/``explode``: one narrow (no-shuffle) operator
instead of a self-union that scans the input twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_keys(
    df: DataFrame,
    key_cols: list[str],
    out_col: str,
    label_col: str | None = None,
) -> DataFrame:
    """Emit one row per (input row × key column), with the key value in
    ``out_col`` and optionally the originating column name in
    ``label_col``.

    expand_keys(dim, ["EPID","SPID"], "LOC_EPID") reproduces
    direct/direct_water_prep.py:107-119 without the double scan.
    """
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("__k"), F.col(k).cast("string").alias("__v"))
            for k in key_cols
        ]
    )
    exploded = df.withColumn("__kv", F.explode(pairs))
    out = exploded.withColumn(out_col, F.col("__kv.__v"))
    if label_col:
        out = out.withColumn(label_col, F.col("__kv.__k"))
    return out.drop("__kv")
