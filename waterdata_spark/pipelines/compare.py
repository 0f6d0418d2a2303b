"""Cross-channel reconciliation (SURVEY.md §3, entry point 3).

Reference: ``python compare.py`` (compare.py:22-109) — the two
independently-derived products are conformed to a common schema and
inner-joined on 7 keys; the joined rows are the end-to-end evidence
that both acquisition channels agree (§5.3: "a golden-output test
where the golden data is a second acquisition channel").

Scale: both sides are facts; the 7-key equi-join shuffles on a
composite key whose leading component (PWSID) has ~160 distinct
values in the reference data → salt-or-AQE territory at real scale.
AQE skew-join (on in the session factory) handles it without manual
salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waterdata_spark.functions.cleaning import parse_us_date
from waterdata_spark.operators.joins import suffixed_join

JOIN_KEYS = [
    "PWSID",
    "Contaminant ID",
    "SYSTEM NAME",
    "Sample Date",
    "Analysis Date",
    "SAMPTYPE",
    "LOC_EPID",
]

DIRECT_RENAMES = {
    "CONTNAM": "Contaminant ID",
    "SAMPDATE": "Sample Date",
    "ANALDATE": "Analysis Date",
    "SYSNAME": "SYSTEM NAME",
}


def conform_down(down_df: DataFrame, compat_date_default: bool = True) -> DataFrame:
    """Conform the 'down' product to the comparison schema
    (compare.py:46-69)."""
    df = (
        down_df.withColumn("PWSID", F.col("PWSID").cast("long"))
        .withColumn("SYSTEM NAME", F.trim("SYSTEM NAME"))
        .withColumn("Contaminant ID", F.trim("Contaminant ID"))
        # dates carry embedded spaces from PDF extraction (compare.py:59)
        .withColumn("Sample Date", parse_us_date("Sample Date"))
        # sentinel analysis dates → 1/9/1999 under compat (compare.py:63)
        .withColumn("Analysis Date", parse_us_date("Analysis Date", compat_date_default=compat_date_default))
        # sample-type code = first char (compare.py:67)
        .withColumn("SAMPTYPE", F.substring("Sample Type", 1, 1))
        # the down channel's location key doubles as LOC_EPID (compare.py:69)
        .withColumn("LOC_EPID", F.col("Sample Location"))
        .withColumn("row_num_down", F.monotonically_increasing_id())
    )
    return df


def conform_direct(direct_df: DataFrame) -> DataFrame:
    """Conform the 'direct' product (compare.py:38-68)."""
    df = direct_df
    for old, new in DIRECT_RENAMES.items():
        df = df.withColumnRenamed(old, new)
    df = (
        df.withColumn("PWSID", F.col("PWSID").cast("long"))
        .withColumn("SYSTEM NAME", F.trim("SYSTEM NAME"))
        .withColumn("Contaminant ID", F.trim("Contaminant ID"))
        .withColumn("Sample Date", parse_us_date("Sample Date"))
        .withColumn("Analysis Date", parse_us_date("Analysis Date"))
        # 'n'-prefix string-typing of the key (compare.py:68)
        .withColumn("LOC_EPID", F.concat(F.lit("n"), F.col("LOC_EPID").cast("string")))
        .withColumn("row_num_direct", F.monotonically_increasing_id())
    )
    return df


def compare_pipeline(
    spark: SparkSession,
    down_df: DataFrame,
    direct_df: DataFrame,
    compat_date_default: bool = True,
) -> DataFrame:
    """7-key inner reconciliation join (compare.py:88-107)."""
    down = conform_down(down_df, compat_date_default=compat_date_default)
    direct = conform_direct(direct_df)

    joined = suffixed_join(down, direct, on=JOIN_KEYS, how="inner", suffix="_c")

    # sentinel fix on the joined frame (compare.py:91)
    if "MAIL_ADDR2" in joined.columns:
        joined = joined.withColumn(
            "MAIL_ADDR2",
            F.when(F.col("MAIL_ADDR2").isin("nan", "NaN"), "").otherwise(F.col("MAIL_ADDR2")),
        )

    # result casts for numeric comparison (compare.py:94-95);
    # '.'-sentinel results become NULL (the engine's clean-null default).
    # Sentinel cleaning only applies to string-typed inputs — comparing a
    # numeric column to '.' would force an ANSI cast and fail.
    for col in ("RESULT", "Analysis Result"):
        if dict(joined.dtypes)[col] == "string":
            joined = joined.withColumn(
                col, F.when(F.trim(F.col(col)) == ".", None).otherwise(F.col(col)).cast("double")
            )
        else:
            joined = joined.withColumn(col, F.col(col).cast("double"))
    return joined
