"""The "direct" channel pipeline (SURVEY.md §3, entry point 2) as a
declarative DataFrame DAG.

Reference: ``python direct_water_prep.py``
(direct/direct_water_prep.py:65-172): read the emailed workbook's
three sheets, range-gate the location IDs, expand EPID/SPID into one
joinable LOC_EPID key, then a strict→loose 2-tier fallback join that
DROPS still-unmatched rows (C20).

The linking rule being encoded (direct/direct_water_prep.py:32-35):
"if the sample type is E, then loc_epid = epid; if D, then
loc_epid = spid" — the key expansion makes one dim row per candidate
key so a single equi-join covers both cases.

Two deviations, both pinned deterministic (SURVEY.md §7d):
- the reference's "any one row per PWSID" loose-tier dedup
  (direct/direct_water_prep.py:144-145) is nondeterministic by its
  own comment; the engine orders by the payload columns.
- loose-matched rows keep the FACT's LOC_EPID; the reference
  overwrites it with the arbitrary surviving dim row's LOC_EPID — an
  artifact of its drop-then-rejoin implementation, not a stated rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from waterdata_spark.operators.expand import expand_keys
from waterdata_spark.operators.expectations import expect_ranges
from waterdata_spark.operators.fallback_join import fallback_join
from waterdata_spark.schemas import DIRECT_SYSINFO_COLS, EPID_RANGE, SPID_RANGE
from waterdata_spark.sources.excel import read_excel_sheets

DATA_COLS = ["PWSID", "CONTAMID", "CONTNAM", "RESULT", "SAMPTYPE", "SAMPDATE", "SAMPTIME", "ANALDATE"]
PAYLOAD_COLS = [c for c in DIRECT_SYSINFO_COLS if c not in ("PWSID", "LOC_EPID")]


def read_direct_workbook(spark: SparkSession, xlsx_path: str) -> dict[str, DataFrame]:
    """C4: the three sheets of the emailed workbook
    (direct/direct_water_prep.py:69-74). 'Violations' is loaded but
    unused downstream — declared capability only (:19)."""
    return read_excel_sheets(spark, xlsx_path, ["System Info", "Violations", "Data"])


def direct_pipeline(
    spark: SparkSession,
    system_info: DataFrame,
    data: DataFrame,
) -> DataFrame:
    """Conform + strict/loose fallback join, dropping still-unmatched
    rows (direct/direct_water_prep.py:76-167)."""
    si = system_info.withColumn("EPID", F.col("EPID").cast("long")).withColumn(
        "SPID", F.col("SPID").cast("long")
    )

    # C41 range gates (:84-101) — intent preserved; the latent
    # `EPID>999` mistake in the SPID check (:89) is not reproduced.
    # Both gates share ONE aggregation pass over system_info.
    expect_ranges(si, [("EPID", *EPID_RANGE), ("SPID", *SPID_RANGE)])

    # C21 key expansion: one dim row per (system-info row × {EPID, SPID})
    # — explode instead of the reference's copy+concat (:107-119)
    dim = expand_keys(si, ["EPID", "SPID"], "LOC_EPID")
    # project + full-row dedup (:126-131), LOC_EPID string-typed to match
    # the fact's key (:136-137)
    dim = (
        dim.select(*DIRECT_SYSINFO_COLS)
        .withColumn("PWSID", F.col("PWSID").cast("long"))
        .withColumn("LOC_EPID", F.col("LOC_EPID").cast("string"))
        .dropDuplicates(DIRECT_SYSINFO_COLS)
    )

    fact = data.select(*DATA_COLS, "LOC_EPID").withColumn(
        "PWSID", F.col("PWSID").cast("long")
    ).withColumn("LOC_EPID", F.col("LOC_EPID").cast("string"))

    det_order: list[Column] = [F.col(c).asc_nulls_last() for c in PAYLOAD_COLS]
    out = fallback_join(
        fact,
        dim,
        tiers=[["PWSID", "LOC_EPID"], ["PWSID"]],
        payload=PAYLOAD_COLS,
        dedup_order=det_order,
        # matched = got a mailing address (:149-150)
        match_col="MAIL_ZIP",
        # C20: still-unmatched rows are dropped (:165) — "they will
        # not display on the map"
        keep_unmatched=False,
    )
    return out
