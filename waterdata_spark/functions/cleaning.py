"""Scalar cleaning functions (SURVEY.md §2.6, operators C13 / C31-C40).

All JVM-side ``pyspark.sql.functions`` expressions — no Python UDFs —
so they stay inside whole-stage codegen and cost nothing extra at
100 TB scale.

The reference applies these imperatively with pandas string accessors
and ``.loc`` masks; here each is a pure Column → Column function
composable into any plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Null sentinels observed in the reference data: '.' for result/MCL/date
# (compare.py:63, down/down_water_prep.py:460-461,507), stringified
# 'nan'/'NaN' and '' from pandas round-trips (compare.py:91).
NULL_SENTINELS = [".", "nan", "NaN", ""]

# The reference maps sentinel dates to a magic default '1/9/1999'
# (compare.py:63). The engine defaults to clean NULL semantics and
# keeps the quirk behind compat_date_default.
COMPAT_SENTINEL_DATE = "1/9/1999"


def clean_sentinels(c: Column | str, sentinels: list[str] | None = None) -> Column:
    """C39/C12: map sentinel strings to NULL. ``when(isin(...), NULL)``."""
    col = F.col(c) if isinstance(c, str) else c
    sent = sentinels if sentinels is not None else NULL_SENTINELS
    return F.when(F.trim(col).isin(sent), F.lit(None)).otherwise(col)


def strip_inner_spaces(c: Column | str) -> Column:
    """C32: remove embedded spaces (dates like '04/ 12/2019',
    down/down_water_prep.py:321, compare.py:59)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(col, r"\s+", "")


def parse_us_date(c: Column | str, compat_date_default: bool = False) -> Column:
    """C38/C39: parse MM/DD/YYYY (possibly with embedded spaces,
    possibly sentinel) to DateType.

    compat_date_default=True reproduces the reference's substitution of
    '1/9/1999' for sentinel dates (compare.py:63); default maps them
    to NULL.
    """
    raw = strip_inner_spaces(c)
    cleaned = clean_sentinels(raw)
    if compat_date_default:
        cleaned = F.coalesce(cleaned, F.lit(COMPAT_SENTINEL_DATE))
    return F.to_date(cleaned, "M/d/yyyy")


def strip_float_suffix(c: Column | str) -> Column:
    """C32: drop a trailing '.0' left by pandas float round-trips on
    integer-like keys (down/down_water_prep.py:463,468)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(col.cast("string"), r"\.0$", "")


def prefix_tag(c: Column | str, prefix: str = "n") -> Column:
    """C36: 'n'+key string-typing hack (down/down_water_prep.py:470-471,
    compare.py:68). Kept for compat; the engine's declared schemas make
    it unnecessary."""
    col = F.col(c) if isinstance(c, str) else c
    return F.concat(F.lit(prefix), strip_float_suffix(col))


def coalesce_suffixed(df: DataFrame, cols: list[str], suffix: str = "_y", drop: bool = True) -> DataFrame:
    """C14: after a join that suffixed collisions, fill ``X`` from
    ``X{suffix}`` where ``X`` is null (down/down_water_prep.py:307-313)."""
    for c in cols:
        df = df.withColumn(c, F.coalesce(F.col(c), F.col(c + suffix)))
        if drop:
            df = df.drop(c + suffix)
    return df


def concat_address(*parts: Column | str, sep: str = ", ") -> Column:
    """C35: address assembly for geocoding (down/down_water_prep.py:404-406).
    ``concat_ws`` skips NULLs natively, replacing the reference's branch
    on ADDRESS2 null."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws(sep, *cols)


def with_unit_column(df: DataFrame, contaminant_col: str, out: str = "unit") -> DataFrame:
    """Derive the out-of-band measurement-unit metadata as a column:
    all results mg/L except PFAS (ng/L) and radiological (pCi/L)
    (direct/direct_water_prep.py:38-42, down/down_water_prep.py:149-152)."""
    c = F.upper(F.col(contaminant_col))
    pfas = c.rlike("PF|PERFLUORO")
    radio = c.rlike("RADIUM|URANIUM|ALPHA|BETA|PHOTON")
    return df.withColumn(
        out,
        F.when(pfas, F.lit("ng/L")).when(radio, F.lit("pCi/L")).otherwise(F.lit("mg/L")),
    )


def normalize_key(c: Column | str) -> Column:
    """X2 helper: canonical join-key form — lower, trim, collapse
    whitespace. System names differ only by case/whitespace across the
    reference's two channels (compare.py:48-51)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))
