"""CSV sources (SURVEY.md C1/C2).

The reference reads header-inferring CSVs one at a time and concats
by column name (combine_csvs_into_one_df, down/down_water_prep.py:
554-565) because its yearly extracts put the same columns in
DIFFERENT ORDERS (2014-2016 vs 2017+ — §1.3). The Spark mapping:

- same layout across files → one multi-path ``spark.read.csv`` (one
  scan job, splittable, parallel across files);
- differing layouts → per-file reads folded with ``unionByName``
  (schema aligned by NAME; a positional union would silently corrupt,
  which is exactly the §1.3 hazard).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """C1: header CSV scan. With a declared schema Spark skips the
    inference pass (one fewer full read) and every downstream cast is
    explicit — the engine's replacement for the reference's
    infer-then-astype pattern (down/down_water_prep.py:281-288)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", False)  # all strings: cheap + lossless
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_csv_multi(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """C2: multi-file CSV union scan, aligned BY NAME.

    Each file keeps its own header-driven column order;
    ``unionByName(allowMissingColumns=True)`` aligns them. Spark
    plans this as a single union of parallel file scans — no driver-
    side loop over data, only over file names.
    """
    dfs = [read_csv(spark, p, schema=schema, **options) for p in paths]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
