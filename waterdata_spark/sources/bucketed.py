"""Bucketed tables (SURVEY.md §4 physical design: "bucketing facts by
PWSID for repeated joins").

``write_bucketed`` persists a DataFrame hash-bucketed (and sorted)
by the join key; two tables bucketed the same way equi-join WITHOUT
any Exchange — the shuffle is paid once at write time and amortized
over every subsequent join/aggregation on that key. This is the
standard warehouse trick for a fact table joined on the same key by
many downstream queries (at 100 TB, eliminating the fact shuffle is
usually the single biggest win a layout decision can buy).

Plan proof: tests/test_plans.py asserts the bucketed-join plan has
zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    prepartition: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) managed table. Bucket count
    should match downstream parallelism (≈ cores locally; hundreds on
    a cluster) — both join sides must use the SAME count.

    ``prepartition`` (default) repartitions on the bucket columns
    first: Spark's bucketed write otherwise emits one file per
    (write task × bucket) — with T input tasks that is T×n_buckets
    tiny files plus a per-task sort over ALL buckets' rows, the 6.6×
    write premium VERDICT r6 item 8 flagged. ``repartition(n_buckets,
    cols)`` and the bucket-id spec use the same murmur3-pmod hash, so
    after the exchange each task holds exactly one bucket and writes
    exactly one file (n_buckets files total, each sort local to one
    bucket). The exchange is the same shuffle a downstream join would
    have paid once anyway — the whole point of paying it at write
    time."""
    if prepartition:
        df = df.repartition(n_buckets, *bucket_cols)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
