"""Sinks + stage checkpoints (SURVEY.md C6/C7).

The reference's inter-stage IR is CSV files on disk
(down/down_water_prep.py:408,411 written; 454-455 read back). The
engine's default IR is partitioned Parquet — columnar, splittable,
schema-carrying — with CSV kept as an export format for the
human-review workflow the reference depends on (§5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Default sink. ``partition_by`` gives partition pruning on read —
    the reference's per-year files (down/down_water_prep.py:204-215)
    are manual partitioning; ``partitionBy('year')`` is the same idea
    the optimizer can actually use."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """C6: CSV export (header, no index — pandas' to_csv(index=False)
    equivalent). ``single_file`` coalesces to one part for the
    human-review CSVs; never use it for large outputs."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def checkpoint_parquet(df: DataFrame, path: str) -> DataFrame:
    """C7: durable stage boundary — write Parquet, read it back.

    Unlike ``df.checkpoint()`` (lives in the checkpoint dir, tied to
    the session), a named Parquet table survives process restart —
    the reference's stage-per-invocation design (`csv` then `join`)
    requires exactly this, since a human geocoding step happens
    between the stages (down/down_water_prep.py:414-423).
    """
    write_parquet(df, path)
    return df.sparkSession.read.parquet(path)
