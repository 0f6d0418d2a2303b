"""Mergeable sketch profiling — incremental corpus statistics.

At 100 TB, corpus statistics must be maintained INCREMENTALLY: a new
shard arrives and the stored profile updates by merging the shard's
sketch — never by rescanning the corpus. Exact distinct counts and
exact per-token frequencies need a full pass plus a distinct/groupBy
shuffle over everything ever ingested; sketches bound the state to
kilobytes per column and make the update a union of two tiny frames.
(The exact twins stay in ``operators/expectations.profile`` and
``functions/text.top_ngrams`` — sketches are the scale path, not a
replacement for the oracle-grade exact operators.)

Two published sketch families (both mergeable, both deterministic):

- **HLL distinct-count sketches** — Spark's built-in Apache
  DataSketches HllSketch aggregates (``hll_sketch_agg`` /
  ``hll_union_agg`` / ``hll_sketch_estimate``; Flajolet et al. 2007
  HyperLogLog as implemented by the DataSketches HLL family). Binary
  sketch per column; union of per-shard sketches with the same
  ``lg_k`` carries the same error guarantee as sketching the whole
  corpus directly (register-wise max is associative). NB the merged
  ESTIMATE is not always bit-identical to a direct whole-corpus
  sketch: small shards stay in the library's sparse/exact coupon mode,
  so their union can be MORE accurate than a direct sketch that
  already transitioned to dense registers (observed: 6 sparse shards
  of 3000 ids union to 2997 where the direct sketch says 2977) — both
  are within the lg_k error bound, which is the contract tests pin.
- **Count-min sketch** (Cormode & Muthukrishnan 2005) for item/token
  frequency estimates — implemented NATIVELY as a DataFrame of
  ``depth x width`` counter rows rather than an opaque binary: rows
  merge by ``union + groupBy sum`` (map-side combinable), lookups are
  a bounded broadcast join, and the md5 row hashes are portable, so an
  independent engine reproduces every counter exactly (the x04 'cms'
  oracle leg does — DuckDB rebuilds the identical table). Spark's
  binary ``F.count_min_sketch`` exists, but its sketch bytes cannot be
  queried from SQL and are not cross-engine reproducible; the row form
  is the Spark-idiomatic spelling of the same structure.

Guarantees (count-min, standard): estimate >= true count always; with
``width = ceil(e / eps)`` and ``depth = ceil(ln(1 / delta))``,
``estimate <= true + eps * N`` with probability ``1 - delta`` (N =
total weight). Both properties are test-asserted.

Scale shape: the CMS build is one narrow explode (depth rows per
input row) into one map-side-combinable aggregate whose output is
bounded by ``depth * width`` rows regardless of corpus size; the
lookup broadcast is bounded by the same constant. The HLL profile is
one wide aggregate (single stage) producing ONE row; merging profiles
shuffles only |columns| rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_profile",
    "hll_profile_grouped",
    "merge_hll_profiles",
    "merge_hll_profiles_grouped",
    "estimate_hll_profile",
    "estimate_hll_profile_grouped",
    "count_min_build",
    "count_min_merge",
    "count_min_lookup",
    "count_min_might_contain",
]


def _cms_bucket(col: Column, j: int, width: int, seed: str) -> Column:
    """Row hash j: first 60 bits of md5('{seed}:{j}:' || value), mod
    width — the repo's portable-hash convention (DuckDB twin:
    ``('0x' || substring(md5(...), 1, 15))::BIGINT % width``)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:{j}:"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def hll_profile(df: DataFrame, columns: list[str], lg_k: int = 12) -> DataFrame:
    """One-pass mergeable profile: for each named column, one output
    row ``(column, n_rows, n_nulls, hll binary)``. The whole profile
    is ONE wide aggregate (single row collected into |columns| rows by
    a driver-free union of selects over the same one-row frame), so it
    costs one scan regardless of how many columns are profiled.

    Values are sketched as strings (``cast("string")``) so every
    column type profiles uniformly and a column's sketch merges with
    the same column's sketch from any other shard.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(
            F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_k)).alias(f"__hll_{c}")
        )
    one = df.agg(*aggs)
    parts = [
        one.select(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__hll_{c}").alias("hll"),
        )
        for c in columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_hll_profiles(*profiles: DataFrame) -> DataFrame:
    """Merge per-shard profiles: counts add, sketches union. Shuffles
    |columns| x |shards| rows — the incremental-stats update is
    O(sketch bytes), never a corpus rescan. Sketches must share
    ``lg_k`` (the union downgrades to the smaller config otherwise —
    keep one constant per deployment)."""
    if not profiles:
        raise ValueError("need at least one profile")
    u = profiles[0]
    for p in profiles[1:]:
        u = u.unionByName(p)
    return u.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.hll_union_agg("hll").alias("hll"),
    )


def estimate_hll_profile(profile: DataFrame) -> DataFrame:
    """Materialize estimates: adds ``distinct_est`` (long, rounded
    DataSketches estimate) and drops the binary column."""
    return profile.select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.hll_sketch_estimate("hll")).cast("long").alias("distinct_est"),
    )


def count_min_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
    seed: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``col`` as a counter table
    ``(d int, bucket int, cnt long)`` — at most ``depth * width`` rows.

    ``weight_col``: optional per-row weight (e.g. feed a pre-aggregated
    ``(word, count)`` frame with ``weight_col="count"`` — identical
    counters to sketching the raw token stream, one explode cheaper).

    Plan: one narrow explode (``depth`` struct rows per input row) into
    one map-side-combinable groupBy — partial aggregation caps every
    task's output at ``depth * width`` rows, so the shuffle is constant
    size at any corpus scale. Null items are ignored (no bucket).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"need depth >= 1 and width >= 1, got {depth=} {width=}")
    c = F.col(col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("d"), _cms_bucket(c, j, width, seed).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    return (
        df.filter(c.isNotNull())
        .select(F.explode(rows).alias("__r"), w.alias("__w"))
        .groupBy(F.col("__r.d").alias("d"), F.col("__r.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width, seed):
    union + sum. Bit-identical to building once over the union of the
    inputs (counters are plain sums) — the incremental-update path."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_lookup(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
    seed: str = "cms",
    out_col: str = "est",
) -> DataFrame:
    """Estimate each item's total weight: min over the item's ``depth``
    counters (0 where the counter row is absent — the item was never
    seen). (depth, width, seed) must match the build.

    Plan: explode each item into its ``depth`` (d, bucket) keys, join
    the sketch, min per item. The sketch side is broadcast — it is
    bounded by ``depth * width`` rows BY CONSTRUCTION (not by an
    optimistic size guess), so the join is shuffle-free at any corpus
    scale.
    """
    c = F.col(col)
    keys = F.array(
        *[
            F.struct(
                F.lit(j).alias("d"), _cms_bucket(c, j, width, seed).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    probes = items.filter(c.isNotNull()).select(col, F.explode(keys).alias("__k"))
    joined = probes.join(
        F.broadcast(cms),
        (F.col("__k.d") == F.col("d")) & (F.col("__k.bucket") == F.col("bucket")),
        "left",
    )
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(out_col)
    )


def count_min_might_contain(
    cms: DataFrame,
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
    seed: str = "cms",
    out_col: str = "might_contain",
) -> DataFrame:
    """Per-ROW membership test against a sketched set — the counting-
    Bloom-filter reading of the count-min structure: because counters
    never underestimate, a row whose ``depth`` counters are not ALL
    present is **definitely absent** from the sketched set;
    ``out_col = True`` means *possibly present* (false-positive rate
    set by the load factor, never a false negative).

    Unlike :func:`count_min_lookup` this adds the flag WITHOUT any
    aggregation or shuffle: ``depth`` broadcast hash joins, one per
    counter row (each side is the ≤``width``-row d-slice of the
    sketch), so the input's partitioning and row identity survive —
    the shape a 100 TB gate needs (flag a trillion rows against a
    stored corpus membership sketch at scan speed, then send only the
    flagged sliver to the exact check). NULL values flag False (a
    NULL is never a member)."""
    out = df
    c = F.col(col)
    hit_cols = []
    for j in range(depth):
        slice_j = cms.filter(F.col("d") == j).select(
            F.col("bucket").alias(f"__bk{j}"), F.lit(True).alias(f"__hit{j}")
        )
        out = out.join(
            F.broadcast(slice_j),
            _cms_bucket(c, j, width, seed) == F.col(f"__bk{j}"),
            "left",
        )
        hit_cols.append(f"__hit{j}")
    all_hit = c.isNotNull()
    for hc in hit_cols:
        all_hit = all_hit & F.col(hc).isNotNull()
    return out.withColumn(out_col, all_hit).drop(
        *[f"__bk{j}" for j in range(depth)], *hit_cols
    )


def hll_profile_grouped(
    df: DataFrame, group_col: str, columns: list[str], lg_k: int = 12
) -> DataFrame:
    """Per-GROUP mergeable profile — the per-domain/per-language grain
    a corpus datasheet reports: for each (group, column), one row
    ``(group_col, column, n_rows, n_nulls, hll)``. Same single-scan
    shape as :func:`hll_profile` (one wide groupBy aggregate, then a
    driver-free unpivot by column), and the SAME merge operator
    applies per group: :func:`merge_hll_profiles_grouped`.

    Output size is |groups| x |columns| rows — bounded by the grouping
    cardinality, never the corpus."""
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(
            F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_k)).alias(f"__hll_{c}")
        )
    one = df.groupBy(group_col).agg(*aggs)
    parts = [
        one.select(
            F.col(group_col),
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__hll_{c}").alias("hll"),
        )
        for c in columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_hll_profiles_grouped(group_col: str, *profiles: DataFrame) -> DataFrame:
    """Merge per-shard grouped profiles: counts add, sketches union,
    per (group, column). A group appearing in only some shards merges
    from those shards alone — exactly the semantics incremental
    ingestion needs."""
    if not profiles:
        raise ValueError("need at least one profile")
    u = profiles[0]
    for p in profiles[1:]:
        u = u.unionByName(p)
    return u.groupBy(group_col, "column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.hll_union_agg("hll").alias("hll"),
    )


def estimate_hll_profile_grouped(profile: DataFrame, group_col: str) -> DataFrame:
    """Materialize grouped estimates: (group, column, n_rows, n_nulls,
    distinct_est)."""
    return profile.select(
        group_col,
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.hll_sketch_estimate("hll")).cast("long").alias("distinct_est"),
    )
