"""Scale the sf0.1 testdata 10× to sf1 with semantics-preserving replication.

Usage: python tools/scale_testdata.py [src_dir] [dst_dir] [factor]

Replication rules (per replica i in [0, factor)):
- fixed dims (region, nation) are copied once — their cardinality is
  scale-independent, like TPC-H;
- every entity/foreign key is shifted by ``i * (max_key + 1)`` with
  the SAME base on both sides of each relationship, so joins resolve
  within a replica and never across replicas (cardinalities scale
  linearly, exactly like a bigger TPC-H run);
- document text gets a per-replica token suffix for i > 0, keeping
  each replica's shingle/minhash/jaccard structure identical to the
  original while making replicas token-disjoint — without this, exact
  text copies would make every cross-replica pair a near-dup
  candidate and the dedup workload would grow quadratically BY DATA
  CONSTRUCTION rather than by plan;
- embeddings are dimension-rotated by i (norm- and distribution-
  preserving, decorrelates replicas so ANN cell occupancy stays
  uniform instead of collapsing onto duplicate points).

The output is for BENCHMARKING (bench.py's sf1 block); the DuckDB
oracle keeps running at sf0.01 — no oracle reads this data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

FIXED_DIMS = {"region", "nation"}

# table → {column: key-space name}; every key-space gets one shift base
KEY_COLS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

KEY_SOURCES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def _replicate(df: DataFrame, table: str, factor: int, bases: dict[str, int]) -> DataFrame:
    rep = df.withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(factor)])))
    for col, space in KEY_COLS.get(table, {}).items():
        dt = dict(df.dtypes)[col]
        rep = rep.withColumn(col, (F.col(col) + F.col("__r") * F.lit(bases[space])).cast(dt))
    if table == "documents":
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("_r"), F.col("__r").cast("string")),
            ),
            " ",
        )
        rep = rep.withColumn("text", F.when(F.col("__r") == 0, F.col("text")).otherwise(salted))
        rep = rep.withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        dim = F.size("embedding")
        # rotation offset must stay inside the vector: slice() with a
        # start past the array end would silently produce short vectors
        # when factor > dim
        off = F.pmod(F.col("__r"), dim)
        rotated = F.concat(
            F.slice(F.col("embedding"), off + 1, dim - off),
            F.slice(F.col("embedding"), 1, off),
        )
        rep = rep.withColumn(
            "embedding",
            F.when(off == 0, F.col("embedding")).otherwise(rotated).cast("array<float>"),
        )
    return rep.drop("__r")


def scale_dir(spark: SparkSession, src: str, dst: str, factor: int = 10) -> None:
    from waterdata_spark.schemas import load_table

    bases: dict[str, int] = {}
    for space, (table, col) in KEY_SOURCES.items():
        mx = load_table(spark, src, table).agg(F.max(col)).first()[0]
        bases[space] = int(mx) + 1

    os.makedirs(dst, exist_ok=True)
    for table in TABLES:
        df = load_table(spark, src, table)
        out = df if table in FIXED_DIMS else _replicate(df, table, factor, bases)
        if table not in FIXED_DIMS:
            # The explode plan inherits the source's task count (often
            # ONE file at small sf), which would write the scaled table
            # as a single parquet file — scans of the "big" table then
            # run on 1-2 tasks and every benchmark number measures the
            # generator's layout, not the query plan (measured: q07 at
            # sf10 was 18.7x/decade on a 1-file orders table). Match a
            # real warehouse layout instead: one file per core.
            out = out.repartition(spark.sparkContext.defaultParallelism)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
    with open(os.path.join(dst, "_SCALED"), "w") as f:
        f.write(_marker_line(src, factor))


# bump when the generated LAYOUT changes (not just the data): v2 =
# one-file-per-core repartition of scaled tables, v3 = normalized
# epoch-ns events.ts + embedding rotation. A stale-layout cache must
# regenerate — the marker's existence alone once let a 1-file-layout
# sf1 dir survive the repartition fix and keep distorting scale ratios.
LAYOUT_VERSION = 3


def _marker_line(src: str, factor: int) -> str:
    return f"src={src} factor={factor} layout={LAYOUT_VERSION}\n"


def ensure_scaled(spark: SparkSession, src: str, dst: str, factor: int = 10) -> bool:
    """Generate once, cache on disk; regenerate when the marker doesn't
    match the current (src, factor, layout) — True when data is ready."""
    marker = os.path.join(dst, "_SCALED")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == _marker_line(src, factor):
                return True
    try:
        scale_dir(spark, src, dst, factor)
        return True
    except Exception as e:  # benching must not die on a scale-gen failure
        print(f"# sf-scale generation failed: {e}", file=sys.stderr)
        return False


if __name__ == "__main__":
    from waterdata_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/waterdata_spark_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_dir(get_spark("scale-testdata"), src, dst, factor)
    print(f"scaled {src} -> {dst} x{factor}")
