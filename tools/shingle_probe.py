"""A/B probe for the char_shingles construction (r12 optimization).

The r12 plan audit found the x08 signature pass's Generate argument
contains ~15 copies of `filter(split(text, ''))`: sliding_windows'
shifted-copy zip_with references the chars ARRAY EXPRESSION once per
shift operand (7 slices + 7 zip_withs + sizes), and Catalyst performs
no common-subexpression elimination inside a Generate, so every
reference re-splits the text. Candidate fix: a let-binding via
`transform(array(chars), ca -> ...)` — the chars array is bound ONCE
per row as a lambda variable, windows are built by one transform over
`sequence` with O(1) `element_at` lookups.

Measures, on documents replicated REPL times (~sf1 at REPL=10):
  A. current minhash_signature_frame (explode + 16 min aggs)
  B. same but with the let-bound element_at shingle construction
  C. per-row form: let-bound shingles, 16 array_min(transform(...)) —
     no explode, no aggregate, no exchange
plus a value-equality check A==B==C on the raw signature columns.

Usage: python tools/shingle_probe.py [repl] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import default_parallelism, get_spark  # noqa: E402

K = 8
N_HASHES = 16


def let_bound_shingles(col, k: int = K):
    """k-char shingles with the chars array bound once per row."""
    chars = F.filter(F.split(col, ""), lambda ch: ch != "")

    def windows(ca):
        return F.transform(
            F.sequence(F.lit(1), F.size(ca) - (k - 1)),
            lambda i: F.concat(*[F.element_at(ca, i + j) for j in range(k)]),
        )

    sh = F.element_at(F.transform(F.array(chars), windows), 1)
    return F.when(F.length(col) >= k, sh).when(F.length(col) < k, F.array(col))


def sig_current(df):
    from waterdata_spark.operators.dedup_approx import minhash_signature_frame

    return minhash_signature_frame(df, "doc_id", "text", N_HASHES, K, "xx")


def sig_let_explode(df):
    sh = df.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(let_bound_shingles(F.col("text")))).alias("__s"),
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("__s"))).alias(f"__h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def sig_per_row(df):
    sh = df.select(
        F.col("doc_id"),
        F.array_distinct(let_bound_shingles(F.col("text"))).alias("__sh"),
    ).filter(F.col("__sh").isNotNull())
    def _hash_i(i: int):
        # NB: a `lambda s, i=i:` default-arg closure would be treated by
        # PySpark as a TWO-argument lambda (element, index) — the index
        # silently replaces the literal. A factory keeps arity 1.
        return lambda s: F.xxhash64(F.lit(i), s)

    mins = [
        F.array_min(F.transform(F.col("__sh"), _hash_i(i))).alias(f"__h{i}")
        for i in range(N_HASHES)
    ]
    return sh.select("doc_id", *mins)


def drain(df) -> int:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
    ).collect()[0]
    return row["n"]


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("shingle-probe")
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_docs = base.count()
    d = (
        base.crossJoin(F.broadcast(spark.range(repl).select(F.col("id").alias("__r"))))
        .select((F.col("doc_id") + F.col("__r") * n_docs).alias("doc_id"), "text")
        .repartition(default_parallelism())
        .localCheckpoint(eager=True)  # isolate the probe from scan/replication cost
    )
    print(f"# corpus: {d.count()} docs")

    variants = {
        "A_current": sig_current,
        "B_let_explode": sig_let_explode,
        "C_per_row": sig_per_row,
    }
    for name, fn in variants.items():
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            n = drain(fn(d))
            runs.append(round(time.time() - t0, 3))
        print(f"{name}: min {min(runs)}s of {runs} ({n} rows)")

    # value equality: order-independent exact content hash must match
    a = sig_current(d)

    def table_hash(df):
        cols = ["doc_id"] + [f"__h{i}" for i in range(N_HASHES)]
        return df.select(
            F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    ha = table_hash(a)
    for name, fn in [("B_let_explode", sig_let_explode), ("C_per_row", sig_per_row)]:
        hb = table_hash(fn(d))
        ok = ha["s"] == hb["s"] and ha["n"] == hb["n"]
        print(f"equality A=={name}: {'OK' if ok else f'MISMATCH {ha} vs {hb}'}")


if __name__ == "__main__":
    main()
