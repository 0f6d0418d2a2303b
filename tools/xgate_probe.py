"""Probe the membership-gate paths of dedup_against_exact.

The regime the gates exist for: the stored reference digest set is too
big to broadcast (at 100 TB: billions of digests), so the plain
anti-join shuffles the ENTIRE corpus — including the document payload,
because an anti-join's output needs every column. Built locally: 4M
reference digests (~260 MB of strings — past the session's 64 MB
broadcast threshold, so the plain path really shuffles) vs corpora of
1/4M rows carrying a realistic ~1 KB payload, 1% true overlap,
digest_col path (measures the join strategy, not text hashing).

Measured per corpus size, with the filter PREBUILT (the serving shape
— a stored corpus's filter is maintained incrementally per shard, the
sketches/bloom module contract; the one-time build cost is reported
separately):

- plain anti-join (payload rides the exchange)
- bloom gate (bit-packed; the Arrow UDF sees ONLY the k position ints,
  never the payload) + anti-join over the flagged sliver
- cms row gate (broadcast counter joins, all JVM) + sliver anti-join

plus the mechanism number: corpus rows that reach an exchange (plain =
all; gated = the flagged sliver ≈ overlap + fp). Exactness (gated ==
plain survivors) is asserted at every size.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import _drain  # noqa: E402

REPEATS = int(os.environ.get("XGATE_PROBE_REPEATS", "3"))
REF_M = 4
OVERLAP = 0.01
BLOOM_BITS = 1 << 26  # 8 MB for 4M members -> fill ~0.22, fp ~0.2%
BLOOM_K = 4
CMS_DEPTH, CMS_WIDTH = 4, 1 << 22


def _timed(fn) -> float:
    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        _drain(fn())
        runs.append(round(time.time() - t0, 3))
        gc.collect()
    return min(runs)


def main() -> None:
    from waterdata_spark.operators.bloom import bloom_build, with_bloom_contains
    from waterdata_spark.operators.dedup import dedup_against_exact
    from waterdata_spark.operators.sketches import (
        count_min_build,
        count_min_might_contain,
    )
    from waterdata_spark.session import get_spark

    spark = get_spark("xgate-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    n_ref = REF_M * 1_000_000
    reference = spark.range(n_ref).select(
        F.md5(F.concat(F.lit("r"), F.col("id"))).alias("dg")
    )
    ref_h = reference.select("dg").distinct().persist()
    ref_h.count()

    t0 = time.time()
    bf = bloom_build(ref_h, "dg", BLOOM_BITS, BLOOM_K, seed="xgate")
    bloom_build_sec = round(time.time() - t0, 3)
    t0 = time.time()
    cms = count_min_build(ref_h, "dg", CMS_DEPTH, CMS_WIDTH, seed="xgate").persist()
    cms.count()
    cms_build_sec = round(time.time() - t0, 3)

    out = {
        "metric": "xgate_probe",
        "ref_rows": n_ref,
        "overlap": OVERLAP,
        "bloom_bits": BLOOM_BITS,
        "bloom_k": BLOOM_K,
        "bloom_fill": round(bf.fill_fraction, 4),
        "bloom_build_sec": bloom_build_sec,
        "cms_depth": CMS_DEPTH,
        "cms_width": CMS_WIDTH,
        "cms_build_sec": cms_build_sec,
    }

    for m in (1, 4):
        n_corpus = m * 1_000_000
        n_overlap = int(n_corpus * OVERLAP)
        corpus = spark.range(n_corpus).select(
            F.col("id").alias("row_id"),
            F.md5(
                F.when(F.col("id") < n_overlap, F.concat(F.lit("r"), F.col("id")))
                .otherwise(F.concat(F.lit("c"), F.col("id")))
            ).alias("dg"),
            # ~1 KB document payload — what an anti-join would shuffle
            F.repeat(F.md5(F.concat(F.lit("p"), F.col("id"))), 32).alias("text"),
        ).persist()
        corpus.count()

        def plain():
            return corpus.join(ref_h, "dg", "left_anti")

        def bloom_gated():
            flagged = with_bloom_contains(corpus, "dg", bf, out_col="__maybe")
            keep = flagged.filter(~F.col("__maybe")).drop("__maybe")
            cand = (
                flagged.filter(F.col("__maybe"))
                .drop("__maybe")
                .join(ref_h, "dg", "left_anti")
            )
            return keep.unionByName(cand)

        def cms_gated():
            flagged = count_min_might_contain(
                cms, corpus, "dg", CMS_DEPTH, CMS_WIDTH, seed="xgate",
                out_col="__maybe",
            )
            keep = flagged.filter(~F.col("__maybe")).drop("__maybe")
            cand = (
                flagged.filter(F.col("__maybe"))
                .drop("__maybe")
                .join(ref_h, "dg", "left_anti")
            )
            return keep.unionByName(cand)

        block = {
            "corpus_rows": n_corpus,
            "plain_sec": _timed(plain),
            "bloom_sec": _timed(bloom_gated),
            "cms_sec": _timed(cms_gated),
        }
        a, b = plain().count(), bloom_gated().count()
        c = cms_gated().count()
        assert a == b == c == n_corpus - n_overlap, (a, b, c)
        flagged = (
            with_bloom_contains(corpus, "dg", bf, out_col="__maybe")
            .filter(F.col("__maybe"))
            .count()
        )
        block["exchange_rows_plain"] = n_corpus
        block["exchange_rows_gated"] = flagged
        block["exchange_row_reduction"] = round(n_corpus / max(flagged, 1), 1)
        block["bloom_speedup"] = round(block["plain_sec"] / max(block["bloom_sec"], 1e-9), 2)
        block["cms_speedup"] = round(block["plain_sec"] / max(block["cms_sec"], 1e-9), 2)
        out[f"corpus_{m}m"] = block
        corpus.unpersist()
        print(f"# corpus {m}M: {block}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
