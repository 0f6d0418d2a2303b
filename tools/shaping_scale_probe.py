"""Decade measurements for the training-data shaping operators
(VERDICT r4: chunk/pack/sample/merge shipped with oracle rows but no
scale evidence — "two decades of measurements, not extrapolation" is
the repo's bar for every other hot operator).

Usage: python tools/shaping_scale_probe.py

Runs chunk_documents, pack_sequences, stratified_sample (+ the exact
per-stratum variant) and merge_upsert on the documents table at sf0.1
and the 10x replica set (tools/scale_testdata.py, same generator the
bench uses), min-of-3 with the bench's GC isolation, and prints one
JSON line with per-op times and decade ratios.

Expected shapes (why each should be ~linear):
- chunk: posexplode over precomputed slice bounds — narrow, no shuffle;
- pack: one hash-partition shuffle into 256 streams + per-stream
  running sum — shuffle volume linear in rows;
- stratified_sample: scan + broadcast of the rates frame — no shuffle;
- merge_upsert: one full-outer shuffle join on the key digest.

One-off evidence tool (results recorded in SCALING.md), not part of
the per-round bench.
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

REPEATS = 3


def _ops(spark, sf_dir):
    from waterdata_spark.operators.chunking import chunk_documents, pack_sequences
    from waterdata_spark.operators.merge import merge_upsert
    from waterdata_spark.operators.sampling import (
        stratified_sample,
        stratified_sample_exact,
    )
    from waterdata_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")

    def chunk():
        return chunk_documents(docs, max_tokens=64, overlap=16)

    def pack():
        return pack_sequences(docs, budget_tokens=512)

    def sample():
        return stratified_sample(docs, "lang", {"en": 0.5, "de": 0.25, "fr": 0.1}, "doc_id")

    def sample_exact():
        return stratified_sample_exact(docs, "lang", 200, "doc_id")

    def merge():
        # upsert a 20% slice with edits + 5% deletes into the full table
        src = (
            docs.filter(F.hash("doc_id") % 5 == 0)
            .withColumn("n_chars", F.col("n_chars") + 1)
            .withColumn("__del", F.hash("doc_id") % 20 == 1)
        )
        return merge_upsert(docs, src, keys=["doc_id"], delete_col="__del")

    def decontam():
        # eval set: 13-token spans cut from 50 documents — every one a
        # guaranteed hit, so the flag path does real work
        from waterdata_spark.operators.decontaminate import decontaminate

        ev = (
            docs.filter(F.col("doc_id") % 100 == 0)
            .limit(50)
            .select(
                F.col("doc_id").alias("eid"),
                F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 3, 13), " ").alias(
                    "etext"
                ),
            )
        )
        return decontaminate(docs, ev, n=13, eval_id_col="eid", eval_text_col="etext")

    def line_dedup():
        from waterdata_spark.operators.dedup import dedup_lines_global

        return dedup_lines_global(docs.select("doc_id", "text"))

    def span_dedup():
        from waterdata_spark.operators.dedup import dedup_spans_global

        return dedup_spans_global(docs.select("doc_id", "text"))

    def dsir():
        # target = a 1-in-9 slice of the corpus; k = 10% of docs
        from waterdata_spark.operators.selection import importance_resample

        d = docs.select("doc_id", "text")
        target = d.filter(F.col("doc_id") % 9 == 1).select("text")
        k = max(100, d.count() // 10)
        return importance_resample(d, target, k=k)

    def html_extract():
        # wrap each doc in markup so the chain does real work
        from waterdata_spark.functions.text import html_to_text

        wrapped = docs.select(
            "doc_id",
            F.concat(
                F.lit("<html><body><script>var x=1;</script><p>"),
                F.regexp_replace("text", r"\n", "</p><p>"),
                F.lit("</p></body></html>"),
            ).alias("raw"),
        )
        return wrapped.select("doc_id", html_to_text("raw").alias("text"))

    def cross_dedup():
        # reference corpus = a 10% slice of the same docs → 10% of the
        # corpus near-dups against it by construction. Input
        # repartitioned at BOTH scales (x08 bench precedent): sf0.1's
        # documents table is ONE parquet file, which would pin both
        # MinHash scan passes to a single task and measure the layout,
        # not the operator.
        from waterdata_spark.operators.dedup_approx import dedup_against
        from waterdata_spark.session import default_parallelism

        d = docs.select("doc_id", "text").repartition(default_parallelism())
        ref = d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 10**7).alias("doc_id"), "text"
        )
        return dedup_against(d, ref)

    return {
        "chunk_documents": chunk,
        "pack_sequences": pack,
        "stratified_sample": sample,
        "stratified_sample_exact": sample_exact,
        "merge_upsert": merge,
        "decontaminate": decontam,
        "dedup_lines_global": line_dedup,
        "dedup_spans_global": span_dedup,
        "importance_resample": dsir,
        "html_to_text": html_extract,
        "dedup_against": cross_dedup,
    }


def _time_suite(spark, sf_dir):
    out, rows = {}, {}
    for name, fn in _ops(spark, sf_dir).items():
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            df = fn()
            n = _drain(df)  # full-column materialization (bench.py r6:
            # a bare count() prunes payload compute — e.g. line-dedup's
            # reassembled text never built, aggregates' sums skipped)
            runs.append(round(time.time() - t0, 3))
            del df
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        out[name], rows[name] = min(runs), n
        print(f"# {sf_dir} {name}: {n} rows, min {min(runs)}s of {runs}", file=sys.stderr)
    return out, rows


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    spark = get_spark("shaping-scale-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()  # warm workers

    t01, rows01 = _time_suite(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    t1, rows1 = _time_suite(spark, sf1)
    print(
        json.dumps(
            {
                "metric": "shaping_scale_probe",
                "sf0.1": t01,
                "sf1": t1,
                "rows_sf1": rows1,
                "decade_ratio": {k: round(t1[k] / max(t01[k], 0.05), 2) for k in t1},
                "row_ratio": {k: round(rows1[k] / max(rows01[k], 1), 2) for k in rows1},
            }
        )
    )


if __name__ == "__main__":
    main()
