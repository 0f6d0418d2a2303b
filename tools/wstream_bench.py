"""Streaming down-pipeline at scale: the 10x replica corpus through the
file-stream path (VERDICT r4 next-round #7).

Usage: python tools/wstream_bench.py [factor]

Replicates the reference's yearly fact CSVs ``factor`` times (reusing
wbench.replicate_facts — provenance-column shifts keep rows distinct
through the conform stage's dedup while join keys keep their real
distribution), stages them into a bronze landing zone (one Parquet file
per replica-year), and drives streaming/down_stream.py over it with
``availableNow`` — one micro-batch per file, i.e. the reference's
extract cadence replayed ``7 * factor`` times.

Records, in one JSON line:
- stream-vs-batch equality (order-independent row-hash fingerprint of
  the accumulated append output vs the all-at-once batch pipeline);
- bounded state: max state-store rows across all micro-batches (the
  conform stage's global exact dedup is the only stateful operator —
  its state is the distinct-row count by construction, and the JSON
  shows it growing to exactly that bound and no further);
- micro-batch count and wall time for both paths.

One-off evidence tool (results recorded in SCALING.md), not part of the
per-round bench.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.wbench import OUT, REF, replicate_facts  # noqa: E402

LANDING = "/tmp/waterdata_wstream_landing"


def fingerprint(df):
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols])
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(h.cast("decimal(38,0)")).alias("s")
    ).first()
    return row["n"], str(row["s"])


def main() -> None:
    from waterdata_spark.pipelines.down import down_csv_stage, down_join_stage
    from waterdata_spark.session import get_spark
    from waterdata_spark.streaming.down_stream import down_stream, stage_yearly_facts

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("wstream_bench")
    paths = replicate_facts(factor)

    # --- batch reference: the all-at-once pipeline on the same corpus
    t0 = time.time()
    site_sub, data = down_csv_stage(
        spark,
        spi_paths=sorted(glob.glob(f"{REF}/csvdispSPIp*.csv")),
        bi_paths=sorted(glob.glob(f"{REF}/csvdispBIp*.csv")),
        sites_xlsx=f"{REF}/ResultsSite.xlsx",
        data_paths=paths,
    )
    batch = down_join_stage(spark, site_sub, data)
    batch_fp = fingerprint(batch)
    t_batch = round(time.time() - t0, 2)

    # --- stream: land each replica-year once, then one micro-batch per file
    t0 = time.time()
    landed = stage_yearly_facts(spark, paths, LANDING)
    t_land = round(time.time() - t0, 2)

    t0 = time.time()
    out_stream = down_stream(spark, site_sub, LANDING)
    q = (
        out_stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("wstream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = list(q.recentProgress)
    t_stream = round(time.time() - t0, 2)

    data_batches = [p for p in progress if p["numInputRows"] > 0]
    state_rows = [
        op["numRowsTotal"] for p in progress for op in p.get("stateOperators", [])
    ]
    stream_fp = fingerprint(spark.sql("SELECT * FROM wstream_out"))

    print(
        json.dumps(
            {
                "metric": "down_stream_scale",
                "factor": factor,
                "files": len(landed),
                "micro_batches": len(data_batches),
                "rows": stream_fp[0],
                "stream_equals_batch": stream_fp == batch_fp,
                "max_state_rows": max(state_rows) if state_rows else 0,
                "land_sec": t_land,
                "stream_sec": t_stream,
                "batch_sec": t_batch,
            }
        )
    )


if __name__ == "__main__":
    main()
