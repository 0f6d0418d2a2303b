"""Down-pipeline scale measurement: the reference workload at 1x and 10x.

Usage: python tools/wbench.py [factor]

Replicates the reference's yearly fact CSVs ``factor`` times into /tmp,
shifting only the provenance columns (MAIN_PAGE/SYSNAME_PAGE) so rows
stay distinct through the conform stage's ``distinct()`` while every
join key keeps its real distribution — the "same systems, more years of
samples" growth scenario. Runs conform + 3-tier fallback join at both
scales and prints one JSON line with the timings and ratio.

One-off evidence tool (results recorded in COVERAGE.md), not part of
the per-round bench.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

REF = "/root/reference/down"
OUT = "/tmp/waterdata_wbench_facts"


def replicate_facts(factor: int) -> list[str]:
    os.makedirs(OUT, exist_ok=True)
    paths = []
    for src in sorted(glob.glob(f"{REF}/rptinfo*.csv")):
        df = pd.read_csv(src, dtype=str)
        year = os.path.basename(src)
        for i in range(factor):
            rep = df.copy()
            if i:
                rep["MAIN_PAGE"] = (rep["MAIN_PAGE"].astype(int) + i * 1_000_000).astype(str)
                rep["SYSNAME_PAGE"] = (rep["SYSNAME_PAGE"].astype(int) + i * 1_000_000).astype(str)
            p = f"{OUT}/{i}_{year}"
            if not os.path.exists(p):
                rep.to_csv(p, index=False)
            paths.append(p)
    return paths


def run(spark, data_paths: list[str]) -> tuple[float, int]:
    from waterdata_spark.pipelines.down import down_csv_stage, down_join_stage

    t0 = time.time()
    site_sub, data = down_csv_stage(
        spark,
        spi_paths=sorted(glob.glob(f"{REF}/csvdispSPIp*.csv")),
        bi_paths=sorted(glob.glob(f"{REF}/csvdispBIp*.csv")),
        sites_xlsx=f"{REF}/ResultsSite.xlsx",
        data_paths=data_paths,
    )
    out = down_join_stage(spark, site_sub, data)
    n = out.count()
    return round(time.time() - t0, 2), n


def main() -> None:
    from waterdata_spark.session import get_spark

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("wbench")
    base = sorted(glob.glob(f"{REF}/rptinfo*.csv"))
    t_warm, _ = run(spark, base)  # plan compile + JVM warm
    t1, n1 = run(spark, base)
    paths = replicate_facts(factor)
    tN, nN = run(spark, paths)
    print(
        json.dumps(
            {
                "metric": "down_pipeline_scale",
                "warm_1x_sec": t1,
                "rows_1x": n1,
                f"warm_{factor}x_sec": tN,
                f"rows_{factor}x": nN,
                "time_ratio": round(tN / t1, 2),
                "data_ratio": round(nN / n1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
