"""x07 IVF build phase timing (VERDICT r12 item 8).

The driver's x07_build_sec at sf10 swung 13.6s (r11) -> 19.4s (r12) on
identical code. This probe splits the build into its phases so the
swing can be attributed: (1) the count+dim aggregate, (2) the bounded
sample collect + driver Lloyd's, (3) the assignment pass
(pandas_udf + explode + optional int8 quantize) + persist fill. Each
phase is timed on a fresh build (cache released between runs), twice,
in one JVM; scan parallelism is reported because the scaled sf
replicas are ONE parquet file per table — if phase 3 dominates and its
task count is small, the fix is the x08-bench precedent (repartition
to the session parallelism before the pass).

Usage: python tools/ivf_build_probe.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from waterdata_spark.schemas import load_table  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/waterdata_spark_sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from waterdata_spark.operators.similarity import (
        _build_index,
        _probe_cells_udf,
        with_unit_vector,
    )

    spark = get_spark("ivf-build-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "320")
    e = load_table(spark, sf_dir, "embeddings")
    e.count()  # warm page cache
    n_files = e.rdd.getNumPartitions()

    out = {"sf_dir": sf_dir, "scan_partitions": n_files, "rounds": []}
    for _ in range(rounds):
        r = {}
        d_unit = with_unit_vector(e.select("vec_id", "embedding"), "embedding").select(
            F.col("vec_id"), F.col("__unit")
        )
        t0 = time.time()
        n, dim = d_unit.agg(
            F.count(F.lit(1)), F.coalesce(F.first(F.size("__unit")), F.lit(0))
        ).first()
        r["t_count_dim"] = round(time.time() - t0, 2)

        t0 = time.time()
        n_cells, C = _build_index(d_unit, "auto", 42, "kmeans")
        r["t_fit_total"] = round(time.time() - t0, 2)  # includes its own count
        r["n_cells"] = n_cells

        from waterdata_spark.operators.quantize import with_quantized_vector

        assign = _probe_cells_udf(C, 2)
        payload = with_quantized_vector(d_unit, "__unit", "__q", "__s").select(
            F.col("vec_id").alias("d_id"),
            F.col("__q").alias("d_q"),
            F.col("__s").alias("d_s"),
            F.explode(assign(F.col("__unit").cast("array<double>"))).alias("cell"),
        )
        t0 = time.time()
        p = payload.persist()
        p.count()
        r["t_assign_persist"] = round(time.time() - t0, 2)
        r["assign_tasks"] = p.rdd.getNumPartitions()
        p.unpersist()
        out["rounds"].append(r)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
