"""Dedicated-JVM probe for the r9 Arrow partial-Gram PCA fit
(`operators/embeddings.fit_pca_gram`) — VERDICT r8 item 1: the exact
integer fit multiplies rows by d(d+1)/2 in its second-moment pass and
is impractical at production embedding dims; the gram fit must carry
the 100 TB contract at d>=512.

Workload: synthetic unit-range vectors written once to parquet per
(d, n) block — deterministic xxhash64-derived components, so the probe
measures the FIT, not a generator expression re-evaluated per scan.
Blocks (fresh child JVM each, min-of-3, GC between repeats, contention
sentinel around the block):

  d=64  exact @ 20k / 200k   — the r8 baseline path at its proven dim
  d=64  gram  @ 20k / 200k   — same workload, Arrow path (direct speedup)
  d=512 gram  @ 2k / 20k / 200k — production dims, two decades

Verdict recorded in SCALING.md. The judge's bar: per-row cost of
gram@d512 comparable to exact@d64 per-row cost."""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3
N_COMPONENTS = 16


def _dataset_path(d: int, n: int) -> str:
    return f"/tmp/pca_probe_d{d}_n{n}"


def _ensure_dataset(spark, d: int, n: int) -> str:
    from pyspark.sql import functions as F

    path = _dataset_path(d, n)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(d)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), i), F.lit(2_000_001)) - F.lit(1_000_000)
        ).cast("double")
        / F.lit(1_000_000.0),
    )
    (
        spark.range(n)
        .repartition(32)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _child(path: str, method: str) -> None:
    from bench import _sentinel_sec
    from waterdata_spark.operators.embeddings import fit_pca, fit_pca_gram
    from waterdata_spark.session import get_spark

    spark = get_spark("pca-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    df = spark.read.parquet(path)
    n = df.count()  # page-cache warm

    def fit():
        if method == "gram":
            return fit_pca_gram(df, "embedding", N_COMPONENTS).n
        return fit_pca(df, "embedding", N_COMPONENTS, method="exact").n

    fit()  # plan-compile warm, untimed
    sent_before = _sentinel_sec()
    runs = []
    for _ in range(REPEATS):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        fit()
        runs.append(round(time.monotonic() - t0, 3))
    sent_after = _sentinel_sec()
    drift = round(
        max(sent_before, sent_after) / max(min(sent_before, sent_after), 1e-9), 3
    )
    print(
        json.dumps(
            {
                "rows": n,
                "sec": min(runs),
                "runs": runs,
                # 32 local cores — core-ms/row for cross-block comparison
                "core_ms_per_row": round(min(runs) * 32 * 1000 / n, 4),
                "sentinel_drift": drift,
                "contended": drift > 1.15,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3])
        return

    from waterdata_spark.session import get_spark

    blocks = [
        ("d64_exact_20k", 64, 20_000, "exact"),
        ("d64_exact_200k", 64, 200_000, "exact"),
        ("d64_gram_20k", 64, 20_000, "gram"),
        ("d64_gram_200k", 64, 200_000, "gram"),
        ("d512_gram_2k", 512, 2_000, "gram"),
        ("d512_gram_20k", 512, 20_000, "gram"),
        ("d512_gram_200k", 512, 200_000, "gram"),
    ]
    spark = get_spark("pca-probe-datagen")
    for _, d, n, _m in blocks:
        _ensure_dataset(spark, d, n)
    spark.stop()
    os.sync()

    out: dict[str, object] = {"metric": "pca_scale_probe", "n_components": N_COMPONENTS}
    for label, d, n, method in blocks:
        r = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                _dataset_path(d, n),
                method,
            ],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            timeout=3000,
            check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out[label] = rec
        print(f"# {label}: {rec}", file=sys.stderr)

    def sec(k: str) -> float:
        return out[k]["sec"]  # type: ignore[index,call-overload]

    out["d64_gram_speedup_200k"] = round(sec("d64_exact_200k") / sec("d64_gram_200k"), 2)
    out["d512_gram_decade1"] = round(sec("d512_gram_20k") / sec("d512_gram_2k"), 2)
    out["d512_gram_decade2"] = round(sec("d512_gram_200k") / sec("d512_gram_20k"), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
