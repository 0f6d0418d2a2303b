"""Probe cap_per_group's skew-aware plan vs the naive global window.

The workload the operator is built for: almost all groups are under
the cap (the long tail of domains), a few are hot. The naive plan
windows EVERY row (a corpus-wide shuffle whose hottest partition is
the hot domain); the two-branch plan windows only the offenders' rows
and passes the bulk through a broadcast anti-join.

Built locally per decade: N rows over ~N/100 tail groups of ~90 rows
(under the cap of 100) plus 10% of rows pooled into 3 hot groups.
Measured: the operator vs the naive row_number()<=cap window, same
semantics (asserted equal), in BOTH row shapes:

- narrow (id + group): the naive window's shuffle is cheap, so the
  two-branch plan's extra machinery (count aggregate, double scan,
  joins, union) is pure overhead — the naive plan wins here, and the
  probe records that honestly.
- wide (~1 KB document payload — the shape the operator exists for):
  the naive window shuffles every payload byte; the smart plan's bulk
  branch is a broadcast anti-join with NO exchange, and only the hot
  10% of payloads ride the window shuffle.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _drain  # noqa: E402

REPEATS = int(os.environ.get("CAP_PROBE_REPEATS", "3"))
CAP = 100


def _timed(fn) -> float:
    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        _drain(fn())
        runs.append(round(time.time() - t0, 3))
        gc.collect()
    return min(runs)


def _block(spark, n_rows: int, wide: bool) -> dict:
    from waterdata_spark.operators.sampling import _hash_u, cap_per_group

    n_tail_groups = max(n_rows // 100, 1)
    cols = [
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0, F.concat(F.lit("hot"), (F.col("id") % 3))
        )
        .otherwise(F.concat(F.lit("g"), F.col("id") % n_tail_groups))
        .alias("g"),
    ]
    if wide:
        cols.append(F.repeat(F.md5(F.col("id").cast("string")), 32).alias("text"))
    df = spark.range(n_rows).select(*cols).persist()
    df.count()

    def smart():
        return cap_per_group(df, "g", CAP, id_col="doc_id")

    def naive():
        w = Window.partitionBy("g").orderBy(_hash_u("doc_id", "cap42"), F.col("doc_id"))
        return df.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= CAP
        ).drop("__rn")

    smart_sec = _timed(smart)
    naive_sec = _timed(naive)
    a, b = smart().count(), naive().count()
    assert a == b, (a, b)
    df.unpersist()
    return {
        "rows": n_rows,
        "tail_groups": n_tail_groups,
        "smart_sec": smart_sec,
        "naive_sec": naive_sec,
        "speedup": round(naive_sec / max(smart_sec, 1e-9), 2),
        "survivors": a,
    }


def main() -> None:
    from waterdata_spark.session import get_spark

    spark = get_spark("cap-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "cap_scale_probe", "cap": CAP}
    for m in (1, 8, 32):
        out[f"narrow_{m}m"] = _block(spark, m * 1_000_000, wide=False)
        print(f"# narrow {m}M: {out[f'narrow_{m}m']}", file=sys.stderr)
    for m in (1, 8):
        out[f"wide_{m}m"] = _block(spark, m * 1_000_000, wide=True)
        print(f"# wide {m}M: {out[f'wide_{m}m']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
