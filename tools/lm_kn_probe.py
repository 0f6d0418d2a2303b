"""At-birth probe for the Kneser-Ney LM path (r10): fit cost for both
smoothings, and score cost per doc across two decades (documents at
sf0.1/sf1 — 5k/50k docs) with the reference frozen at sf0.1's en
slice via fit_lm_tables (the streaming-gate form; score_lm ≡
lm_perplexity is test-pinned, so these numbers cover both spellings).

Expected shapes: fit is two aggregate scans of the REFERENCE (constant
here); score is one narrow bigram explode + broadcast joins + one
map-side mean — per-doc core cost should FALL with corpus scale like
every other linear pass. KN and JM share the identical scoring plan
class (three broadcast hash joins), so their decade curves should
track each other.
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

REPEATS = int(os.environ.get("LM_PROBE_REPEATS", "4"))
N_BUCKETS = 1 << 18


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.operators.selection import fit_lm_tables, score_lm
    from waterdata_spark.schemas import load_table
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    spark = get_spark("lm-kn-probe")
    spark.range(64).count()

    ref = (
        load_table(spark, sf01, "documents")
        .filter(F.col("lang") == "en")
        .select("text")
    )
    out: dict = {"metric": "lm_kn_probe", "n_buckets": N_BUCKETS, "fit": {}, "score": {}}
    tables = {}
    for sm in ("jm", "kn"):
        t0 = time.time()
        tables[sm] = fit_lm_tables(ref, n_buckets=N_BUCKETS, smoothing=sm)
        out["fit"][sm] = round(time.time() - t0, 3)
        print(f"# fit {sm}: {out['fit'][sm]}s", file=sys.stderr)

    assert ensure_scaled(spark, sf01, sf1, factor=10)
    for sf_dir in (sf01, sf1):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        blk = {}
        for sm in ("jm", "kn"):
            runs = []
            for _ in range(REPEATS):
                t0 = time.time()
                _drain(score_lm(docs, tables[sm]))
                runs.append(round(time.time() - t0, 3))
                gc.collect()
                spark.sparkContext._jvm.System.gc()
            sec = min(runs)
            blk[sm] = {
                "sec": sec,
                "core_ms_per_doc": round(1e3 * sec * 32 / max(n, 1), 3),
            }
            print(f"# {sf_dir} {sm}: {n} docs, min {sec}s of {runs}", file=sys.stderr)
        blk["docs"] = n
        out["score"][sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace("/", "")] = blk
    print(json.dumps(out))


if __name__ == "__main__":
    main()
