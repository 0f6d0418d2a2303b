"""Three-decade probe for main-content extraction (operators/content):

The chain is one regexp pass + one posexplode + one per-document
window + one grouped reassembly — nothing super-linear, so per-page
core cost must fall (or hold) across sf0.1 → sf1 → sf10 documents
(5k/50k/500k pages synthesized from the documents table, same
construction as the x11 'main' oracle leg but with a third body block
so the near-good window does real work).

Protocol: min-of-N per scale in one JVM, GC between repeats, full
drain. Results -> SCALING.md.
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

REPEATS = int(os.environ.get("CONTENT_PROBE_REPEATS", "4"))


def _pages(docs):
    third = "CAST(floor(length(text) / 3) AS INT)"
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><body><div id="nav"><a href="/">Home</a> '
                '<a href="/a">Section A</a> <a href="/b">Section B</a></div><p>'
            ),
            F.expr(f"substr(text, 1, {third})"),
            F.lit("</p><p>short middle heading line</p><p>"),
            F.expr(f"substr(text, {third} + 1)"),
            F.lit(
                '</p><div class="rel"><a href="/x">More one</a> '
                '<a href="/y">More two</a></div></body></html>'
            ),
        ).alias("html"),
    )


def _block(spark, sf_dir: str) -> dict:
    from waterdata_spark.operators.content import extract_main_content
    from waterdata_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()  # warm page cache
    pages = _pages(docs)

    runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        _drain(extract_main_content(pages))
        runs.append(round(time.time() - t0, 3))
        gc.collect()
    sec = min(runs)
    kept = extract_main_content(pages).filter(F.col("main_text") != "").count()
    return {
        "pages": n_docs,
        "sec": sec,
        "core_us_per_page": round(1e6 * sec * 32 / max(n_docs, 1), 2),
        "pages_with_content": kept,
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("content-scale-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "content_scale_probe"}
    out["sf0.1"] = _block(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1)
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
