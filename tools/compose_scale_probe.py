"""Three-decade probe for the COMPOSED r10/r11 front half of the
cascade (VERDICT r10 item 7): main-content extraction as curate stage
0.5 feeds every later stage, so the number that matters is the
composed funnel, not the stage in isolation —

    HTML pages -> curate_corpus(html_extract + exact_dedup +
    host_cap) -> chunk_documents_sentences

one action end-to-end. Pages synthesize from the documents table with
the content probe's construction (nav boilerplate + two body blocks +
a short near-good heading) plus a per-doc URL over |docs|/~20 domains
so the r11 host_cap stage does real grouping work. The chain is
regexp passes, explodes, per-document windows, one digest groupBy and
one bounded domain window — nothing super-linear, so per-document
core cost must fall (or hold) across sf0.1 -> sf1 -> sf10.

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

REPEATS = int(os.environ.get("COMPOSE_PROBE_REPEATS", "3"))
CAP = 40  # per-domain cap: bites the hot tail at every scale


def _block(spark, sf_dir: str) -> dict:
    from waterdata_spark.operators.chunking import chunk_documents_sentences
    from waterdata_spark.pipelines.curate import curate_corpus
    from waterdata_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()  # warm page cache
    n_domains = max(n_docs // 20, 1)  # ~20 docs/domain, plus one hot domain
    # DISTINCT registrable domains (siteN.com — a shared parent like
    # siteN.example.com would collapse every page into ONE group, which
    # a first cut of this probe did); every 3rd doc goes to the hot
    # domain so the cap's skew branch does real work at every scale
    dom = F.when(F.col("doc_id") % 3 == 0, F.lit(0)).otherwise(
        F.col("doc_id") % n_domains
    )
    third = "CAST(floor(length(text) / 3) AS INT)"
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www.site"), dom.cast("string"), F.lit(".com/p")
        ).alias("url"),
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

    def run():
        res = curate_corpus(
            pages,
            html_extract=True,
            exact_dedup=True,
            host_cap={"max_docs": CAP, "url_col": "url"},
            audit=False,  # probe times the plan, not the funnel report
        )
        return chunk_documents_sentences(
            res.df, max_tokens=128, boundary=r"\.\s+"
        )

    runs, n_chunks = [], 0
    for _ in range(REPEATS):
        t0 = time.time()
        n_chunks = _drain(run())
        runs.append(round(time.time() - t0, 3))
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    sec = min(runs)
    # one audited pass for the funnel (not timed)
    res = curate_corpus(
        pages,
        html_extract=True,
        exact_dedup=True,
        host_cap={"max_docs": CAP, "url_col": "url"},
    )
    out = chunk_documents_sentences(res.df, max_tokens=128, boundary=r"\.\s+")
    out.count()
    funnel = dict(res.report())
    return {
        "docs": n_docs,
        "domains": n_domains,
        "sec": sec,
        "runs": runs,
        "chunks": n_chunks,
        "core_us_per_doc": round(1e6 * sec * 32 / max(n_docs, 1), 2),
        "funnel": funnel,
    }


def main() -> None:
    from tools.scale_testdata import ensure_scaled
    from waterdata_spark.session import get_spark

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/waterdata_spark_sf1")
    sf10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/waterdata_spark_sf10")
    spark = get_spark("compose-scale-probe")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {"metric": "compose_scale_probe", "cap": CAP, "repeats": REPEATS}
    out["sf0.1"] = _block(spark, sf01)
    assert ensure_scaled(spark, sf01, sf1, factor=10)
    out["sf1"] = _block(spark, sf1)
    if ensure_scaled(spark, sf1, sf10, factor=10):
        out["sf10"] = _block(spark, sf10)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
