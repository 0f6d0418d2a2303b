"""Pipeline integration tests (SURVEY.md §3/§5): the down conform+join
path runs against the reference's real shipped data (144,595 fact
rows); direct + compare run on reference-shaped fixtures; the 7-key
reconciliation join reproduces matches across the two channels."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.xlsx_util import write_xlsx
from waterdata_spark.pipelines.compare import compare_pipeline
from waterdata_spark.pipelines.direct import direct_pipeline, read_direct_workbook
from waterdata_spark.pipelines.down import down_csv_stage, down_join_stage

REF_DOWN = "/root/reference/down"
HAVE_REF = os.path.exists(f"{REF_DOWN}/csvdispSPIp1.csv")


@pytest.fixture(scope="module")
def down_outputs(spark):
    if not HAVE_REF:
        pytest.skip("reference data absent")
    site_sub, data = down_csv_stage(
        spark,
        spi_paths=sorted(glob.glob(f"{REF_DOWN}/csvdispSPIp*.csv")),
        bi_paths=sorted(glob.glob(f"{REF_DOWN}/csvdispBIp*.csv")),
        sites_xlsx=f"{REF_DOWN}/ResultsSite.xlsx",
        data_paths=sorted(glob.glob(f"{REF_DOWN}/rptinfo*.csv")),
    )
    return site_sub.cache(), data.cache()


class TestDownPipeline:
    def test_csv_stage_site_schema(self, down_outputs):
        site_sub, _ = down_outputs
        assert "Lat_Long_Address" in site_sub.columns
        assert len(site_sub.columns) == 24  # 23 fields + Lat_Long_Address

    def test_csv_stage_data_cleaned(self, down_outputs):
        _, data = down_outputs
        # PDF artifact repaired (down/down_water_prep.py:318)
        assert data.filter(F.col("Sample Type") == "DISTRIBUTIO N").count() == 0
        assert data.filter(F.col("Sample Type") == "DISTRIBUTION").count() > 0
        # dates de-spaced (:321)
        assert data.filter(F.col("Sample Date").contains(" ")).count() == 0

    def test_join_stage_row_preservation(self, spark, down_outputs):
        """C43: the hierarchical join must neither fan out nor drop
        (down/down_water_prep.py:540-543)."""
        site_sub, data = down_outputs
        out = down_join_stage(spark, site_sub, data)
        assert out.count() == data.count()

    def test_join_stage_enrichment_coverage(self, spark, down_outputs):
        site_sub, data = down_outputs
        out = down_join_stage(spark, site_sub, data)
        n = out.count()
        enriched = out.filter(F.col("ZIP_CODE").isNotNull() & (F.col("ZIP_CODE") != "")).count()
        # measured on the shipped reference data: 125,638/143,992 (87.3%)
        # get an address — the rest belong to systems whose SPI/BI pages
        # are not in the shipped subset
        assert enriched / n > 0.85


def _direct_fixture_sheets():
    si_header = [
        "PWSID", "SYSTYPE", "EPID", "SPID", "SYSNAME", "POPL", "AREACITY",
        "SYSOWNAM", "MAIL_ADDR1", "MAIL_ADDR2", "SYSLOCCY", "MAIL_ZIP",
    ]
    system_info = [
        si_header,
        [6430001, "CWS", 101, 701, "SCENIC MHP", 50, "MERCER", "OWNER A", "1 Main", None, "MERCER", "16137"],
        [6430002, "CWS", 102, 702, "OTHER SYS", 99, "BUTLER", "OWNER B", "2 Elm", "Apt 1", "BUTLER", "16001"],
    ]
    data_header = ["PWSID", "CONTAMID", "CONTNAM", "RESULT", "SAMPTYPE", "SAMPDATE", "SAMPTIME", "ANALDATE", "LOC_EPID"]
    data = [
        data_header,
        [6430001, 1040, "NITRATE", 1.1, "E", "8/4/2017", "09:00", "8/6/2017", 101],   # strict match (EPID)
        [6430001, 1040, "NITRATE", 1.2, "D", "8/5/2017", "09:00", "8/7/2017", 701],   # strict match (SPID)
        [6430002, 2950, "TTHM", 0.05, "D", "9/1/2017", "10:00", "9/3/2017", 999],     # loose match (PWSID only)
        [9999999, 1040, "NITRATE", 9.9, "E", "9/9/2017", "11:00", "9/9/2017", 101],   # no match → dropped
    ]
    violations = [["PWSID", "VIOLATION"], [6430001, "NONE"]]
    return {"System Info": system_info, "Violations": violations, "Data": data}


class TestDirectPipeline:
    def test_strict_loose_drop(self, spark, tmp_path):
        p = write_xlsx(str(tmp_path / "direct.xlsx"), _direct_fixture_sheets())
        sheets = read_direct_workbook(spark, p)
        out = direct_pipeline(spark, sheets["System Info"], sheets["Data"])
        rows = {(r["PWSID"], r["LOC_EPID"]): r for r in out.collect()}
        assert len(rows) == 3  # unmatched PWSID 9999999 dropped (C20)
        assert rows[(6430001, "101")]["MAIL_ZIP"] == "16137"
        assert rows[(6430001, "701")]["MAIL_ZIP"] == "16137"
        assert rows[(6430002, "999")]["MAIL_ZIP"] == "16001"  # loose tier

    def test_range_gate_fires(self, spark, tmp_path):
        from waterdata_spark.operators.expectations import ExpectationError

        sheets = _direct_fixture_sheets()
        sheets["System Info"][1][2] = 999  # EPID out of [100,199]
        p = write_xlsx(str(tmp_path / "bad.xlsx"), sheets)
        loaded = read_direct_workbook(spark, p)
        with pytest.raises(ExpectationError):
            direct_pipeline(spark, loaded["System Info"], loaded["Data"])


class TestComparePipeline:
    def test_seven_key_reconciliation(self, spark):
        down = spark.createDataFrame(
            [
                # matches direct row 1 on all 7 keys
                ("n101", "NITRATE", "1.1", ".", "08/04/2017", "ENTRY POINT", "8/6/2017", 6430001, "SCENIC MHP "),
                # differs on Sample Date → no match
                ("n101", "NITRATE", "1.3", ".", "08/05/2017", "ENTRY POINT", "8/6/2017", 6430001, "SCENIC MHP"),
            ],
            "`Sample Location` string, `Contaminant ID` string, `Analysis Result` string, "
            "`MCL In Effect` string, `Sample Date` string, `Sample Type` string, "
            "`Analysis Date` string, PWSID long, `SYSTEM NAME` string",
        )
        direct = spark.createDataFrame(
            [(6430001, 1040, "NITRATE", 1.1, "E", "8/4/2017", "09:00", "8/6/2017", "SCENIC MHP", "101", "16137", "x")],
            "PWSID long, CONTAMID long, CONTNAM string, RESULT double, SAMPTYPE string, "
            "SAMPDATE string, SAMPTIME string, ANALDATE string, SYSNAME string, LOC_EPID string, "
            "MAIL_ZIP string, MAIL_ADDR2 string",
        )
        out = compare_pipeline(spark, down, direct)
        rows = out.collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["RESULT"] == 1.1 and r["Analysis Result"] == 1.1
        assert r["row_num_down"] is not None and r["row_num_direct"] is not None

    def test_compat_sentinel_date(self, spark):
        """Sentinel analysis dates join via the 1/9/1999 default
        (compare.py:63) when compat is on."""
        down = spark.createDataFrame(
            [("n101", "LEAD", "0.01", ".", "08/04/2017", "DISTRIBUTION", ".", 1, "S")],
            "`Sample Location` string, `Contaminant ID` string, `Analysis Result` string, "
            "`MCL In Effect` string, `Sample Date` string, `Sample Type` string, "
            "`Analysis Date` string, PWSID long, `SYSTEM NAME` string",
        )
        direct = spark.createDataFrame(
            [(1, 1, "LEAD", 0.01, "D", "8/4/2017", "09:00", "1/9/1999", "S", "101", "16137", None)],
            "PWSID long, CONTAMID long, CONTNAM string, RESULT double, SAMPTYPE string, "
            "SAMPDATE string, SAMPTIME string, ANALDATE string, SYSNAME string, LOC_EPID string, "
            "MAIL_ZIP string, MAIL_ADDR2 string",
        )
        assert compare_pipeline(spark, down, direct, compat_date_default=True).count() == 1
        assert compare_pipeline(spark, down, direct, compat_date_default=False).count() == 0


class TestDownStreaming:
    def test_stream_equals_batch_on_full_corpus(self, spark, down_outputs, tmp_path):
        """The reference lifecycle driven INCREMENTALLY (VERDICT r3
        missing #5): each yearly extract lands as one file, the stream
        picks it up as its own micro-batch (≥7 batches), conforms it,
        and fallback-joins the static site dim — and the accumulated
        append output equals the all-at-once batch pipeline on the
        full 144,595-row corpus, column for column."""
        from waterdata_spark.streaming.down_stream import down_stream, stage_yearly_facts

        site_sub, data = down_outputs
        batch = down_join_stage(spark, site_sub, data)

        landing = str(tmp_path / "landing")
        landed = stage_yearly_facts(
            spark, sorted(glob.glob(f"{REF_DOWN}/rptinfo*.csv")), landing
        )
        assert len(landed) == 7
        # idempotent re-landing: second call stages nothing new
        assert stage_yearly_facts(spark, sorted(glob.glob(f"{REF_DOWN}/rptinfo*.csv")), landing) == landed

        stream_df = down_stream(spark, site_sub, landing)
        assert stream_df.isStreaming
        q = (
            stream_df.writeStream.outputMode("append")
            .format("memory")
            .queryName("down_incremental")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(data_batches) >= 7  # one micro-batch per yearly file
        out = spark.sql("SELECT * FROM down_incremental")

        def fingerprint(df):
            cols = sorted(df.columns)
            h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols])
            row = df.agg(
                F.count(F.lit(1)).alias("n"), F.sum(h.cast("decimal(38,0)")).alias("s")
            ).first()
            return row["n"], row["s"]

        assert sorted(out.columns) == sorted(batch.columns)
        assert fingerprint(out) == fingerprint(batch)


class TestDownPublish:
    def test_partitioned_publish_and_pruning(self, spark, tmp_path, down_outputs):
        import glob as _glob

        from waterdata_spark.pipelines.down import down_publish, down_join_stage
        from waterdata_spark.plans.explain import plan_summary

        site_sub, data = down_outputs
        final = down_join_stage(spark, site_sub, data)
        published = down_publish(final, str(tmp_path / "gold"))
        # one directory per sample year on disk
        years = sorted(
            p.split("=")[-1] for p in _glob.glob(str(tmp_path / "gold" / "sample_year=*"))
        )
        assert len(years) >= 7
        # partition pruning: a single-year query reads one partition
        one_year = published.filter(F.col("sample_year") == int(years[0]))
        s = plan_summary(one_year)
        assert any("sample_year" in p for p in [s.text]) and one_year.count() > 0
        assert published.count() == final.count()


class TestCurateCorpus:
    """pipelines/curate — the composed crawl-to-training-set cascade
    (one lazy plan, observe()-instrumented funnel)."""

    ROWS = [
        (1, "the quick brown fox jumps over the lazy dog and runs far away today"),
        (2, "the quick brown fox jumps over the lazy dog and runs far away today"),
        (3, "the quick brown fox jumps over the lazy dog and runs far away tonight"),
        (4, "COOKIE BANNER ACCEPT ALL\ndifferent content about spark engines\nCOOKIE BANNER ACCEPT ALL"),
        (5, "COOKIE BANNER ACCEPT ALL\nanother document body mentioning water data\nCOOKIE BANNER ACCEPT ALL"),
        (6, "contact me at john.doe@example.com for details about the dataset release"),
    ]

    def test_cascade_and_funnel(self, spark):
        from waterdata_spark.pipelines.curate import curate_corpus

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        res = curate_corpus(
            df,
            boilerplate_min_docs=2,
            near_dup={"n_hashes": 16, "n_bands": 8, "k": 4, "threshold": 0.5},
            redact=True,
        )
        got = {r["doc_id"]: r["text"] for r in res.df.collect()}
        # exact dup 2 gone; near dup 3 gone; banner stripped from 4/5;
        # PII redacted in 6; lowest ids survive their clusters
        assert set(got) == {1, 4, 5, 6}
        assert "COOKIE BANNER" not in got[4] and "COOKIE BANNER" not in got[5]
        assert "john.doe@example.com" not in got[6] and "<EMAIL>" in got[6]
        funnel = dict(res.report())
        assert funnel["input"] == 6
        assert funnel["exact_dedup"] == 5
        assert funnel["near_dup"] == 4
        assert funnel["redact_pii"] == 4
        # monotone non-increasing
        vals = [v for _, v in res.report()]
        assert all(a >= b for a, b in zip(vals, vals[1:]))

    def test_stage_barrier_frames(self, spark):
        # r13: stage_barrier=True must (a) leave the final frame
        # value-identical to the unbarriered run, (b) expose each
        # stage's output in .frames equal to the matching PREFIX run
        # (the w03 funnel contract), and (c) keep the observe() funnel
        # firing exactly once per stage under audit=True.
        from waterdata_spark.pipelines.curate import curate_corpus

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        kw = dict(exact_dedup=True, boilerplate_min_docs=2, redact=True)
        plain = curate_corpus(df, audit=False, **kw)
        res = curate_corpus(df, stage_barrier=True, **kw)

        assert [n for n, _ in res.stages] == list(res.frames)
        assert sorted(map(tuple, res.df.collect())) == sorted(
            map(tuple, plain.df.collect())
        )
        # each captured frame == running only the prefix of stages
        prefixes = {
            "exact_dedup": dict(exact_dedup=True),
            "boilerplate": dict(exact_dedup=True, boilerplate_min_docs=2),
            "redact_pii": kw,
        }
        for name, pkw in prefixes.items():
            want = sorted(
                map(tuple, curate_corpus(df, audit=False, **pkw).df.collect())
            )
            assert sorted(map(tuple, res.frames[name].collect())) == want, name
        # observations: one fire per stage, counts match the frames
        res.df.count()
        funnel = dict(res.report())
        assert funnel["input"] == 6
        for name, frame in res.frames.items():
            assert funnel[name] == frame.count(), name

    def test_url_filter_stage_runs_first(self, spark):
        """r10: url_filter is RefinedWeb §3.1's stage 0 — rows drop by
        URL before any content work, the funnel shows it first, and
        the strict PSL-keyed form threads through."""
        from waterdata_spark.functions.urls import load_psl
        from waterdata_spark.pipelines.curate import curate_corpus

        rows = [
            (i, t, u)
            for (i, t), u in zip(
                self.ROWS,
                [
                    "https://user1.github.io/a",
                    "https://good.example.com/b",
                    "https://good.example.com/c",
                    "https://user2.github.io/d",
                    "https://blocked.example.org/e",
                    "https://good.example.com/f",
                ],
            )
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, url string")
        bl = spark.createDataFrame(
            [("user1.github.io",), ("blocked.example.org",)], "domain string"
        )
        res = curate_corpus(
            df, url_filter={"blocklist": bl, "url_col": "url"}, exact_dedup=True
        )
        ids = {r["doc_id"] for r in res.df.collect()}
        assert 1 not in ids and 5 not in ids  # URL-blocked
        # doc 1 (the exact-dup twin of 2) left by URL, so dedup keeps 2/3
        assert {2, 3, 4, 6} == ids
        funnel = res.report()
        assert funnel[1][0] == "url_filter" and funnel[1][1] == 4
        # strict registered-domain form: user2.github.io survives a
        # blocklist naming only user1.github.io even under PSL matching
        res2 = curate_corpus(
            df,
            url_filter={
                "blocklist": bl,
                "url_col": "url",
                "match_on": "registered_domain",
                "psl": load_psl(),
            },
            exact_dedup=False,
        )
        ids2 = {r["doc_id"] for r in res2.df.collect()}
        # strict mode matches only registrable-domain-keyed entries:
        # user1.github.io IS a registrable domain (PSL private suffix)
        # → doc 1 blocked; blocked.example.org sits BELOW example.org's
        # registrable level → doc 5 survives (the suffix-chain default
        # above blocked it)
        assert ids2 == {2, 3, 4, 5, 6}
        import pytest as _pytest

        with _pytest.raises(ValueError, match="blocklist"):
            curate_corpus(df, url_filter={"url_col": "url"})

    def test_classifier_gate_stage(self, spark):
        """r12 (VERDICT r11 item 5): the trained-classifier gate —
        train LR on a labeled slice, pick the operating point with
        pr_sweep, gate the corpus; survivors pinned, funnel audited."""
        from waterdata_spark.operators.classify import lr_score, lr_train, pr_sweep
        from waterdata_spark.pipelines.curate import curate_corpus

        def good(i):
            return (
                i,
                f"measured river discharge and lake hydrology report {i} "
                "with calibrated sensors and documented methodology",
            )

        def bad(i):
            return (
                100 + i,
                f"click here {i} buy cheap pills now amazing offer "
                "winner prize claim free money casino",
            )

        labeled = spark.createDataFrame(
            [(d, t, 1) for d, t in (good(i) for i in range(8))]
            + [(d, t, 0) for d, t in (bad(i) for i in range(8))],
            "doc_id long, text string, y int",
        )
        model = lr_train(
            labeled.select("doc_id", "y", "text"),
            n_buckets=1024,
            n_iter=8,
            learning_rate=0.5,
        )
        scored = lr_score(labeled, model)
        sweep = {
            r["threshold"]: r
            for r in pr_sweep(
                scored, "lr_prob", "y", [0.3, 0.5, 0.7]
            ).collect()
        }
        # pick the threshold with the fewest errors (the documented
        # operating-point selection step)
        thr = min(sweep, key=lambda t: sweep[t]["fp"] + sweep[t]["fn"])
        assert sweep[thr]["fp"] + sweep[thr]["fn"] == 0  # separable here
        corpus = spark.createDataFrame(
            [good(i) for i in range(20, 26)] + [bad(i) for i in range(20, 26)],
            "doc_id long, text string",
        )
        res = curate_corpus(
            corpus,
            exact_dedup=False,
            classifier_gate={"model": model, "threshold": thr},
        )
        got = {r["doc_id"] for r in res.df.collect()}
        assert got == {i for i in range(20, 26)}
        funnel = dict(res.report())
        assert funnel["input"] == 12 and funnel["classifier_gate"] == 6
        # the gate's score columns do not leak into the output
        assert "lr_prob" not in res.df.columns

    def test_host_cap_stage(self, spark):
        """r11 (VERDICT r10 item 6): the per-registered-domain
        frequency cap composes into the cascade — survivors pinned,
        funnel audited, hostless docs never capped, and the PSL form
        keeps sibling private-suffix subdomains apart."""
        from waterdata_spark.functions.urls import load_psl
        from waterdata_spark.pipelines.curate import curate_corpus

        rows = (
            [
                (i, f"hot domain document number {i} body", "https://a.hot.example.com/p")
                for i in range(8)
            ]
            + [
                (10, "small domain first document body", "https://small.example.org/x"),
                (11, "small domain second document body", "https://small.example.org/y"),
                (20, "document with no url at all body", None),
                (21, "another document with no url body", None),
            ]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string, url string")
        res = curate_corpus(
            df,
            exact_dedup=True,
            host_cap={"max_docs": 3, "url_col": "url", "order_by": ["doc_id"]},
        )
        ids = {r["doc_id"] for r in res.df.collect()}
        # hot.example.com -> example.com group capped to lowest 3 ids;
        # small.example.org under its cap; BOTH hostless docs survive
        # (never capped) even though max_docs < their count
        assert ids == {0, 1, 2, 10, 11, 20, 21}
        funnel = dict(res.report())
        assert funnel["host_cap"] == 7 and funnel["exact_dedup"] == 12

        # PSL grouping: user1/user2.github.io are SEPARATE registrable
        # domains under the PSL (private suffix) — cap 2 keeps all 4;
        # the short built-in table collapses them to github.io — cap 2
        # keeps only 2
        rows2 = [
            (1, "gh page one body text", "https://user1.github.io/a"),
            (2, "gh page two body text", "https://user1.github.io/b"),
            (3, "gh page three body text", "https://user2.github.io/c"),
            (4, "gh page four body text", "https://user2.github.io/d"),
        ]
        df2 = spark.createDataFrame(rows2, "doc_id long, text string, url string")
        with_psl = curate_corpus(
            df2,
            exact_dedup=False,
            host_cap={
                "max_docs": 2, "url_col": "url", "order_by": ["doc_id"],
                "psl": load_psl(),
            },
        )
        assert {r["doc_id"] for r in with_psl.df.collect()} == {1, 2, 3, 4}
        without = curate_corpus(
            df2,
            exact_dedup=False,
            host_cap={"max_docs": 2, "url_col": "url", "order_by": ["doc_id"]},
        )
        assert {r["doc_id"] for r in without.df.collect()} == {1, 2}
        # the window plan is semantically identical
        win = curate_corpus(
            df2,
            exact_dedup=False,
            host_cap={
                "max_docs": 2, "url_col": "url", "order_by": ["doc_id"],
                "plan": "window",
            },
        )
        assert {r["doc_id"] for r in win.df.collect()} == {1, 2}

    def test_html_extract_stage(self, spark):
        """r10: html_extract is stage 0.5 (the trafilatura position) —
        pages extract to boilerplate-free text INTO text_col, nav-only
        pages drop, and downstream stages (exact dedup) see the
        extracted text, not the raw page."""
        from waterdata_spark.pipelines.curate import curate_corpus

        body1 = (
            "This is the main article body and it is comfortably long "
            "enough to pass the block length gate in the extractor."
        )
        nav = (
            '<div><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/b">More</a></div>'
        )
        page = f"<html><body>{nav}<p>{body1}</p></body></html>"
        # docs 1 and 2: DIFFERENT nav rails, SAME body -> only the
        # extracted text is an exact dup; doc 3: nav-only page -> drops
        rows = [
            (1, page),
            (2, f'<html><body><div><a href="/z">Other nav</a></div><p>{body1}</p></body></html>'),
            (3, f"<html><body>{nav}</body></html>"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        res = curate_corpus(df, html_extract=True, exact_dedup=True)
        got = {r["doc_id"]: r["text"] for r in res.df.collect()}
        assert set(got) == {1}  # 2 deduped against 1, 3 dropped empty
        assert got[1] == body1
        funnel = dict(res.report())
        assert funnel["html_extract"] == 2 and funnel["exact_dedup"] == 1
        # {} enables with defaults (the ADVICE r8 contract)
        res2 = curate_corpus(df, html_extract={}, exact_dedup=False)
        assert {r["doc_id"] for r in res2.df.collect()} == {1, 2}

    def test_empty_dict_enables_stage(self, spark):
        """ADVICE r8: `{}` — the natural 'enable with defaults'
        spelling — must RUN the dict|bool stages, not silently skip
        them (truthiness treated {} as False for quality_gate and
        near_dup while span_dedup={} ran)."""
        from waterdata_spark.pipelines.curate import curate_corpus

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        res = curate_corpus(df, exact_dedup=False, quality_gate={}, near_dup={})
        names = [n for n, _ in res.stages]
        assert "quality_gate" in names and "near_dup" in names
        res.df.count()
        funnel = dict(res.report())
        assert "quality_gate" in funnel and "near_dup" in funnel

    def test_decontaminate_stage_and_audit_off(self, spark):
        from waterdata_spark.pipelines.curate import curate_corpus

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        evals = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog and runs far away today")],
            "eid long, text string",
        )
        res = curate_corpus(
            df,
            exact_dedup=True,
            decontaminate_eval=evals.selectExpr("eid as doc_id", "text"),
            decontaminate_n=13,
            audit=False,
        )
        assert res.input_rows is None and res.stages == []
        ids = {r["doc_id"] for r in res.df.collect()}
        # docs 1 (and its dup 2, already exact-deduped) hit the eval
        # 13-gram; doc 3 shares a 13-gram prefix with the eval text too
        assert 1 not in ids and 2 not in ids
        assert {4, 5, 6} <= ids

    def test_normalize_feeds_exact_dedup(self, spark):
        import unicodedata

        from waterdata_spark.pipelines.curate import curate_corpus

        nfc = unicodedata.normalize("NFC", "café corpus body text")
        nfd = unicodedata.normalize("NFD", "café corpus body text")
        df = spark.createDataFrame(
            [(1, nfc), (2, nfd), (3, "unrelated")], "doc_id long, text string"
        )
        res = curate_corpus(df, unicode_normalize=True)
        ids = sorted(r["doc_id"] for r in res.df.collect())
        assert ids == [1, 3]
        assert dict(res.report())["exact_dedup"] == 2
