"""Unit tests for the scalar cleaning + text function library
(SURVEY.md §2.6 and §2.9/X4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from waterdata_spark.functions.cleaning import (
    clean_sentinels,
    coalesce_suffixed,
    concat_address,
    normalize_key,
    parse_us_date,
    prefix_tag,
    strip_float_suffix,
    strip_inner_spaces,
    with_unit_column,
)
from waterdata_spark.functions.text import (
    char_shingles,
    doc_fingerprint,
    lang_id_score,
    punct_count,
    quality_features,
    token_count,
    tokens,
)


def one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


class TestCleaning:
    def test_clean_sentinels(self, spark):
        df = spark.createDataFrame([(".",), ("nan",), (" NaN ",), ("",), ("0.46",)], "x string")
        vals = [r["v"] for r in df.select(clean_sentinels("x").alias("v")).collect()]
        assert vals == [None, None, None, None, "0.46"]

    def test_parse_us_date_with_spaces(self, spark):
        # embedded-space dates occur in the PDF extracts (compare.py:59)
        df = spark.createDataFrame([("04/ 12/2019",), ("1/9/1999",), (".",)], "d string")
        vals = [str(r["v"]) for r in df.select(parse_us_date("d").alias("v")).collect()]
        assert vals == ["2019-04-12", "1999-01-09", "None"]

    def test_parse_us_date_compat_default(self, spark):
        # reference maps sentinel dates to 1/9/1999 (compare.py:63)
        df = spark.createDataFrame([(".",)], "d string")
        v = one(df, parse_us_date("d", compat_date_default=True))
        assert str(v) == "1999-01-09"

    def test_strip_inner_spaces(self, spark):
        df = spark.createDataFrame([("a b\tc",)], "x string")
        assert one(df, strip_inner_spaces("x")) == "abc"

    def test_strip_float_suffix(self, spark):
        df = spark.createDataFrame([("123.0",), ("123",)], "x string")
        vals = [r["v"] for r in df.select(strip_float_suffix("x").alias("v")).collect()]
        assert vals == ["123", "123"]

    def test_prefix_tag(self, spark):
        # 'n'+key hack (down/down_water_prep.py:470-471)
        df = spark.createDataFrame([("6430001.0",)], "x string")
        assert one(df, prefix_tag("x")) == "n6430001"

    def test_coalesce_suffixed(self, spark):
        df = spark.createDataFrame([(None, "filled"), ("kept", "ignored")], "a string, a_y string")
        out = coalesce_suffixed(df, ["a"])
        assert out.columns == ["a"]
        assert sorted(r["a"] for r in out.collect()) == ["filled", "kept"]

    def test_concat_address_skips_nulls(self, spark):
        # replaces the ADDRESS2-null branch at down/down_water_prep.py:404-406
        df = spark.createDataFrame(
            [("1 Main St", None, "Mercer", "PA"), ("2 Elm", "Apt 3", "Butler", "PA")],
            "a1 string, a2 string, city string, st string",
        )
        vals = [r["v"] for r in df.select(concat_address("a1", "a2", "city", "st").alias("v")).collect()]
        assert vals == ["1 Main St, Mercer, PA", "2 Elm, Apt 3, Butler, PA"]

    def test_unit_column(self, spark):
        df = spark.createDataFrame(
            [("LEAD",), ("PFOA (PERFLUOROOCTANOIC ACID)",), ("COMBINED RADIUM-226 & 228",)],
            "contaminant string",
        )
        vals = [r["unit"] for r in with_unit_column(df, "contaminant").collect()]
        assert vals == ["mg/L", "ng/L", "pCi/L"]

    def test_normalize_key(self, spark):
        df = spark.createDataFrame([("  GREENVILLE   WATER  Co ",)], "x string")
        assert one(df, normalize_key("x")) == "greenville water co"


class TestText:
    def test_tokens_and_count(self, spark):
        df = spark.createDataFrame([("  the quick  brown   fox ",), ("",)], "t string")
        counts = [r["v"] for r in df.select(token_count("t").alias("v")).collect()]
        assert counts == [4, 0]
        toks = one(df.limit(1), tokens("t"))
        assert toks == ["the", "quick", "brown", "fox"]

    def test_punct_count(self, spark):
        df = spark.createDataFrame([("a, b! c?",)], "t string")
        assert one(df, punct_count("t")) == 3

    def test_lang_id_score_whole_tokens(self, spark):
        df = spark.createDataFrame([("the theory of the band",)], "t string")
        assert one(df, lang_id_score("t", "en")) == 3  # 'theory'/'band' don't count

    def test_char_shingles(self, spark):
        df = spark.createDataFrame([("abcdefghij",), ("ab",)], "t string")
        rows = df.select(char_shingles("t", 8).alias("v")).collect()
        assert rows[0]["v"] == ["abcdefgh", "bcdefghi", "cdefghij"]
        assert rows[1]["v"] == ["ab"]  # shorter than k → whole text

    def test_fingerprint_deterministic_and_shift_invariant(self, spark):
        df = spark.createDataFrame([("hello world, this is a doc",)], "t string")
        a = one(df, doc_fingerprint("t"))
        b = one(df, doc_fingerprint("t"))
        assert a == b and len(a) == 32

    def test_quality_features(self, spark):
        df = spark.createDataFrame([("ab cd!",)], "t string")
        feats = quality_features("t")
        row = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
        assert row["n_tokens"] == 2
        assert row["n_chars"] == 6
        assert row["mean_token_len"] == 2.5  # 'ab' + 'cd!'

    def test_word_ngrams(self, spark):
        from waterdata_spark.functions.text import word_ngrams

        df = spark.createDataFrame([("a b c d",), ("x",), ("",)], "t string")
        rows = df.select(word_ngrams("t", 2).alias("g")).collect()
        assert rows[0]["g"] == ["a b", "b c", "c d"]
        assert rows[1]["g"] == []  # fewer tokens than n
        assert rows[2]["g"] == []

    def test_repetition_ngram_signals_hand_computed(self, spark):
        from waterdata_spark.functions.text import repetition_features

        # bigrams of 'a b a b a': [a b, b a, a b, b a] -> dup 2/4, top 2/4
        df = spark.createDataFrame([("a b a b a",)], "t string")
        feats = repetition_features("t", ngram=2)
        row = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
        assert abs(row["dup_ngram_fraction"] - 0.5) < 1e-9
        assert abs(row["top_ngram_fraction"] - 0.5) < 1e-9
        assert row["dup_line_fraction"] == 0.0  # one line

    def test_repetition_line_signals_hand_computed(self, spark):
        from waterdata_spark.functions.text import repetition_features

        # non-empty lines: dup, dup, unique line, '- bullet item',
        # 'ends with...' = 5; one is a repeat, one bullet, one ellipsis
        text = "dup\n\ndup\nunique line\n- bullet item\nends with...\n"
        df = spark.createDataFrame([(text,)], "t string")
        feats = repetition_features("t", ngram=2)
        row = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
        assert abs(row["dup_line_fraction"] - 0.2) < 1e-9
        assert row["bullet_line_fraction"] == 0.2
        assert row["ellipsis_line_fraction"] == 0.2

    def test_redact_pii(self, spark):
        from waterdata_spark.functions.text import pii_counts, redact_pii

        text = (
            "mail a.b+c@ex-ample.co.uk or call (412) 555-1234 / 412-555-9876, "
            "host 10.0.255.1, ssn 123-45-6789, keep 2024-01-02 and price 3.14"
        )
        df = spark.createDataFrame([(text,)], "t string")
        out = df.select(redact_pii("t").alias("r"), *[
            v.alias(k) for k, v in pii_counts("t").items()
        ]).collect()[0]
        r = out["r"]
        assert "<EMAIL>" in r and "a.b+c@" not in r
        assert r.count("<PHONE>") == 2 and "555-1234" not in r
        assert "<IP>" in r and "10.0.255.1" not in r
        assert "<SSN>" in r and "123-45-6789" not in r
        # non-PII digits survive
        assert "2024-01-02" in r and "3.14" in r
        assert (out["email_count"], out["phone_count"], out["ip_count"], out["ssn_count"]) == (1, 2, 1, 1)

    def test_redact_pii_no_false_positives(self, spark):
        from waterdata_spark.functions.text import redact_pii

        clean = "version 1.2.3 of pkg@dev is not an email-address; 1234-5678 stays"
        df = spark.createDataFrame([(clean,)], "t string")
        r = df.select(redact_pii("t").alias("r")).collect()[0]["r"]
        # 'pkg@dev' lacks a dotted TLD; 1.2.3 is not 4 octets; 1234-5678
        # matches no class
        assert r == clean

    def test_repetition_features_crlf_equals_lf(self, spark):
        """CRLF and LF corpora must score identically: '\\r'-only lines
        are empty, 'foo\\r' == 'foo' for line dedup, and the ellipsis/
        bullet anchors see the line without the trailing '\\r'."""
        from waterdata_spark.functions.text import repetition_features

        lf = "dup\n\ndup\nunique line\n- bullet item\nends with...\n"
        crlf = lf.replace("\n", "\r\n")
        df = spark.createDataFrame([(lf,), (crlf,)], "t string")
        feats = repetition_features("t", ngram=2)
        rows = df.select(*[v.alias(k) for k, v in feats.items()]).collect()
        assert rows[0].asDict() == rows[1].asDict()
        assert abs(rows[1]["dup_line_fraction"] - 0.2) < 1e-9
        assert rows[1]["ellipsis_line_fraction"] == 0.2

    def test_top_ngram_fraction_equals_quadratic_reference(self, spark):
        """The sorted-run top-gram count must equal the naive
        distinct×filter definition on varied docs (VERDICT r5 item 4
        linearization)."""
        import random

        from pyspark.sql import functions as F

        from waterdata_spark.functions.text import repetition_features, word_ngrams

        rng = random.Random(11)
        docs = [
            " ".join(rng.choice("a b c dd eee f".split()) for _ in range(n))
            for n in (0, 1, 2, 3, 7, 50, 200)
        ]
        df = spark.createDataFrame([(d,) for d in docs], "t string")
        grams = word_ngrams("t", 2)
        naive_top = F.array_max(
            F.transform(
                F.array_distinct(grams),
                lambda g: F.size(F.filter(grams, lambda x: x == g)),
            )
        )
        n_grams = F.size(grams)
        naive = F.when(
            n_grams > 0, naive_top.cast("double") / n_grams.cast("double")
        ).otherwise(F.lit(0.0))
        fast = repetition_features("t", ngram=2)["top_ngram_fraction"]
        for row in df.select(naive.alias("naive"), fast.alias("fast")).collect():
            assert abs(row["naive"] - row["fast"]) < 1e-12

    def test_top_ngram_fraction_adversarial_long_doc(self, spark):
        """A 60k-token boilerplate doc (the worst case the old
        distinct×total scan made quadratic) completes and scores ~1.0."""
        from waterdata_spark.functions.text import repetition_features

        text = "spam spam " * 30_000
        df = spark.createDataFrame([(text,)], "t string")
        feats = repetition_features("t", ngram=3)
        row = df.select(feats["top_ngram_fraction"].alias("f")).collect()[0]
        assert row["f"] > 0.99

    def test_pii_counts_reconcile_with_redaction(self, spark):
        """Overlapping matches must not double-count: a phone-shaped
        local part inside an email is ONE email, zero phones — exactly
        what redact_pii emits (ADVICE r5)."""
        from waterdata_spark.functions.text import pii_counts, redact_pii

        text = "write 555-123-4567@mail.example.com today"
        df = spark.createDataFrame([(text,)], "t string")
        out = df.select(
            redact_pii("t").alias("r"),
            *[v.alias(k) for k, v in pii_counts("t").items()],
        ).collect()[0]
        assert out["r"] == "write <EMAIL> today"
        assert out["email_count"] == 1 and out["phone_count"] == 0
        # total redactions == total counts (reconciliation law)
        n_placeholders = sum(out["r"].count(t) for t in ("<EMAIL>", "<IP>", "<SSN>", "<PHONE>"))
        assert n_placeholders == out["email_count"] + out["ip_count"] + out["ssn_count"] + out["phone_count"]

    def test_repetition_features_clean_doc_and_empty(self, spark):
        from waterdata_spark.functions.text import repetition_features

        df = spark.createDataFrame([("one two three four",), ("",)], "t string")
        feats = repetition_features("t", ngram=3)
        rows = df.select(*[v.alias(k) for k, v in feats.items()]).collect()
        # clean doc: 2 distinct trigrams each appearing once
        assert rows[0]["dup_line_fraction"] == 0.0
        assert rows[0]["dup_ngram_fraction"] == 0.0
        assert rows[0]["top_ngram_fraction"] == 0.5  # 1 of 2 trigrams
        assert rows[0]["bullet_line_fraction"] == 0.0
        # empty text: every signal 0.0, no division errors
        assert all(v == 0.0 for v in rows[1].asDict().values())


class TestGopherGate:
    """Composed Gopher document filter (Rae et al. 2021 Table A1)."""

    def _df(self, spark, texts):
        return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_gate_keeps_clean_drops_each_violation(self, spark):
        import random

        from waterdata_spark.functions.text import gopher_gate

        rng = random.Random(5)
        words = ["river", "water", "sample", "quality", "report", "system", "site", "level"]
        clean = " ".join(rng.choice(words) for _ in range(200))
        too_short = "only a few words here"
        boilerplate = "spam spam " * 100  # top-2gram ~1.0
        bullets = "\n".join(f"- item {i}" for i in range(20))  # 100% bullet lines
        no_alpha = " ".join(str(i) for i in range(100))  # alpha_word_ratio 0
        df = self._df(spark, [clean, too_short, boilerplate, bullets, no_alpha])
        kept = {r["doc_id"] for r in gopher_gate(df).collect()}
        assert kept == {0}

    def test_audit_names_failed_rules(self, spark):
        import random

        from waterdata_spark.functions.text import gopher_gate

        rng = random.Random(5)
        words = [f"word{i}" for i in range(200)]
        clean = " ".join(rng.choice(words) for _ in range(200))
        df = self._df(spark, [clean, "tiny doc", "spam spam " * 100])
        out = {r["doc_id"]: r["why"] for r in gopher_gate(df, audit_col="why").collect()}
        assert out[0] == []
        assert "n_words" in out[1]
        assert any(k.startswith("top_") or k.startswith("dup_") for k in out[2])
        # audit mode keeps every row
        assert len(out) == 3

    def test_differential_vs_python_reference_on_documents(self, spark):
        """The composed gate decides document DELETION, so its full
        Table-A1 threshold set is differential-tested against a pure-
        Python reimplementation on the real documents table plus
        planted edge documents (VERDICT r6 item 6; the line-dedup
        precedent). Compares the per-document failed-rule SETS, not
        just the kept/dropped verdict."""
        import re

        from pyspark.sql import functions as F

        from tests.conftest import SF_SMOKE
        from waterdata_spark.functions.text import GOPHER_THRESHOLDS, gopher_gate
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        planted = spark.createDataFrame(
            [
                (10_001, "spam spam " * 100),            # top-2gram ≈ 1
                (10_002, "\n".join(f"- item {i}" for i in range(30))),  # bullets
                (10_003, " ".join(str(i) for i in range(100))),  # no alpha
                (10_004, ("word " * 60 + "\n") * 5),      # dup lines + dup grams
                (10_005, "a # " * 40),                    # symbols + short words
            ],
            "doc_id long, text string",
        )
        df = docs.unionByName(planted)
        rows = [(r["doc_id"], r["text"]) for r in df.collect()]

        def signals(text: str) -> dict[str, float]:
            toks = [t for t in re.split(r"\s+", text.strip(" ")) if t != ""]
            n = len(toks)
            ns = max(n, 1)
            raw_lines = [
                l for l in re.split(r"\r?\n", text) if l.strip(" ") != ""
            ]
            nl = len(raw_lines)

            def grams(k: int) -> list[str]:
                if n < k:
                    return []
                return [" ".join(toks[i : i + k]) for i in range(n - k + 1)]

            def dup_frac(arr: list) -> float:
                return 1.0 - len(set(arr)) / len(arr) if arr else 0.0

            def top_frac(arr: list) -> float:
                if not arr:
                    return 0.0
                best = max(arr.count(g) for g in set(arr))
                return best / len(arr)

            sig = {
                "n_words": float(n),
                "mean_word_len": sum(len(t) for t in toks) / ns,
                "alpha_word_ratio": sum(
                    1 for t in toks if re.search("[A-Za-z]", t)
                ) / ns,
                "symbol_word_ratio": sum(
                    1 for t in toks if re.search(r"#|\.\.\.|…", t)
                ) / ns,
                "bullet_line_fraction": (
                    sum(
                        1
                        for l in raw_lines
                        if re.search(r"^([-*•‣▪]|\d+[.)])\s", l.strip(" "))
                    ) / nl
                    if nl
                    else 0.0
                ),
                "ellipsis_line_fraction": (
                    sum(
                        1
                        for l in raw_lines
                        if re.search(r"(\.\.\.|…)$", l.strip(" "))
                    ) / nl
                    if nl
                    else 0.0
                ),
                "dup_line_fraction": dup_frac(raw_lines),
            }
            for k in (2, 3, 4):
                sig[f"top_{k}gram_fraction"] = top_frac(grams(k))
            for k in (5, 10):
                sig[f"dup_{k}gram_fraction"] = dup_frac(grams(k))
            return sig

        want = {}
        for did, text in rows:
            sig = signals(text)
            want[did] = sorted(
                name
                for name, (lo, hi) in GOPHER_THRESHOLDS.items()
                if sig[name] < lo or sig[name] > hi
            )

        got = {
            r["doc_id"]: sorted(r["why"])
            for r in gopher_gate(df, audit_col="why").collect()
        }
        assert got == want
        # sanity: the differential actually exercised both outcomes
        assert any(v for v in got.values()) and any(not v for v in got.values())
        # and the filter form agrees with the audit form
        kept = {r["doc_id"] for r in gopher_gate(df).select("doc_id").collect()}
        assert kept == {d for d, fails in want.items() if not fails}

    def test_null_text_fails_not_passes(self, spark):
        """A NULL document must FAIL the gate: every signal of a null
        text is null, each threshold comparison yields null, and
        array_compact would have dropped them all — reporting null
        documents as clean (ADVICE r6). The explicit null_text rule
        names the failure instead."""
        from waterdata_spark.functions.text import gopher_gate

        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        assert gopher_gate(df).count() == 0
        out = gopher_gate(df, audit_col="why").collect()
        assert out[0]["why"] == ["null_text"]

    def test_threshold_override_and_unknown_rejected(self, spark):
        import pytest as _pytest

        from waterdata_spark.functions.text import gopher_gate

        twenty = " ".join(f"item{i}" for i in range(20))  # only n_words fails
        df = self._df(spark, [twenty])
        assert gopher_gate(df).count() == 0  # default min 50
        assert gopher_gate(df, thresholds={"n_words": (10, 100_000)}).count() == 1
        with _pytest.raises(ValueError, match="unknown signal"):
            gopher_gate(df, thresholds={"not_a_rule": (0, 1)})


class TestHtmlToText:
    def _run(self, spark, html):
        from waterdata_spark.functions.text import html_to_text

        df = spark.createDataFrame([(1, html)], "id long, raw string")
        return df.select(html_to_text("raw").alias("t")).first()["t"]

    def test_full_page_extraction(self, spark):
        html = (
            "<html><head><title>T</title>"
            "<style>body { color: red; } .x>span{}</style>"
            "<script>if (a < b) { alert('hi </div>'); }</script></head>"
            "<body><!-- nav comment --><h1>Water Report</h1>"
            "<p>First <b>bold</b> paragraph &amp; more.</p>"
            "<div>Second block with <a href='x'>a link</a>.</div>"
            "<ul><li>item one</li><li>item &lt;two&gt;</li></ul>"
            "<table><tr><td>cell a</td><td>cell b</td></tr></table>"
            "</body></html>"
        )
        assert self._run(spark, html) == (
            "T Water Report\n"
            "First bold paragraph & more.\n"
            "Second block with a link.\n"
            "item one\nitem <two>\n"
            "\ncell a cell b"
        )

    def test_script_and_style_content_never_leaks(self, spark):
        out = self._run(
            spark,
            "<p>keep</p><script>var secret = 'LEAK1';</script>"
            "<style>#LEAK2 {}</style><p>also keep</p>",
        )
        assert "LEAK" not in out and out == "keep\nalso keep"

    def test_entity_decode_order_single_round(self, spark):
        # '&amp;lt;' is the LITERAL text '&lt;' — one decode round only
        assert self._run(spark, "a &amp;lt; b &nbsp;&mdash;&nbsp; c &#39;d&#39;") == (
            "a &lt; b — c 'd'"
        )

    def test_plain_text_fixed_point(self, spark):
        """Already-extracted text (no markup, no entities) passes
        through unchanged up to whitespace normalization, and the
        operator is idempotent on its own output."""
        plain = "line one\nline two\n\npara two ends."
        assert self._run(spark, plain) == plain
        assert self._run(spark, self._run(spark, plain)) == plain

    def test_null_and_whitespace(self, spark):
        from waterdata_spark.functions.text import html_to_text

        df = spark.createDataFrame(
            [(1, None), (2, "  <p>  x  </p>  "), (3, "<br><br><br><br>")],
            "id long, raw string",
        )
        got = {r["id"]: r["t"] for r in df.select("id", html_to_text("raw").alias("t")).collect()}
        assert got[1] is None and got[2] == "x" and got[3] == ""


class TestNormalizeUnicode:
    """normalize_unicode laws — the pre-dedup normalizer (CCNet §3)."""

    def test_folding_accents_case_and_nulls(self, spark):
        from waterdata_spark.functions.text import normalize_unicode

        df = spark.createDataFrame(
            [("ﬁne Ａscii café",), ("Straße",), (None,), ("plain ascii 123",)],
            "t string",
        )
        got = [
            (r["n"], r["sa"])
            for r in df.select(
                normalize_unicode("t").alias("n"),
                normalize_unicode("t", strip_accents=True).alias("sa"),
            ).collect()
        ]
        assert got[0] == ("fine ascii café", "fine ascii cafe")
        assert got[1] == ("strasse", "strasse")  # casefold, not lower
        assert got[2] == (None, None)
        assert got[3] == ("plain ascii 123", "plain ascii 123")  # ASCII fixpoint

    def test_composed_and_decomposed_unify_for_dedup(self, spark):
        """The dedup motivation: NFC and NFD spellings of the same text
        must hash identically after normalization."""
        import unicodedata

        from waterdata_spark.functions.text import normalize_unicode
        from waterdata_spark.operators.dedup import exact_dedup

        nfc = unicodedata.normalize("NFC", "café au lait")
        nfd = unicodedata.normalize("NFD", "café au lait")
        assert nfc != nfd  # different byte strings going in
        df = spark.createDataFrame(
            [(1, nfc), (2, nfd), (3, "other doc")], "doc_id long, text string"
        )
        normed = df.select("doc_id", normalize_unicode("text").alias("text"))
        out = exact_dedup(normed, ["text"], "doc_id")
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]

    def test_idempotent_all_flag_combinations(self, spark):
        import pyspark.sql.functions as F

        from waterdata_spark.functions.text import normalize_unicode

        df = spark.createDataFrame(
            [("ﬁ Ａ café ß ＫＡＮＡ ㎒ Ⅷ",), ("mixed ＣＡＳＥ é́ text",)],
            "t string",
        )
        for lower in (True, False):
            for sa in (True, False):
                once = df.select(
                    normalize_unicode("t", lower=lower, strip_accents=sa).alias("n")
                )
                twice = once.select(
                    "n",
                    normalize_unicode("n", lower=lower, strip_accents=sa).alias("nn"),
                )
                assert twice.filter(F.col("n") != F.col("nn")).count() == 0

    def test_bad_form_raises(self, spark):
        import pytest as _pytest

        from waterdata_spark.functions.text import normalize_unicode

        with _pytest.raises(ValueError):
            normalize_unicode("t", form="NFX")


class TestTopNgrams:
    def test_matches_pure_python_counter(self, spark):
        from collections import Counter, defaultdict

        from tests.conftest import SF_SMOKE
        from waterdata_spark.functions.text import top_ngrams
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").limit(150)
        rows = [r["text"] for r in docs.collect()]
        occ: Counter = Counter()
        dfreq: dict = defaultdict(set)
        for did, text in enumerate(rows):
            toks = text.lower().split()
            for i in range(len(toks) - 1):
                g = f"{toks[i]} {toks[i+1]}"
                occ[g] += 1
                dfreq[g].add(did)
        want = sorted(
            ((g, c, len(dfreq[g])) for g, c in occ.items()),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        got = [
            (r["ngram"], r["occurrences"], r["doc_freq"])
            for r in top_ngrams(docs, "text", n=2, k=10).collect()
        ]
        assert got == want

    def test_min_docs_floor_and_determinism(self, spark):
        from waterdata_spark.functions.text import top_ngrams

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c d"), (3, "c d c d")],
            "doc_id long, text string",
        )
        got = [
            tuple(r)
            for r in top_ngrams(df, "text", n=2, k=10, min_docs=2).collect()
        ]
        # 'a b' occurs 3x in 2 docs; 'c d' 3x in 2 docs; others 1 doc only
        assert got == [("a b", 3, 2), ("c d", 3, 2)]
