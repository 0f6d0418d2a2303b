"""Main-content extraction (operators/content.py): block
classification, the near-good neighbor rule, and the reassembly
contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.content import content_blocks, extract_main_content

PAGE = """<html><head><title>T</title><style>p {color: red}</style></head><body>
<div class="nav"><a href="/">Home</a> | <a href="/about">About us</a> | <a href="/contact">Contact</a></div>
<p>This is the first real paragraph of the article and it has plenty of characters to pass the length gate comfortably, with a <a href="/ref">single link</a> inside.</p>
<p>A short middle line.</p>
<p>Second long paragraph, also long enough to be treated as body content by the simple shallow feature classifier built from length and link density.</p>
<div class="related"><a href="/x">Read more</a> <a href="/y">Another story</a> <a href="/z">Third story</a></div>
<!-- a comment that must vanish -->
<script>var boilerplate = "must not leak";</script>
</body></html>"""


@pytest.fixture(scope="module")
def page_df(spark):
    return spark.createDataFrame([(1, PAGE)], "doc_id int, html string")


class TestContentBlocks:
    def test_nav_and_related_rejected_body_kept(self, page_df):
        rows = {r["block_text"][:20]: r for r in content_blocks(page_df).collect()}
        nav = rows["Home | About us | Co"]
        assert not nav["is_content"] and nav["link_density"] > 0.5
        rel = rows["Read more Another st"]
        assert not rel["is_content"] and rel["link_density"] > 0.9
        body1 = rows["This is the first re"]
        assert body1["is_content"] and body1["link_density"] < 0.15
        assert rows["Second long paragrap"]["is_content"]

    def test_near_good_inheritance(self, page_df):
        rows = {r["block_text"]: r for r in content_blocks(page_df).collect()}
        # the short middle line sits between two good paragraphs and is
        # link-free -> inherits content-ness despite failing min_len
        short = rows["A short middle line."]
        assert short["n_chars"] < 80 and short["is_content"]

    def test_script_style_comment_never_leak(self, page_df):
        txt = " ".join(r["block_text"] for r in content_blocks(page_df).collect())
        assert "must not leak" not in txt
        assert "color: red" not in txt
        assert "a comment" not in txt

    def test_stopword_gate_opt_in(self, page_df):
        # with a binding stopword threshold, the link-free heading-ish
        # block with no stopwords would fail even the near-good rule
        rows = {
            r["block_text"]: r
            for r in content_blocks(page_df, min_stopword_frac=0.2).collect()
        }
        assert not rows["A short middle line."]["is_content"] or (
            rows["A short middle line."]["stopword_frac"] >= 0.2
        )
        # body paragraphs are stopword-rich English and survive
        body = [r for t, r in rows.items() if t.startswith("This is the first")]
        assert body and body[0]["is_content"]

    def test_anchor_spanning_block_boundary_is_tolerated(self, spark):
        # the </p> inside the anchor splits the pair across blocks: the
        # unmatched open sentinel pairs with nothing, so the anchor
        # contributes ZERO link chars (documented heuristic slack) —
        # no crash, densities stay in [0, 1], no text is lost
        html = '<p>alpha <a href="/x">link text</p><p>beta paragraph</a> tail</p>'
        out = content_blocks(
            spark.createDataFrame([(1, html)], "doc_id int, html string"),
            min_len=5,
        ).collect()
        assert len(out) == 2
        assert all(0.0 <= r["link_density"] <= 1.0 for r in out)
        joined = " ".join(r["block_text"] for r in out)
        assert "alpha" in joined and "beta" in joined and "tail" in joined

    def test_null_and_empty_html(self, spark):
        df = spark.createDataFrame([(1, None), (2, "")], "doc_id int, html string")
        assert content_blocks(df).count() == 0
        got = {r["doc_id"]: r["main_text"] for r in extract_main_content(df).collect()}
        assert got == {1: "", 2: ""}


class TestPythonDifferential:
    def test_exact_vs_independent_reimplementation(self, spark):
        """EXACT differential: an independent pure-Python block
        classifier (re-based, written against the documented feature
        definitions, not the Spark code) must reproduce every block
        decision and every extracted main_text over a generated page
        battery covering nav rails, link-free headings, mixed-density
        blocks, entities, and empty pages."""
        import re

        MIN_LEN, MAX_LD, SHORT = 80, 0.3, 20

        def py_extract(html: str) -> str:
            s = re.sub(r"(?is)<script\b[^>]*>.*?</script\s*>", " ", html)
            s = re.sub(r"(?is)<style\b[^>]*>.*?</style\s*>", " ", s)
            s = re.sub(r"(?s)<!--.*?-->", " ", s)
            s = re.sub(r"(?is)<a\b[^>]*>", "\x01", s)
            s = re.sub(r"(?is)</a\s*>", "\x02", s)
            s = re.sub(
                r"(?i)</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|"
                r"article|header|footer|pre|figure|figcaption|dd|dt)>"
                r"|<br\s*/?>|<hr\s*/?>",
                "\n",
                s,
            )
            s = re.sub(r"(?i)</(?:td|th)>", " ", s)
            s = re.sub(r"(?s)<[^>]*>", "", s)
            for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                            ("&nbsp;", " "), ("&amp;", "&")]:
                s = s.replace(ent, ch)
            blocks = []
            for raw in s.split("\n"):
                no_sent = raw.replace("\x01", "").replace("\x02", "")
                clean = re.sub(r"\s+", " ", no_sent).strip()
                if not clean:
                    continue
                anchor = sum(
                    len(m) for m in re.findall("\x01([^\x02]*)\x02", raw)
                )
                ld = anchor / max(len(no_sent), 1)
                blocks.append((clean, len(clean), ld))
            base = [
                n >= MIN_LEN and ld <= MAX_LD for (_, n, ld) in blocks
            ]
            out = []
            for i, (txt, n, ld) in enumerate(blocks):
                near = (
                    not base[i]
                    and ld <= MAX_LD
                    and n >= SHORT
                    and (i > 0 and base[i - 1])
                    and (i + 1 < len(blocks) and base[i + 1])
                )
                if base[i] or near:
                    out.append(txt)
            return "\n".join(out)

        import random

        rng = random.Random(99)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

        def sentence(n):
            return " ".join(rng.choice(words) for _ in range(n))

        pages = []
        for i in range(40):
            parts = ["<html><body>"]
            for _ in range(rng.randint(1, 8)):
                kind = rng.randint(0, 3)
                if kind == 0:  # nav rail
                    links = " ".join(
                        f'<a href="/{w}">{w} link</a>'
                        for w in rng.sample(words, rng.randint(1, 4))
                    )
                    parts.append(f"<div>{links}</div>")
                elif kind == 1:  # body paragraph, maybe with a link
                    body = sentence(rng.randint(5, 40))
                    if rng.random() < 0.4:
                        body += f' with <a href="/r">a ref</a> inside'
                    parts.append(f"<p>{body}</p>")
                elif kind == 2:  # short line / heading
                    parts.append(f"<h2>{sentence(rng.randint(1, 6))}</h2>")
                else:  # noise the chain must drop
                    parts.append("<script>var x = 1;</script><!-- c -->")
            parts.append("&amp; tail &lt;entity&gt;</body></html>")
            pages.append((i, "".join(parts)))

        df = spark.createDataFrame(pages, "doc_id long, html string")
        got = {
            r["doc_id"]: r["main_text"]
            for r in extract_main_content(df).collect()
        }
        for i, html in pages:
            assert got[i] == py_extract(html), (i, got[i], py_extract(html))


class TestExtractMainContent:
    def test_page_order_and_passthrough(self, spark, page_df):
        out = extract_main_content(page_df.withColumn("extra", F.lit(7)))
        (row,) = out.collect()
        assert row["extra"] == 7 and "html" in out.columns
        parts = row["main_text"].split("\n")
        assert parts[0].startswith("This is the first real paragraph")
        assert parts[1] == "A short middle line."
        assert parts[2].startswith("Second long paragraph")

    def test_no_content_doc_gets_empty_string(self, spark):
        df = spark.createDataFrame(
            [(9, '<div><a href="/">only nav links here</a></div>')],
            "doc_id int, html string",
        )
        (row,) = extract_main_content(df).collect()
        assert row["main_text"] == ""
