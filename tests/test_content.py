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
