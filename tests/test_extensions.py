"""Tests for the extension surface: as-of join, approximate dedup
(MinHash LSH / SimHash), multimodal plumbing, streaming ops
(SURVEY.md §2.8-2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from waterdata_spark.operators.asof import asof_join
from waterdata_spark.operators.dedup_approx import (
    hamming_distance,
    jaccard_verify_pairs,
    min_id_components,
    minhash_candidate_pairs,
    star_contraction_components,
    minhash_dedup,
    simhash_signature,
)
from waterdata_spark.operators.multimodal import (
    dedup_media_exact,
    extract_media_features,
    fake_image_codec,
)


class TestAsofJoin:
    def test_backward_basic(self, spark):
        left = spark.createDataFrame([(1, 100, 10), (1, 200, 20), (2, 150, 30)], "k long, t long, lv long")
        right = spark.createDataFrame([(1, 90, "a"), (1, 150, "b"), (2, 200, "c")], "k long, t long, p string")
        out = asof_join(left, right, on=["k"], ts="t", payload=["p"])
        rows = {(r["k"], r["t"]): r["p_right"] for r in out.collect()}
        assert rows[(1, 100)] == "a"  # 90 <= 100
        assert rows[(1, 200)] == "b"  # 150 is latest <= 200
        assert rows[(2, 150)] is None  # no right row <= 150

    def test_exact_match_toggle(self, spark):
        left = spark.createDataFrame([(1, 100)], "k long, t long")
        right = spark.createDataFrame([(1, 100, "same")], "k long, t long, p string")
        inc = asof_join(left, right, on=["k"], ts="t", payload=["p"], allow_exact_match=True)
        exc = asof_join(left, right, on=["k"], ts="t", payload=["p"], allow_exact_match=False)
        assert inc.collect()[0]["p_right"] == "same"
        assert exc.collect()[0]["p_right"] is None

    def test_forward_direction(self, spark):
        left = spark.createDataFrame([(1, 100)], "k long, t long")
        right = spark.createDataFrame([(1, 90, "past"), (1, 120, "future")], "k long, t long, p string")
        out = asof_join(left, right, on=["k"], ts="t", payload=["p"], direction="forward")
        assert out.collect()[0]["p_right"] == "future"

    def test_right_order_fuses_tie_dedup(self, spark):
        """r12 (VERDICT r11 item 8): right_order elects the MAX right
        row among equal-(key, ts) ties inside the as-of window itself —
        identical to a priority_dedup(keys=(k, t), order=desc) window
        run first, without that window's extra shuffle+sort."""
        import pytest

        from waterdata_spark.operators.dedup import priority_dedup

        left = spark.createDataFrame(
            [(1, 100), (1, 160), (2, 100)], "k long, t long"
        )
        right = spark.createDataFrame(
            [(1, 100, 5, "e5"), (1, 100, 9, "e9"), (1, 100, 7, "e7"),
             (1, 150, 1, "x1"), (1, 150, 2, "x2"), (2, 90, 3, "y3")],
            "k long, t long, eid long, v string",
        )
        fused = asof_join(
            left, right, on=["k"], ts="t", payload=["eid", "v"],
            right_order=["eid"],
        )
        got = {(r["k"], r["t"]): (r["eid_right"], r["v_right"])
               for r in fused.collect()}
        assert got[(1, 100)] == (9, "e9")   # max eid at the exact tie
        assert got[(1, 160)] == (2, "x2")   # max eid at t=150
        assert got[(2, 100)] == (3, "y3")
        # equivalence with the dedup-first plan, row for row
        dd = asof_join(
            left,
            priority_dedup(right, ["k", "t"], [F.col("eid").desc()]),
            on=["k"], ts="t", payload=["eid", "v"],
        )
        want = {(r["k"], r["t"]): (r["eid_right"], r["v_right"])
                for r in dd.collect()}
        assert got == want
        # exact-match exclusion composes: ties at t=100 are invisible
        exc = asof_join(
            left, right, on=["k"], ts="t", payload=["eid", "v"],
            right_order=["eid"], allow_exact_match=False,
        )
        got2 = {(r["k"], r["t"]): r["eid_right"] for r in exc.collect()}
        assert got2[(1, 100)] is None and got2[(1, 160)] == 2
        # a non-payload right_order column is rejected
        with pytest.raises(ValueError, match="payload"):
            asof_join(left, right, on=["k"], ts="t", payload=["v"],
                      right_order=["eid"])

    def test_row_count_preserved(self, spark):
        left = spark.range(100).select(F.lit(1).alias("k"), F.col("id").alias("t"))
        right = spark.createDataFrame([(1, 5, "x")], "k long, t long, p string")
        assert asof_join(left, right, on=["k"], ts="t", payload=["p"]).count() == 100

    def test_matched_row_null_payload_preserved(self, spark):
        """DuckDB ASOF semantics: the matched right row's genuine NULL
        must NOT be replaced by a stale value from an older right row
        (ADVICE r1: per-column last(ignorenulls) resurrected stale
        values; the struct carry fixes it)."""
        left = spark.createDataFrame([(1, 200)], "k long, t long")
        right = spark.createDataFrame(
            [(1, 100, "stale"), (1, 150, None)], "k long, t long, p string"
        )
        out = asof_join(left, right, on=["k"], ts="t", payload=["p"]).collect()
        assert out[0]["p_right"] is None  # matched row t=150 has NULL p

    def test_payload_columns_from_same_matched_row(self, spark):
        """All payload columns must come from ONE right row — mixing
        fields across rows (NULL in one column skipping back further
        than another) is wrong."""
        left = spark.createDataFrame([(1, 200)], "k long, t long")
        right = spark.createDataFrame(
            [(1, 100, "a_old", "b_old"), (1, 150, None, "b_new")],
            "k long, t long, a string, b string",
        )
        out = asof_join(left, right, on=["k"], ts="t", payload=["a", "b"]).collect()
        # matched row is t=150: a is genuinely NULL there, b is b_new
        assert out[0]["a_right"] is None
        assert out[0]["b_right"] == "b_new"


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs through the green field every single morning"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("green", "blue")),  # near dup of 0
        (3, "completely different text about spark query engines and distributed columnar execution plans"),
        (4, "another unrelated document mentioning water quality sampling in mercer county pennsylvania"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMinHash:
    def test_candidates_include_planted_dups(self, spark, near_dup_docs):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_candidate_pairs(near_dup_docs, "doc_id", "text", n_hashes=8, n_bands=4).collect()
        }
        assert (0, 1) in pairs  # exact dup always collides

    def test_jaccard_verify(self, spark, near_dup_docs):
        pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
        verified = jaccard_verify_pairs(near_dup_docs, pairs, "doc_id", "text", threshold=0.5)
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
        assert got[(0, 1)] == 1.0
        assert (0, 2) in got and got[(0, 2)] > 0.5
        assert (0, 3) not in got

    def test_dedup_removes_cluster(self, spark, near_dup_docs):
        kept = minhash_dedup(near_dup_docs, "doc_id", "text", n_hashes=8, n_bands=4, threshold=0.5)
        ids = sorted(r["doc_id"] for r in kept.collect())
        assert 0 in ids and 1 not in ids  # lowest id of the dup cluster survives
        assert 3 in ids and 4 in ids

    def test_dedup_idempotent(self, spark, near_dup_docs):
        once = minhash_dedup(near_dup_docs, "doc_id", "text", n_hashes=8, n_bands=4, threshold=0.5)
        twice = minhash_dedup(once, "doc_id", "text", n_hashes=8, n_bands=4, threshold=0.5)
        assert sorted(r["doc_id"] for r in once.collect()) == sorted(r["doc_id"] for r in twice.collect())

    def test_fingerprint_column_matches_doc_fingerprint(self, spark, near_dup_docs):
        """minhash_bands(fingerprint=True) piggybacks the unseeded
        1-permutation MinHash (the former x05 surface) on the signature
        aggregate; it must equal functions.text.doc_fingerprint and be
        constant across a document's band rows (r7 consolidation)."""
        from pyspark.sql import functions as F

        from waterdata_spark.functions.text import doc_fingerprint
        from waterdata_spark.operators.dedup_approx import minhash_bands

        bands = minhash_bands(
            near_dup_docs, "doc_id", "text", n_hashes=4, n_bands=2, fingerprint=True
        )
        got = {
            (r["doc_id"], r["band_id"]): r["fingerprint"] for r in bands.collect()
        }
        want = {
            r["doc_id"]: r["fp"]
            for r in near_dup_docs.select(
                "doc_id", doc_fingerprint("text", 8).alias("fp")
            ).collect()
        }
        assert got and all(fp == want[d] for (d, _), fp in got.items())


class TestMinIdComponents:
    def test_string_ids_converge_fully(self, spark):
        # Regression: the old fixpoint witness was sum(label), which
        # implicitly casts string labels to NULL — NULL == NULL after
        # round 1 stopped propagation early and returned wrong
        # components SILENTLY. A 6-node path needs ~3 doubling rounds,
        # so early stop is observable.
        ids = [f"doc{i}" for i in range(6)]
        nodes = spark.createDataFrame([(i,) for i in ids], "node string")
        edges = spark.createDataFrame(
            [(ids[i], ids[i + 1]) for i in range(5)], "id_a string, id_b string"
        )
        labels = {r["node"]: r["label"] for r in min_id_components(nodes, edges).collect()}
        assert labels == {i: "doc0" for i in ids}

    def test_integral_ids_two_components(self, spark):
        nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
        )
        labels = {r["node"]: r["label"] for r in min_id_components(nodes, edges).collect()}
        assert labels == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5}

    def test_minhash_dedup_with_string_doc_ids(self, spark, near_dup_docs):
        # x10's operator must accept arbitrary id types end-to-end.
        docs = near_dup_docs.selectExpr("concat('d', doc_id) AS doc_id", "text")
        kept = minhash_dedup(docs, "doc_id", "text", n_hashes=8, n_bands=4, threshold=0.5)
        kept_ids = {r["doc_id"] for r in kept.collect()}
        assert kept_ids == {"d0", "d3", "d4"}  # d1/d2 collapse into d0's cluster


class TestStarContraction:
    def _labels(self, df):
        return {r["node"]: r["label"] for r in df.collect()}

    def test_equivalent_to_label_propagation_random_graphs(self, spark):
        import random

        rng = random.Random(7)
        for n, m in [(30, 20), (50, 60), (40, 0)]:
            edge_rows = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(m)
            ] or [(0, 0)]
            nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
            edges = spark.createDataFrame(edge_rows, "id_a long, id_b long")
            assert self._labels(star_contraction_components(nodes, edges)) == self._labels(
                min_id_components(nodes, edges)
            )

    def test_equivalent_on_minhash_candidate_edges(self, spark):
        # the x10/x15 cluster semantics: edges from the real candidate
        # generator over the sf0.001 documents corpus
        from waterdata_spark.schemas import load_table
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents").limit(200)
        edges = minhash_candidate_pairs(docs, "doc_id", "text", n_hashes=8, n_bands=4)
        nodes = docs.select(F.col("doc_id").alias("node"))
        assert self._labels(star_contraction_components(nodes, edges)) == self._labels(
            min_id_components(nodes, edges)
        )

    def test_multi_parent_witness_regression(self, spark):
        """The 7-edge graph hypothesis found (r7): after one
        large-star/small-star round, node 9 ends up with TWO parents
        (0 and 1) while no parent is itself a child — the old
        convergence probe called that a star forest and returned the
        big component split as {…}→0 and {1,18,20}→1. The fixed probe
        also requires single-parent children and runs the extra
        rounds."""
        edge_rows = [(13, 5), (0, 17), (18, 1), (9, 17), (20, 18), (20, 9), (0, 12)]
        nodes = spark.createDataFrame([(i,) for i in range(25)], "node long")
        edges = spark.createDataFrame(edge_rows, "id_a long, id_b long")
        got = self._labels(star_contraction_components(nodes, edges))
        assert got == self._labels(min_id_components(nodes, edges))
        assert got[1] == 0 and got[18] == 0 and got[20] == 0 and got[13] == 5

    def test_path_graph_round_bound(self, spark):
        # a 64-node path needs ~63 label-propagation rounds but must
        # star-contract in O(log^2 n) — 8 rounds is generous headroom;
        # the operator raises if it doesn't converge within the budget.
        n = 64
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        labels = self._labels(star_contraction_components(nodes, edges, max_rounds=8))
        assert labels == {i: 0 for i in range(n)}

    def test_durable_checkpoint_dir(self, spark, tmp_path):
        import os

        nodes = spark.createDataFrame([(f"n{i}",) for i in range(6)], "node string")
        edges = spark.createDataFrame(
            [("n0", "n1"), ("n1", "n2"), ("n4", "n5")], "id_a string, id_b string"
        )
        got = self._labels(
            star_contraction_components(nodes, edges, checkpoint_dir=str(tmp_path))
        )
        assert got == {"n0": "n0", "n1": "n0", "n2": "n0", "n3": "n3", "n4": "n4", "n5": "n4"}
        assert any(f.startswith("stars_slot") for f in os.listdir(tmp_path))


class TestSimHash:
    def test_identical_texts_same_signature(self, spark, near_dup_docs):
        sigs = {r["doc_id"]: r["s"] for r in near_dup_docs.select("doc_id", simhash_signature("text").alias("s")).collect()}
        assert sigs[0] == sigs[1]

    def test_near_dups_closer_than_unrelated(self, spark, near_dup_docs):
        sigs = near_dup_docs.select("doc_id", simhash_signature("text").alias("s"))
        a = sigs.alias("a")
        b = sigs.alias("b")
        d = (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("ia"),
                F.col("b.doc_id").alias("ib"),
                hamming_distance(F.col("a.s"), F.col("b.s")).alias("h"),
            )
        )
        dist = {(r["ia"], r["ib"]): r["h"] for r in d.collect()}
        assert dist[(0, 2)] < dist[(0, 3)]
        assert dist[(0, 2)] < dist[(0, 4)]


class TestMultimodal:
    @pytest.fixture()
    def media(self, spark):
        rows = [
            (1, "image", b"\x89PNG-fake-one", len(b"\x89PNG-fake-one"), "image/png", {"src": "a"}),
            (2, "image", b"\x89PNG-fake-two", 13, "image/png", {"src": "b"}),
            (3, "image", b"\x89PNG-fake-one", 13, "image/png", {"src": "c"}),  # dup content of 1
        ]
        from waterdata_spark.operators.multimodal import MEDIA_SCHEMA

        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_feature_extraction_deterministic(self, spark, media):
        f1 = extract_media_features(media, codec=fake_image_codec).collect()
        f2 = extract_media_features(media, codec=fake_image_codec).collect()
        by_id1 = {r["media_id"]: r for r in f1}
        by_id2 = {r["media_id"]: r for r in f2}
        assert by_id1[1]["feature"] == by_id2[1]["feature"]
        assert by_id1[1]["content_sha"] == by_id1[3]["content_sha"]
        assert len(by_id1[1]["feature"]) == 8

    def test_exact_media_dedup(self, spark, media):
        kept = dedup_media_exact(media)
        assert sorted(r["media_id"] for r in kept.collect()) == [1, 2]

    def test_default_codec_contract_either_env(self, spark, media):
        """The no-codec path must WORK in every environment: PIL-backed
        decode when PIL is installed, the deterministic fake otherwise
        (detect-and-register at import; VERDICT r3 task 8). Same output
        contract — 8-dim feature, dims, sha — either way."""
        from waterdata_spark.operators.multimodal import HAS_PIL, default_image_codec

        if HAS_PIL:
            # fixture bytes aren't decodable images — build a real one
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.new("RGB", (12, 7), (200, 10, 10)).save(buf, format="PNG")
            from waterdata_spark.operators.multimodal import MEDIA_SCHEMA

            media = spark.createDataFrame(
                [(1, "image", buf.getvalue(), buf.getbuffer().nbytes, "image/png", {})],
                MEDIA_SCHEMA,
            )
            rows = {r["media_id"]: r for r in extract_media_features(media).collect()}
            assert (rows[1]["width"], rows[1]["height"]) == (12, 7)
        else:
            assert default_image_codec is fake_image_codec
            rows = {r["media_id"]: r for r in extract_media_features(media).collect()}
            assert rows[1]["content_sha"] == rows[3]["content_sha"]
        assert len(rows[1]["feature"]) == 8
        assert abs(sum(rows[1]["feature"])) < 8.01  # bounded feature values

    def test_real_codec_raises_only_without_pil(self):
        from waterdata_spark.operators.multimodal import HAS_PIL, real_image_codec

        if HAS_PIL:
            pytest.skip("PIL present: real codec active, covered above")
        with pytest.raises(NotImplementedError, match="No image library"):
            real_image_codec(b"\x89PNG")

    def test_metadata_path_is_jvm_only(self, spark):
        """Metadata derivation (size, MIME sniff, hash) must not spawn
        Python workers: whole plan stays in codegen — no
        mapInPandas/ArrowEvalPython nodes."""
        from waterdata_spark.operators.multimodal import MEDIA_SCHEMA, with_media_metadata

        rows = [
            (1, "image", b"\x89PNG\r\n\x1a\nrest", 0, "", {}),
            (2, "image", b"\xff\xd8\xff\xe0jfif", 0, "", {}),
            (3, "pdf_page", b"%PDF-1.7 x", 0, "", {}),
            (4, "audio", b"RIFF\x00\x00\x00\x00WAVEfmt ", 0, "", {}),
            (5, "video", b"RIFF\x00\x00\x00\x00AVI LIST", 0, "", {}),
            (6, "blob", b"\x00\x01\x02", 0, "", {}),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA).drop("n_bytes", "mime")
        out = with_media_metadata(media)
        got = {r["media_id"]: r for r in out.collect()}
        assert got[1]["mime"] == "image/png"
        assert got[2]["mime"] == "image/jpeg"
        assert got[3]["mime"] == "application/pdf"
        assert got[4]["mime"] == "audio/wav"
        assert got[5]["mime"] == "video/x-msvideo"
        assert got[6]["mime"] == "application/octet-stream"
        assert got[3]["n_bytes"] == 10 and len(got[3]["content_sha"]) == 64
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "mapInPandas" not in plan


def _bmp24(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Hand-assemble an uncompressed 24-bit bottom-up BMP (the public
    BITMAPINFOHEADER layout) from rows of (r, g, b), top to bottom."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) // 4 * 4
    raster = b""
    for row in reversed(pixels):  # file stores bottom-up
        rb = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
        raster += rb + b"\x00" * (stride - len(rb))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + dib + raster


def _wav(frames: bytes, n_channels: int, sampwidth: int, rate: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


class TestRealCodecsNoLibs:
    """The REAL decode paths that execute in THIS environment — numpy
    BMP/PNM image decode and stdlib-wave audio decode — closing X5's
    'real codec never executed' gap for every format whose bit layout
    needs no entropy decoder."""

    # 2x2: white, black / red, green — ITU-R 601-2 luma 255,0,76,150
    PIXELS = [[(255, 255, 255), (0, 0, 0)], [(255, 0, 0), (0, 255, 0)]]
    EXPECT_HIST = [0.25, 0.0, 0.25, 0.0, 0.25, 0.0, 0.0, 0.25]  # bins 0,2,4,7

    def test_bmp_decode_exact(self):
        from waterdata_spark.operators.multimodal import numpy_image_codec

        d = numpy_image_codec(_bmp24(self.PIXELS))
        assert (d["width"], d["height"]) == (2, 2)
        assert d["feature"] == self.EXPECT_HIST

    def test_bmp_row_padding_and_3wide(self):
        # width 3 -> 9-byte rows padded to 12; padding must not leak into pixels
        from waterdata_spark.operators.multimodal import numpy_image_codec

        pixels = [[(255, 255, 255)] * 3, [(0, 0, 0)] * 3]
        d = numpy_image_codec(_bmp24(pixels))
        assert (d["width"], d["height"]) == (3, 2)
        assert d["feature"][0] == 0.5 and d["feature"][7] == 0.5

    def test_ppm_equals_bmp_same_pixels(self):
        """Cross-format differential: the P6 raster of the same pixels
        must produce byte-identical features to the BMP decode."""
        from waterdata_spark.operators.multimodal import numpy_image_codec

        raw = b"".join(bytes(p) for row in self.PIXELS for p in row)
        ppm = b"P6\n# a comment\n2 2\n255\n" + raw
        assert numpy_image_codec(ppm) == numpy_image_codec(_bmp24(self.PIXELS))

    def test_pgm_grayscale(self):
        from waterdata_spark.operators.multimodal import numpy_image_codec

        d = numpy_image_codec(b"P5\n4 1\n255\n" + bytes([0, 64, 128, 255]))
        assert (d["width"], d["height"]) == (4, 1)
        assert d["feature"] == [0.25, 0.0, 0.25, 0.0, 0.25, 0.0, 0.0, 0.25]

    def test_bmp_32bit_topdown_equals_24bit_bottomup(self):
        """Encoding invariance: the same pixels through the 32-bit
        top-down layout (negative height, BGRA, no padding) must decode
        identically to the 24-bit bottom-up layout — pins stride, row
        order, and alpha-drop handling in one law."""
        import struct

        from waterdata_spark.operators.multimodal import numpy_image_codec

        import random

        rng = random.Random(7)
        pixels = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(5)] for _ in range(3)]
        h, w = 3, 5
        raster = b"".join(
            bytes((b_, g, r, 0xFF)) for row in pixels for (r, g, b_) in row
        )  # top-down: rows in natural order
        header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(raster), 2835, 2835, 0, 0)
        assert numpy_image_codec(header + dib + raster) == numpy_image_codec(_bmp24(pixels))

    def test_bmp_bitfields_standard_masks_decode(self):
        """BI_BITFIELDS with the standard BGRA masks decodes exactly
        like the equivalent BI_RGB file."""
        import struct

        from waterdata_spark.operators.multimodal import numpy_image_codec

        pixels = self.PIXELS
        h, w = len(pixels), len(pixels[0])
        raster = b"".join(bytes((b_, g, r, 0xFF)) for row in pixels for (r, g, b_) in row)
        header = struct.pack("<2sIHHI", b"BM", 66 + len(raster), 0, 0, 66)
        dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 3, len(raster), 2835, 2835, 0, 0)
        masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
        assert numpy_image_codec(header + dib + masks + raster) == numpy_image_codec(_bmp24(pixels))

    def test_bmp_bitfields_nonstandard_masks_rejected(self):
        """RGBA-order masks must raise, not silently decode with
        swapped channels (ADVICE r5: pure red landed in the blue luma
        bin)."""
        import struct

        from waterdata_spark.operators.multimodal import numpy_image_codec

        raster = bytes((255, 0, 0, 255))  # would-be pure red under RGBA masks
        header = struct.pack("<2sIHHI", b"BM", 66 + len(raster), 0, 0, 66)
        dib = struct.pack("<IiiHHIIiiII", 40, 1, -1, 1, 32, 3, len(raster), 2835, 2835, 0, 0)
        masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)  # RGBA order
        with pytest.raises(ValueError, match="BI_BITFIELDS masks"):
            numpy_image_codec(header + dib + masks + raster)

    def test_compressed_format_still_errors_clearly(self):
        from waterdata_spark.operators.multimodal import numpy_image_codec

        with pytest.raises(ValueError, match="BMP/P6/P5 only"):
            numpy_image_codec(b"\x89PNG\r\n\x1a\n")

    def test_real_codec_dispatches_to_numpy_in_spark(self, spark):
        """End-to-end: real_image_codec (NOT the fake) runs inside the
        Arrow-batched Spark path on decodable formats, even with no PIL."""
        from waterdata_spark.operators.multimodal import MEDIA_SCHEMA, real_image_codec

        bmp = _bmp24(self.PIXELS)
        media = spark.createDataFrame(
            [(1, "image", bmp, len(bmp), "image/bmp", {})], MEDIA_SCHEMA
        )
        rows = extract_media_features(media, codec=real_image_codec).collect()
        assert (rows[0]["width"], rows[0]["height"]) == (2, 2)
        assert [round(v, 6) for v in rows[0]["feature"]] == self.EXPECT_HIST

    def test_wav_16bit_mono(self):
        import struct

        from waterdata_spark.operators.multimodal import wav_audio_codec

        # 1s at 8 kHz, constant half-scale -> every segment RMS = 0.5
        frames = struct.pack("<8000h", *([16384] * 8000))
        d = wav_audio_codec(_wav(frames, 1, 2, 8000))
        assert (d["sample_rate"], d["n_channels"], d["n_frames"]) == (8000, 1, 8000)
        assert d["duration_s"] == 1.0
        assert all(abs(v - 0.5) < 1e-9 for v in d["feature"]) and len(d["feature"]) == 8

    def test_wav_stereo_8bit_mixdown(self):
        from waterdata_spark.operators.multimodal import wav_audio_codec

        # L=+96, R=-96 around the 128 bias -> mono mixdown is exactly 0
        frames = bytes([128 + 96, 128 - 96] * 400)
        d = wav_audio_codec(_wav(frames, 2, 1, 400))
        assert (d["n_channels"], d["duration_s"]) == (2, 1.0)
        assert all(v == 0.0 for v in d["feature"])

    def test_wav_24bit(self):
        from waterdata_spark.operators.multimodal import wav_audio_codec

        # constant +2^22 (half scale), little-endian 3-byte samples
        one = (1 << 22).to_bytes(3, "little")
        d = wav_audio_codec(_wav(one * 1600, 1, 3, 1600))
        assert d["n_frames"] == 1600
        assert all(abs(v - 0.5) < 1e-9 for v in d["feature"])

    @staticmethod
    def _y4m(frames_luma: list[int], w: int = 4, h: int = 2) -> bytes:
        """Assemble a C420 YUV4MPEG2 clip; each frame's luma plane is a
        constant value from ``frames_luma`` (chroma planes neutral 128)."""
        head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
        chroma = bytes([128] * (2 * (w // 2) * (h // 2)))
        body = b"".join(
            b"FRAME\n" + bytes([v] * (w * h)) + chroma for v in frames_luma
        )
        return head + body

    def test_y4m_decode_and_frame_sampling(self):
        from waterdata_spark.operators.multimodal import y4m_video_codec

        clip = self._y4m([0, 64, 128, 192, 255])
        d = y4m_video_codec(clip)
        assert (d["width"], d["height"], d["fps"], d["n_frames"]) == (4, 2, 25.0, 5)
        assert len(d["frames"]) == 5
        # constant-luma frames put all mass in one bin: 0,64,128,192,255 -> 0,2,4,6,7
        for fr, bin_ in zip(d["frames"], [0, 2, 4, 6, 7]):
            assert fr["feature"][bin_] == 1.0
        # every 2nd frame, capped at 2 -> frame_idx 0 and 2 only
        sampled = y4m_video_codec(clip, sample_every=2, max_frames=2)
        assert [f["frame_idx"] for f in sampled["frames"]] == [0, 2]
        assert sampled["n_frames"] == 5  # total count still reported

    def test_y4m_rejects_compressed(self):
        from waterdata_spark.operators.multimodal import y4m_video_codec

        with pytest.raises(ValueError, match="not a YUV4MPEG2"):
            y4m_video_codec(b"\x1a\x45\xdf\xa3webm...")

    def test_sample_video_frames_spark(self, spark):
        from waterdata_spark.operators.multimodal import MEDIA_SCHEMA, sample_video_frames

        clip = self._y4m([10, 200, 10, 200, 10, 200])
        media = spark.createDataFrame(
            [(9, "video", clip, len(clip), "video/x-yuv4mpeg", {})], MEDIA_SCHEMA
        )
        rows = sample_video_frames(media, sample_every=2).collect()
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 2, 4]
        assert all(r["width"] == 4 and r["height"] == 2 for r in rows)
        assert all(r["feature"][0] == 1.0 for r in rows)  # luma 10 -> bin 0

    def test_media_mime_covers_raw_formats(self, spark):
        from waterdata_spark.operators.multimodal import MEDIA_SCHEMA, with_media_metadata

        rows = [
            (1, "image", _bmp24(self.PIXELS), 0, "", {}),
            (2, "image", b"P6\n2 2\n255\n" + b"\x00" * 12, 0, "", {}),
            (3, "video", self._y4m([0]), 0, "", {}),
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA).drop("n_bytes", "mime")
        got = {r["media_id"]: r["mime"] for r in with_media_metadata(media).collect()}
        assert got == {
            1: "image/bmp",
            2: "image/x-portable-pixmap",
            3: "video/x-yuv4mpeg",
        }

    def test_extract_audio_features_spark(self, spark):
        import struct

        from waterdata_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_audio_features,
        )

        frames = struct.pack("<4000h", *([8192] * 4000))
        wav = _wav(frames, 1, 2, 4000)
        media = spark.createDataFrame(
            [(7, "audio", wav, len(wav), "audio/wav", {})], MEDIA_SCHEMA
        )
        rows = extract_audio_features(media).collect()
        assert rows[0]["media_id"] == 7
        assert rows[0]["sample_rate"] == 4000 and rows[0]["duration_s"] == 1.0
        assert all(abs(v - 0.25) < 1e-9 for v in rows[0]["feature"])


@pytest.fixture()
def events_stream_dir(tmp_path):
    """File streams read DIRECTORIES; stage the events table alone."""
    import shutil

    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-0.parquet")
    return str(d)


class TestStreaming:
    def test_hourly_rollup_matches_batch_twin(self, spark, events_stream_dir):
        """availableNow file stream over the events parquet must produce
        the same buckets as the batch query (q17's logic)."""
        from waterdata_spark.queries import QUERIES
        from waterdata_spark.streaming.ops import hourly_rollup_stream, read_events_stream, run_stream_to_memory

        stream = read_events_stream(spark, events_stream_dir)
        # complete mode: append would hold back windows still inside the
        # watermark at end-of-input (by design — late data could arrive)
        out = run_stream_to_memory(hourly_rollup_stream(stream), "t_hourly", output_mode="complete")
        got = out.groupBy().agg(F.sum("n").alias("total")).collect()[0]["total"]
        batch_total = QUERIES["q17_hourly_rollup"].fn(spark, SF_SMOKE).agg(F.sum("n")).collect()[0][0]
        assert got == batch_total

    def test_sessionize_stream_runs(self, spark, events_stream_dir):
        from waterdata_spark.streaming.ops import read_events_stream, run_stream_to_memory, sessionize_stream

        stream = read_events_stream(spark, events_stream_dir)
        out = run_stream_to_memory(sessionize_stream(stream, gap="30 minutes"), "t_sessions")
        assert out.count() > 0
        assert out.filter(F.col("session_end") < F.col("session_start")).count() == 0

    def test_interval_join_stream_matches_batch(self, spark, events_stream_dir):
        """Stream-stream interval join (errors ⟂ trailing clicks within
        5 min per user) must agree with the equivalent batch join."""
        from waterdata_spark.streaming.ops import (
            interval_join_stream,
            read_events_stream,
            run_stream_to_memory,
        )

        errors = read_events_stream(spark, events_stream_dir).filter(F.col("event_type") == "error")
        clicks = read_events_stream(spark, events_stream_dir).filter(F.col("event_type") == "click")
        got = run_stream_to_memory(interval_join_stream(errors, clicks), "t_ij").count()

        from waterdata_spark.schemas import load_table

        ev = load_table(spark, SF_SMOKE, "events").withColumn(
            "event_ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
        be = ev.filter(F.col("event_type") == "error").select(
            F.col("user_id").alias("l_user"), F.col("event_ts").alias("l_ts")
        )
        bc = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("r_user"), F.col("event_ts").alias("r_ts")
        )
        want = be.join(
            bc,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") <= F.col("l_ts"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 5 minutes")),
        ).count()
        assert got == want > 0

    def test_dedup_stream_drops_cross_batch_duplicates(self, spark, tmp_path):
        """X1's streaming twin: the same file fed as two micro-batches
        must emit each event_id once — duplicate arrivals inside the
        watermark are dropped with bounded state."""
        import shutil

        from waterdata_spark.queries import QUERIES  # noqa: F401 (env parity)
        from waterdata_spark.streaming.ops import dedup_stream, read_events_stream, run_stream_to_memory

        d = tmp_path / "dupstream"
        d.mkdir()
        shutil.copy(f"{SF_SMOKE}/events.parquet", d / "a.parquet")
        shutil.copy(f"{SF_SMOKE}/events.parquet", d / "b.parquet")
        stream = read_events_stream(spark, str(d), max_files_per_trigger=1)
        out = run_stream_to_memory(dedup_stream(stream, ["event_id"]), "t_dedup")
        n_distinct = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
        assert out.count() == n_distinct
        assert out.select("event_id").distinct().count() == n_distinct


class TestStreamingPplGate:
    def test_stream_equals_batch_threshold(self, spark, tmp_path):
        """A 3-micro-batch document stream gated at a log-perplexity
        threshold under a frozen reference LM (r10) must keep exactly
        what the batch lm_perplexity filter keeps, quarantine the rest,
        and be non-vacuous both ways; <2-token docs reject by
        default."""
        from waterdata_spark.operators.selection import lm_perplexity
        from waterdata_spark.schemas import load_table
        from waterdata_spark.streaming.hygiene import ppl_gate_stream_sink

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        reference = docs.filter(F.col("doc_id") % 5 == 0).select("text")
        # pick the threshold as the batch median so the gate splits
        scored = lm_perplexity(
            docs, reference, n_buckets=4096, hash_fn="md5", smoothing="kn"
        )
        thr = scored.approxQuantile("log_ppl", [0.5], 0.0)[0]
        batch_kept = {
            r["doc_id"]
            for r in scored.filter(F.col("log_ppl") <= thr).collect()
        }

        src = tmp_path / "docs_stream"
        src.mkdir()
        for i in range(3):
            docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = ppl_gate_stream_sink(
            stream,
            reference,
            out_dir=str(tmp_path / "kept"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_log_ppl=thr,
            quarantine_dir=str(tmp_path / "rejected"),
            n_buckets=4096,
            hash_fn="md5",
            smoothing="kn",
        )
        q.awaitTermination()

        all_ids = {r["doc_id"] for r in docs.collect()}
        got_kept = {
            r["doc_id"] for r in spark.read.parquet(str(tmp_path / "kept")).collect()
        }
        got_rej = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "rejected")).collect()
        }
        assert got_kept == batch_kept
        assert got_rej == all_ids - batch_kept
        assert got_kept and got_rej  # the median threshold splits


class TestStreamNsPrecision:
    def test_ns_layout_ts_survives_untruncated(self, spark, tmp_path):
        """On the nanos-as-long physical layout, read_events_stream must
        NOT rewrite ts through a µs intermediate: genuinely sub-µs
        values survive, so a stream-vs-batch equality check on ts holds
        (ADVICE r4 — batch load_table preserves raw ns; the stream
        must too)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from waterdata_spark.streaming.ops import read_events_stream, run_stream_to_memory

        ns_vals = [1_700_000_000_123_456_789, 1_700_000_003_000_000_001]
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(ns_vals, pa.timestamp("ns")),
                "user_id": pa.array([10, 11], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.0, 2.0]),
                "props": pa.array(["{}", "{}"]),
            }
        )
        d = tmp_path / "nsstream"
        d.mkdir()
        pq.write_table(tbl, d / "part-0.parquet", coerce_timestamps=None)
        out = run_stream_to_memory(read_events_stream(spark, str(d)), "t_ns")
        got = {r["event_id"]: r["ts"] for r in out.collect()}
        assert got == {1: ns_vals[0], 2: ns_vals[1]}  # exact ns, no µs truncation
        # event_ts is necessarily µs-truncated (Spark TIMESTAMP) — floor
        ev = {r["event_id"]: r["event_ts"] for r in out.collect()}
        assert ev[1].microsecond == 123456


class TestStatefulStreaming:
    def test_running_totals_accumulate_across_batches(self, spark, tmp_path):
        """Two files × maxFilesPerTrigger=1 → two micro-batches; the
        custom stateful operator must carry totals across them."""
        import shutil

        from waterdata_spark.streaming.ops import (
            read_events_stream,
            run_stream_to_memory,
            running_user_totals_stream,
        )

        d = tmp_path / "stream2"
        d.mkdir()
        shutil.copy(f"{SF_SMOKE}/events.parquet", d / "a.parquet")
        shutil.copy(f"{SF_SMOKE}/events.parquet", d / "b.parquet")
        stream = read_events_stream(spark, str(d), max_files_per_trigger=1)
        out = run_stream_to_memory(running_user_totals_stream(stream), "t_totals")
        rows = out.collect()
        assert len(rows) > 0
        per_user = {}
        for r in rows:
            per_user.setdefault(r["user_id"], []).append(r)
        # at least one user saw two batches with accumulating totals
        multi = [v for v in per_user.values() if len(v) == 2]
        assert multi, "expected users emitted in both micro-batches"
        for emissions in multi:
            a, b = sorted(emissions, key=lambda r: r["total_events"])
            assert b["total_events"] == a["total_events"] + b["batch_events"]


class TestEmbeddingDedup:
    def test_planted_near_identical_vectors(self, spark):
        from waterdata_spark.operators.dedup_approx import embedding_dedup

        import random

        rnd = random.Random(7)
        base = [rnd.uniform(-1, 1) for _ in range(16)]
        near = [x + 0.001 for x in base]
        rows = [(0, base), (1, near)] + [
            (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(2, 12)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        kept = embedding_dedup(df, "vec_id", "embedding", threshold=0.99, n_cells=4, n_probe=4)
        ids = sorted(r["vec_id"] for r in kept.collect())
        assert 0 in ids and 1 not in ids  # near-identical pair collapsed
        assert len(ids) == 11

    def test_idempotent_on_real_embeddings(self, spark):
        from waterdata_spark.operators.dedup_approx import embedding_dedup
        from waterdata_spark.schemas import load_table

        emb = load_table(spark, SF_SMOKE, "embeddings")
        once = embedding_dedup(emb, "vec_id", "embedding", threshold=0.98)
        twice = embedding_dedup(once, "vec_id", "embedding", threshold=0.98)
        assert sorted(r["vec_id"] for r in once.collect()) == sorted(r["vec_id"] for r in twice.collect())


class TestSimilarityIdTypes:
    def test_ivf_blocked_preserves_string_ids(self, spark):
        """ADVICE r1: out_schema must derive id type from the input, not
        hardcode LongType."""
        import random

        from waterdata_spark.operators.similarity import cosine_topk_ivf_blocked

        rnd = random.Random(3)
        rows = [(f"doc-{i}", [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
        out = cosine_topk_ivf_blocked(df, k=2, n_cells=2, n_probe=2)
        assert dict(out.dtypes)["vec_id"] == "string"
        assert dict(out.dtypes)["neighbor_id"] == "string"
        got = out.collect()
        assert len(got) > 0
        assert all(r["vec_id"].startswith("doc-") for r in got)


class TestSimHashMd5:
    def test_identical_same_near_closer(self, spark, near_dup_docs):
        from waterdata_spark.operators.dedup_approx import simhash_signature_md5

        sigs_df = near_dup_docs.select(
            "doc_id", simhash_signature_md5("text").alias("s")
        )
        sigs = {r["doc_id"]: r["s"] for r in sigs_df.collect()}
        assert sigs[0] == sigs[1]  # identical texts, identical signature
        def ham(a, b):
            return bin(a ^ b).count("1")
        assert ham(sigs[0], sigs[2]) < ham(sigs[0], sigs[3])
        assert ham(sigs[0], sigs[2]) < ham(sigs[0], sigs[4])

    def test_empty_text_zero_signature(self, spark):
        from waterdata_spark.operators.dedup_approx import simhash_signature_md5

        df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
        got = {r["doc_id"]: r["s"] for r in df.select("doc_id", simhash_signature_md5("text").alias("s")).collect()}
        assert got[1] == 0 and got[2] == 0


class TestDecontaminate:
    """GPT-3-style eval-set decontamination (Brown et al. 2020 App. C):
    13-gram collisions, whole-example grams for short eval items,
    lowercase/whitespace normalization before matching."""

    @pytest.fixture()
    def corpus(self, spark):
        long_clean = " ".join(f"w{i}" for i in range(30))
        # shares tokens 5..17 (a 13-token window) with the eval doc
        overlap13 = " ".join(f"w{i}" for i in range(5)) + " " + " ".join(
            f"e{i}" for i in range(13)
        ) + " tail tokens here"
        # contains the SHORT eval item verbatim mid-document
        holds_short = "alpha beta the secret eval answer gamma delta " + " ".join(
            f"x{i}" for i in range(10)
        )
        return spark.createDataFrame(
            [(1, long_clean), (2, overlap13), (3, holds_short)],
            "doc_id long, text string",
        )

    @pytest.fixture()
    def eval_df(self, spark):
        eval_long = " ".join(f"e{i}" for i in range(20))  # >= 13 tokens
        eval_short = "The  Secret   EVAL answer"  # 4 tokens, mixed case/space
        return spark.createDataFrame(
            [(100, eval_long), (101, eval_short)], "eid long, etext string"
        )

    def test_flags_13gram_and_short_verbatim(self, spark, corpus, eval_df):
        from waterdata_spark.operators.decontaminate import ngram_contamination

        got = {
            r["doc_id"]: r
            for r in ngram_contamination(
                corpus, eval_df, n=13, eval_id_col="eid", eval_text_col="etext"
            ).collect()
        }
        assert set(got) == {2, 3}
        assert got[2]["n_eval_docs"] == 1 and got[2]["n_collisions"] >= 1
        # case/whitespace-normalized short item found inside doc 3
        assert got[3]["n_eval_docs"] == 1 and got[3]["n_collisions"] == 1

    def test_decontaminate_preserves_clean_rows(self, spark, corpus, eval_df):
        from waterdata_spark.operators.decontaminate import decontaminate

        kept = decontaminate(
            corpus, eval_df, n=13, eval_id_col="eid", eval_text_col="etext"
        )
        assert [r["doc_id"] for r in kept.collect()] == [1]
        assert kept.columns == corpus.columns

    def test_empty_eval_set_is_noop(self, spark, corpus):
        from waterdata_spark.operators.decontaminate import decontaminate

        empty = spark.createDataFrame([], "eid long, etext string")
        kept = decontaminate(corpus, empty, eval_id_col="eid", eval_text_col="etext")
        assert kept.count() == 3

    def test_max_lengths_guard_truncates_and_warns(self, spark, corpus):
        """A hostile eval set with many distinct short-example lengths
        must not multiply corpus window generation unbounded: only the
        max_lengths most frequent gram lengths are matched, with a
        warning naming the dropped ones (VERDICT r5 item 8)."""
        import warnings

        from waterdata_spark.operators.decontaminate import ngram_contamination

        # 10 distinct eval lengths (3..12 tokens), one example each
        hostile = spark.createDataFrame(
            [(i, " ".join(f"z{i}_{j}" for j in range(i + 3))) for i in range(10)],
            "eid long, etext string",
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = ngram_contamination(
                corpus, hostile, n=13, eval_id_col="eid", eval_text_col="etext",
                max_lengths=4,
            )
            assert out.count() == 0  # no z-tokens in the corpus
        msgs = [str(x.message) for x in w]
        assert any("distinct gram lengths" in m and "keeping the 4" in m for m in msgs)

    def test_decontaminate_raises_on_trimmed_lengths(self, spark, corpus):
        """decontaminate() DELETES data, so a max_lengths trim that
        skips eval coverage must raise, not warn (ADVICE r6) — a
        silently-partial eval match would pass contaminated documents.
        on_trim='warn' is the explicit opt-in to partial coverage."""
        import warnings

        import pytest as _pytest

        from waterdata_spark.operators.decontaminate import decontaminate

        hostile = spark.createDataFrame(
            [(i, " ".join(f"z{i}_{j}" for j in range(i + 3))) for i in range(10)],
            "eid long, etext string",
        )
        with _pytest.raises(ValueError, match="refuses to silently skip"):
            decontaminate(
                corpus, hostile, n=13, eval_id_col="eid", eval_text_col="etext",
                max_lengths=4,
            )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            kept = decontaminate(
                corpus, hostile, n=13, eval_id_col="eid", eval_text_col="etext",
                max_lengths=4, on_trim="warn",
            )
            assert kept.count() == 3  # no z-tokens in the corpus
        assert any("distinct gram lengths" in str(x.message) for x in w)

    def test_short_gram_warning_but_still_matches(self, spark, corpus):
        import warnings

        from waterdata_spark.operators.decontaminate import ngram_contamination

        # a 2-token eval item that DOES occur in doc 3 ('secret eval')
        tiny = spark.createDataFrame([(7, "secret eval")], "eid long, etext string")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = ngram_contamination(
                corpus, tiny, n=13, eval_id_col="eid", eval_text_col="etext"
            ).collect()
        assert [r["doc_id"] for r in got] == [3]
        assert any("candidate window" in str(x.message) for x in w)

    def test_differential_vs_python_reference_on_documents(self, spark):
        """On the real documents table: eval items are token spans cut
        from 3 documents; a pure-Python reimplementation of the rule
        (same normalization) must flag exactly the same doc_ids."""
        from waterdata_spark.operators.decontaminate import ngram_contamination
        from waterdata_spark.schemas import load_table

        n = 13
        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        rows = {r["doc_id"]: r["text"] for r in docs.collect()}
        pick = sorted(rows)[:3]
        evals = []
        for j, did in enumerate(pick):
            toks = rows[did].lower().split()
            evals.append((1000 + j, " ".join(toks[2 : 2 + n])))  # one 13-gram span
        eval_df = spark.createDataFrame(evals, "eid long, etext string")

        got = sorted(
            r["doc_id"]
            for r in ngram_contamination(
                docs, eval_df, n=n, eval_id_col="eid", eval_text_col="etext"
            ).collect()
        )

        eval_grams = set()
        for _, t in evals:
            et = t.lower().split()
            if len(et) >= n:
                eval_grams |= {tuple(et[i : i + n]) for i in range(len(et) - n + 1)}
            elif et:
                eval_grams.add(tuple(et))
        lengths = {len(g) for g in eval_grams}
        expect = sorted(
            did
            for did, t in rows.items()
            if any(
                tuple(t.lower().split()[i : i + ln]) in eval_grams
                for ln in lengths
                for i in range(max(0, len(t.lower().split()) - ln + 1))
            )
        )
        assert got == expect and len(expect) >= 3

    def test_metamorphic_laws(self, spark):
        """Monotonicity (a larger eval set never un-flags), idempotence
        (re-decontaminating with the same eval set removes nothing
        more), and eval-row-order invariance — on deterministic random
        corpora."""
        import random

        from waterdata_spark.operators.decontaminate import (
            decontaminate,
            ngram_contamination,
        )

        rng = random.Random(11)
        vocab = [f"t{i}" for i in range(40)]
        corpus_rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40))))
            for i in range(60)
        ]
        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        # eval1: spans of 2 corpus docs; eval2 adds 2 more
        def span(did, ln):
            toks = corpus_rows[did][1].split()
            return " ".join(toks[: min(ln, len(toks))])

        e1 = [(0, span(3, 13)), (1, span(7, 6))]
        e2 = e1 + [(2, span(20, 13)), (3, span(31, 4))]
        ev1 = spark.createDataFrame(e1, "eid long, etext string")
        ev2 = spark.createDataFrame(e2, "eid long, etext string")
        ev2_shuffled = spark.createDataFrame(list(reversed(e2)), "eid long, etext string")

        kw = dict(n=13, eval_id_col="eid", eval_text_col="etext")
        f1 = {r["doc_id"] for r in ngram_contamination(corpus, ev1, **kw).collect()}
        f2 = {r["doc_id"] for r in ngram_contamination(corpus, ev2, **kw).collect()}
        f2s = {r["doc_id"] for r in ngram_contamination(corpus, ev2_shuffled, **kw).collect()}
        assert f1 <= f2          # monotone in the eval set
        assert f2 == f2s         # order-invariant
        assert {3, 7} <= f1      # the planted spans are found

        once = decontaminate(corpus, ev2, **kw)
        twice = decontaminate(once, ev2, **kw)
        assert sorted(r["doc_id"] for r in once.collect()) == sorted(
            r["doc_id"] for r in twice.collect()
        )

    def test_no_false_positive_on_shorter_window(self, spark, eval_df):
        """A corpus doc containing only 12 of the eval doc's 13-gram
        tokens must NOT be flagged — the window length is exact."""
        from waterdata_spark.operators.decontaminate import ngram_contamination

        corpus = spark.createDataFrame(
            [(7, "prefix " + " ".join(f"e{i}" for i in range(12)))],
            "doc_id long, text string",
        )
        out = ngram_contamination(
            corpus, eval_df, n=13, eval_id_col="eid", eval_text_col="etext"
        )
        assert out.count() == 0


class TestStreamingDecontaminate:
    def test_stream_equals_batch_with_quarantine(self, spark, tmp_path):
        """A 3-micro-batch document stream decontaminated against a
        frozen eval set must accumulate exactly the batch operator's
        clean set, with the dropped docs in quarantine — and the eval
        prep (the only driver action) happens once, not per batch."""
        from waterdata_spark.operators.decontaminate import decontaminate
        from waterdata_spark.schemas import load_table
        from waterdata_spark.streaming.hygiene import decontaminate_stream_sink

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        # eval set carved from the corpus (same recipe as x21): spans of
        # every 11th doc -> guaranteed hits across all micro-batches
        toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
        eval_df = docs.filter((F.col("doc_id") % 11 == 0) & (F.size(toks) >= 16)).select(
            (F.col("doc_id") + 10**6).alias("doc_id"),
            F.array_join(F.slice(toks, 2, 13), " ").alias("text"),
        )

        src = tmp_path / "docs_stream"
        src.mkdir()
        for i in range(3):
            docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = decontaminate_stream_sink(
            stream,
            eval_df,
            out_dir=str(tmp_path / "clean"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            quarantine_dir=str(tmp_path / "dirty"),
        )
        q.awaitTermination()

        batch_clean = {r["doc_id"] for r in decontaminate(docs, eval_df).collect()}
        got_clean = {
            r["doc_id"] for r in spark.read.parquet(str(tmp_path / "clean")).collect()
        }
        got_dirty = {
            r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dirty")).collect()
        }
        all_ids = {r["doc_id"] for r in docs.collect()}
        assert got_clean == batch_clean
        assert got_dirty == all_ids - batch_clean
        assert len(got_dirty) > 0  # non-vacuous: spans really collided


class TestStreamingDedupAgainst:
    def test_stream_equals_batch_gate(self, spark, tmp_path):
        """A 3-micro-batch document stream gated against a frozen
        reference corpus must keep exactly what the batch signature
        gate keeps (flag_near_reference is per-document and stateless,
        so the equality is row-for-row), quarantine the rest, and be
        non-vacuous in both directions: the reference slice's own
        documents drop (self-similarity 1.0 always collides and
        estimates 1.0), others survive."""
        from waterdata_spark.operators.dedup_approx import (
            flag_near_reference,
            reference_signatures,
        )
        from waterdata_spark.schemas import load_table
        from waterdata_spark.streaming.hygiene import dedup_against_stream_sink

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        reference = docs.filter(F.col("doc_id") % 6 == 2)

        src = tmp_path / "docs_stream"
        src.mkdir()
        for i in range(3):
            docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                str(src / f"f{i}")
            )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = dedup_against_stream_sink(
            stream,
            reference,
            out_dir=str(tmp_path / "kept"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            quarantine_dir=str(tmp_path / "dropped"),
            threshold=0.7,
        )
        q.awaitTermination()

        ref_sig = reference_signatures(reference)
        batch_flagged = {
            r["doc_id"] for r in flag_near_reference(docs, ref_sig).collect()
        }
        all_ids = {r["doc_id"] for r in docs.collect()}
        got_kept = {
            r["doc_id"] for r in spark.read.parquet(str(tmp_path / "kept")).collect()
        }
        got_dropped = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "dropped")).collect()
        }
        assert got_kept == all_ids - batch_flagged
        assert got_dropped == batch_flagged
        ref_ids = {r["doc_id"] for r in reference.select("doc_id").collect()}
        assert ref_ids <= got_dropped  # identity always estimates 1.0
        assert got_kept  # and the gate is not dropping everything

    def test_gate_agrees_with_estimate_only_semantics(self, spark):
        """Planted docs: an identical copy of a reference doc and a
        light edit must be flagged; an unrelated doc must not — on
        both hash paths."""
        from waterdata_spark.operators.dedup_approx import (
            flag_near_reference,
            reference_signatures,
        )

        base = "the quick brown fox jumps over the lazy dog again " * 5
        corpus = spark.createDataFrame(
            [
                (1, base),
                (2, base + "with one small appended tail"),
                (3, "entirely different text about catalyst plans " * 5),
            ],
            "doc_id long, text string",
        )
        ref = spark.createDataFrame([(900, base)], "doc_id long, text string")
        # the repeated base collapses to ~60 distinct shingles, so the
        # light edit sits at true jaccard ~0.68 — gate at 0.5 with 8
        # bands (2 rows/band), the same operating point the batch
        # fuzzy-dedup test pins
        for hash_fn in ("xx", "md5"):
            sig = reference_signatures(ref, hash_fn=hash_fn)
            flagged = {
                r["doc_id"]
                for r in flag_near_reference(
                    corpus, sig, n_bands=8, threshold=0.5, hash_fn=hash_fn
                ).collect()
            }
            assert flagged == {1, 2}, hash_fn


class TestAnnSearch:
    def test_probe_all_equals_bruteforce(self, spark):
        """cosine_search_ivf with n_probe >= n_cells covers every cell,
        so it must EQUAL the exact search — the completeness law that
        pins the index structure (partial probing only removes cells)."""
        from waterdata_spark.operators.similarity import (
            cosine_search_bruteforce,
            cosine_search_ivf,
        )
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        data = e.filter(F.col("vec_id") % 5 != 0)
        queries = e.filter(F.col("vec_id") % 5 == 0).withColumnRenamed("vec_id", "qid")
        bf = cosine_search_bruteforce(data, queries, query_id_col="qid", k=3, sim_col=None)
        ivf = cosine_search_ivf(
            data, queries, query_id_col="qid", k=3, n_cells=8, n_probe=8, sim_col=None
        )
        assert sorted(map(tuple, bf.collect())) == sorted(map(tuple, ivf.collect()))

    def test_probe_all_equals_bruteforce_under_ties(self, spark):
        """Duplicate embeddings create exact similarity ties at the
        top-k boundary — the per-cell cut must keep the smallest
        neighbor ids, matching brute force (an arbitrary argpartition
        subset diverges exactly here; VERDICT r3 #6)."""
        from waterdata_spark.operators.similarity import (
            cosine_search_bruteforce,
            cosine_search_ivf,
            cosine_topk_bruteforce,
            cosine_topk_ivf_blocked,
        )

        vecs = [[1.0, 0.0], [0.0, 1.0], [0.8, 0.6]]
        rows = [(i, vecs[i % 3]) for i in range(15)]  # each vector ×5
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

        bf = cosine_topk_bruteforce(df, k=4, sim_col=None)
        ivf = cosine_topk_ivf_blocked(df, k=4, n_cells=3, n_probe=3, sim_col=None)
        assert sorted(map(tuple, bf.collect())) == sorted(map(tuple, ivf.collect()))

        data = df.filter(F.col("vec_id") >= 3)
        queries = df.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        sbf = cosine_search_bruteforce(data, queries, query_id_col="qid", k=4, sim_col=None)
        sivf = cosine_search_ivf(
            data, queries, query_id_col="qid", k=4, n_cells=3, n_probe=3, sim_col=None
        )
        assert sorted(map(tuple, sbf.collect())) == sorted(map(tuple, sivf.collect()))

    def test_multi_assign_probe_all_equals_bruteforce(self, spark):
        """n_assign > 1 duplicates data vectors across cells; with
        probe-all the result must STILL equal brute force — i.e. the
        cross-cell duplicate pairs collapse exactly (no neighbor ever
        appears twice in a query's top-k, no rank gaps)."""
        from waterdata_spark.operators.similarity import (
            cosine_search_bruteforce,
            cosine_search_ivf,
            cosine_topk_bruteforce,
            cosine_topk_ivf_blocked,
        )
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings").limit(60)
        bf = cosine_topk_bruteforce(e, k=3, sim_col=None)
        ivf = cosine_topk_ivf_blocked(
            e, k=3, n_cells=4, n_probe=4, n_assign=2, sim_col=None
        )
        assert sorted(map(tuple, bf.collect())) == sorted(map(tuple, ivf.collect()))

        data = e.filter(F.col("vec_id") % 5 != 0)
        queries = e.filter(F.col("vec_id") % 5 == 0).withColumnRenamed("vec_id", "qid")
        sbf = cosine_search_bruteforce(data, queries, query_id_col="qid", k=3, sim_col=None)
        sivf = cosine_search_ivf(
            data, queries, query_id_col="qid", k=3, n_cells=4, n_probe=4, n_assign=2, sim_col=None
        )
        assert sorted(map(tuple, sbf.collect())) == sorted(map(tuple, sivf.collect()))

    def test_multi_assign_no_duplicate_pairs_partial_probe(self, spark):
        """Under PARTIAL probing with n_assign=2 a (query, neighbor)
        pair can surface via two different shared cells — the collapse
        must leave exactly one row per (vec_id, neighbor_id) and dense
        ranks 1..k."""
        from waterdata_spark.operators.similarity import cosine_topk_ivf_blocked
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings").limit(120)
        out = cosine_topk_ivf_blocked(
            e, k=4, n_cells=8, n_probe=3, n_assign=2, sim_col=None
        )
        rows = out.collect()
        pairs = [(r["vec_id"], r["neighbor_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["vec_id"], []).append(r["rank"])
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())

    def test_build_once_search_many_equals_oneshot(self, spark):
        """The FAISS-style build/search split: one build_ivf_index +
        per-batch search_ivf_index must equal the one-shot
        cosine_search_ivf on each batch (same quantizer seed ⇒ same
        cells ⇒ identical candidates), including an n_assign=2 build
        where the dedup decision rides the index, not the call."""
        from waterdata_spark.operators.similarity import (
            build_ivf_index,
            cosine_search_ivf,
            search_ivf_index,
        )
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        data = e.filter(F.col("vec_id") % 5 != 0)
        batches = [
            e.filter(F.col("vec_id") % 5 == 0).withColumnRenamed("vec_id", "qid"),
            e.filter(F.col("vec_id") % 7 == 0).withColumnRenamed("vec_id", "qid"),
        ]
        for n_assign in (1, 2):
            index = build_ivf_index(data, n_cells=8, n_assign=n_assign)
            for q in batches:
                split = search_ivf_index(index, q, query_id_col="qid", k=3, n_probe=4, sim_col=None)
                oneshot = cosine_search_ivf(
                    data, q, query_id_col="qid", k=3, n_cells=8, n_probe=4,
                    n_assign=n_assign, sim_col=None,
                )
                assert sorted(map(tuple, split.collect())) == sorted(
                    map(tuple, oneshot.collect())
                )

    def test_quantize_roundtrip_error_within_bound(self, spark):
        """Symmetric int8 quantization must reconstruct within the
        theoretical half-step bound scale/2 per element, and a zero
        vector must survive (scale 0, all-zero codes)."""
        from waterdata_spark.operators.quantize import quantization_error
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        zero = spark.createDataFrame(
            [(10**9, [0.0] * len(e.first()["embedding"]))],
            "vec_id long, embedding array<double>",
        )
        out = quantization_error(
            e.select("vec_id", F.col("embedding").cast("array<double>")).unionByName(zero)
        )
        stats = out.agg(
            F.max("err_vs_bound").alias("worst"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        assert stats["n"] == e.count() + 1
        assert stats["worst"] <= 1.0 + 1e-9
        z = out.filter(F.col("vec_id") == 10**9).collect()[0]
        assert z["max_abs_err"] == 0.0 and z["qscale"] == 0.0
        assert all(v == 0 for v in z["qvec"])

    def test_quantize_plan_is_jvm_only(self, spark):
        """Quantization is pure JVM expressions — no Python workers in
        the plan (the 100 TB write path must not serde every vector)."""
        from waterdata_spark.operators.quantize import with_quantized_vector
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        out = with_quantized_vector(e.select("vec_id", "embedding"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "mapInPandas" not in plan
        row = out.first()
        assert len(row["qvec"]) == len(row["embedding"]) and row["qscale"] > 0

    def test_quantized_probe_all_matches_exact_on_separated_groups(self, spark):
        """Margin law: int8 noise (<~0.01 cosine) must not flip a
        decision whose margin exceeds it. 16 groups of 4 near-duplicate
        vectors around well-separated centers: each query's exact top-3
        is its 3 groupmates (in-group cosine ~1.0 vs cross-group ~<0.8),
        so the quantized search must return exactly those sets."""
        import math
        import random

        from waterdata_spark.operators.similarity import (
            build_ivf_index,
            cosine_search_bruteforce,
            search_ivf_index,
        )

        rng = random.Random(3)
        dim, n_groups = 8, 16
        centers = []
        for g in range(n_groups):
            v = [rng.gauss(0, 1) for _ in range(dim)]
            n = math.sqrt(sum(x * x for x in v))
            centers.append([x / n for x in v])
        rows = [
            (g * 4 + m, [c + rng.uniform(-0.005, 0.005) for c in centers[g]])
            for g in range(n_groups)
            for m in range(4)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        # query = member 0 of every 4th group; data = everything else
        queries = df.filter((F.col("vec_id") % 16 == 0)).withColumnRenamed("vec_id", "qid")
        data = df.filter(F.col("vec_id") % 16 != 0)
        bf = cosine_search_bruteforce(data, queries, query_id_col="qid", k=3, sim_col=None)
        by_q_bf: dict = {}
        for r in bf.collect():
            by_q_bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # sanity: exact top-3 of query g*16 is its groupmates g*16+1..3
        assert all(v == {q + 1, q + 2, q + 3} for q, v in by_q_bf.items())
        idx = build_ivf_index(data, n_cells=4, quantize=True)
        try:
            q = search_ivf_index(idx, queries, query_id_col="qid", k=3, n_probe=4, sim_col=None)
            by_q_q: dict = {}
            for r in q.collect():
                by_q_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            assert by_q_bf == by_q_q
        finally:
            idx.indexed.unpersist()

    def test_quantized_index_schema_and_overlap_on_real_embeddings(self, spark):
        """On the real embeddings table the quantized index must store
        int8 payloads (byte array + one double scale — the 4x claim's
        schema side) and agree with the float index on >=90% of
        neighbor decisions at the same operating point."""
        from waterdata_spark.operators.similarity import build_ivf_index, search_ivf_index
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        queries = e.filter(F.col("vec_id") % 10 == 0).withColumnRenamed("vec_id", "qid")
        fp = build_ivf_index(e, n_cells=8, n_assign=2)
        q8 = build_ivf_index(e, n_cells=8, n_assign=2, quantize=True)
        try:
            assert dict(q8.indexed.dtypes)["d_q"] == "array<tinyint>"
            assert dict(q8.indexed.dtypes)["d_s"] == "double"
            a = search_ivf_index(fp, queries, query_id_col="qid", k=5, n_probe=8, sim_col=None)
            b = search_ivf_index(q8, queries, query_id_col="qid", k=5, n_probe=8, sim_col=None)
            sa = {(r["query_id"], r["neighbor_id"]) for r in a.collect()}
            sb = {(r["query_id"], r["neighbor_id"]) for r in b.collect()}
            assert len(sa & sb) / len(sa) >= 0.9
        finally:
            fp.indexed.unpersist()
            q8.indexed.unpersist()

    def test_query_ids_disjoint_from_data(self, spark):
        """The search shape must not self-exclude: a query searching a
        corpus that contains an identical vector should return it."""
        from waterdata_spark.operators.similarity import cosine_search_ivf

        data = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
        )
        queries = spark.createDataFrame([(100, [1.0, 0.0])], "qid long, embedding array<float>")
        out = cosine_search_ivf(
            data, queries, query_id_col="qid", k=1, n_cells=2, n_probe=2, sim_col="similarity"
        ).collect()
        assert len(out) == 1
        assert out[0]["neighbor_id"] == 1 and out[0]["similarity"] == 1.0


class TestRecordLinkage:
    """Soundex/prefix-blocked levenshtein linkage (operators/linkage.py
    — SURVEY §2.9 X2's declared record-linkage mapping)."""

    NAMES = [
        (1, "Acme Water District"),
        (2, "ACME  water  district"),     # case/whitespace only
        (3, "Acme Water Distrct"),        # 1-char deletion typo
        (4, "Blue River Utility"),
        (5, "Blue River Utilitys"),       # 1-char insertion
        (6, "Crystal Springs Co"),
        (7, "completely different name"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.NAMES, "id long, key string")

    def test_differential_vs_python_reference(self, spark):
        """Pairs from the Spark operator must equal a pure-Python
        blocked-linkage reimplementation (same normalize, same prefix
        block, classic DP levenshtein) on planted names — distances
        included."""
        import re

        from waterdata_spark.operators.linkage import link_pairs

        def norm(s):
            return re.sub(r"\s+", " ", s).strip().lower()

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        rows = [(i, norm(k)) for i, k in self.NAMES]
        want = set()
        for i, (ia, ka) in enumerate(rows):
            for ib, kb in rows[i + 1 :]:
                if ka[:3] == kb[:3] and lev(ka, kb) <= 2:
                    want.add((ia, ib, lev(ka, kb)))
        got = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in link_pairs(
                self._df(spark), blocking=["prefix:3"], max_distance=2
            ).collect()
        }
        assert got == want
        assert (1, 2, 0) in got and (1, 3, 1) in got and (4, 5, 1) in got

    def test_linked_dedup_transitive_and_deterministic(self, spark):
        """a<->b<->c collapses to one survivor (lowest id) even when
        the endpoints are further apart than max_distance; unrelated
        rows survive; the operator is idempotent."""
        from waterdata_spark.operators.linkage import linked_dedup

        out = linked_dedup(self._df(spark), max_distance=2)
        kept = sorted(r["id"] for r in out.collect())
        assert kept == [1, 4, 6, 7]
        again = sorted(r["id"] for r in linked_dedup(out, max_distance=2).collect())
        assert again == kept

    def test_linked_dedup_forwards_cap_and_normalize(self, spark):
        """max_block_size / normalize reach link_pairs from the dedup
        API (ADVICE r7): a degenerate shared-prefix corpus dedupes its
        true dup only when the cap is lifted, and normalize=False
        keeps case-distinct keys apart."""
        from waterdata_spark.operators.linkage import linked_dedup

        rows = [(i, f"Customer#{i:09d}") for i in range(30)]
        rows.append((9_000, "Customer#000000007"))  # exact dup of id 7
        df = spark.createDataFrame(rows, "id long, key string")
        capped = linked_dedup(
            df, blocking=["prefix:8"], max_distance=0, max_block_size=5
        ).count()
        assert capped == 31  # whole corpus is one block > cap: no links
        uncapped = linked_dedup(
            df, blocking=["prefix:8"], max_distance=0, max_block_size=None
        ).count()
        assert uncapped == 30  # dup of id 7 collapsed

        cased = spark.createDataFrame(
            [(1, "ACME"), (2, "acme")], "id long, key string"
        )
        assert linked_dedup(cased, max_distance=0, normalize=False).count() == 2
        assert linked_dedup(cased, max_distance=0, normalize=True).count() == 1

    def test_multi_strategy_union_catches_first_letter_typo(self, spark):
        """'acme' vs 'bcme': soundex and prefix blocks both split on
        the first letter, but rprefix blocking catches it — the
        multi-pass union recall mechanism."""
        from waterdata_spark.operators.linkage import link_pairs

        df = spark.createDataFrame(
            [(1, "acme water"), (2, "bcme water")], "id long, key string"
        )
        miss = link_pairs(df, blocking=["soundex", "prefix:3"]).collect()
        assert miss == []
        hit = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in link_pairs(df, blocking=["rprefix:4"]).collect()
        }
        assert hit == {(1, 2, 1)}

    def test_two_table_linkage_and_null_safety(self, spark):
        from waterdata_spark.operators.linkage import link_pairs

        a = spark.createDataFrame(
            [(1, "Acme Water"), (2, None), (3, "")], "id long, key string"
        )
        b = spark.createDataFrame(
            [(10, "acme  water"), (11, None)], "id long, key string"
        )
        got = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in link_pairs(a, b).collect()
        }
        assert got == {(1, 10, 0)}

    def test_plan_is_block_equi_join_not_product(self, spark):
        """100 TB guard: candidate generation must be an equi-join on
        the block key — no CartesianProduct / BroadcastNestedLoopJoin
        anywhere in the plan."""
        from waterdata_spark.operators.linkage import link_pairs

        df = self._df(spark)
        plan = (
            link_pairs(df, blocking=["soundex", "rprefix:3"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSpanDedupGlobal:
    """Content-defined-chunking global span dedup
    (operators/dedup.dedup_spans_global)."""

    W, P, MIN = 4, 32, 8

    @staticmethod
    def _py_dedup(rows, w, p, min_tok):
        """Pure-Python reference: same md5 boundary rule, first-
        occurrence-by-(doc,start) election, reassembly."""
        import hashlib
        import re

        def toks(text):
            return [t for t in re.split(r"\s+", (text or "").strip(" ")) if t != ""]

        def boundary(window_toks):
            h = int(
                hashlib.md5(" ".join(window_toks).encode()).hexdigest()[:15], 16
            )
            return h % p == 0

        doc_chunks = {}
        for did, text in rows:
            ts = toks(text)
            chunks, cur, start = [], [], 0
            for i, t in enumerate(ts):
                cur.append(t)
                if i >= w - 1 and boundary(ts[i - w + 1 : i + 1]):
                    chunks.append((start, cur))
                    cur, start = [], i + 1
            if cur:
                chunks.append((start, cur))
            doc_chunks[did] = chunks
        seen = {}
        for did in sorted(doc_chunks):
            for start, cur in doc_chunks[did]:
                key = " ".join(cur)
                if len(cur) >= min_tok and key not in seen:
                    seen[key] = (did, start)
        out = {}
        for did in sorted(doc_chunks):
            kept_chunks, kept, total = [], 0, 0
            for start, cur in doc_chunks[did]:
                total += len(cur)
                key = " ".join(cur)
                if len(cur) < min_tok or seen.get(key) == (did, start):
                    kept_chunks.append(key)
                    kept += len(cur)
            out[did] = (" ".join(kept_chunks), kept, total - kept)
        return out

    def test_differential_vs_python_reference_on_documents(self, spark):
        """md5-boundary path vs the pure-Python reference on the real
        documents table plus planted cross-document duplicate spans:
        reassembled text, kept and dropped token counts all equal."""
        from waterdata_spark.operators.dedup import dedup_spans_global
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        shared = " ".join(f"srd{i % 17}tok{i}" for i in range(120))
        planted = spark.createDataFrame(
            [
                (20_001, "intro words here " + shared + " closing remarks"),
                (20_002, "other beginning " + shared),
                (20_003, shared + " trailing part only"),
            ],
            "doc_id long, text string",
        )
        df = docs.unionByName(planted)
        rows = [(r["doc_id"], r["text"]) for r in df.collect()]
        want = self._py_dedup(rows, self.W, self.P, self.MIN)
        got = {
            r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_dropped"])
            for r in dedup_spans_global(
                df,
                window=self.W,
                target_chunk_tokens=self.P,
                min_chunk_tokens=self.MIN,
                drop_empty_docs=False,
                hash_fn="md5",
            ).collect()
        }
        assert set(got) == set(want)
        for did in want:
            assert got[did] == want[did], did
        # non-vacuous: the planted copies really lost span tokens
        assert got[20_002][2] > 0 and got[20_003][2] > 0

    def test_offset_robustness(self, spark):
        """THE property fixed tiles cannot provide: the same long span
        embedded at DIFFERENT offsets still dedups — interior chunks
        are content-defined, so only edge partials survive in the
        second document."""
        from waterdata_spark.operators.dedup import dedup_spans_global

        shared = " ".join(f"sp{i % 13}x{i}" for i in range(400))
        df = spark.createDataFrame(
            [
                (1, "a b " + shared + " y z"),
                (2, " ".join(f"pre{j}" for j in range(37)) + " " + shared),
            ],
            "doc_id long, text string",
        )
        for hash_fn in ("xx", "md5"):
            got = {
                r["doc_id"]: r
                for r in dedup_spans_global(df, hash_fn=hash_fn).collect()
            }
            assert got[1]["n_tokens_dropped"] == 0, hash_fn
            # doc 2 loses most of the 400 shared tokens — only the two
            # edge partial chunks may survive, and chunk lengths are
            # geometric with mean p=32, so >=75% dropped is safe for
            # any boundary luck (measured: 331 xx / 321 md5)
            assert got[2]["n_tokens_dropped"] >= 300, (
                hash_fn,
                got[2]["n_tokens_dropped"],
            )
            assert "pre0" in got[2]["text"] and "pre36" in got[2]["text"]

    def test_unique_corpus_passes_through_token_normalized(self, spark):
        """A corpus with no repeated spans loses nothing; output text
        is the token-normalized original; empty docs drop by default."""
        from waterdata_spark.operators.dedup import dedup_spans_global

        df = spark.createDataFrame(
            [
                (1, "  alpha   beta\tgamma  " + " ".join(f"u{i}" for i in range(40))),
                (2, ""),
                (3, None),
            ],
            "doc_id long, text string",
        )
        out = dedup_spans_global(df).collect()
        assert {r["doc_id"] for r in out} == {1}
        r = out[0]
        assert r["n_tokens_dropped"] == 0
        assert r["text"].startswith("alpha beta gamma u0 ")


class TestPagerank:
    """Link-graph centrality (operators/graph.pagerank)."""

    @staticmethod
    def _py_pagerank(nodes, edges, d=0.85, tol=1e-6, max_iter=40):
        edges = sorted(set(edges))
        out = {}
        for s, _ in edges:
            out[s] = out.get(s, 0) + 1
        n = len(nodes)
        ranks = {v: 1.0 / n for v in nodes}
        for _ in range(max_iter):
            dangling = sum(r for v, r in ranks.items() if out.get(v, 0) == 0)
            contrib = {v: 0.0 for v in nodes}
            for s, t in edges:
                contrib[t] += ranks[s] / out[s]
            new = {
                v: (1 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
            }
            delta = sum(abs(new[v] - ranks[v]) for v in nodes)
            ranks = new
            if delta < tol:
                break
        return ranks

    def test_differential_vs_python_power_iteration(self, spark):
        """Exact agreement with a pure-Python power iteration on a
        graph with a hub, a cycle, a dangling node, and a duplicate
        edge (counted once)."""
        nodes = list(range(7))
        edges = [
            (0, 1), (0, 2), (0, 3),
            (1, 0), (2, 0), (3, 0),
            (4, 5), (5, 6),           # chain into dangling 6
            (4, 5),                   # duplicate edge
            (3, 4),
        ]
        from waterdata_spark.operators.graph import pagerank

        ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
        edf = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(ndf, edf).collect()}
        want = self._py_pagerank(nodes, edges)
        assert set(got) == set(want)
        for v in nodes:
            assert got[v] == pytest.approx(want[v], abs=1e-9), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
        assert got[0] == max(got.values())  # the hub dominates

    def test_ring_is_uniform_and_star_center_wins(self, spark):
        from waterdata_spark.operators.graph import pagerank

        ring_n = spark.createDataFrame([(v,) for v in range(5)], "node long")
        ring_e = spark.createDataFrame(
            [(v, (v + 1) % 5) for v in range(5)], "src long, dst long"
        )
        got = [r["rank"] for r in pagerank(ring_n, ring_e).collect()]
        for r in got:
            assert r == pytest.approx(0.2, abs=1e-9)

        star_n = spark.createDataFrame([(v,) for v in range(6)], "node long")
        star_e = spark.createDataFrame(
            [(v, 0) for v in range(1, 6)] + [(0, v) for v in range(1, 6)],
            "src long, dst long",
        )
        ranks = {r["node"]: r["rank"] for r in pagerank(star_n, star_e).collect()}
        assert all(ranks[0] > ranks[v] for v in range(1, 6))


class TestPagerankExternalEdges:
    def test_edges_outside_node_set_preserve_mass(self, spark):
        """Edges whose dst (or src) is outside ``nodes`` are dropped
        before outdeg (ADVICE r7): node 2's only out-link leaves the
        set, so it is dangling, and Σ rank stays exactly 1 — the old
        behavior counted the external edge in outdeg and leaked its
        share of rank mass."""
        from waterdata_spark.operators.graph import pagerank

        nodes = [0, 1, 2]
        # (2, 99): dst outside set; (98, 0): src outside set
        edges = [(0, 1), (1, 2), (2, 99), (98, 0), (0, 2)]
        ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
        edf = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(ndf, edf).collect()}
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        kept = [(s, t) for s, t in edges if s in nodes and t in nodes]
        want = TestPagerank._py_pagerank(nodes, kept)
        for v in nodes:
            assert got[v] == pytest.approx(want[v], abs=1e-9), v


class TestLinkageBlockCap:
    def test_degenerate_block_skipped_not_quadratic(self, spark):
        """A corpus whose every key shares the blocked prefix (the
        TPC-H 'Customer#0000…' shape) degenerates soundex/prefix to
        ONE table-sized block; the cap skips it for that strategy
        while rprefix (digit tail) still links the true dup pair."""
        from waterdata_spark.operators.linkage import link_pairs

        rows = [(i, f"Customer#{i:09d}") for i in range(500)]
        rows.append((9_000, "Customer#000000007"))  # exact dup of id 7
        df = spark.createDataFrame(rows, "id long, key string")
        got = {
            (r["id_a"], r["id_b"])
            for r in link_pairs(
                df,
                blocking=["prefix:8", "rprefix:5"],
                max_distance=1,
                max_block_size=100,
            ).collect()
        }
        # prefix:8 block ('customer') holds all 501 rows -> skipped;
        # rprefix:5 ('00007') holds only the dup pair (+ id 7) -> found
        assert (7, 9_000) in got
        # and nothing exploded: candidates stayed tiny
        assert len(got) < 50

    def test_cap_none_restores_full_recall(self, spark):
        from waterdata_spark.operators.linkage import link_pairs

        df = spark.createDataFrame(
            [(1, "abcd"), (2, "abce"), (3, "abcf")], "id long, key string"
        )
        capped = {
            (r["id_a"], r["id_b"])
            for r in link_pairs(
                df, blocking=["prefix:3"], max_block_size=2
            ).collect()
        }
        full = {
            (r["id_a"], r["id_b"])
            for r in link_pairs(
                df, blocking=["prefix:3"], max_block_size=None
            ).collect()
        }
        assert capped == set()
        assert full == {(1, 2), (1, 3), (2, 3)}


class TestNearDedupStream:
    def test_signature_dedup_stream_equals_batch(self, spark, tmp_path):
        """A 3-micro-batch doc stream deduped at signature granularity
        keeps exactly the batch twin's survivors (exact_dedup on the
        same signature digest): the later re-wrapped copy of doc 1
        drops (same shingle SET as doc 1 — sha2-of-text would miss
        it), distinct docs survive."""
        from waterdata_spark.operators.dedup import exact_dedup
        from waterdata_spark.operators.dedup_approx import minhash_signature
        from waterdata_spark.streaming.ops import near_dedup_stream, run_stream_to_memory

        base = "alpha beta gamma delta epsilon zeta eta theta " * 4
        rows = [
            (1, base, 100),
            (2, "a completely different second document body " * 4, 200),
            (3, base, 300),            # exact copy, later arrival
            (4, "yet another distinct third document here " * 4, 400),
        ]
        src = tmp_path / "stream"
        src.mkdir()
        for i, batch in enumerate([rows[:2], rows[2:3], rows[3:]]):
            spark.createDataFrame(
                batch, "doc_id long, text string, off long"
            ).selectExpr(
                "doc_id", "text",
                "timestamp_micros(1700000000000000 + off*1000000) AS event_ts",
            ).coalesce(1).write.parquet(str(src / f"f{i}"))
        stream = spark.readStream.schema(
            "doc_id long, text string, event_ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(str(src / "*"))
        got = {
            r["doc_id"]
            for r in run_stream_to_memory(
                near_dedup_stream(stream), "near_dedup_t"
            ).collect()
        }

        batch_df = spark.createDataFrame(
            [(i, t) for i, t, _ in rows], "doc_id long, text string"
        ).withColumn(
            "__sig", F.concat_ws("|", minhash_signature(F.col("text"), 16, 8))
        )
        want = {
            r["doc_id"] for r in exact_dedup(batch_df, ["__sig"], "doc_id").collect()
        }
        assert got == want == {1, 2, 4}


class TestBm25:
    """Okapi BM25 keyword retrieval (operators/retrieval.bm25_topk)."""

    @staticmethod
    def _py_bm25(doc_rows, query_rows, k=10, k1=1.2, b=0.75, max_df=None):
        """Pure-Python BM25 with the operator's exact contract:
        lowercase whitespace terms, distinct query terms, per-term
        contribution rounded to 9dp then exactly summed (Fraction
        keeps the sum order-independent), ties by doc id."""
        import math
        import re
        from fractions import Fraction

        def terms(t):
            return [x for x in re.split(r"\s+", t.strip(" ").lower()) if x]

        docs = {i: terms(t) for i, t in doc_rows}
        n = len(docs)
        dl = {i: len(ts) for i, ts in docs.items()}
        avgdl = sum(dl.values()) / n
        dfreq = {}
        for ts in docs.values():
            for t in set(ts):
                dfreq[t] = dfreq.get(t, 0) + 1
        out = {}
        for qid, qt in query_rows:
            scores = {}
            for t in set(terms(qt)):
                df_t = dfreq.get(t)
                if df_t is None or (max_df is not None and df_t > max_df):
                    continue
                idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
                for d, ts in docs.items():
                    tf = ts.count(t)
                    if not tf:
                        continue
                    c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))
                    scores[d] = scores.get(d, Fraction(0)) + Fraction(
                        round(c, 9)
                    ).limit_denominator(10**9)
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            out[qid] = [
                (d, r + 1, float(s)) for r, (d, s) in enumerate(ranked)
            ]
        return out

    def test_differential_vs_python_on_documents(self, spark):
        """Rank AND rounded-decimal score agree exactly with the
        pure-Python reference on real documents, queries cut from
        document text (guaranteed hits)."""
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.retrieval import bm25_topk
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        doc_rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        query_rows = [
            (i, " ".join(t.split()[2:8]))
            for i, t in doc_rows
            if i % 37 == 3 and len(t.split()) > 8
        ][:6]
        queries = spark.createDataFrame(query_rows, "qid long, qtext string")
        got = {}
        for r in bm25_topk(docs, queries, k=5).collect():
            got.setdefault(r["qid"], []).append(
                (r["doc_id"], r["rank"], r["score"])
            )
        want = self._py_bm25(doc_rows, query_rows, k=5)
        assert set(got) == {q for q, v in want.items() if v}
        for qid, rows in got.items():
            rows.sort(key=lambda x: x[1])
            assert [x[:2] for x in rows] == [x[:2] for x in want[qid]], qid
            for (_, _, gs), (_, _, ws) in zip(rows, want[qid]):
                assert gs == pytest.approx(ws, abs=1e-9)

    def test_partition_stability_and_identical_doc_ties(self, spark):
        from waterdata_spark.operators.retrieval import bm25_topk

        rows = [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact dup of 1
            (3, "alpha unrelated filler words here now"),
            (4, "totally different content"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        q = spark.createDataFrame([(7, "alpha beta")], "qid long, qtext string")
        key = lambda out: [(r["doc_id"], r["rank"], r["score"]) for r in out]
        a = key(bm25_topk(docs, q, k=4).orderBy("rank").collect())
        bb = key(bm25_topk(docs.repartition(13), q, k=4).orderBy("rank").collect())
        assert a == bb
        # identical docs -> identical decimal scores, tie broken by id
        assert a[0][0] == 1 and a[1][0] == 2
        assert a[0][2] == a[1][2]
        assert [r[0] for r in a] == [1, 2, 3]  # doc 4 shares no term

    def test_max_df_prunes_stopwords(self, spark):
        """A term present in every document carries ~zero idf; with
        max_df below N it is dropped and no longer generates
        candidates."""
        from waterdata_spark.operators.retrieval import bm25_topk

        docs = spark.createDataFrame(
            [(i, f"common filler text unique{i}") for i in range(20)],
            "doc_id long, text string",
        )
        q = spark.createDataFrame([(1, "common unique3")], "qid long, qtext string")
        full = bm25_topk(docs, q, k=25).collect()
        assert len(full) == 20  # 'common' matches everything
        pruned = bm25_topk(docs, q, k=25, max_df=10).collect()
        assert [r["doc_id"] for r in pruned] == [3]  # only 'unique3' survives

    def test_plan_broadcasts_query_side(self, spark):
        """The postings build is the only wide stage: the query-term
        and idf joins ride broadcasts, never a sort-merge of the
        corpus against the queries."""
        from waterdata_spark.operators.retrieval import bm25_topk

        docs = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("word"), (F.col("id") % 17).cast("string"),
                     F.lit(" tail common")).alias("text"),
        )
        q = spark.createDataFrame([(1, "word3 common")], "qid long, qtext string")
        plan = (
            bm25_topk(docs, q, k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan


class TestUrlCanonicalize:
    """Crawl URL canonicalization (functions/urls.py)."""

    CASES = [
        # (input, expected canonical)
        ("HTTP://WWW.Example.COM:80/a/", "http://www.example.com/a"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com/a?utm_source=x&b=2&a=1#frag", "http://example.com/a?a=1&b=2"),
        ("http://example.com/a?fbclid=abc", "http://example.com/a"),
        ("http://example.com/a?gclid=1&utm_campaign=q&keep=v", "http://example.com/a?keep=v"),
        ("http://example.com/", "http://example.com/"),
        ("http://example.com", "http://example.com"),
        ("  http://example.com/a  ", "http://example.com/a"),
        ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
        ("not a url at all", "not a url at all"),
        ("ftp://Files.Example.com/Pub/", "ftp://files.example.com/Pub"),
    ]

    def test_battery_and_idempotence(self, spark):
        from waterdata_spark.functions.urls import canonicalize_url, is_canonical_url

        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(self.CASES)], "i long, url string"
        )
        out = {
            r["i"]: (r["c"], r["cc"], r["ok"])
            for r in df.select(
                "i",
                canonicalize_url("url").alias("c"),
                canonicalize_url(canonicalize_url("url")).alias("cc"),
                is_canonical_url("url").alias("ok"),
            ).collect()
        }
        for i, (u, want) in enumerate(self.CASES):
            c, cc, ok = out[i]
            assert c == want, (u, c)
            assert cc == c, ("not idempotent", u, c, cc)
            assert ok == (u.strip() != "not a url at all"), u

    def test_url_host_and_null(self, spark):
        from waterdata_spark.functions.urls import canonicalize_url, url_host

        df = spark.createDataFrame(
            [(1, "HTTPS://API.Example.org:8443/v1"), (2, None), (3, "nope")],
            "i long, url string",
        )
        got = {
            r["i"]: (r["h"], r["c"])
            for r in df.select(
                "i", url_host("url").alias("h"), canonicalize_url("url").alias("c")
            ).collect()
        }
        assert got[1][0] == "api.example.org"
        assert got[2] == (None, None)
        assert got[3][0] == ""

    def test_collapses_crawl_variants_to_one_key(self, spark):
        """The operational point: all spellings of the same page give
        ONE dedup key."""
        from waterdata_spark.functions.urls import canonicalize_url

        variants = [
            "http://Example.com/page/",
            "HTTP://example.com:80/page",
            "http://example.com/page?utm_source=feed",
            "http://example.com/page#top",
        ]
        df = spark.createDataFrame([(u,) for u in variants], "url string")
        keys = df.select(canonicalize_url("url").alias("k")).distinct().collect()
        assert len(keys) == 1
        assert keys[0]["k"] == "http://example.com/page"


class TestDomainBlocklist:
    """Registered-domain extraction + UT1-style blocklist filtering
    (functions/urls.py, operators/urlfilter.py, r9) — the RefinedWeb
    stage-1 hygiene gate; the x27 'domain' oracle leg is the twin."""

    def test_host_suffixes_chain(self, spark):
        from waterdata_spark.functions.urls import host_suffixes

        df = spark.createDataFrame(
            [(1, "a.b.example.com"), (2, "com"), (3, ""), (4, None)],
            "i long, h string",
        )
        got = {
            r["i"]: r["s"]
            for r in df.select("i", host_suffixes("h").alias("s")).collect()
        }
        assert got[1] == ["a.b.example.com", "b.example.com", "example.com", "com"]
        assert got[2] == ["com"]
        assert got[3] == []
        assert got[4] == []

    def test_registered_domain_rule(self, spark):
        from waterdata_spark.functions.urls import registered_domain

        cases = {
            1: ("deep.sub.domain.com", "domain.com"),
            2: ("www.blog.example.co.uk", "example.co.uk"),
            3: ("shop.com.au", "shop.com.au"),
            4: ("localhost", "localhost"),
            5: ("co.uk", "co.uk"),  # a bare public suffix stays itself
            6: (None, None),
        }
        df = spark.createDataFrame(
            [(k, v[0]) for k, v in cases.items()], "i long, h string"
        )
        got = {
            r["i"]: r["d"]
            for r in df.select("i", registered_domain("h").alias("d")).collect()
        }
        assert got == {k: v[1] for k, v in cases.items()}

    def test_extra_suffixes_extend_the_set(self, spark):
        from waterdata_spark.functions.urls import registered_domain

        df = spark.createDataFrame([(1, "x.y.blogspot.com")], "i long, h string")
        default = df.select(registered_domain("h").alias("d")).first()["d"]
        extended = df.select(
            registered_domain("h", extra_suffixes=("blogspot.com",)).alias("d")
        ).first()["d"]
        assert default == "blogspot.com"
        assert extended == "y.blogspot.com"

    def test_blocklist_dot_boundary_and_subdomains(self, spark):
        """Blocking example.com blocks every subdomain but NOT
        notexample.com — the endswith-string trap."""
        from waterdata_spark.operators.urlfilter import url_blocklist_filter

        df = spark.createDataFrame(
            [
                (1, "http://a.b.example.com/x"),
                (2, "http://example.com/y"),
                (3, "http://notexample.com/z"),
                (4, "https://safe.org/w"),
                (5, None),
                (6, "not a url"),
            ],
            "id long, url string",
        )
        bl = spark.createDataFrame([("example.com",)], "domain string")
        kept = sorted(
            r["id"] for r in url_blocklist_filter(df, bl, mode="remove").collect()
        )
        assert kept == [3, 4, 5, 6]
        flags = {
            r["id"]: r["url_blocked"]
            for r in url_blocklist_filter(df, bl, mode="flag").collect()
        }
        assert flags == {1: True, 2: True, 3: False, 4: False, 5: False, 6: False}

    def test_shuffle_fallback_and_empty_blocklist(self, spark):
        from waterdata_spark.operators.urlfilter import url_blocklist_filter

        df = spark.createDataFrame(
            [(i, f"http://h{i % 5}.example{i % 3}.com/p") for i in range(60)],
            "id long, url string",
        )
        bl = spark.createDataFrame([("example0.com",), ("h3.example1.com",)],
                                   "domain string")
        a = sorted(r["id"] for r in url_blocklist_filter(df, bl).collect())
        b = sorted(
            r["id"]
            for r in url_blocklist_filter(df, bl, max_broadcast_rows=0).collect()
        )
        assert a == b and 0 < len(a) < 60
        empty = spark.createDataFrame([], "domain string")
        assert url_blocklist_filter(df, empty).count() == 60
        with pytest.raises(ValueError, match="mode"):
            url_blocklist_filter(df, bl, mode="audit")


class TestPsl:
    """Public-suffix-list snapshot support (functions/urls.py load_psl +
    operators/urlfilter.py registered_domains_psl, r10 — VERDICT r9
    item 5 / missing #3)."""

    HOSTS = [
        "user1.github.io",
        "a.b.user1.github.io",
        "user2.github.io",
        "www.blog.example.co.uk",
        "shop.example.com.au",
        "example.com",
        "a.b.example.com",
        "www.ck",          # !www.ck exception: registrable itself
        "a.www.ck",
        "foo.bar.ck",      # *.ck wildcard: bar.ck is public suffix
        "ck",              # bare TLD → null
        "com",
        "co.uk",           # public suffix itself → null
        "localhost",
        "unknowntld.zz",   # default '*' rule
        "city.kawasaki.jp",     # exception under *.kawasaki.jp
        "a.city.kawasaki.jp",
        "x.y.kawasaki.jp",      # wildcard: y.kawasaki.jp is public suffix
    ]

    def test_parse_psl_format(self):
        from waterdata_spark.functions.urls import parse_psl

        psl = parse_psl(
            "// comment\n\ncom\n*.ck\n!www.ck\nCO.UK  trailing junk\n"
        )
        assert "com" in psl.rules and "co.uk" in psl.rules
        assert "ck" in psl.wildcards and "www.ck" in psl.exceptions
        with pytest.raises(ValueError, match="wildcard"):
            parse_psl("a.*.b\n")

    def test_snapshot_battery_pure_python(self):
        """The verdict's named battery against the vendored snapshot."""
        from waterdata_spark.functions.urls import load_psl, psl_registered_domain

        psl = load_psl()
        want = {
            "user1.github.io": "user1.github.io",
            "a.b.user1.github.io": "user1.github.io",
            "user2.github.io": "user2.github.io",
            "www.blog.example.co.uk": "example.co.uk",
            "shop.example.com.au": "example.com.au",
            "example.com": "example.com",
            "www.ck": "www.ck",
            "a.www.ck": "www.ck",
            "foo.bar.ck": "foo.bar.ck",
            "ck": None,
            "co.uk": None,
            "localhost": None,
            "unknowntld.zz": "unknowntld.zz",
            "city.kawasaki.jp": "city.kawasaki.jp",
            "x.y.kawasaki.jp": "x.y.kawasaki.jp",
        }
        for h, w in want.items():
            assert psl_registered_domain(h, psl) == w, h
        assert psl_registered_domain(None, psl) is None
        assert psl_registered_domain("", psl) is None
        # user1 and user2 github.io sites do NOT collapse (the gap the
        # short built-in set has)
        from waterdata_spark.functions.urls import registered_domain  # noqa: F401

    def test_distributed_operator_differential(self, spark):
        """registered_domains_psl (distinct hosts → broadcast rules
        join) == psl_registered_domain on the full battery, via both
        host_col and url_col entry points; null/empty/non-URL → null."""
        from waterdata_spark.functions.urls import load_psl, psl_registered_domain
        from waterdata_spark.operators.urlfilter import registered_domains_psl

        psl = load_psl()
        rows = [(i, h) for i, h in enumerate(self.HOSTS)] + [
            (100, None),
            (101, ""),
            (102, "UPPER.Example.COM"),
        ]
        df = spark.createDataFrame(rows, "i long, h string")
        got = {
            r["i"]: r["reg_domain"]
            for r in registered_domains_psl(df, psl, host_col="h").collect()
        }
        for i, h in rows:
            assert got[i] == psl_registered_domain(h, psl), (i, h)
        # url entry point
        urls = spark.createDataFrame(
            [(1, "https://A.B.user1.GitHub.io/x?q=1"), (2, "not a url"), (3, None)],
            "i long, url string",
        )
        g2 = {
            r["i"]: r["reg_domain"]
            for r in registered_domains_psl(urls, psl, url_col="url").collect()
        }
        assert g2 == {1: "user1.github.io", 2: None, 3: None}
        with pytest.raises(ValueError, match="exactly one"):
            registered_domains_psl(df, psl, host_col="h", url_col="h")
        with pytest.raises(ValueError, match="exactly one"):
            registered_domains_psl(df, psl)

    def test_blocklist_registered_domain_match(self, spark):
        """match_on='registered_domain': user1.github.io is blockable
        without touching user2.github.io — the strict UT1 semantics the
        suffix chain cannot express (an entry 'github.io' would block
        both)."""
        from waterdata_spark.functions.urls import load_psl
        from waterdata_spark.operators.urlfilter import url_blocklist_filter

        psl = load_psl()
        df = spark.createDataFrame(
            [
                (1, "https://user1.github.io/p"),
                (2, "https://deep.user1.github.io/p"),
                (3, "https://user2.github.io/p"),
                (4, "https://example.com/p"),
            ],
            "id long, url string",
        )
        bl = spark.createDataFrame([("user1.github.io",)], "domain string")
        kept = sorted(
            r["id"]
            for r in url_blocklist_filter(
                df, bl, match_on="registered_domain", psl=psl
            ).collect()
        )
        assert kept == [3, 4]
        # suffix chain with a github.io entry blocks both users
        bl2 = spark.createDataFrame([("github.io",)], "domain string")
        kept2 = sorted(r["id"] for r in url_blocklist_filter(df, bl2).collect())
        assert kept2 == [4]
        with pytest.raises(ValueError, match="requires psl"):
            url_blocklist_filter(df, bl, match_on="registered_domain")
        with pytest.raises(ValueError, match="match_on"):
            url_blocklist_filter(df, bl, match_on="psl")


class TestNaiveBayes:
    """Hashed-token multinomial NB (operators/classify.py)."""

    B, ALPHA = 4096, 1.0

    def test_differential_vs_python_on_documents(self, spark):
        """Train on a lang-labeled slice of the real documents table
        (md5 bucket path), score the rest; predicted label matches a
        pure-Python NB exactly and the joint log prob to 1e-8."""
        import hashlib
        import math
        import re

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.classify import nb_score, nb_train
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
        train = docs.filter(F.col("doc_id") % 3 == 0).select(
            F.col("lang").alias("label"), "text"
        )
        test = docs.filter(F.col("doc_id") % 3 != 0)
        model = nb_train(train, n_buckets=self.B, hash_fn="md5")
        got = {
            r["doc_id"]: (r["predicted"], r["nb_log_prob"])
            for r in nb_score(
                test, model, n_buckets=self.B, alpha=self.ALPHA, hash_fn="md5"
            ).collect()
        }

        def toks(t):
            return [x for x in re.split(r"\s+", t.strip(" ")) if x != ""]

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % self.B

        cnt, n_class, n_docs = {}, {}, {}
        for r in train.collect():
            c = r["label"]
            n_docs[c] = n_docs.get(c, 0) + 1
            for b in (bucket(t) for t in toks(r["text"])):
                cnt[(c, b)] = cnt.get((c, b), 0) + 1
                n_class[c] = n_class.get(c, 0) + 1
        total = sum(n_docs.values())
        labels = sorted(n_docs)
        lp = {c: round(math.log(n_docs[c] / total), 9) for c in labels}
        lu = {
            c: round(
                math.log(self.ALPHA) - math.log(n_class.get(c, 0) + self.ALPHA * self.B), 9
            )
            for c in labels
        }

        for r in test.collect():
            bs = [bucket(t) for t in toks(r["text"])]
            best = None
            for c in labels:
                s = lp[c] + len(bs) * lu[c]
                s += sum(
                    round(math.log((cnt.get((c, b), 0) + self.ALPHA) / self.ALPHA), 9)
                    for b in bs
                    if (c, b) in cnt
                )
                if best is None or s > best[1] + 1e-12:
                    best = (c, s)
            want_label, want_score = best
            g_label, g_score = got[r["doc_id"]]
            assert g_label == want_label, r["doc_id"]
            assert g_score == pytest.approx(want_score, abs=1e-8), r["doc_id"]

    def test_language_recovery_and_empty_doc_prior(self, spark):
        """NB trained on marker-rich language-labeled docs recovers the
        language of held-out docs (>=0.9 — the synthetic documents
        table itself is NOT usable here: its 31-word vocabulary is
        shared across langs, so text barely encodes the label and even
        an exactly-correct NB sits near the prior); an empty doc gets
        the majority-prior class."""
        from waterdata_spark.functions.text import LANG_MARKERS
        from waterdata_spark.operators.classify import nb_score, nb_train

        langs = sorted(LANG_MARKERS)[:4]
        rows = []
        for i in range(240):
            # index by i//2 so the even/odd train split sees every class
            lang = langs[0] if (i // 2) % 3 == 0 else langs[(i // 2) % 4]
            text = " ".join(LANG_MARKERS[lang] * 4 + ["shared", "noise", "words"])
            rows.append((i, lang, text))
        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        train = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.col("lang").alias("label"), "text"
        )
        test = docs.filter(F.col("doc_id") % 2 != 0)
        model = nb_train(train, n_buckets=self.B)
        scored = nb_score(test, model, n_buckets=self.B)
        n, hits = 0, 0
        for r in scored.collect():
            n += 1
            hits += int(r["predicted"] == r["lang"])
        assert hits / n >= 0.9, f"accuracy {hits/n}"

        empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
        majority = (
            train.groupBy("label").count().orderBy(F.col("count").desc(), "label")
            .first()["label"]
        )
        got = nb_score(empty, model, n_buckets=self.B).first()
        assert got["predicted"] == majority

    def test_shuffle_fallback_matches_broadcast(self, spark):
        from waterdata_spark.operators.classify import nb_score, nb_train
        from tests.conftest import SF_SMOKE
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
        train = docs.limit(40).select(F.col("lang").alias("label"), "text")
        test = docs.limit(60)
        model = nb_train(train, n_buckets=self.B)
        a = {
            (r["doc_id"], r["predicted"], r["nb_log_prob"])
            for r in nb_score(test, model, n_buckets=self.B).collect()
        }
        b = {
            (r["doc_id"], r["predicted"], r["nb_log_prob"])
            for r in nb_score(
                test, model, n_buckets=self.B, max_broadcast_rows=0
            ).collect()
        }
        assert a == b


class TestPrSweep:
    """Threshold sweep for classifier operating points
    (operators/classify.pr_sweep, r11): exact differential vs naive
    per-threshold counting on REAL LR scores, one-scan/bounded plan,
    null exclusion."""

    def test_exact_differential_on_real_scores(self, spark):
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.classify import lr_score, lr_train, pr_sweep
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select(
            "doc_id", "lang", "text"
        )
        train = docs.filter(F.col("doc_id") % 3 == 0).select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("y"), "text"
        )
        model = lr_train(train, n_buckets=4096, hash_fn="md5", n_iter=2)
        test = docs.filter(F.col("doc_id") % 3 != 0).withColumn(
            "y", (F.col("lang") == "en").cast("int")
        )
        scored = lr_score(test, model).persist()
        ts = [0.2, 0.4, 0.5, 0.6, 0.8]
        got = {
            r["threshold"]: (r["tp"], r["fp"], r["fn"], r["tn"])
            for r in pr_sweep(scored, "lr_prob", "y", ts).collect()
        }
        rows = [(r["lr_prob"], r["y"]) for r in scored.collect()]
        scored.unpersist()
        assert set(got) == set(ts)
        for t in ts:
            tp = sum(1 for s, y in rows if s >= t and y == 1)
            fp = sum(1 for s, y in rows if s >= t and y == 0)
            fn = sum(1 for s, y in rows if s < t and y == 1)
            tn = sum(1 for s, y in rows if s < t and y == 0)
            assert got[t] == (tp, fp, fn, tn), t
        # the rule is monotone: raising t never gains tp or fp
        ordered = [got[t] for t in sorted(ts)]
        assert all(a[0] >= b[0] and a[1] >= b[1] for a, b in zip(ordered, ordered[1:]))

    def test_null_exclusion_and_single_scan(self, spark):
        from waterdata_spark.operators.classify import pr_sweep

        df = spark.createDataFrame(
            [(0.9, 1), (0.4, 0), (None, 1), (0.7, None), (0.1, 0),
             (float("nan"), 0)],  # NaN clears every threshold in Spark
            "s double, y int",     # ordering — must be excluded (r11)
        )
        out = pr_sweep(df, "s", "y", [0.5])
        [r] = out.collect()
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 0, 0, 2)
        # one corpus scan for the whole sweep: the totals come from the
        # bounded counts frame, not a second pass
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("LocalTableScan") - plan.count(
            "LocalTableScan <empty>"
        ) <= 3  # corpus once + threshold frame + totals reuse (cached)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pr_sweep(df, "s", "y", [])


class TestLogisticRegression:
    """Binary LR over hashed-token features (operators/classify.py, r9) —
    the iterated-aggregation sibling of NB; the x28 'lr' oracle leg
    unrolls two epochs in DuckDB."""

    B = 4096

    def test_training_differential_vs_python(self, spark):
        """Fit on the lang-labeled real documents (md5 path, l2 ON to
        exercise the regularized update): every weight and the bias
        match the exact pure-Python twin bit-for-bit."""
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.classify import lr_python, lr_train
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
        train = docs.filter(F.col("doc_id") % 3 == 0).select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("y"), "text"
        )
        model = lr_train(
            train, n_buckets=self.B, hash_fn="md5", n_iter=3,
            learning_rate=0.5, l2=0.01,
        )
        pdocs = {
            r["doc_id"]: (1 if r["lang"] == "en" else 0, r["text"])
            for r in docs.filter(F.col("doc_id") % 3 == 0).collect()
        }
        w, b = lr_python(
            pdocs, n_buckets=self.B, n_iter=3, learning_rate=0.5, l2=0.01
        )
        assert b == model.bias
        assert w == model.weights

    def test_fit_is_partitioning_invariant(self, spark):
        """The decimal-sum contract: repartitioned input → bit-identical
        model (serialized form compared)."""
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.classify import lr_train
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
        train = docs.filter(F.col("doc_id") % 3 == 0).select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("y"), "text"
        )
        a = lr_train(train, n_buckets=self.B, hash_fn="md5", n_iter=2)
        b = lr_train(
            train.repartition(7), n_buckets=self.B, hash_fn="md5", n_iter=2
        )
        assert a.to_json() == b.to_json()

    def test_learns_separable_labels(self, spark):
        """Marker-rich planted docs (the NB recipe — the synthetic
        documents table's 31-word shared vocabulary barely encodes the
        label): held-out accuracy >= 0.9 and positive docs score higher
        probability than negative ones."""
        from waterdata_spark.functions.text import LANG_MARKERS
        from waterdata_spark.operators.classify import lr_score, lr_train

        langs = sorted(LANG_MARKERS)[:2]
        rows = []
        for i in range(200):
            lang = langs[(i // 2) % 2]
            text = " ".join(LANG_MARKERS[lang] * 4 + ["shared", "noise", "words"])
            rows.append((i, 1 if lang == langs[0] else 0, text))
        docs = spark.createDataFrame(rows, "doc_id long, y int, text string")
        train = docs.filter(F.col("doc_id") % 2 == 0)
        test = docs.filter(F.col("doc_id") % 2 != 0)
        model = lr_train(train, n_buckets=self.B, n_iter=10, learning_rate=1.0)
        scored = lr_score(test, model).collect()
        hits = sum(int(r["lr_pred"] == r["y"]) for r in scored)
        assert hits / len(scored) >= 0.9, f"accuracy {hits/len(scored)}"
        pos = min(r["lr_prob"] for r in scored if r["y"] == 1)
        neg = max(r["lr_prob"] for r in scored if r["y"] == 0)
        assert pos > neg

    def test_shuffle_fallback_matches_broadcast(self, spark):
        """max_broadcast_rows=0 degrades both train and score to shuffle
        joins with identical results (the lm_perplexity contract)."""
        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.classify import lr_score, lr_train
        from waterdata_spark.schemas import load_table

        docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
        train = docs.limit(60).select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("y"), "text"
        )
        test = docs.limit(90)
        a = lr_train(train, n_buckets=self.B, n_iter=2)
        b = lr_train(train, n_buckets=self.B, n_iter=2, max_broadcast_rows=0)
        assert a.to_json() == b.to_json()
        sa = {
            (r["doc_id"], r["lr_prob"], r["lr_pred"])
            for r in lr_score(test, a).collect()
        }
        sb = {
            (r["doc_id"], r["lr_prob"], r["lr_pred"])
            for r in lr_score(test, a, max_broadcast_rows=0).collect()
        }
        assert sa == sb

    def test_empty_doc_scores_sigmoid_bias_and_json_roundtrip(self, spark):
        import math

        from waterdata_spark.operators.classify import LRModel, lr_score, lr_train

        train = spark.createDataFrame(
            [(0, 1, "good fine nice"), (1, 0, "bad awful junk")] * 10,
            "doc_id long, y int, text string",
        )
        model = lr_train(train, n_buckets=self.B, n_iter=2)
        got = lr_score(
            spark.createDataFrame([(9, "")], "doc_id long, text string"), model
        ).first()
        want = round(1.0 / (1.0 + math.exp(-model.bias)), 7)
        assert got["lr_prob"] == pytest.approx(want, abs=1e-12)
        rt = LRModel.from_json(model.to_json())
        assert rt.to_json() == model.to_json()
        assert rt.weights == model.weights and rt.bias == model.bias

    def test_rejects_non_binary_labels(self, spark):
        from waterdata_spark.operators.classify import lr_train

        bad = spark.createDataFrame(
            [(0, 2, "a b"), (1, 0, "c d")], "doc_id long, y int, text string"
        )
        with pytest.raises(ValueError, match="0/1"):
            lr_train(bad, n_buckets=self.B, n_iter=1)


class TestUrlDedupStream:
    def test_stream_equals_batch_on_canonical_key(self, spark, tmp_path):
        """Crawl variants of the same page arriving across micro-batches
        collapse to the first arrival; stream == batch (exact_dedup on
        the canonical URL)."""
        from waterdata_spark.functions.urls import canonicalize_url
        from waterdata_spark.operators.dedup import exact_dedup
        from waterdata_spark.streaming.ops import run_stream_to_memory, url_dedup_stream

        rows = [
            (1, "http://Example.com/page/", 0),
            (2, "HTTP://example.com:80/page", 60),       # same page, later
            (3, "http://example.com/page?utm_source=x", 120),  # same page
            (4, "http://example.com/other", 180),
            (5, None, 240),                               # null passes through
        ]
        src = tmp_path / "urls"
        src.mkdir()
        for i, batch in enumerate([rows[:2], rows[2:4], rows[4:]]):
            spark.createDataFrame(
                batch, "page_id long, url string, off long"
            ).selectExpr(
                "page_id", "url",
                "timestamp_micros(1700000000000000 + off*1000000) AS event_ts",
            ).coalesce(1).write.parquet(str(src / f"f{i}"))
        stream = spark.readStream.schema(
            "page_id long, url string, event_ts timestamp"
        ).option("maxFilesPerTrigger", 1).parquet(str(src / "*"))
        got = {
            r["page_id"]
            for r in run_stream_to_memory(
                url_dedup_stream(stream), "url_dedup_t"
            ).collect()
        }

        batch_df = spark.createDataFrame(
            [(i, u) for i, u, _ in rows], "page_id long, url string"
        ).withColumn(
            "__k",
            F.coalesce(
                canonicalize_url(F.col("url")),
                F.concat(F.lit("null:"), F.col("page_id").cast("string")),
            ),
        )
        want = {
            r["page_id"] for r in exact_dedup(batch_df, ["__k"], "page_id").collect()
        }
        assert got == want == {1, 4, 5}


class TestRrfFuse:
    def test_fusion_matches_python_and_handles_missing_docs(self, spark):
        """RRF of a sparse and a dense ranking matches the pure-Python
        definition exactly (9dp-decimal sums); docs missing from one
        list contribute only from the other."""
        from fractions import Fraction

        from waterdata_spark.operators.retrieval import rrf_fuse

        sparse = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)]
        dense = [(1, 11, 1), (1, 13, 2), (2, 21, 1), (2, 22, 2), (2, 20, 3)]
        a = spark.createDataFrame(sparse, "qid long, doc_id long, rank long")
        b = spark.createDataFrame(dense, "qid long, doc_id long, rank long")
        out = rrf_fuse([a, b], k=10, rrf_k=60)
        got = {}
        for r in out.collect():
            got.setdefault(r["qid"], []).append(
                (r["rank"], r["doc_id"], r["rrf_score"])
            )

        scores = {}
        for lst in (sparse, dense):
            for q, d, rk in lst:
                scores[(q, d)] = scores.get((q, d), Fraction(0)) + Fraction(
                    round(1.0 / (60 + rk), 9)
                ).limit_denominator(10**9)
        want = {}
        for (q, d), s in scores.items():
            want.setdefault(q, []).append((d, s))
        for q in want:
            ranked = sorted(want[q], key=lambda t: (-t[1], t[0]))
            got_q = sorted(got[q])
            assert [(i + 1, d) for i, (d, _) in enumerate(ranked)] == [
                (rk, d) for rk, d, _ in got_q
            ], q
            for (rk, d, gs), (d2, ws) in zip(got_q, ranked):
                assert gs == pytest.approx(float(ws), abs=1e-9)
        # doc 11 appears in both lists for q1 -> fused rank 1
        assert got[1][0][1] == 11

    def test_identical_lists_tie_break_by_doc_id(self, spark):
        from waterdata_spark.operators.retrieval import rrf_fuse

        l1 = spark.createDataFrame(
            [(1, 5, 1), (1, 3, 1)], "qid long, doc_id long, rank long"
        )
        out = rrf_fuse([l1], k=5).orderBy("rank").collect()
        assert [(r["rank"], r["doc_id"]) for r in out] == [(1, 3), (2, 5)]

    def test_composed_hybrid_bm25_plus_ann(self, spark):
        """VERDICT r8 item 4, the advertised use end-to-end: BM25 over
        a planted corpus + exact-cosine ANN over planted embeddings,
        fused by RRF. Doc 10 matches the query by KEYWORDS only (its
        embedding is orthogonal), doc 20 by EMBEDDING only (no shared
        words), doc 30 by both — the fusion must rank the both-lists
        doc first and keep the single-list docs present."""
        from waterdata_spark.operators.retrieval import bm25_topk, rrf_fuse
        from waterdata_spark.operators.similarity import cosine_search_bruteforce

        docs = spark.createDataFrame(
            [
                (10, "quantum entanglement experiment with superconducting qubits"),
                (20, "gardening tips for tomato seedlings in spring weather"),
                (30, "quantum entanglement measurement on qubit devices"),
                (40, "medieval castle architecture and defensive walls"),
            ],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [(1, "quantum entanglement qubits")], "qid long, qtext string"
        )
        # embeddings: axis 0 = "quantum-ness", axis 1 = "gardening-ness",
        # axis 2 = noise. Query vec points at axis 0 tilted toward 1.
        emb = spark.createDataFrame(
            [
                (10, [0.0, 0.0, 1.0]),   # keyword match, orthogonal embedding
                (20, [0.3, 0.95, 0.0]),  # embedding match, no shared words
                (30, [0.9, 0.4, 0.1]),   # both
                (40, [0.0, 0.0, -1.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        qe = spark.createDataFrame(
            [(1, [0.7, 0.7, 0.0])], "qid long, embedding array<double>"
        )
        bm25 = bm25_topk(docs, q, k=3)
        dense = cosine_search_bruteforce(
            emb, qe, query_id_col="qid", k=2, sim_col=None
        ).select(
            F.col("query_id").alias("qid"),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
        bm_ids = {r["doc_id"] for r in bm25.collect()}
        dn_ids = {r["doc_id"] for r in dense.collect()}
        assert 10 in bm_ids and 20 not in bm_ids  # keyword-only planted
        assert 20 in dn_ids and 10 not in dn_ids  # embedding-only planted
        fused = rrf_fuse([bm25.select("qid", "doc_id", "rank"), dense], k=4)
        ranked = [r["doc_id"] for r in fused.orderBy("rank").collect()]
        assert ranked[0] == 30  # in both lists -> fused winner
        assert {10, 20} <= set(ranked)  # single-list docs survive fusion


class TestSemDeDup:
    """SemDeDup (Abbas 2023): frozen-centroid assignment, within-cluster
    threshold graph, min-id components, least-prototypical election."""

    THR = 0.4

    @staticmethod
    def _py_semdedup(ids, X, C, thr, dp=6):
        """Independent pure-numpy/union-find implementation."""
        import numpy as np

        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0] = 1.0
        U = X / n
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        S = np.round(U @ (C / cn).T, dp)
        lab = S.argmax(axis=1)
        cos = S[np.arange(len(lab)), lab]
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for c in range(C.shape[0]):
            idx = np.where(lab == c)[0]
            Sub = np.round(U[idx] @ U[idx].T, dp)
            for i in range(len(idx)):
                for j in range(i + 1, len(idx)):
                    if Sub[i, j] >= thr:
                        ra, rb = find(int(ids[idx[i]])), find(int(ids[idx[j]]))
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        comp = {int(i): find(int(i)) for i in ids}
        best = {}
        for k, i in enumerate(ids):
            cand = (cos[k], int(i))
            key = comp[int(i)]
            if key not in best or cand < best[key]:
                best[key] = cand
        labels = {(int(i), int(lab[k]), comp[int(i)]) for k, i in enumerate(ids)}
        return labels, {v[1] for v in best.values()}

    @staticmethod
    def _real(spark):
        import numpy as np

        e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        rows = sorted(e.collect(), key=lambda r: r["vec_id"])
        ids = np.array([r["vec_id"] for r in rows])
        X = np.array([r["embedding"] for r in rows], dtype="float64")
        return e, ids, X

    def test_differential_pure_python(self, spark):
        import numpy as np

        from waterdata_spark.operators.semdedup import (
            FROZEN_CENTROIDS_64D_K4,
            semdedup,
            semdedup_labels,
        )

        e, ids, X = self._real(spark)
        C = np.array(FROZEN_CENTROIDS_64D_K4)
        want_labels, want_surv = self._py_semdedup(ids, X, C, self.THR)
        L = semdedup_labels(e, "vec_id", "embedding", self.THR, C)
        got = {(r["vec_id"], r["cluster"], r["component"]) for r in L.collect()}
        assert got == want_labels
        got_surv = {r["vec_id"] for r in L.filter("survivor").collect()}
        assert got_surv == want_surv
        out = semdedup(e, "vec_id", "embedding", self.THR, centroids=C)
        assert {r["vec_id"] for r in out.collect()} == want_surv
        # all original columns intact
        assert out.columns == e.columns

    def test_planted_exact_duplicate_one_survives(self, spark):
        from waterdata_spark.operators.semdedup import (
            FROZEN_CENTROIDS_64D_K4,
            semdedup,
        )

        e, _, _ = self._real(spark)
        v = e.filter(F.col("vec_id") == 3).select(
            F.lit(900001).cast("long").alias("vec_id"),
            "embedding",
            "label",
        )
        df = e.select("vec_id", "embedding", "label").unionByName(v)
        out = semdedup(df, "vec_id", "embedding", self.THR, FROZEN_CENTROIDS_64D_K4)
        got = {r["vec_id"] for r in out.collect()}
        # identical vectors co-assign and tie on cos — min id survives,
        # so the planted copy can never outlive its original
        assert 900001 not in got
        assert not ({3, 900001} <= got)

    def test_single_centroid_matches_global_graph(self, spark):
        """k=1 ⇒ every pair is compared ⇒ SemDeDup == exact-graph dedup."""
        import numpy as np

        from waterdata_spark.operators.semdedup import semdedup_labels

        e, ids, X = self._real(spark)
        C = np.ones((1, X.shape[1]))
        want_labels, want_surv = self._py_semdedup(ids, X, C, self.THR)
        L = semdedup_labels(e, "vec_id", "embedding", self.THR, C)
        assert {r["vec_id"] for r in L.filter("survivor").collect()} == want_surv
        assert {(r["vec_id"], r["component"]) for r in L.collect()} == {
            (i, c) for i, _, c in want_labels
        }

    def test_idempotent_with_fixed_centroids(self, spark):
        from waterdata_spark.operators.semdedup import (
            FROZEN_CENTROIDS_64D_K4,
            semdedup,
        )

        e, _, _ = self._real(spark)
        once = semdedup(e, "vec_id", "embedding", self.THR, FROZEN_CENTROIDS_64D_K4)
        twice = semdedup(
            once, "vec_id", "embedding", self.THR, FROZEN_CENTROIDS_64D_K4
        )
        assert {r["vec_id"] for r in twice.collect()} == {
            r["vec_id"] for r in once.collect()
        }

    def test_repartition_stable(self, spark):
        from waterdata_spark.operators.semdedup import (
            FROZEN_CENTROIDS_64D_K4,
            semdedup,
        )

        e, _, _ = self._real(spark)
        a = semdedup(e, "vec_id", "embedding", self.THR, FROZEN_CENTROIDS_64D_K4)
        b = semdedup(
            e.repartition(7, "label"),
            "vec_id",
            "embedding",
            self.THR,
            FROZEN_CENTROIDS_64D_K4,
        )
        assert {r["vec_id"] for r in a.collect()} == {r["vec_id"] for r in b.collect()}

    def test_udf_path_equals_literal_path(self, spark):
        from waterdata_spark.operators.semdedup import (
            FROZEN_CENTROIDS_64D_K4,
            semdedup_labels,
        )

        e, _, _ = self._real(spark)
        lit = semdedup_labels(e, "vec_id", "embedding", self.THR, FROZEN_CENTROIDS_64D_K4)
        udf = semdedup_labels(
            e,
            "vec_id",
            "embedding",
            self.THR,
            FROZEN_CENTROIDS_64D_K4,
            literal_max_elems=0,  # force the Arrow closure path
        )
        assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, udf.collect()))

    def test_assignment_plan_is_jvm_only(self, spark):
        from waterdata_spark.operators.semdedup import (
            FROZEN_CENTROIDS_64D_K4,
            assign_clusters,
        )

        e, _, _ = self._real(spark)
        asg = assign_clusters(e, "vec_id", "embedding", FROZEN_CENTROIDS_64D_K4)
        plan = asg._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert "InPandas" not in plan

    def test_fit_centroids_production_path(self, spark):
        """int-k path: sampled k-means centroids; exact duplicates are
        still caught (identical vectors co-assign for ANY centroids)."""
        from waterdata_spark.operators.semdedup import semdedup

        e, _, _ = self._real(spark)
        v = e.filter(F.col("vec_id") == 7).select(
            F.lit(900002).cast("long").alias("vec_id"), "embedding", "label"
        )
        df = e.select("vec_id", "embedding", "label").unionByName(v)
        out = semdedup(df, "vec_id", "embedding", self.THR, centroids=4, seed=7)
        got = {r["vec_id"] for r in out.collect()}
        assert not ({7, 900002} <= got)
        assert 0 < len(got) <= df.count()

    def test_fit_kwargs_forwarded_to_distributed_trainer(self, spark):
        """ADVICE r8: the caller's round_dp and trainer knobs reach the
        distributed kmeans fit — labels under fit_kwargs={'n_iter': 1}
        must equal an explicit kmeans(n_iter=1, round_dp=...) fit, and
        fit_kwargs alongside explicit centroids is a contract error."""
        import pytest

        from waterdata_spark.operators.clustering import kmeans
        from waterdata_spark.operators.semdedup import semdedup

        e, _, _ = self._real(spark)
        df = e.select("vec_id", "embedding")
        out = semdedup(
            df,
            "vec_id",
            "embedding",
            self.THR,
            centroids=4,
            seed=7,
            round_dp=4,
            fit="distributed",
            fit_kwargs={"n_iter": 1},
        )
        model, _ = kmeans(
            df, "vec_id", "embedding", k=4, n_iter=1, seed=7, round_dp=4
        )
        expected = semdedup(
            df, "vec_id", "embedding", self.THR, centroids=model.centroids,
            round_dp=4,
        )
        assert {r["vec_id"] for r in out.collect()} == {
            r["vec_id"] for r in expected.collect()
        }
        with pytest.raises(ValueError, match="fit_kwargs"):
            semdedup(
                df, "vec_id", "embedding", self.THR,
                centroids=model.centroids, fit_kwargs={"n_iter": 2},
            )

    def test_arrow_assignment_rounds_half_up(self, spark):
        """ADVICE r8: the Arrow kernel must round HALF_UP like F.round,
        the python twin, and the DuckDB oracle. Constructed exact tie:
        unit query [1,0,...], centroid ones(16) -> unit 0.25 each ->
        cosine exactly 0.25; at round_dp=1 that is the 2.5 tie —
        HALF_UP gives 0.3, numpy's half-to-even gave 0.2."""
        from waterdata_spark.operators.semdedup import assign_clusters

        df = spark.createDataFrame(
            [(1, [1.0] + [0.0] * 15)], "vec_id long, embedding array<double>"
        )
        cents = [[1.0] * 16, [0.0, 1.0] + [0.0] * 14]
        lit = assign_clusters(df, "vec_id", "embedding", cents, round_dp=1)
        arrow = assign_clusters(
            df, "vec_id", "embedding", cents, round_dp=1, literal_max_elems=0
        )
        r_lit = lit.collect()[0]
        r_arrow = arrow.collect()[0]
        assert r_lit["cos_to_centroid"] == 0.3
        assert r_arrow["cos_to_centroid"] == 0.3
        assert r_lit["cluster"] == r_arrow["cluster"] == 0


class TestKMeans:
    """Distributed Lloyd's k-means (operators/clustering) — the exact
    scaled-integer update contract and the seeded-init path."""

    def test_kmeans_differential_exact(self, spark):
        """Two full iterations from the frozen centroids must match the
        pure-Python Lloyd twin EXACTLY — every label and every centroid
        component bit-for-bit (order-independent integer sums)."""
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.clustering import kmeans, kmeans_python
        from waterdata_spark.operators.semdedup import FROZEN_CENTROIDS_64D_K4
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        model, asg = kmeans(
            e, "vec_id", "embedding", init_centroids=FROZEN_CENTROIDS_64D_K4, n_iter=2
        )
        got = {r["vec_id"]: r["cluster"] for r in asg.collect()}
        vecs = {r["vec_id"]: list(r["embedding"]) for r in e.collect()}
        C_py, lab_py = kmeans_python(vecs, FROZEN_CENTROIDS_64D_K4, 2)
        assert got == lab_py
        assert np.array_equal(model.centroids, np.asarray(C_py))
        assert sum(model.sizes) == len(vecs)

    def test_kmeans_partitioning_invariance(self, spark):
        """Same centroids and labels no matter how the input is
        partitioned — the point of integer sums."""
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.clustering import kmeans
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings").limit(200)
        m1, a1 = kmeans(e.coalesce(1), "vec_id", "embedding", k=3, n_iter=2, seed=11)
        m2, a2 = kmeans(
            e.repartition(13), "vec_id", "embedding", k=3, n_iter=2, seed=11
        )
        assert np.array_equal(m1.centroids, m2.centroids)
        assert {tuple(r) for r in a1.collect()} == {tuple(r) for r in a2.collect()}

    def test_kmeans_empty_cluster_keeps_previous_centroid(self, spark):
        """A centroid that captures no members survives the update
        unchanged (Lloyd convention) instead of going NaN."""
        import numpy as np

        from waterdata_spark.operators.clustering import kmeans

        rows = [
            (1, [1.0, 0.05]),
            (2, [1.0, -0.05]),
            (3, [0.05, 1.0]),
            (4, [-0.05, 1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        init = [[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]]
        model, asg = kmeans(
            df, "vec_id", "embedding", init_centroids=init, n_iter=3
        )
        assert model.sizes[2] == 0
        assert np.array_equal(model.centroids[2], np.asarray(init[2]))
        labels = {r["vec_id"]: r["cluster"] for r in asg.collect()}
        assert labels == {1: 0, 2: 0, 3: 1, 4: 1}

    def test_kmeans_arrow_and_literal_paths_agree(self, spark):
        """k=16 x 64-d (1024 elems) runs the Arrow closure under the
        default 512 literal budget — same centroids and labels as the
        forced-literal plan (the two assignment kernels are
        interchangeable)."""
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.clustering import kmeans
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings").limit(300)
        m_arrow, a_arrow = kmeans(e, "vec_id", "embedding", k=16, n_iter=2, seed=3)
        m_lit, a_lit = kmeans(
            e, "vec_id", "embedding", k=16, n_iter=2, seed=3,
            literal_max_elems=32_768,
        )
        assert np.array_equal(m_arrow.centroids, m_lit.centroids)
        got_a = {(r["vec_id"], r["cluster"]) for r in a_arrow.collect()}
        got_l = {(r["vec_id"], r["cluster"]) for r in a_lit.collect()}
        assert got_a == got_l

    def test_kmeans_validation(self, spark):
        import pytest as _pytest

        from waterdata_spark.operators.clustering import kmeans

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
        )
        with _pytest.raises(ValueError):
            kmeans(df, "vec_id", "embedding")  # neither k nor init
        with _pytest.raises(ValueError):
            kmeans(df, "vec_id", "embedding", k=2, init_centroids=[[1.0, 0.0]])
        with _pytest.raises(ValueError):
            kmeans(df, "vec_id", "embedding", k=2, n_iter=0)
        with _pytest.raises(ValueError):
            kmeans(df, "vec_id", "embedding", k=5)  # k > n vectors


class TestPCAWhitening:
    """Exact-moment distributed PCA + whitening (operators/embeddings;
    Su 2021 BERT-whitening)."""

    def test_fit_differential_exact_and_partition_invariant(self, spark):
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.embeddings import fit_pca, fit_pca_python
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        m = fit_pca(e, "embedding", 8)
        vecs = [list(r["embedding"]) for r in e.collect()]
        mp = fit_pca_python(vecs, 8)
        assert np.array_equal(m.mean, mp.mean)
        assert np.array_equal(m.components, mp.components)
        assert np.array_equal(m.eigenvalues, mp.eigenvalues)
        # order-independent integer moments: any partitioning, same bits
        m2 = fit_pca(e.repartition(17), "embedding", 8)
        assert np.array_equal(m.components, m2.components)
        # eigenvalues descending, all finite
        assert all(
            m.eigenvalues[i] >= m.eigenvalues[i + 1]
            for i in range(len(m.eigenvalues) - 1)
        )

    def test_gram_fit_matches_exact_within_tolerance(self, spark):
        """VERDICT r8 item 1: the Arrow partial-Gram production fit.
        Against an UNROUNDED pure-numpy float64 covariance (the right
        reference for the float path) it must be exact to summation
        noise (<1e-12; measured bit-equal single-partition, 8.7e-15
        under repartitioning). Against the integer path it must sit
        within the bound the exact path's own 1e-6 input quantization
        implies (~||ΔC||/eigengap ≈ 1e-5 on these closely-spaced
        spectra) — the delta is the EXACT path's rounding, not gram
        error, which the numpy assertion proves."""
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.embeddings import (
            _model_from_cov,
            fit_pca,
            fit_pca_gram,
        )
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        gram = fit_pca_gram(e, "embedding", 8)
        X = np.array([list(r["embedding"]) for r in e.collect()], dtype="float64")
        mean = X.mean(axis=0)
        cov = (X.T @ X) / len(X) - np.outer(mean, mean)
        ref = _model_from_cov(mean, cov, len(X), 8, scale=0)
        assert gram.scale == 0 and gram.n == len(X)
        assert np.max(np.abs(gram.mean - ref.mean)) < 1e-12
        assert np.max(np.abs(gram.eigenvalues - ref.eigenvalues)) < 1e-12
        assert np.max(np.abs(gram.components - ref.components)) < 1e-12
        # repartitioning reorders float64 partial sums — tolerance, not bits
        g2 = fit_pca_gram(e.repartition(17), "embedding", 8)
        assert np.max(np.abs(g2.components - ref.components)) < 1e-9
        # and the integer path agrees to its own quantization bound
        exact = fit_pca(e, "embedding", 8, method="exact")
        assert np.allclose(gram.mean, exact.mean, atol=1e-6)
        assert np.allclose(gram.eigenvalues, exact.eigenvalues, atol=1e-6)
        assert np.max(np.abs(gram.components - exact.components)) < 1e-4

    def test_auto_routes_by_dimension(self, spark):
        """method='auto' keeps the exact fit at d<=128 and routes
        production dims to the gram fit (scale==0 marks the float
        path); bad method names raise."""
        import numpy as np
        import pytest

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.embeddings import fit_pca
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")  # d=64 -> exact
        assert fit_pca(e, "embedding", 4).scale != 0
        wide = e.select(
            "vec_id",
            F.flatten(F.array_repeat(F.col("embedding"), 3)).alias("embedding"),
        )  # d=192 -> gram
        m = fit_pca(wide, "embedding", 4)
        assert m.scale == 0
        assert np.all(np.isfinite(m.components))
        with pytest.raises(ValueError, match="method"):
            fit_pca(e, "embedding", 4, method="fast")

    def test_large_magnitude_components_stay_exact(self, spark):
        """ADVICE r8: components around 4e3 scale to ~4e9 longs whose
        pairwise products (~1.6e19) exceed long range — the pre-fix
        long*long product silently wrapped in non-ANSI mode. The
        decimal-before-multiply fit must still match the arbitrary-
        precision Python twin bit-for-bit."""
        import numpy as np

        from waterdata_spark.operators.embeddings import fit_pca, fit_pca_python

        vecs = [
            [4000.25, -3500.5, 2999.75],
            [-3900.125, 3600.0, 4100.5],
            [3777.0, -4050.25, -3888.875],
            [-4096.5, 3333.125, 3555.0],
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
        )
        m = fit_pca(df, "embedding", 2)
        mp = fit_pca_python(vecs, 2)
        assert np.array_equal(m.mean, mp.mean)
        assert np.array_equal(m.components, mp.components)
        assert np.array_equal(m.eigenvalues, mp.eigenvalues)

    def test_projection_matches_numpy_and_whitening_decorrelates(self, spark):
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.embeddings import fit_pca, project_pca
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        m = fit_pca(e, "embedding", 8)
        out = project_pca(e, "embedding", m, whiten=True)
        assert out.schema[out.columns[-1]].dataType.simpleString() == "array<double>"
        rows = out.select("vec_id", "pca").collect()
        P = np.array([list(r["pca"]) for r in rows])
        X = np.array(
            [list(r["embedding"]) for r in e.orderBy("vec_id").collect()],
            dtype=np.float64,
        )
        # align by vec_id
        by_id = {r["vec_id"]: list(r["pca"]) for r in rows}
        srt = sorted(by_id)
        P = np.array([by_id[i] for i in srt])
        ref = (X - m.mean) @ m.components.T / np.sqrt(m.eigenvalues)
        assert np.abs(P - ref).max() < 1e-9
        # whitened: unit variance per axis, near-zero cross-covariance
        C = np.cov(P.T, bias=True)
        assert np.abs(np.diag(C) - 1.0).max() < 1e-6
        off = np.abs(C - np.diag(np.diag(C))).max()
        assert off < 1e-5

    def test_components_orthonormal_and_truncation_reduces(self, spark):
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.embeddings import fit_pca, project_pca
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings").limit(100)
        m = fit_pca(e, "embedding", 4)
        G = m.components @ m.components.T
        assert np.abs(G - np.eye(4)).max() < 1e-10
        out = project_pca(e, "embedding", m, out_col="z")
        assert out.select(
            (F.size("z") == 4).alias("ok")
        ).filter(~F.col("ok")).count() == 0
        # deterministic sign: largest-|component| entry positive
        for k in range(4):
            assert m.components[k][np.argmax(np.abs(m.components[k]))] > 0

    def test_fit_validation(self, spark):
        import pytest as _pytest

        from waterdata_spark.operators.embeddings import fit_pca

        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [0.5, 1.0])], "vec_id long, embedding array<float>"
        )
        with _pytest.raises(ValueError):
            fit_pca(df, "embedding", 0)
        with _pytest.raises(ValueError):
            fit_pca(df, "embedding", 3)
        with _pytest.raises(ValueError):
            fit_pca(df.filter("vec_id > 99"), "embedding", 1)


class TestEmbeddingPipelineComposition:
    """The r8 geometry stack composes: whiten -> distributed k-means ->
    SemDeDup over the whitened space — the shape a real curation
    pipeline runs (Su 2021 whitening feeding Abbas 2023 clustering)."""

    def test_whiten_kmeans_semdedup_end_to_end(self, spark):
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.clustering import kmeans
        from waterdata_spark.operators.embeddings import fit_pca, project_pca
        from waterdata_spark.operators.semdedup import semdedup
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings")
        m = fit_pca(e, "embedding", 16)
        w = project_pca(e, "embedding", m, out_col="z", whiten=True).select(
            "vec_id", "z"
        )
        model, asg = kmeans(w, "vec_id", "z", k=4, n_iter=3, seed=5)
        assert sum(model.sizes) == e.count()
        assert model.centroids.shape == (4, 16)
        # every cluster non-degenerate on this data
        assert min(model.sizes) > 0
        # rerun determinism end-to-end (fit + train are exact)
        model2, _ = kmeans(w, "vec_id", "z", k=4, n_iter=3, seed=5)
        assert np.array_equal(model.centroids, model2.centroids)
        # SemDeDup over the whitened space with the trained centroids
        out = semdedup(w, "vec_id", "z", threshold=0.9, centroids=model.centroids)
        assert 0 < out.count() <= e.count()
        assert out.columns == ["vec_id", "z"]


class TestModelPersistence:
    """KMeansModel / PCAModel JSON round-trips are exact (shortest-
    round-trip float repr), so train-once / serve-later splits keep
    the bit-level determinism contracts."""

    def test_kmeans_model_roundtrip_and_distributed_semdedup_fit(self, spark):
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.clustering import KMeansModel, kmeans
        from waterdata_spark.operators.semdedup import semdedup
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings").limit(200)
        model, _ = kmeans(e, "vec_id", "embedding", k=3, n_iter=2, seed=9)
        back = KMeansModel.from_json(model.to_json())
        assert np.array_equal(model.centroids, back.centroids)
        assert back.sizes == model.sizes and back.n_iter == model.n_iter
        # semdedup can train its centroids with the distributed fitter
        out = semdedup(e, "vec_id", "embedding", 0.4, centroids=3, fit="distributed")
        assert 0 < out.count() <= 200
        import pytest as _pytest

        with _pytest.raises(ValueError):
            semdedup(e, "vec_id", "embedding", 0.4, centroids=3, fit="bogus")

    def test_pca_model_roundtrip_projection_identical(self, spark):
        import numpy as np

        from tests.conftest import SF_SMOKE
        from waterdata_spark.operators.embeddings import (
            PCAModel,
            fit_pca,
            project_pca,
        )
        from waterdata_spark.schemas import load_table

        e = load_table(spark, SF_SMOKE, "embeddings").limit(120)
        m = fit_pca(e, "embedding", 5)
        back = PCAModel.from_json(m.to_json())
        assert np.array_equal(m.mean, back.mean)
        assert np.array_equal(m.components, back.components)
        assert np.array_equal(m.eigenvalues, back.eigenvalues)
        a = project_pca(e, "embedding", m, out_col="z").select("vec_id", "z")
        b = project_pca(e, "embedding", back, out_col="z").select("vec_id", "z")
        ga = {r["vec_id"]: tuple(r["z"]) for r in a.collect()}
        gb = {r["vec_id"]: tuple(r["z"]) for r in b.collect()}
        assert ga == gb  # bit-identical projections from the revived model
