"""Token-id surface (operators/vocab.py): vocab artifact determinism
and round-trip, exact id-mapping differentials against the symbol
encoders, decode round-trips, and the loader-ready packed-bin
contract (VERDICT r10 item 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waterdata_spark.operators.bpe import encode_bpe, train_bpe
from waterdata_spark.operators.unigram_lm import encode_unigram, train_unigram
from waterdata_spark.operators.vocab import (
    UNK,
    Vocab,
    alphabet_of,
    bpe_vocab,
    decode_ids,
    encode_bpe_ids,
    encode_unigram_ids,
    pack_bins_ids,
    unigram_vocab,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull() & (F.length("text") > 40))
        .limit(80)
        .persist()
    )


@pytest.fixture(scope="module")
def bpe(docs):
    model = train_bpe(docs, n_merges=60, min_count=1)
    vocab = bpe_vocab(model, alphabet_of(docs))
    return model, vocab


@pytest.fixture(scope="module")
def unigram(docs):
    model = train_unigram(docs, vocab_size=300, max_piece_len=4, min_count=1)
    return model, unigram_vocab(model)


class TestVocabArtifact:
    def test_json_round_trip_and_ids(self, bpe):
        _, vocab = bpe
        again = Vocab.from_json(vocab.to_json())
        assert again == vocab
        assert vocab.pieces[vocab.unk_id] == UNK
        for i, p in enumerate(vocab.pieces):
            assert vocab.id_of(p) == i and vocab.piece_of(i) == p
        assert vocab.id_of("never-a-piece-xyz") == vocab.unk_id

    def test_rebuild_identical(self, docs, bpe):
        model, vocab = bpe
        again = bpe_vocab(model, alphabet_of(docs.repartition(7)))
        assert again.to_json() == vocab.to_json()

    def test_bpe_vocab_covers_all_reachable_symbols(self, docs, bpe):
        # every symbol the encoder can emit has a non-unk id
        model, vocab = bpe
        seen = set()
        for r in encode_bpe(docs, model).select("bpe").collect():
            seen.update(r["bpe"])
        missing = {s for s in seen if vocab.id_of(s) == vocab.unk_id}
        assert not missing

    def test_validation(self):
        with pytest.raises(ValueError, match="unique"):
            Vocab(pieces=[UNK, "a", "a"])
        with pytest.raises(ValueError, match="specials"):
            Vocab(pieces=["a", UNK], n_specials=1)


class TestIdDifferential:
    def test_bpe_ids_equal_symbols_through_vocab(self, docs, bpe):
        model, vocab = bpe
        enc = encode_bpe_ids(encode_bpe(docs, model), model, vocab)
        for r in enc.select("bpe", "input_ids").collect():
            assert r["input_ids"] == [vocab.id_of(s) for s in r["bpe"]]

    def test_unigram_ids_equal_pieces_through_vocab(self, docs, unigram):
        model, vocab = unigram
        enc = encode_unigram_ids(encode_unigram(docs, model), model, vocab)
        for r in enc.select("pieces", "input_ids").collect():
            assert r["input_ids"] == [vocab.id_of(s) for s in r["pieces"]]

    def test_decode_round_trip(self, docs, bpe, unigram):
        bmodel, bvocab = bpe
        umodel, uvocab = unigram
        rows = encode_bpe_ids(docs, bmodel, bvocab, out_col="bids")
        rows = encode_unigram_ids(rows, umodel, uvocab, out_col="uids").collect()
        for r in rows:
            norm = " ".join(r["text"].lower().split())
            assert decode_ids(r["bids"], bvocab, "bpe") == norm
            assert decode_ids(r["uids"], uvocab, "unigram") == norm

    def test_oov_maps_to_unk_and_decodes_literally(self, spark, docs, bpe):
        model, vocab = bpe
        oov = spark.createDataFrame([(1, "ÿþ")], "doc_id long, text string")
        [r] = encode_bpe_ids(oov, model, vocab).collect()
        assert vocab.unk_id in r["input_ids"]
        assert UNK in decode_ids(r["input_ids"], vocab, "bpe")

    def test_decode_unknown_family(self, bpe):
        _, vocab = bpe
        with pytest.raises(ValueError):
            decode_ids([0], vocab, "nope")

    def test_bos_eos_boundaries(self, spark, docs, bpe):
        from waterdata_spark.operators.vocab import BOS, EOS, alphabet_of, bpe_vocab

        model, _ = bpe
        vocab = bpe_vocab(model, alphabet_of(docs), specials=(UNK, BOS, EOS))
        out = encode_bpe_ids(
            docs, model, vocab, bos=BOS, eos=EOS
        ).select("text", "input_ids")
        for r in out.collect():
            ids = r["input_ids"]
            assert ids[0] == vocab.id_of(BOS) and ids[-1] == vocab.id_of(EOS)
            # skip_specials drops the boundaries, round trip survives
            norm = " ".join(r["text"].lower().split())
            assert decode_ids(ids, vocab, "bpe", skip_specials=True) == norm
        # an undeclared boundary name raises rather than encoding <unk>
        _, plain_vocab = bpe
        with pytest.raises(ValueError, match="special"):
            encode_bpe_ids(docs, model, plain_vocab, eos=EOS)


class TestByteFallback:
    """r12 (VERDICT r11 item 3): the OOV-free encoding mode — unknown
    characters decompose to UTF-8 byte pieces (the GPT-2/SentencePiece
    byte_fallback convention): oov_rate ≡ 0 on adversarial corpora,
    exact encode→decode round-trip, differential vs a pure-Python
    byte-fallback reference."""

    ADVERSARIAL = [
        (1, "café naïve über straße"),
        (2, "日本語 テスト 中文"),
        (3, "emoji \U0001f600\U0001f680 mix42"),
        (4, "русский עברית"),
        (5, "plain ascii words"),
    ]

    @pytest.fixture(scope="class")
    def adversarial(self, spark):
        return spark.createDataFrame(self.ADVERSARIAL, "doc_id long, text string")

    def test_vocab_layout_and_json(self, docs, bpe):
        from waterdata_spark.operators.bpe import EOW
        from waterdata_spark.operators.vocab import BYTE_PIECES

        model, _ = bpe
        v = bpe_vocab(model, alphabet_of(docs), byte_fallback=True)
        assert tuple(v.pieces[v.n_specials : v.n_specials + 256]) == BYTE_PIECES
        assert v.pieces[v.n_specials + 256] == EOW  # the boundary piece
        again = Vocab.from_json(v.to_json())
        assert again == v and again.byte_fallback
        # layout violation is rejected at construction
        with pytest.raises(ValueError, match="byte pieces"):
            Vocab(pieces=[UNK, "a", "b"], byte_fallback=True)
        # a vocab without the bare </w> piece cannot serve the encoder
        broken = Vocab(
            pieces=[UNK, *BYTE_PIECES], n_specials=1, byte_fallback=True
        )
        with pytest.raises(ValueError, match="</w>"):
            encode_bpe_ids(docs, model, broken)

    def test_oov_rate_zero_and_round_trip_bpe(self, adversarial, docs, bpe):
        from waterdata_spark.operators.vocab import token_id_stats

        model, _ = bpe
        v = bpe_vocab(model, alphabet_of(docs), byte_fallback=True)
        enc = encode_bpe_ids(adversarial, model, v)
        [stats] = token_id_stats(enc, v).collect()
        assert stats["n_unk"] == 0 and stats["oov_rate"] == 0.0
        for r in enc.collect():
            norm = " ".join(r["text"].lower().split())
            assert decode_ids(r["input_ids"], v, "bpe") == norm

    def test_oov_rate_zero_and_round_trip_unigram(self, adversarial, unigram):
        from waterdata_spark.operators.vocab import token_id_stats

        model, _ = unigram
        v = unigram_vocab(model, byte_fallback=True)
        enc = encode_unigram_ids(adversarial, model, v)
        [stats] = token_id_stats(enc, v).collect()
        assert stats["n_unk"] == 0 and stats["oov_rate"] == 0.0
        for r in enc.collect():
            norm = " ".join(r["text"].lower().split())
            assert decode_ids(r["input_ids"], v, "unigram") == norm

    def test_differential_vs_pure_python(self, adversarial, docs, bpe):
        """Independent pure-Python byte-fallback encoder (direct from
        the layout contract: in-vocab symbol -> its id; OOV word-final
        symbol -> bytes + bare-</w> id; other OOV -> bytes) must equal
        the distributed encoder row for row."""
        from waterdata_spark.operators.bpe import EOW, encode_word

        model, _ = bpe
        v = bpe_vocab(model, alphabet_of(docs), byte_fallback=True)
        ranks = model.ranks
        base = v.byte_id_base

        def py_encode(text):
            out = []
            for w in text.lower().split():
                for s in encode_word(w, ranks):
                    if s in v._ids:
                        out.append(v._ids[s])
                    elif s.endswith(EOW) and len(s) > len(EOW):
                        out += [base + b for b in s[: -len(EOW)].encode("utf-8")]
                        out.append(v._ids[EOW])
                    else:
                        out += [base + b for b in s.encode("utf-8")]
            return out

        for r in encode_bpe_ids(adversarial, model, v).collect():
            assert r["input_ids"] == py_encode(r["text"])

    def test_byte_rate_signal(self, adversarial, docs, bpe):
        """byte_rate is the fallback-mode retrain signal (oov_rate is
        identically zero): it must equal the exact byte-token fraction
        and be zero on in-vocab text."""
        from waterdata_spark.operators.vocab import token_id_stats

        model, _ = bpe
        v = bpe_vocab(model, alphabet_of(docs), byte_fallback=True)
        base = v.byte_id_base
        enc = encode_bpe_ids(adversarial, model, v)
        [stats] = token_id_stats(enc, v).collect()
        rows = enc.select("input_ids").collect()
        n_bytes = sum(
            sum(1 for i in r["input_ids"] if base <= i < base + 256)
            for r in rows
        )
        n_tok = sum(len(r["input_ids"]) for r in rows)
        assert stats["n_byte_tokens"] == n_bytes > 0
        assert stats["byte_rate"] == pytest.approx(n_bytes / n_tok)
        [clean] = token_id_stats(encode_bpe_ids(docs, model, v), v).collect()
        assert clean["n_byte_tokens"] == 0 and clean["byte_rate"] == 0.0

    def test_in_vocab_text_uses_no_byte_pieces(self, docs, bpe):
        """Corpus text (the vocab's own alphabet) must encode without
        any byte decomposition — fallback touches only true OOV."""
        model, _ = bpe
        v = bpe_vocab(model, alphabet_of(docs), byte_fallback=True)
        base = v.byte_id_base
        rows = encode_bpe_ids(docs, model, v).select("input_ids").collect()
        assert rows and all(
            not any(base <= i < base + 256 for i in r["input_ids"]) for r in rows
        )


class TestTokenIdStats:
    def test_matches_python_counts(self, spark, docs, bpe):
        from waterdata_spark.operators.vocab import token_id_stats

        model, vocab = bpe
        enc = encode_bpe_ids(
            docs.withColumn("grp", (F.col("doc_id") % 2).cast("int")),
            model,
            vocab,
        ).persist()
        rows = enc.collect()
        unk = vocab.unk_id
        want_tokens = sum(len(r["input_ids"]) for r in rows)
        want_unk = sum(r["input_ids"].count(unk) for r in rows)
        want_bytes = sum(len(r["text"].encode()) for r in rows)
        [got] = token_id_stats(enc, vocab, text_col="text").collect()
        assert got["n_docs"] == len(rows)
        assert got["n_tokens"] == want_tokens
        assert got["n_unk"] == want_unk
        assert got["n_bytes"] == want_bytes
        assert got["oov_rate"] == want_unk / want_tokens
        assert abs(
            got["tokens_per_100_bytes"] - want_tokens * 100.0 / want_bytes
        ) < 1e-9
        # grouped grain: per-group sums re-add to the corpus totals
        per = token_id_stats(enc, vocab, by="grp").collect()
        assert sum(r["n_tokens"] for r in per) == want_tokens
        assert sum(r["n_docs"] for r in per) == len(rows)
        enc.unpersist()

    def test_oov_visible(self, spark, bpe):
        from waterdata_spark.operators.vocab import token_id_stats

        model, vocab = bpe
        oov = spark.createDataFrame([(1, "ÿþÿþ")], "doc_id long, text string")
        [got] = token_id_stats(
            encode_bpe_ids(oov, model, vocab), vocab
        ).collect()
        assert got["n_unk"] > 0 and got["oov_rate"] > 0


class TestPackBinsIds:
    @pytest.mark.parametrize("packer", ["cumsum", "bfd"])
    def test_bins_concatenate_aligned(self, docs, bpe, packer):
        from waterdata_spark.operators.chunking import (
            pack_sequences,
            pack_sequences_bfd,
        )

        model, vocab = bpe
        enc = encode_bpe_ids(docs, model, vocab)
        pack = pack_sequences if packer == "cumsum" else pack_sequences_bfd
        packed = pack(
            enc,
            text_col="input_ids",
            tokenizer=lambda c: F.col(c),
            budget_tokens=256,
            n_streams=4,
        )
        bins = pack_bins_ids(packed).collect()
        assert bins
        by_doc = {r["doc_id"]: r["input_ids"] for r in enc.collect()}
        n_docs = 0
        for b in bins:
            # concatenation length matches the reported bin token count
            assert len(b["input_ids"]) == b["bin_tokens"]
            assert len(b["doc_starts"]) == len(b["doc_ids"])
            n_docs += len(b["doc_ids"])
            # each document's slice at its start offset is its own ids
            starts = list(b["doc_starts"]) + [len(b["input_ids"])]
            for i, did in enumerate(b["doc_ids"]):
                assert b["input_ids"][starts[i] : starts[i + 1]] == by_doc[did]
        assert n_docs == len(by_doc)  # every doc in exactly one bin
