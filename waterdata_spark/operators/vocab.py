"""Integer token-ID surface: the vocabulary artifact plus id-array
encodings — the last link between a curated corpus and an actually
TRAINABLE release (VERDICT r10 item 1). A training loader consumes
``int32`` token ids plus the vocab file, not symbol strings; this
module maps both tokenizer families (``operators/bpe``,
``operators/unigram_lm``) onto that contract:

- :class:`Vocab` — the piece→id artifact: a deterministic, exactly
  JSON-round-trippable ordered piece list (id == index), special
  tokens at the front (the SentencePiece / GPT-2 ``vocab.json``
  convention — both public formats store exactly this mapping).
- :func:`bpe_vocab` / :func:`unigram_vocab` — build the artifact from
  a trained model. BPE's reachable symbol set is the base alphabet
  (plain and ``</w>``-suffixed) plus one merged symbol per learned
  merge — the model stores merges only, so the alphabet comes from
  :func:`alphabet_of` (one bounded distinct aggregate over the
  corpus). The unigram vocab is the model's own piece set.
- :func:`encode_bpe_ids` / :func:`encode_unigram_ids` — ``array<int>``
  document encodings (Arrow-batched, same greedy-merge / Viterbi cores
  as the symbol encoders, with the piece→id map applied inside the
  same UDF pass — no second scan). Out-of-vocabulary symbols map to
  the ``<unk>`` id, so encoding never fails — or, with a
  ``byte_fallback`` vocab (r12), decompose to their UTF-8 byte pieces
  so encoding is LOSSLESS (``oov_rate ≡ 0`` on any input).
- :func:`decode_ids` — the inverse (ids → pieces → text via the
  family's boundary markers).
- :func:`pack_bins_ids` — the loader-facing bins: one row per packed
  training sequence with the CONCATENATED id array plus per-document
  start offsets (the attention-masking prerequisite
  ``chunking.pack_offsets`` computes at document grain).

Scale shape: vocab construction is driver-side on model-bounded state
(|alphabet| + |merges| or |pieces|); encoders broadcast the id map in
the UDF closure (vocab-bounded — the encode_bpe precedent); the bin
aggregation is bounded per bin by the token budget.

No oracle rows: the encoders ride the tokenizer UDFs (the documented
non-SQL class). Verification is an exact differential — the id arrays
must equal the symbol encoders' output mapped through the vocab,
row for row — plus encode→decode round-trips and rebuild-identical
vocab JSON (tests/test_vocab.py).

Reference parity: no counterpart in the reference engine; X4/X7
extension surface (SURVEY §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterdata_spark.functions.text import tokens
from waterdata_spark.operators.bpe import EOW, BPEModel, decode_symbols, encode_word
from waterdata_spark.operators.chunking import pack_offsets
from waterdata_spark.operators.unigram_lm import (
    WB,
    UnigramModel,
    decode_pieces,
    viterbi_word,
)

__all__ = [
    "UNK",
    "BOS",
    "EOS",
    "BYTE_PIECES",
    "Vocab",
    "alphabet_frame",
    "alphabet_of",
    "bpe_vocab",
    "unigram_vocab",
    "encode_bpe_ids",
    "encode_unigram_ids",
    "decode_ids",
    "token_id_stats",
    "pack_bins_ids",
]

#: the out-of-vocabulary special token (always present, id within the
#: specials block at the front of the piece list)
UNK = "<unk>"
#: conventional sequence-boundary specials — pass them in ``specials``
#: at vocab build time to use ``bos``/``eos`` in the encoders
BOS = "<bos>"
EOS = "<eos>"

#: the 256 byte pieces of byte-fallback mode (r12, VERDICT r11 item 3)
#: — the SentencePiece ``byte_fallback`` / GPT-2 byte-level convention:
#: with these in the vocab, an out-of-vocabulary symbol decomposes to
#: its UTF-8 bytes instead of collapsing to ``<unk>``, so encoding is
#: LOSSLESS (oov_rate ≡ 0) on any input. Layout contract: they sit
#: immediately after the specials block, in byte order, so
#: ``byte b ↦ id n_specials + b``.
BYTE_PIECES = tuple(f"<0x{i:02X}>" for i in range(256))


@dataclass
class Vocab:
    """piece→id artifact: ``pieces[i]`` has id ``i``; the first
    ``n_specials`` entries are special tokens (``<unk>`` required —
    the OOV fallback). Exact JSON round-trip (the geometry-model
    persistence convention); rebuilding from the same model yields the
    identical artifact (deterministic order, test-pinned).

    ``byte_fallback`` (r12): the vocab carries the 256
    :data:`BYTE_PIECES` immediately after the specials (layout
    enforced here — the id assignment is the compatibility contract)
    and the id encoders decompose out-of-vocabulary symbols to their
    UTF-8 bytes instead of ``<unk>``: encoding becomes LOSSLESS on any
    input (``oov_rate ≡ 0``, the SentencePiece ``byte_fallback`` /
    GPT-2 byte-level convention). ``<unk>`` stays declared (ids from a
    non-fallback encoder remain decodable) but is never emitted."""

    pieces: list[str]
    n_specials: int = 1
    byte_fallback: bool = False
    _ids: dict = field(init=False, repr=False, compare=False)

    def __post_init__(self) -> None:
        if len(set(self.pieces)) != len(self.pieces):
            raise ValueError("vocab pieces must be unique")
        if UNK not in self.pieces[: self.n_specials]:
            raise ValueError(f"specials must include {UNK!r}")
        if self.byte_fallback and tuple(
            self.pieces[self.n_specials : self.n_specials + 256]
        ) != BYTE_PIECES:
            raise ValueError(
                "byte_fallback vocab must carry the 256 byte pieces "
                "immediately after the specials block (build with "
                "bpe_vocab/unigram_vocab byte_fallback=True)"
            )
        self._ids = {p: i for i, p in enumerate(self.pieces)}

    def __len__(self) -> int:
        return len(self.pieces)

    @property
    def unk_id(self) -> int:
        return self._ids[UNK]

    @property
    def byte_id_base(self) -> int:
        """Id of ``<0x00>`` — byte ``b`` has id ``byte_id_base + b``
        (the enforced layout). Only meaningful when ``byte_fallback``."""
        return self.n_specials

    def id_of(self, piece: str) -> int:
        """The piece's id, or ``unk_id`` when out-of-vocabulary."""
        return self._ids.get(piece, self._ids[UNK])

    def piece_of(self, i: int) -> str:
        return self.pieces[i]

    def to_json(self) -> str:
        import json

        return json.dumps(
            {
                "pieces": self.pieces,
                "n_specials": self.n_specials,
                "byte_fallback": self.byte_fallback,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Vocab":
        import json

        d = json.loads(s)
        return Vocab(
            pieces=list(d["pieces"]),
            n_specials=int(d["n_specials"]),
            byte_fallback=bool(d.get("byte_fallback", False)),
        )


def alphabet_frame(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Distinct characters across the corpus's whitespace words as a
    one-column frame ``(c)`` — the distributed core of
    :func:`alphabet_of` (exposed separately so the aggregate is
    oracle-checkable: x04's 'alpha' leg)."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return (
        df.select(F.explode(tokens(col)).alias("__w"))
        .select(F.explode(F.split(F.col("__w"), "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
    )


def alphabet_of(df: DataFrame, text_col: str = "text", lowercase: bool = True) -> list[str]:
    """Sorted distinct characters across the corpus's whitespace words
    — the BPE base-symbol alphabet. One distinct aggregate bounded by
    the character set (hundreds to a few thousand rows at any corpus
    size), the only distributed step of vocab construction. Matches
    the training normalization: pass the same ``lowercase`` used for
    :func:`~waterdata_spark.operators.bpe.train_bpe`."""
    return sorted(
        r["c"] for r in alphabet_frame(df, text_col, lowercase).collect()
    )


def bpe_vocab(
    model: BPEModel,
    alphabet: list[str],
    specials: tuple[str, ...] = (UNK,),
    byte_fallback: bool = False,
) -> Vocab:
    """The deterministic BPE piece list: specials, then the base
    characters in sorted order INTERLEAVED with their ``</w>``-suffixed
    forms — ``c0, c0</w>, c1, c1</w>, …`` (every character can end a
    word; ADVICE r11 pinned this layout description to what the code
    has always emitted, since the id assignment is the compatibility
    contract a consumer may reconstruct from this docstring) — then one
    merged symbol per merge in RANK order (the order the model learned
    them — the convention public BPE vocab files use), first occurrence
    kept on the rare duplicate (a merge can re-derive a base symbol).

    ``byte_fallback`` (r12): insert the 256 :data:`BYTE_PIECES` plus
    the bare ``</w>`` piece right after the specials — the bare marker
    lets an out-of-vocabulary WORD-FINAL character decompose to bytes
    WITHOUT losing its word boundary (``'c</w>' → bytes(c), '</w>'``),
    so decode round-trips exactly."""
    pieces: list[str] = list(specials)
    seen = set(pieces)
    if len(seen) != len(pieces):
        raise ValueError("duplicate special tokens")
    if byte_fallback:
        for p in (*BYTE_PIECES, EOW):
            if p in seen:
                raise ValueError(f"byte-fallback piece {p!r} collides with a special")
            seen.add(p)
            pieces.append(p)
    for c in sorted(alphabet):
        for p in (c, c + EOW):
            if p not in seen:
                seen.add(p)
                pieces.append(p)
    for a, b in model.merges:
        p = a + b
        if p not in seen:
            seen.add(p)
            pieces.append(p)
    return Vocab(
        pieces=pieces, n_specials=len(specials), byte_fallback=byte_fallback
    )


def unigram_vocab(
    model: UnigramModel,
    specials: tuple[str, ...] = (UNK,),
    byte_fallback: bool = False,
) -> Vocab:
    """The unigram piece list: specials, then (with ``byte_fallback``)
    the 256 byte pieces, then the model's pieces in lexicographic
    order (the model's own JSON ordering — rebuilds are identical).
    Unigram OOV pieces are single characters (Viterbi's documented
    floor path), so no boundary-marker piece is needed: the ``▁``
    word marker is part of the piece string and byte-decomposes with
    it."""
    pieces = list(specials)
    if byte_fallback:
        for p in BYTE_PIECES:
            if p in pieces or p in model.logp:
                raise ValueError(f"byte piece {p!r} collides with a special/model piece")
        pieces += list(BYTE_PIECES)
    pieces += sorted(model.logp)
    return Vocab(
        pieces=pieces, n_specials=len(specials), byte_fallback=byte_fallback
    )


def _boundary_ids(
    vocab: Vocab, bos: str | None, eos: str | None
) -> tuple[list[int], list[int]]:
    """Resolve bos/eos special-token names to id prefixes/suffixes;
    each must be a declared special (a typo silently encoding as
    ``<unk>`` would corrupt every sequence)."""
    out = []
    for name in (bos, eos):
        if name is None:
            out.append([])
            continue
        if name not in vocab.pieces[: vocab.n_specials]:
            raise ValueError(f"{name!r} is not a declared special token")
        out.append([vocab.id_of(name)])
    return out[0], out[1]


def _encode_ids_udf(word_to_ids, prefix: list[int], suffix: list[int]):
    """Shared Arrow encoder shell: ``word_to_ids(word) -> list[int]``
    runs per DISTINCT word per batch (Zipf → dict hit); ``prefix``/
    ``suffix`` are the bos/eos ids wrapped around each document."""

    # no type hints: stringified annotations defeat pandas-UDF eval-type
    # inference (encode_bpe precedent) — returnType carries the contract
    @F.pandas_udf("array<int>")
    def enc(texts):
        cache: dict = {}

        def one(t):
            if t is None:
                return None
            out: list = list(prefix)
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = word_to_ids(w)
                    cache[w] = got
                out.extend(got)
            out.extend(suffix)
            return out

        return texts.map(one)

    return enc


def encode_bpe_ids(
    df: DataFrame,
    model: BPEModel,
    vocab: Vocab,
    text_col: str = "text",
    out_col: str = "input_ids",
    lowercase: bool = True,
    bos: str | None = None,
    eos: str | None = None,
) -> DataFrame:
    """Adds ``out_col: array<int>`` — the document's BPE token-id
    sequence: the same greedy lowest-rank-first merge core as
    ``encode_bpe``, with the piece→id map applied in the same pass
    (exactly ``[vocab.id_of(s) for s in encode_bpe(...)]``, test-pinned
    as the differential). OOV symbols → ``vocab.unk_id``.

    ``bos``/``eos``: names of DECLARED special tokens (build the vocab
    with ``specials=(UNK, BOS, EOS)``) prepended/appended per document
    — the sequence boundaries a packed training run separates documents
    with; undeclared names raise rather than encode as ``<unk>``.

    With a ``byte_fallback`` vocab (r12), an OOV symbol — always a
    single character, plain or ``</w>``-suffixed, since every merge
    output is in the vocab by construction — decomposes to its UTF-8
    byte pieces (word-final: bytes then the bare ``</w>`` piece, so
    the boundary survives): no ``<unk>`` is ever emitted and
    encode→decode round-trips exactly."""
    ranks = model.ranks
    ids = dict(vocab._ids)
    unk = vocab.unk_id
    prefix, suffix = _boundary_ids(vocab, bos, eos)
    if vocab.byte_fallback:
        base = vocab.byte_id_base
        eow_id = ids.get(EOW)
        if eow_id is None:
            raise ValueError(
                "byte-fallback BPE vocab must carry the bare '</w>' piece "
                "(build it with bpe_vocab(byte_fallback=True))"
            )
        n_eow = len(EOW)

        def word_to_ids(w: str) -> list[int]:
            out: list[int] = []
            for s in encode_word(w, ranks):
                i = ids.get(s)
                if i is not None:
                    out.append(i)
                elif s.endswith(EOW) and len(s) > n_eow:
                    out.extend(base + b for b in s[:-n_eow].encode("utf-8"))
                    out.append(eow_id)
                else:
                    out.extend(base + b for b in s.encode("utf-8"))
            return out
    else:

        def word_to_ids(w: str) -> list[int]:
            return [ids.get(s, unk) for s in encode_word(w, ranks)]

    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return df.withColumn(out_col, _encode_ids_udf(word_to_ids, prefix, suffix)(col))


def encode_unigram_ids(
    df: DataFrame,
    model: UnigramModel,
    vocab: Vocab,
    text_col: str = "text",
    out_col: str = "input_ids",
    lowercase: bool = True,
    bos: str | None = None,
    eos: str | None = None,
) -> DataFrame:
    """Adds ``out_col: array<int>`` — the Viterbi piece-id sequence
    (== ``encode_unigram`` mapped through the vocab, test-pinned).
    OOV pieces → ``vocab.unk_id``, or their UTF-8 byte pieces with a
    ``byte_fallback`` vocab (r12 — OOV Viterbi pieces are single
    characters by the floor-path contract, the ``▁`` marker included,
    so byte decomposition loses nothing and round-trips exactly).
    ``bos``/``eos`` as in :func:`encode_bpe_ids`."""
    logp, max_len = model.logp, model.max_piece_len
    ids = dict(vocab._ids)
    unk = vocab.unk_id
    prefix, suffix = _boundary_ids(vocab, bos, eos)
    if vocab.byte_fallback:
        base = vocab.byte_id_base

        def word_to_ids(w: str) -> list[int]:
            out: list[int] = []
            for s in viterbi_word(WB + w, logp, max_len):
                i = ids.get(s)
                if i is not None:
                    out.append(i)
                else:
                    out.extend(base + b for b in s.encode("utf-8"))
            return out
    else:

        def word_to_ids(w: str) -> list[int]:
            return [ids.get(s, unk) for s in viterbi_word(WB + w, logp, max_len)]

    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return df.withColumn(out_col, _encode_ids_udf(word_to_ids, prefix, suffix)(col))


def decode_ids(
    ids: list[int],
    vocab: Vocab,
    family: str = "bpe",
    skip_specials: bool = False,
) -> str:
    """Inverse of the id encoders for one sequence: ids → pieces →
    text via the family's word-boundary convention (``</w>`` for
    ``'bpe'``, ``▁`` for ``'unigram'``). An ``unk_id`` decodes to the
    literal ``<unk>`` string — lossy by construction, exactly like the
    public tokenizers. ``skip_specials`` drops boundary specials
    (bos/eos etc.) but NEVER ``<unk>`` — lost content stays visible.

    With a ``byte_fallback`` vocab (r12), maximal runs of byte-piece
    ids refold to their UTF-8 string first (``errors='replace'`` — the
    engine's encoders only emit whole-character byte runs, so the
    replacement char can only appear for hand-built id sequences), so
    encode→decode round-trips exactly with no ``<unk>`` loss."""
    if skip_specials:
        unk = vocab.unk_id
        ids = [i for i in ids if i >= vocab.n_specials or i == unk]
    if vocab.byte_fallback:
        base = vocab.byte_id_base
        pieces: list[str] = []
        buf = bytearray()
        for i in ids:
            if base <= i < base + 256:
                buf.append(i - base)
                continue
            if buf:
                pieces.append(buf.decode("utf-8", errors="replace"))
                buf = bytearray()
            pieces.append(vocab.piece_of(i))
        if buf:
            pieces.append(buf.decode("utf-8", errors="replace"))
    else:
        pieces = [vocab.piece_of(i) for i in ids]
    if family == "bpe":
        return decode_symbols(pieces)
    if family == "unigram":
        return decode_pieces(pieces)
    raise ValueError(f"unknown family {family!r}")


def token_id_stats(
    df: DataFrame,
    vocab: Vocab,
    ids_col: str = "input_ids",
    text_col: str | None = None,
    by: str | None = None,
) -> DataFrame:
    """Tokenizer-coverage datasheet over an encoded corpus: ONE
    aggregate over the id arrays (pure JVM — the ids already exist, no
    re-tokenize) returning ``n_docs, n_tokens, n_unk, oov_rate`` plus,
    when ``text_col`` is given, ``n_bytes`` and ``tokens_per_100_bytes``
    (tokenizer "fertility" — the compression a budget planner needs).
    ``by`` adds a grouping column (per-language/per-source grain —
    output bounded by group cardinality). A rising ``oov_rate`` is the
    operational signal that the shipped vocab no longer covers the
    corpus (new script/domain) and the tokenizer needs retraining.

    With a ``byte_fallback`` vocab (r12) ``oov_rate`` is zero by
    construction, so the datasheet adds ``n_byte_tokens`` /
    ``byte_rate`` — ids in the byte-piece block. That is the SAME
    retrain signal in fallback form: unknown characters now cost
    multiple byte tokens instead of one ``<unk>``, so a rising
    byte_rate means the vocab is spending sequence length spelling out
    content it has no pieces for."""
    unk = vocab.unk_id
    toks = F.size(F.col(ids_col)).cast("long")
    unks = F.size(
        F.filter(F.col(ids_col), lambda x: x == F.lit(unk))
    ).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
        F.sum(unks).alias("n_unk"),
    ]
    if vocab.byte_fallback:
        base = vocab.byte_id_base
        bytes_ = F.size(
            F.filter(
                F.col(ids_col),
                lambda x: (x >= F.lit(base)) & (x < F.lit(base + 256)),
            )
        ).cast("long")
        aggs.append(F.sum(bytes_).alias("n_byte_tokens"))
    if text_col is not None:
        aggs.append(
            F.sum(F.coalesce(F.octet_length(F.col(text_col)), F.lit(0))).alias(
                "n_bytes"
            )
        )
    grouped = df.groupBy(by) if by else df.groupBy()
    out = grouped.agg(*aggs).withColumn(
        "oov_rate",
        F.when(F.col("n_tokens") > 0, F.col("n_unk") / F.col("n_tokens")).otherwise(
            F.lit(0.0)
        ),
    )
    if vocab.byte_fallback:
        out = out.withColumn(
            "byte_rate",
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_byte_tokens") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
        )
    if text_col is not None:
        out = out.withColumn(
            "tokens_per_100_bytes",
            F.when(
                F.col("n_bytes") > 0, F.col("n_tokens") * 100.0 / F.col("n_bytes")
            ).otherwise(F.lit(0.0)),
        )
    return out


def pack_bins_ids(
    packed: DataFrame, id_col: str = "doc_id", ids_col: str = "input_ids"
) -> DataFrame:
    """The loader-facing training sequences: one row per bin —
    ``stream_id, bin_id, bin_tokens``, the bin's CONCATENATED
    ``ids_col`` (documents in placement order), ``doc_starts`` (each
    document's start-token offset inside the concatenation — the
    per-document attention-mask / position-reset boundaries), and
    ``doc_ids`` (provenance, same order).

    ``packed`` must be the output of ``pack_sequences`` /
    ``pack_sequences_bfd`` run ON THE ID ARRAYS — i.e. with
    ``text_col=ids_col, tokenizer=lambda c: F.col(c)`` — so that
    ``n_tokens == size(ids)`` and the offsets align with the
    concatenation (``size(input_ids) == bin_tokens`` per output row;
    test-pinned). One grouped collect over the bin grain, bounded per
    bin by the token budget."""
    with_off = pack_offsets(packed, id_col)
    docs = F.array_sort(
        F.collect_list(
            F.struct(
                "offset",
                F.col(id_col).alias("doc_id"),
                "n_tokens",
                F.col(ids_col).alias("ids"),
            )
        )
    )
    return (
        with_off.groupBy("stream_id", "bin_id")
        .agg(F.first("bin_tokens").alias("bin_tokens"), docs.alias("__docs"))
        .select(
            "stream_id",
            "bin_id",
            "bin_tokens",
            F.flatten(F.transform("__docs", lambda s: s["ids"])).alias(ids_col),
            F.transform("__docs", lambda s: s["offset"]).alias("doc_starts"),
            F.transform("__docs", lambda s: s["doc_id"]).alias("doc_ids"),
        )
    )
