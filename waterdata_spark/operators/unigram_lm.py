"""Distributed unigram-LM tokenizer training + encoding (Kudo 2018,
"Subword Regularization", arXiv:1804.10959 — the SentencePiece unigram
model, the other published tokenizer family next to BPE). Together
with `operators/bpe` this covers both subword algorithms every public
LLM pipeline chooses between.

Training shape (the same factoring the BPE module uses): the unigram
model's EM statistics depend only on the WORD-FREQUENCY table — two
equal words contribute identical expected counts. So:

- the **seed vocabulary** is one distributed aggregate over the word
  table: every substring of every word up to ``max_piece_len``,
  weighted by word frequency, top-``seed_size`` by weight (plus ALL
  single characters, which are never pruned — they guarantee every
  word keeps a segmentation);
- each **EM iteration** is one Arrow-batched scan of the word table
  (forward-backward over each word's segmentation lattice, piece
  log-probs in the UDF closure) emitting per-piece expected counts,
  rounded once to ``round_dp`` and summed as DECIMAL — the shuffle is
  piece-bounded and order-independent, so fits are bit-identical on
  any partitioning (the engine-wide decimal_round recipe);
- the **M-step and pruning** run driver-side on the ≤|seed| collected
  rows (the k·dim bounded-driver-state contract). Pruning keeps the
  highest-expected-count pieces (single chars floored), shrinking by
  ``prune_frac`` per round toward ``vocab_size`` — the standard
  frequency-based simplification of Kudo §3.2's likelihood-loss prune
  (documented deviation: the paper recomputes each piece's removal
  loss; public reimplementations commonly use the expected-count
  ranking, and the retained-vocab difference is in the low-signal
  tail).

Encoding is Viterbi segmentation per word (max total log-prob; ties
break to the fewest pieces, then to the latest split). The shipped
model's piece log-probs are rounded to fixed decimal precision at
build time, so GIVEN THE SAME MODEL JSON encodings reproduce on any
IEEE-754 platform; the fit itself is same-platform deterministic
(libm exp/log may differ across platforms). Arrow-batched with per-batch word
memoization — the documented Python-UDF exception class (string DP
has no JVM surface; encode_bpe precedent). Words are prefixed with
the SentencePiece ``▁`` word-boundary marker, so decoding is exact.

No oracle row: EM is iterative (the driver contract's documented
non-SQL class). Verification: independent pure-Python differential
(tests), encode∘decode == normalized text, partition-invariant fits.

Reference parity: no counterpart in the reference engine; X4/X7
extension surface (SURVEY §2.9).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterdata_spark.operators.bpe import word_counts

#: SentencePiece word-boundary marker (U+2581 LOWER ONE QUARTER BLOCK)
WB = "▁"


@dataclass
class UnigramModel:
    """piece -> natural-log probability. Exact JSON round-trip (the
    geometry-model persistence convention)."""

    logp: dict
    max_piece_len: int = 8

    def to_json(self) -> str:
        import json

        return json.dumps(
            {
                "logp": {p: float(v) for p, v in sorted(self.logp.items())},
                "max_piece_len": self.max_piece_len,
            }
        )

    @staticmethod
    def from_json(s: str) -> "UnigramModel":
        import json

        d = json.loads(s)
        return UnigramModel(
            logp={p: float(v) for p, v in d["logp"].items()},
            max_piece_len=int(d["max_piece_len"]),
        )


def seed_pieces(
    wc: DataFrame, max_piece_len: int = 6, seed_size: int = 20_000
) -> DataFrame:
    """``(piece, weight)`` seed candidates: every substring (length ≤
    ``max_piece_len``) of every ``▁``-prefixed word, weighted by word
    frequency — one explode (fan-out ≤ len·max_piece_len per word,
    word-table-bounded) + one map-side-combinable groupBy + a
    deterministic top-``seed_size`` (TakeOrderedAndProject; ties by
    piece). Single characters are added by the trainer regardless of
    rank, so the cut only shapes the multi-char candidate pool."""
    w = F.concat(F.lit(WB), F.col("word"))
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda l: F.substring(w, i, l),
            ),
        )
    )
    return (
        wc.select(F.explode(subs).alias("piece"), F.col("count"))
        .groupBy("piece")
        .agg(F.sum("count").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("piece").asc())
        .limit(seed_size)
    )


def forward_backward_word(
    word: str, logp: dict, max_len: int
) -> tuple[dict, float]:
    """Expected piece counts + log-likelihood of one ``▁``-prefixed
    word under the current model — the textbook lattice forward-
    backward. Returns ({piece: expected_count}, loglik)."""
    L = len(word)
    NEG = float("-inf")

    def lse(a: float, b: float) -> float:
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = a if a > b else b
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    alpha = [NEG] * (L + 1)
    alpha[0] = 0.0
    for i in range(1, L + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alpha[j] != NEG:
                alpha[i] = lse(alpha[i], alpha[j] + lp)
    beta = [NEG] * (L + 1)
    beta[L] = 0.0
    for j in range(L - 1, -1, -1):
        for i in range(j + 1, min(L, j + max_len) + 1):
            lp = logp.get(word[j:i])
            if lp is not None and beta[i] != NEG:
                beta[j] = lse(beta[j], lp + beta[i])
    ll = alpha[L]
    ec: dict = {}
    if ll == NEG:
        return ec, ll
    for j in range(L):
        if alpha[j] == NEG:
            continue
        for i in range(j + 1, min(L, j + max_len) + 1):
            p = word[j:i]
            lp = logp.get(p)
            if lp is not None and beta[i] != NEG:
                ec[p] = ec.get(p, 0.0) + math.exp(alpha[j] + lp + beta[i] - ll)
    return ec, ll


def _expected_counts(
    wc: DataFrame, logp: dict, max_len: int, round_dp: int
) -> list:
    """One distributed E-step: Arrow-batched forward-backward over the
    word table, per-piece expected counts rounded once and summed as
    DECIMAL (order-independent), collected as ≤|vocab| rows."""
    scale = 10**round_dp

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            # per-WORD half-up rounding to a scaled int, exact integer
            # accumulation within the batch: any batching/partitioning
            # yields the same global sums (rounding per batch total
            # would make the fit depend on batch composition)
            acc: dict = {}
            for word, cnt in zip(pdf["word"], pdf["count"]):
                ec, _ = forward_backward_word(WB + word, logp, max_len)
                for p, e in ec.items():
                    v = e * int(cnt) * scale
                    acc[p] = acc.get(p, 0) + int(math.floor(v + 0.5))
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "ec9": list(acc.values())}
            )

    rows = (
        wc.mapInPandas(gen, "piece string, ec9 long")
        .groupBy("piece")
        .agg(F.sum(F.col("ec9").cast("decimal(38,0)")).alias("c9"))
        .collect()
    )
    return [
        {"piece": r["piece"], "c": float(r["c9"]) / scale} for r in rows
    ]


def _piece_removal_loss(
    p: str, logp: dict, max_len: int
) -> float:
    """Kudo 2018 §3.2 removal loss of piece ``p`` under the current
    model, SentencePiece-style: the expected count of ``p`` times the
    log-prob drop to ``p``'s best ALTERNATIVE segmentation (the Viterbi
    split of ``p``'s own string using every piece but ``p``; unknown
    single chars score at the model floor). Pure driver math,
    O(len·max_len) per piece — no per-piece dict copies."""
    floor = min(logp.values()) - 1.0 if logp else -1.0
    L = len(p)
    best: list = [None] * (L + 1)
    best[0] = 0.0
    for i in range(1, L + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            s = p[j:i]
            if s == p:
                continue  # the whole-piece "segmentation" is p itself
            lp = logp.get(s)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor
            cand = best[j] + lp
            if best[i] is None or cand > best[i]:
                best[i] = cand
    alt = best[L]  # always reachable through single characters
    return math.exp(logp[p]) * (logp[p] - alt)


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4000,
    seed_size: int | None = None,
    max_piece_len: int = 6,
    em_iters_per_round: int = 2,
    prune_frac: float = 0.25,
    lowercase: bool = True,
    min_count: int = 2,
    max_vocab_words: int = 1_000_000,
    round_dp: int = 9,
    prune_mode: str = "count",
) -> UnigramModel:
    """Seed → (EM ×``em_iters_per_round`` → prune) until the vocabulary
    fits ``vocab_size`` → one final EM round. Deterministic end to end:
    hashless seed with lexicographic tie-breaks, decimal E-step sums,
    driver-side M-step on exact inputs — refits are bit-identical on
    any partitioning (test-pinned).

    ``prune_mode`` selects the per-round ranking of multi-char pieces
    (r10, VERDICT r9 item 8): ``'count'`` (default, unchanged) keeps
    the highest expected-count pieces — the common public
    simplification; ``'loss'`` keeps the pieces whose REMOVAL costs
    the corpus likelihood most (Kudo 2018 §3.2 semantics: expected
    count × log-prob drop to the piece's best alternative
    segmentation, :func:`_piece_removal_loss`) — a frequent piece
    whose string re-segments almost as well without it is now pruned
    first. Both rankings are driver-side on the same EM output; the
    distributed plan is identical."""
    import sys

    if prune_mode not in ("count", "loss"):
        raise ValueError(f"prune_mode must be 'count' or 'loss', got {prune_mode!r}")
    if seed_size is None:
        seed_size = 4 * vocab_size
    wc = word_counts(df, text_col, lowercase=lowercase, min_count=min_count)
    top = (
        wc.orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_vocab_words)
    )
    from waterdata_spark.plans import cachereg

    top = cachereg.register("unigram.word_counts", top.persist())
    n_words = top.count()
    if n_words == 0:
        raise ValueError("train_unigram: empty vocabulary (check min_count)")
    if n_words == max_vocab_words:
        print(
            f"# train_unigram: word table capped at {max_vocab_words}",
            file=sys.stderr,
        )

    seed = seed_pieces(top, max_piece_len, seed_size).collect()
    weights = {r["piece"]: float(r["weight"]) for r in seed}
    # coverage floor: every single character of every ▁-prefixed word
    chars = {
        r["c"]
        for r in top.select(
            F.explode(
                F.split(F.concat(F.lit(WB), F.col("word")), "")
            ).alias("c")
        )
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    }
    for ch in chars:
        weights.setdefault(ch, 1.0)
    total = sum(weights.values())
    logp = {p: math.log(w / total) for p, w in weights.items()}

    def em_round(logp: dict) -> dict:
        rows = _expected_counts(top, logp, max_piece_len, round_dp)
        cs = {r["piece"]: float(r["c"]) for r in rows if float(r["c"]) > 0.0}
        for ch in chars:  # a char can have ~0 expectation; keep it alive
            cs.setdefault(ch, 1e-12)
        tot = sum(cs.values())
        return {p: math.log(c / tot) for p, c in cs.items()}

    while True:
        for _ in range(em_iters_per_round):
            logp = em_round(logp)
        multi = [p for p in logp if len(p) > 1]
        n_now = len(logp)
        if n_now <= vocab_size or not multi:
            # `not multi`: the single-char floor alone exceeds
            # vocab_size — can't shrink further without losing coverage
            break
        keep_multi = max(
            vocab_size - (n_now - len(multi)),
            int(len(multi) * (1.0 - prune_frac)),
        )
        if keep_multi >= len(multi):
            keep_multi = max(0, vocab_size - (n_now - len(multi)))
        if prune_mode == "loss":
            kept = sorted(
                multi,
                key=lambda p: (-_piece_removal_loss(p, logp, max_piece_len), p),
            )[:keep_multi]
        elif prune_mode == "count":
            kept = sorted(multi, key=lambda p: (-logp[p], p))[:keep_multi]
        else:
            raise ValueError(f"prune_mode must be 'count' or 'loss', got {prune_mode!r}")
        logp = {
            p: lp for p, lp in logp.items() if len(p) == 1 or p in set(kept)
        }
        # renormalize after the cut (M-step of the survivors)
        tot = sum(math.exp(v) for v in sorted(logp.values()))
        logp = {p: v - math.log(tot) for p, v in logp.items()}
    # Pin the shipped log-probs to fixed decimal precision (the
    # decimal_round recipe): Viterbi's tie-epsilon then compares sums of
    # identical float64 values, so ENCODING is deterministic on any
    # IEEE-754 platform given the same model JSON. The FIT itself is
    # same-platform deterministic (libm exp/log may differ across
    # platforms). ADVICE r9.
    logp = {p: round(v, 9) for p, v in logp.items()}
    return UnigramModel(logp=logp, max_piece_len=max_piece_len)


def viterbi_word(word: str, logp: dict, max_len: int) -> list[str]:
    """Max-log-prob segmentation of one ``▁``-prefixed word. Ties break
    to the FEWEST pieces, then to the shortest final piece (largest
    split point) — pinned for cross-run determinism. Characters absent
    from the vocabulary pass through as single-char pieces (scored at
    the model's floor), so encoding never fails."""
    L = len(word)
    floor = min(logp.values()) - 1.0 if logp else -1.0
    # best[i] = (score, n_pieces, split_j)
    best: list = [None] * (L + 1)
    best[0] = (0.0, 0, -1)
    for i in range(1, L + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            p = word[j:i]
            lp = logp.get(p)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor  # single unknown char
            cand = (best[j][0] + lp, best[j][1] + 1, j)
            if (
                best[i] is None
                or cand[0] > best[i][0] + 1e-12
                or (
                    abs(cand[0] - best[i][0]) <= 1e-12
                    and (cand[1], -cand[2]) < (best[i][1], -best[i][2])
                )
            ):
                best[i] = cand
    out: list[str] = []
    i = L
    while i > 0:
        j = best[i][2]
        out.append(word[j:i])
        i = j
    return out[::-1]


def encode_unigram(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
    out_col: str = "pieces",
    lowercase: bool = True,
) -> DataFrame:
    """Adds ``out_col: array<string>`` — the Viterbi piece sequence of
    the document (word boundaries carried by the ``▁`` prefixes, so
    :func:`decode_pieces` restores the normalized text exactly).
    Arrow-batched; log-probs ride the closure (vocab-bounded) with a
    per-batch word cache (Zipf → dict hit)."""
    logp, max_len = model.logp, model.max_piece_len

    # no type hints: stringified annotations defeat pandas-UDF eval-type
    # inference (encode_bpe precedent) — returnType carries the contract
    @F.pandas_udf("array<string>")
    def enc(texts):
        cache: dict = {}

        def one(t):
            if t is None:
                return None
            out: list = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = viterbi_word(WB + w, logp, max_len)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(one)

    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return df.withColumn(out_col, enc(col))


def decode_pieces(pieces: list[str]) -> str:
    """Inverse of encoding for one document: concatenate, words split
    at the ``▁`` markers."""
    return "".join(pieces).replace(WB, " ").strip()
