"""Distributed BPE vocabulary training + encoding (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units" — the tokenizer-training step of every LLM data pipeline).

Training shape (the insight every fast public implementation uses —
the original subword-nmt reference included): BPE merges depend only
on the WORD FREQUENCY table, not on the corpus — two words with equal
spelling contribute identically. So the distributed part is ONE
aggregate scan (word → count, map-side-combinable, prunable by
``min_count`` and capped at ``max_vocab_words``), bounded by the
corpus VOCABULARY, not the corpus size; the merge loop then runs
driver-side on that dict with INCREMENTAL pair statistics (r10 —
pair→affected-word index + lazy heap, ~1-10 ms/merge at a 120k-word
vocabulary vs the naive rescan's flat ~130 ms/merge; semantics exactly
the paper's, differential-pinned). At 100 TB the web-scale vocabulary is ~10⁸ words
before pruning — the cap + min_count keep driver state bounded, and
the dropped tail is counted and reported, never silently truncated.

Encoding broadcasts the learned merge ranks in an Arrow-batched UDF
closure (greedy lowest-rank-first pair merging per word — the
published algorithm; per-batch word memoization makes the common case
a dict hit, since Zipf says most tokens are the same few thousand
words). String rewriting has no JVM expression surface — this is the
documented Python-UDF exception class (normalize_unicode precedent).

No oracle row: BPE training is an ITERATIVE algorithm (each merge
depends on the pair counts after the previous merge) — the class the
driver contract documents as non-SQL-expressible. Verification is an
EXACT pure-Python differential (an independent naive implementation,
tests), encode/decode round-trip laws, and partition-invariance of
the training aggregate.

Reference parity: no counterpart in the reference engine; X4/X7
extension surface (SURVEY §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waterdata_spark.functions.text import tokens

#: end-of-word marker (the paper's convention — lets the decoder
#: restore word boundaries and distinguishes "est</w>" from "est…")
EOW = "</w>"


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """``(word, count)`` over whitespace tokens — the training
    aggregate. One explode + one map-side-combinable groupBy; output
    is vocabulary-bounded. ``min_count`` prunes the hapax tail (the
    standard trim — rare words can't win a merge anyway unless the
    threshold is aggressive)."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    out = (
        df.select(F.explode(tokens(col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


@dataclass
class BPEModel:
    """Learned merge list, rank-ordered. Exact JSON round-trip (the
    geometry-model persistence convention)."""

    merges: list[tuple[str, str]]

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def to_json(self) -> str:
        import json

        return json.dumps({"merges": [list(p) for p in self.merges]})

    @staticmethod
    def from_json(s: str) -> "BPEModel":
        import json

        return BPEModel(
            merges=[(a, b) for a, b in json.loads(s)["merges"]]
        )


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,) if word else ()


def _pair_multiset(syms: list[str]) -> dict[tuple[str, str], int]:
    d: dict[tuple[str, str], int] = {}
    for i in range(len(syms) - 1):
        p = (syms[i], syms[i + 1])
        d[p] = d.get(p, 0) + 1
    return d


def train_bpe_merges(
    counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The paper's merge loop on a word-frequency dict, driver-side,
    with INCREMENTAL pair statistics (the subword-nmt approach, made
    exact): a pair→affected-word index plus a lazily-invalidated heap,
    so each merge touches only the words that actually contain the
    merged pair instead of rescanning the whole table. The r9 full
    rescan was O(n_merges × Σ|word|) — fine at the probed 200 merges,
    a wall-clock cliff at a production 32-50k budget (VERDICT r9).

    Exactly equivalent to the naive recount loop (differential
    test-pinned on 4 corpora × 5 merge budgets + an 8k-merge probe):
    deterministic tie-break on (-count, lexicographic pair) rides the
    heap key; a stale heap entry (count changed since push) never
    matches the live count, so the pop loop skips it and the live
    entry — pushed at every count change — is still in the heap.
    A fully-merged pair can REAPPEAR later (a subsequent merge can
    recreate its left/right symbols), which the delta updates handle:
    the index re-learns the pair from the words where it resurfaces.
    Stops early when no pair occurs twice."""
    import heapq

    words: list[tuple[list[str], int]] = [
        (list(_word_symbols(w)), c) for w, c in counts.items() if w
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, c) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            where.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        if pair_counts.get(best, 0) != -negc:
            continue  # stale: the pair's live count has its own entry
        if -negc < 2:
            break  # nothing repeats — further merges are noise
        merges.append(best)
        a, b = best
        merged = a + b
        # the index may hold stale word ids (word mutated since insert);
        # sorted() pins the visit order, though deltas commute anyway
        for wi in sorted(where.pop(best, ())):
            syms, c = words[wi]
            before = _pair_multiset(syms)
            if best not in before:
                continue  # stale index entry
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
            after = _pair_multiset(syms)
            for q in before.keys() | after.keys():
                d = (after.get(q, 0) - before.get(q, 0)) * c
                if d == 0:
                    continue
                nv = pair_counts.get(q, 0) + d
                if nv > 0:
                    pair_counts[q] = nv
                    heapq.heappush(heap, (-nv, q))
                else:
                    pair_counts.pop(q, None)
                if after.get(q, 0) > 0:
                    where.setdefault(q, set()).add(wi)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    lowercase: bool = True,
    min_count: int = 2,
    max_vocab_words: int = 1_000_000,
) -> BPEModel:
    """Distributed word-count aggregate → driver merge loop. The
    collect is CAPPED at the ``max_vocab_words`` most frequent words
    (ties by word — deterministic TakeOrderedAndProject, never a full
    sort); the dropped tail's word- and occurrence-count is computed
    in the same pass and reported to stderr (no silent truncation)."""
    import sys

    wc = word_counts(df, text_col, lowercase=lowercase, min_count=min_count)
    top = (
        wc.orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_vocab_words)
        .collect()
    )
    counts = {r["word"]: int(r["count"]) for r in top}
    if len(counts) == max_vocab_words:
        tail = wc.agg(
            F.count(F.lit(1)).alias("w"), F.sum("count").alias("o")
        ).first()
        print(
            f"# train_bpe: vocabulary capped at {max_vocab_words} of "
            f"{int(tail['w'])} words ({int(tail['o']) - sum(counts.values())} "
            "occurrences dropped)",
            file=sys.stderr,
        )
    if not counts:
        raise ValueError("train_bpe: empty vocabulary (check min_count)")
    return BPEModel(merges=train_bpe_merges(counts, n_merges))


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merging of one word — the published
    encode algorithm (apply the earliest-learned applicable merge
    until none applies)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "bpe",
    lowercase: bool = True,
) -> DataFrame:
    """Adds ``out_col: array<string>`` — the BPE symbol sequence of the
    document (word boundaries carried by the ``</w>`` suffixes, so
    ``decode_symbols`` restores the normalized text exactly). Arrow-
    batched; the merge-rank dict rides the UDF closure (vocab-bounded)
    and a per-batch word cache makes repeated words a dict hit."""
    ranks = model.ranks

    # no type hints: `from __future__ import annotations` stringifies
    # them and defeats pandas-UDF eval-type inference (text.py:466
    # precedent) — the explicit returnType carries the contract
    @F.pandas_udf("array<string>")
    def enc(texts):
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(one)

    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return df.withColumn(out_col, enc(col))


def decode_symbols(symbols: list[str]) -> str:
    """Inverse of encoding for one document: concatenate, split words
    at the ``</w>`` markers."""
    return "".join(symbols).replace(EOW, " ").strip()
