"""Driver-side scale probe for the INCREMENTAL BPE merge loop
(`operators/bpe.train_bpe_merges`, r10 — VERDICT r9 items 2/"What's
missing #1").

The r9 trainer recounted every pair over the whole word table per
merge: O(n_merges × Σ|word|) — 0.62s at the probed n_merges=200 but a
wall-clock cliff (hours-to-days) at a production 32-50k-merge budget.
The r10 trainer keeps a pair→affected-word index plus a lazily-
invalidated heap, so each merge touches only the words containing the
merged pair (subword-nmt's own approach, made exact — the naive twin
differential stays the contract).

Questions answered here, on a deterministic Zipf-ish ≥100k-word
synthetic vocabulary (morphology = root+suffix so merges stay
meaningful deep into the budget):

1. Does total merge-loop time grow ~LINEARLY in n_merges (per-merge
   cost roughly flat across 1k→16k), not ∝ merges × vocab?
2. What is the measured speedup vs the naive recount twin at a budget
   where the naive is still runnable (512 merges)?

No Spark involved — the merge loop is driver-side by design (the
distributed part is the word_counts aggregate, probed separately in
bpe_scale_probe.py).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waterdata_spark.operators.bpe import train_bpe_merges  # noqa: E402


def synth_vocab(n_words: int, seed: int = 7) -> dict[str, int]:
    """Deterministic Zipf-ish vocabulary with root+suffix morphology:
    ~n_words distinct words, counts ~ 1/rank — the shape a web-scale
    word_counts collect actually has."""
    rng = random.Random(seed)
    syllables = [
        c + v
        for c in "bcdfghjklmnpqrstvwz"
        for v in "aeiou"
    ]
    suffixes = ["", "s", "ed", "ing", "er", "est", "ly", "tion"]
    # over-generate roots, dedupe order-preserving, take every root×suffix
    # combo shuffled — guarantees exactly n_words without rejection loops
    roots = list(dict.fromkeys(
        "".join(rng.choice(syllables) for _ in range(rng.randint(1, 3)))
        for _ in range(n_words // len(suffixes) + n_words // 4)
    ))
    combos = [r + s for r in roots for s in suffixes]
    if len(combos) < n_words:
        raise ValueError(f"only {len(combos)} combos for {n_words} words")
    rng.shuffle(combos)
    return {
        w: max(1, int(2_000_000 / (i + 1)))
        for i, w in enumerate(combos[:n_words])
    }


def naive_merges(counts: dict[str, int], n: int) -> list:
    """The r9 full-rescan loop, kept here as the timing baseline (the
    exact differential twin lives in tests/test_shaping.py)."""
    from waterdata_spark.operators.bpe import _word_symbols

    words = [(list(_word_symbols(w)), c) for w, c in counts.items() if w]
    merges: list = []
    for _ in range(n):
        pc: dict = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def main() -> None:
    n_words = int(os.environ.get("BPE_MERGE_PROBE_WORDS", "120000"))
    vocab = synth_vocab(n_words)
    print(f"# vocab: {len(vocab)} words, {sum(len(w) for w in vocab)} chars")

    out: dict = {"n_words": len(vocab), "incremental": {}, "naive": {}}

    # 1) incremental trainer across merge-budget decades
    for budget in (1024, 2048, 4096, 8192, 16384):
        t0 = time.time()
        m = train_bpe_merges(vocab, budget)
        dt = time.time() - t0
        out["incremental"][budget] = {
            "sec": round(dt, 3),
            "merges_done": len(m),
            "us_per_merge": round(1e6 * dt / max(len(m), 1), 1),
        }
        print(f"# incremental n={budget}: {dt:.3f}s, {len(m)} merges, "
              f"{1e6 * dt / max(len(m), 1):.1f} us/merge")

    # 2) naive baseline where it is still runnable + exactness spot-check
    for budget in (128, 512):
        t0 = time.time()
        nm = naive_merges(vocab, budget)
        dt = time.time() - t0
        out["naive"][budget] = {
            "sec": round(dt, 3),
            "us_per_merge": round(1e6 * dt / max(len(nm), 1), 1),
        }
        t0 = time.time()
        im = train_bpe_merges(vocab, budget)
        idt = time.time() - t0
        assert im == nm, f"differential mismatch at n={budget}"
        out["naive"][budget]["incremental_sec"] = round(idt, 3)
        out["naive"][budget]["speedup"] = round(dt / max(idt, 1e-9), 1)
        print(f"# naive n={budget}: {dt:.3f}s vs incremental {idt:.3f}s "
              f"({dt / max(idt, 1e-9):.1f}x), exact match ok")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
