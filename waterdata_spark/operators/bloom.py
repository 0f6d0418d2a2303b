"""Broadcast Bloom filter (Bloom 1970) — the membership gate for
shard-vs-stored-corpus checks at 100 TB.

The regime: the stored corpus's digest set is billions of rows — far
past any broadcast threshold — so an exact anti-join must shuffle the
ENTIRE incoming shard. A Bloom filter compresses set membership into
``n_bits`` bits (independent of member count; only the false-positive
rate depends on the load): rows whose bits miss are DEFINITELY not in
the stored set and skip the join entirely; only true members plus the
fp-rate sliver pay the exact check. No false negatives, ever — the
gate is exactness-preserving by construction (test-pinned against the
ungated path).

Division of labor with ``operators/sketches``: the count-min ROW form
is the engine-reproducible spelling (oracle-backed, mergeable by SQL,
carries counts); this BIT form is the serving spelling — 64x denser
(1 bit vs a counter row), built by one ``bit_or`` aggregate, shipped
as bytes, checked in one Arrow pass. Same md5 position hashes, so
both are deterministic everywhere. Mergeable by bytes-OR (same
(n_bits, k, seed)) — per-shard filters union without rescans, the
sketches-module contract.

Scale shape: build = one narrow projection (k positions per row) into
one map-side-combinable ``bit_or`` groupBy bounded by ``n_bits/64``
rows, collected as ≤ n_bits/8 bytes (capped at 2^28 bits = 32 MB of
bit state — the ``_MAX_BITS`` driver-safety ceiling); check =
positions computed JVM-side (the md5
chain), then a vectorized numpy bit-gather per Arrow batch (the
documented no-JVM-surface UDF exception: Spark expressions cannot
index an 8 MB bit literal).

Parameter guide (standard Bloom math): fp ≈ (1 - e^(-k·n/m))^k; for
n members choose m = 8n bits, k = 4 → fp ≈ 2.4%; m = 16n, k = 6 →
0.2%.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "bloom_build", "bloom_merge", "with_bloom_contains"]

# The build collects one (word-index, bits) row per SET 64-bit word —
# up to n_bits/64 rows. 2^28 bits = 32 MB of bit state and ≤4M
# collected rows (~hundreds of MB of transient driver Rows): the safe
# ceiling. Beyond that the filter itself stops being broadcast-shaped.
_MAX_BITS = 1 << 28


def _positions(col: Column, k: int, n_bits: int, seed: str) -> list[Column]:
    """k independent md5 positions (the sketches.py portable-hash
    convention: first 60 bits of md5('{seed}:{j}:' || value))."""
    out = []
    for j in range(k):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:{j}:"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        out.append(F.pmod(h, F.lit(n_bits)))
    return out


class BloomFilter:
    """An immutable built filter: the bit array + its parameters.
    ``to_bytes``/``from_bytes`` round-trip exactly (persist next to the
    corpus snapshot it summarizes; OR per-shard filters together with
    :func:`bloom_merge`)."""

    def __init__(self, bits: np.ndarray, n_bits: int, k: int, seed: str):
        assert bits.dtype == np.uint64
        self.bits = bits
        self.n_bits = n_bits
        self.k = k
        self.seed = seed

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @staticmethod
    def from_bytes(raw: bytes, n_bits: int, k: int, seed: str) -> "BloomFilter":
        bits = np.frombuffer(raw, dtype=np.uint64).copy()
        if len(bits) != (n_bits + 63) // 64:
            raise ValueError("byte length does not match n_bits")
        return BloomFilter(bits, n_bits, k, seed)

    @property
    def fill_fraction(self) -> float:
        """Fraction of set bits — the observed load (fp ≈ fill^k)."""
        ones = int(np.unpackbits(self.bits.view(np.uint8)).sum())
        return ones / self.n_bits


def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int = 1 << 23,
    k: int = 4,
    seed: str = "bloom",
) -> BloomFilter:
    """Build the filter over ``df[col]`` (nulls ignored). One narrow
    k-position explode into one map-side-combinable ``bit_or``
    aggregate over word indexes (≤ ``n_bits/64`` rows regardless of
    corpus size), collected bounded."""
    if not 0 < n_bits <= _MAX_BITS:
        raise ValueError(f"need 0 < n_bits <= {_MAX_BITS}, got {n_bits}")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    c = F.col(col)
    pos = F.explode(F.array(*_positions(c, k, n_bits, seed))).alias("__p")
    words = (
        df.filter(c.isNotNull())
        .select(pos)
        .select(
            F.expr("__p div 64").alias("__w"),
            # shiftleft on a LONG one (the layout.py lesson: an int-typed
            # one wraps at bit 31); F.shiftleft takes only literal
            # counts, so spell it in SQL
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
        .collect()
    )
    bits = np.zeros((n_bits + 63) // 64, dtype=np.uint64)
    for r in words:
        bits[int(r["__w"])] = np.uint64(r["__bits"] & 0xFFFFFFFFFFFFFFFF)
    return BloomFilter(bits, n_bits, k, seed)


def bloom_merge(*filters: BloomFilter) -> BloomFilter:
    """OR together filters built with the same (n_bits, k, seed) —
    bit-identical to building once over the unioned inputs (the
    incremental per-shard maintenance path)."""
    if not filters:
        raise ValueError("need at least one filter")
    first = filters[0]
    bits = first.bits.copy()
    for f in filters[1:]:
        if (f.n_bits, f.k, f.seed) != (first.n_bits, first.k, first.seed):
            raise ValueError("filters disagree on (n_bits, k, seed)")
        bits |= f.bits
    return BloomFilter(bits, first.n_bits, first.k, first.seed)


def with_bloom_contains(
    df: DataFrame,
    col: str,
    bloom: BloomFilter,
    out_col: str = "might_contain",
) -> DataFrame:
    """Adds boolean ``out_col``: False ⟹ value DEFINITELY not in the
    filtered set; True ⟹ possibly present (rate = fill^k). NULL values
    flag False. Positions are computed JVM-side (whole-stage codegen);
    the Arrow UDF only gathers bits — one vectorized numpy pass per
    batch, no Python-level hashing."""
    from pyspark.sql.pandas.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(bloom.bits)

    @pandas_udf("boolean")
    def _check(positions):
        import pandas as pd

        bits = bc.value
        if len(positions) == 0:
            return pd.Series([], dtype="boolean")
        flat = np.vstack(positions.values).astype(np.int64)  # rows x k
        words = bits[flat >> 6]
        mask = np.uint64(1) << (flat & 63).astype(np.uint64)
        hit = (words & mask) != 0
        return pd.Series(hit.all(axis=1))

    c = F.col(col)
    # null inputs hash to null positions; coalesce them to 0 so the UDF
    # sees clean ints on every row — the outer when() pins the answer
    # to False regardless (ArrowEvalPython evaluates the UDF for all
    # rows before the projection applies the when)
    pos_arr = F.array(
        *[F.coalesce(p, F.lit(0)) for p in _positions(c, bloom.k, bloom.n_bits, bloom.seed)]
    )
    return df.withColumn(
        out_col,
        F.when(c.isNull(), F.lit(False)).otherwise(_check(pos_arr)),
    )
