"""Cache-lifetime registry: deterministic release of operator-internal
persisted frames in long-lived driver JVMs.

The problem (measured, round 4): an operator that materializes an
internal frame (`persist`/`localCheckpoint`) and returns a lazy result
leaves its storage blocks pinned in the block manager after the result
is consumed. Nothing unpins them until the DRIVER garbage-collects the
plan object AND the ContextCleaner runs — by default a 30-minute
periodic GC. In any process that runs many queries in one JVM (the
correctness gate, bench, a notebook), those orphans stack up, evict
useful storage, and force later shuffles to spill: q06 at sf10 measured
12.6s with six stale IVF checkpoints resident vs 5.2s clean — a 2.4×
distortion with zero plan difference.

The fix is generation semantics, not heuristics:

- an operator that persists an internal frame registers it under a
  stable site key (e.g. ``"similarity.ivf_indexed"``). Registering a
  NEW frame under the same key releases the previous generation —
  so back-to-back invocations (bench repeats, index rebuilds) never
  hold more than one live generation per site;
- every registered query (`queries.query` decorator) drains the whole
  registry at entry — by the time the next query starts, the previous
  query's internals are provably dead weight.

Only RECOMPUTABLE frames (``persist``, lineage intact) belong here:
releasing one merely means a stale result DataFrame, if ever re-used,
recomputes from source. Never register a ``localCheckpoint`` — its
lineage is truncated, so releasing it would make prior results raise.
Iterative operators release their intermediate checkpoints inline
instead (each round's eager checkpoint roots the next — see
``dedup_approx.min_id_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}


def register(key: str, df: DataFrame) -> DataFrame:
    """Track a persisted, RECOMPUTABLE frame; releases the previous
    generation registered under the same key. Returns ``df``."""
    prev = _LIVE.get(key)
    if prev is not None:
        _safe_unpersist(prev)
    _LIVE[key] = df
    return df


def release_all() -> None:
    """Release every live registration (query-boundary drain)."""
    for df in _LIVE.values():
        _safe_unpersist(df)
    _LIVE.clear()


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session already stopped — nothing to release
