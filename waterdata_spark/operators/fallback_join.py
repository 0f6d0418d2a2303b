"""Hierarchical fallback join — the reference's signature composite
operator (SURVEY.md C19/C20).

Semantics (down/down_water_prep.py:428-546): enrich a fact table from
a dimension by trying progressively weaker key sets. Rows that match
on the tier-1 keys take tier-1's payload; still-unmatched rows retry
on tier-2 keys; and so on. Each tier's dim is first reduced to one
row per tier-key (priority dedup, C22) so the join can never fan out;
the output has exactly one row per input fact row (C43's row-count
law), or only matched rows when ``keep_unmatched=False`` (C20,
direct/direct_water_prep.py:134-166).

Physical shape at scale: each tier's dim is small after dedup →
broadcast-hash join (no fact shuffle at any tier); the unmatched
remainder shrinks monotonically, so tier N+1 scans strictly fewer
rows. The fact table is never shuffled and never collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup import priority_dedup

_TIER_COL = "__fallback_tier"
_MATCH_COL = "__fallback_matched"


def fallback_join(
    fact: DataFrame,
    dim: DataFrame,
    tiers: list[list[str]],
    payload: list[str],
    dedup_order: list[Column | str] | None = None,
    keep_unmatched: bool = True,
    tier_col: str | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join ``fact`` to ``dim`` with tiered key fallback.

    Args:
        fact: the large table; every column is preserved.
        dim: the enrichment table.
        tiers: key column lists, strongest first, e.g.
            ``[["PWSID","SYSTEM NAME","SITE ID"], ["PWSID","SYSTEM NAME"], ["PWSID"]]``.
            Key columns must exist in both sides with those names.
        payload: dim columns to carry onto the fact (must not collide
            with fact columns).
        dedup_order: ordering that picks the winning dim row per tier
            key (C22). Defaults to the payload columns descending —
            callers wanting oracle-exact determinism should pass a
            total order.
        keep_unmatched: True = C19 (left semantics, unmatched rows kept
            with NULL payload); False = C20's final drop of unmatched
            (direct/direct_water_prep.py:165).
        tier_col: if set, add an int column recording which tier
            matched (NULL = unmatched).
    """
    if dedup_order is None:
        dedup_order = [F.col(c).desc_nulls_last() for c in payload]

    fact_cols = fact.columns
    strata: list[DataFrame] = []
    remaining = fact

    for tier_idx, keys in enumerate(tiers, start=1):
        dim_tier = priority_dedup(
            dim.select(*keys, *payload), keys, list(dedup_order)
        ).withColumn(_MATCH_COL, F.lit(tier_idx))
        if broadcast_dim:
            dim_tier = F.broadcast(dim_tier)

        joined = remaining.join(dim_tier, on=keys, how="left")
        matched = joined.filter(F.col(_MATCH_COL).isNotNull())
        strata.append(matched)
        # Unmatched rows continue to the next tier with payload pruned
        # (the reference prunes carried columns between tiers,
        # down/down_water_prep.py:515,525) — here equivalent to a
        # left-anti join against the tier dim.
        remaining = joined.filter(F.col(_MATCH_COL).isNull()).select(*fact_cols)

    out_cols = fact_cols + payload + [_MATCH_COL]
    result = strata[0].select(*out_cols)
    for s in strata[1:]:
        result = result.unionByName(s.select(*out_cols))

    if keep_unmatched:
        tail = remaining
        for c in payload:
            tail = tail.withColumn(c, F.lit(None))
        tail = tail.withColumn(_MATCH_COL, F.lit(None).cast("int"))
        result = result.unionByName(tail.select(*out_cols))

    if tier_col:
        result = result.withColumnRenamed(_MATCH_COL, tier_col)
    else:
        result = result.drop(_MATCH_COL)
    return result
