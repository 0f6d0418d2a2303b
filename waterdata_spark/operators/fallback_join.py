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

"Matched" is configurable: the reference decides by a payload
sentinel (ZIP_CODE non-null/non-empty, down/down_water_prep.py:
511-512; MAIL_ZIP notnull, direct/direct_water_prep.py:149-150), not
by join success — a dim row with a null zip falls through to the next
tier. ``match_when`` reproduces that; default is plain join success.

Physical shape at scale: each tier's dim is small after dedup →
broadcast-hash join (no fact shuffle at any tier); the unmatched
remainder shrinks monotonically, so tier N+1 scans strictly fewer
rows. The fact table is never shuffled and never collected.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup import priority_dedup

_TIER_COL = "__fallback_tier"


def fallback_join(
    fact: DataFrame,
    dim: DataFrame,
    tiers: list[list[str]],
    payload: list[str],
    dedup_order: list[Column | str] | list[list[Column | str]] | None = None,
    keep_unmatched: bool = True,
    tier_col: str | None = None,
    broadcast_dim: bool = True,
    match_when: Callable[[], Column] | None = None,
    final_tier_left: bool = False,
) -> DataFrame:
    """Join ``fact`` to ``dim`` with tiered key fallback.

    Args:
        fact: the large table; every column is preserved.
        dim: the enrichment table.
        tiers: key column lists, strongest first, e.g.
            ``[["PWSID","SYSTEM NAME","Sample Location"],
               ["PWSID","SYSTEM NAME"], ["PWSID"]]``
            (the down-join tiers, down/down_water_prep.py:498-501).
            Key columns must exist in both sides with those names.
        payload: dim columns to carry onto the fact (must not collide
            with fact columns).
        dedup_order: ordering that picks the winning dim row per tier
            key (C22) — either one ordering for all tiers or one per
            tier (the reference sorts tier-1/2 by 'Sample Location'
            desc but tier-3 by 'SYSTEM NAME' desc). Defaults to the
            payload columns descending.
        keep_unmatched: True = C19 (left semantics, unmatched rows
            kept with NULL payload); False = C20's final drop
            (direct/direct_water_prep.py:165).
        tier_col: if set, add an int column recording which tier
            matched (NULL = unmatched).
        match_when: optional zero-arg callable returning the Column
            predicate that decides "this row found its enrichment"
            (evaluated on the joined frame). Default: tier indicator
            non-null (join success).
        final_tier_left: True reproduces the down-join's last stratum
            (down/down_water_prep.py:528-532): the final tier is a
            plain left join appended WITHOUT a match split, so rows
            whose dim match fails ``match_when`` still keep that
            tier's payload.
    """
    if dedup_order is None:
        dedup_order = [F.col(c).desc_nulls_last() for c in payload]
    per_tier_order: list[list[Column | str]]
    if dedup_order and isinstance(dedup_order[0], list):
        per_tier_order = dedup_order  # type: ignore[assignment]
        if len(per_tier_order) != len(tiers):
            raise ValueError("per-tier dedup_order must have one entry per tier")
    else:
        per_tier_order = [list(dedup_order)] * len(tiers)  # type: ignore[arg-type]

    fact_cols = fact.columns
    strata: list[DataFrame] = []
    remaining = fact

    for tier_idx, (keys, order) in enumerate(zip(tiers, per_tier_order), start=1):
        # dedup on the FULL dim (the winner ordering may reference columns
        # that are not carried as payload), then project keys+payload
        dim_tier = (
            priority_dedup(dim, keys, list(order))
            .select(*keys, *payload)
            .withColumn(_TIER_COL, F.lit(tier_idx))
        )
        if broadcast_dim:
            dim_tier = F.broadcast(dim_tier)

        joined = remaining.join(dim_tier, on=keys, how="left")
        if final_tier_left and tier_idx == len(tiers):
            strata.append(joined)
            remaining = remaining.limit(0)
            break
        matched_pred = match_when() if match_when else F.col(_TIER_COL).isNotNull()
        matched = joined.filter(matched_pred)
        strata.append(matched)
        # Unmatched rows continue to the next tier with payload pruned
        # (the reference prunes carried columns between tiers,
        # down/down_water_prep.py:515,525) — equivalent to a left-anti
        # join against the tier dim.
        remaining = joined.filter(~matched_pred | matched_pred.isNull()).select(*fact_cols)

    out_cols = fact_cols + payload + [_TIER_COL]
    result = strata[0].select(*out_cols)
    for s in strata[1:]:
        result = result.unionByName(s.select(*out_cols))

    if keep_unmatched:
        tail = remaining
        for c in payload:
            tail = tail.withColumn(c, F.lit(None))
        tail = tail.withColumn(_TIER_COL, F.lit(None).cast("int"))
        result = result.unionByName(tail.select(*out_cols))

    if tier_col:
        result = result.withColumnRenamed(_TIER_COL, tier_col)
    else:
        result = result.drop(_TIER_COL)
    return result
