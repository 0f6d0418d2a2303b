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
tier. ``match_col``/``match_pred`` reproduce that; default is plain
join success.

Physical strategies:

- ``single_pass`` (default): ONE chain of broadcast left joins — the
  fact is scanned exactly once and each tier's dim-dedup window runs
  exactly once; per-row tier selection is a CASE over the tier
  indicators. This is the scale-correct plan: the iterative
  translation of the reference (split matched/unmatched, rejoin the
  remainder) re-scans the fact T+1 times and recomputes every prior
  stratum — visible as 3× fact scans and 6 duplicated window subtrees
  in `.explain` before this rewrite.
- ``iterative``: the literal reference recipe, kept for differential
  testing (both strategies must agree row-for-row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from waterdata_spark.operators.dedup import priority_dedup

_TIER_COL = "__fallback_tier"


def _normalize_orders(
    dedup_order, tiers, payload
) -> list[list[Column | str]]:
    if dedup_order is None:
        dedup_order = [F.col(c).desc_nulls_last() for c in payload]
    if dedup_order and isinstance(dedup_order[0], list):
        if len(dedup_order) != len(tiers):
            raise ValueError("per-tier dedup_order must have one entry per tier")
        return dedup_order
    return [list(dedup_order)] * len(tiers)


def fallback_join(
    fact: DataFrame,
    dim: DataFrame,
    tiers: list[list[str]],
    payload: list[str],
    dedup_order: list[Column | str] | list[list[Column | str]] | None = None,
    keep_unmatched: bool = True,
    tier_col: str | None = None,
    broadcast_dim: bool = True,
    match_col: str | None = None,
    match_pred: Callable[[Column], Column] | None = None,
    final_tier_left: bool = False,
    strategy: str = "single_pass",
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
            key (C22) — one ordering for all tiers or one per tier
            (the reference sorts tier-1/2 by 'Sample Location' desc
            but tier-3 by 'SYSTEM NAME' desc). Defaults to payload
            columns descending.
        keep_unmatched: True = C19 (left semantics, unmatched rows
            kept with NULL payload); False = C20's final drop
            (direct/direct_water_prep.py:165).
        tier_col: if set, add an int column recording which tier
            matched (NULL = unmatched).
        match_col: payload column whose state decides "this row found
            its enrichment" (ZIP_CODE / MAIL_ZIP in the reference).
            None → join success decides.
        match_pred: predicate applied to the tier's ``match_col``
            value (default ``isNotNull``).
        final_tier_left: True reproduces the down-join's last stratum
            (down/down_water_prep.py:528-532): rows failing
            ``match_pred`` at the final tier still keep that tier's
            payload.
        strategy: 'single_pass' (default) or 'iterative' (see module
            docstring).
    """
    per_tier_order = _normalize_orders(dedup_order, tiers, payload)
    if match_col is not None and match_col not in payload:
        raise ValueError("match_col must be a payload column")
    pred = match_pred or (lambda c: c.isNotNull())

    if strategy == "single_pass":
        return _single_pass(
            fact, dim, tiers, payload, per_tier_order, keep_unmatched,
            tier_col, broadcast_dim, match_col, pred, final_tier_left,
        )
    if strategy == "iterative":
        return _iterative(
            fact, dim, tiers, payload, per_tier_order, keep_unmatched,
            tier_col, broadcast_dim, match_col, pred, final_tier_left,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def _tier_dim(dim, keys, payload, order, broadcast_dim):
    d = priority_dedup(dim, keys, list(order)).select(*keys, *payload)
    return F.broadcast(d) if broadcast_dim else d


def _single_pass(
    fact, dim, tiers, payload, per_tier_order, keep_unmatched,
    tier_col, broadcast_dim, match_col, pred, final_tier_left,
):
    n = len(tiers)
    joined = fact
    for i, (keys, order) in enumerate(zip(tiers, per_tier_order), start=1):
        d = _tier_dim(dim, keys, payload, order, broadcast_dim)
        renamed = d.select(
            *keys, *[F.col(c).alias(f"__t{i}_{c}") for c in payload]
        ).withColumn(f"__ind{i}", F.lit(i))
        if broadcast_dim:
            renamed = F.broadcast(renamed)
        joined = joined.join(renamed, on=keys, how="left")

    def tier_matched(i: int) -> Column:
        ok = F.col(f"__ind{i}").isNotNull()
        if match_col is not None:
            ok = ok & pred(F.col(f"__t{i}_{match_col}"))
        return ok

    winner = F.lit(None).cast("int")
    for i in range(n, 0, -1):
        winner = F.when(tier_matched(i), F.lit(i)).otherwise(winner)

    out_payload = []
    for c in payload:
        expr = F.lit(None)
        for i in range(n, 0, -1):
            expr = F.when(winner == i, F.col(f"__t{i}_{c}")).otherwise(expr)
        if final_tier_left:
            # unmatched rows keep the FINAL tier's (possibly failing)
            # payload, like the reference's last plain left join
            expr = F.when(winner.isNotNull(), expr).otherwise(F.col(f"__t{n}_{c}"))
        out_payload.append(expr.alias(c))

    tier_expr = winner
    if final_tier_left:
        tier_expr = F.when(winner.isNotNull(), winner).otherwise(
            F.when(F.col(f"__ind{n}").isNotNull(), F.lit(n)).otherwise(F.lit(None).cast("int"))
        )

    out = joined.select(*fact.columns, *out_payload, tier_expr.alias(_TIER_COL))
    if not keep_unmatched and not final_tier_left:
        out = out.filter(F.col(_TIER_COL).isNotNull())
    if tier_col:
        out = out.withColumnRenamed(_TIER_COL, tier_col)
    else:
        out = out.drop(_TIER_COL)
    return out


def _iterative(
    fact, dim, tiers, payload, per_tier_order, keep_unmatched,
    tier_col, broadcast_dim, match_col, pred, final_tier_left,
):
    fact_cols = fact.columns
    strata: list[DataFrame] = []
    remaining = fact

    for tier_idx, (keys, order) in enumerate(zip(tiers, per_tier_order), start=1):
        dim_tier = _tier_dim(dim, keys, payload, order, broadcast_dim).withColumn(
            _TIER_COL, F.lit(tier_idx)
        )
        joined = remaining.join(dim_tier, on=keys, how="left")
        if final_tier_left and tier_idx == len(tiers):
            strata.append(joined)
            remaining = remaining.limit(0)
            break
        matched_pred = F.col(_TIER_COL).isNotNull()
        if match_col is not None:
            matched_pred = matched_pred & pred(F.col(match_col))
        strata.append(joined.filter(matched_pred))
        remaining = joined.filter(~F.coalesce(matched_pred, F.lit(False))).select(*fact_cols)

    out_cols = fact_cols + payload + [_TIER_COL]
    result = strata[0].select(*out_cols)
    for s in strata[1:]:
        result = result.unionByName(s.select(*out_cols))

    if keep_unmatched and not final_tier_left:
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
