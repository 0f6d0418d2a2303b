"""Dataset snapshot diff — corpus-versioning audit.

Between two releases of a corpus (or any keyed table), report per key
whether the row was added, removed, changed, or carried unchanged —
the audit a data-release pipeline runs before publishing snapshot N+1
(what changed since N, and was it what the pipeline intended?), and
the input to incremental consumers that only want the delta.

Scale shape: each side reduces to ``(key, digest)`` BEFORE the join —
the digest is one md5 over the compared columns, so wide rows (10-100
KB document text) never ride the shuffle; the full-outer join then
moves two fixed-width columns per row. Comparison is digest equality
(collision probability ~n²/2^128 — the repo-wide exact-dedup
convention, operators/dedup.content_digest), with null-safe encoding:
a NULL cell and the string 'null' digest differently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dataset_diff"]

# unit-separator + a non-printing null sentinel: concat_ws drops nulls,
# so each cell is coalesced to a marker no real cast produces
_SEP = "\x1f"
_NULL = "\x00\x00"


def _digest(cols: list[str]) -> Column:
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    status_col: str = "status",
) -> DataFrame:
    """Diff two snapshots keyed by ``id_col``.

    Output: ``id_col, status, old_digest, new_digest`` where status is
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both, compared columns differ), or ``unchanged``
    (both, identical — emitted only with ``include_unchanged=True``;
    the delta is the useful artifact, and at corpus scale the
    unchanged set is the overwhelming bulk).

    ``compare_cols`` defaults to every non-key column the two frames
    share (sorted by name — deterministic). Keys must be unique per
    snapshot (the snapshot contract); duplicate keys make the diff
    multiplicative like any join, they are not detected here.
    """
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - {id_col}
        )
    if not compare_cols:
        raise ValueError("no columns to compare (compare_cols resolved empty)")
    missing = [
        c
        for c in compare_cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"compare_cols absent from a side: {missing}")

    o = old.select(F.col(id_col), _digest(compare_cols).alias("old_digest"))
    n = new.select(F.col(id_col), _digest(compare_cols).alias("new_digest"))
    j = o.join(n, id_col, "full")
    status = (
        F.when(F.col("old_digest").isNull(), "added")
        .when(F.col("new_digest").isNull(), "removed")
        .when(F.col("old_digest") == F.col("new_digest"), "unchanged")
        .otherwise("changed")
    )
    out = j.select(id_col, status.alias(status_col), "old_digest", "new_digest")
    if not include_unchanged:
        out = out.filter(F.col(status_col) != "unchanged")
    return out
