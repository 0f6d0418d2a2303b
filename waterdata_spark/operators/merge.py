"""Incremental table maintenance: SCD-1 upsert and CDC changelog apply.

The reference's pipelines rebuild their product from scratch each run
(down.py end-to-end); at 100 TB a rebuild is not an option — the table
is maintained incrementally from a change feed. Plain-parquet Spark has
no MERGE INTO, but the semantics compose from DataFrame ops exactly:

- ``merge_upsert``: one full-outer join on the keys decides
  matched/unmatched; per-column ``when`` picks the surviving value.
  One shuffle of each side (none for the big side if the target is
  bucketed on the keys — sources/bucketed.py), broadcast for small
  change sets: the classic copy-on-write merge.
- ``apply_changes``: a keyed changelog (op ∈ insert/update/delete with
  a monotonic sequence) collapses to its latest op per key via one
  map-side-combinable ``max_by`` aggregation, then merges. Applying
  the same changelog twice is a no-op (idempotent), so a replayed
  micro-batch cannot corrupt the table — the property that makes the
  operator safe as a ``foreachBatch`` sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    delete_col: str | None = None,
    null_safe_keys: bool = True,
    assert_unique: bool = False,
) -> DataFrame:
    """SCD-1 MERGE: rows of ``source`` update matching ``target`` rows
    (source value wins for ``update_cols`` — default: every non-key
    column both sides share), unmatched source rows insert, and rows
    whose ``delete_col`` flag is true delete their match instead.

    ``source`` must be unique on ``keys`` (collapse a changelog first —
    :func:`apply_changes`). With ``assert_unique=True`` a duplicate
    source key raises ``ValueError`` up front (one groupBy-count over
    the source — cheap next to the full-outer join; Delta's MERGE
    raises on multiple source matches for the same reason). With the
    default False the duplicate silently fans out the matched target
    row — direct callers who can't prove uniqueness should opt in.

    ``null_safe_keys``: by default a NULL key matches its NULL twin
    (``<=>``). Pass False when keys are guaranteed non-null (the normal
    warehouse fact case): plain equality lets a target bucketed on the
    keys (sources/bucketed.py) join with NO target-side Exchange, so
    repeated merges never re-shuffle the big table (plan-pinned in
    tests/test_merge.py).
    """
    # every shared non-key column rides the source projection — INSERTS
    # always take source values; update_cols only governs MATCHED rows
    # (None → all shared; an EXPLICIT [] means never modify matched rows
    # and must not fall through to the default)
    if assert_unique:
        dup = (
            source.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .select(*keys)
            .limit(5)
            .collect()
        )
        if dup:
            raise ValueError(
                f"merge_upsert: source is not unique on keys {keys}; "
                f"first duplicate key rows: {[r.asDict() for r in dup]}"
            )
    shared = [
        c for c in source.columns if c in target.columns and c not in keys and c != delete_col
    ]
    if update_cols is None:
        update_cols = shared
    s = source
    if delete_col is None:
        s = s.withColumn("__del", F.lit(False))
    else:
        flag = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        s = (
            s.withColumn("__del_norm", flag)
            .drop(delete_col)
            .withColumnRenamed("__del_norm", "__del")
        )
    s = s.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in shared],
        F.lit(True).alias("__in_s"),
        "__del",
    )
    t = target.withColumn("__in_t", F.lit(True))
    cond = [
        t[k].eqNullSafe(s[f"__k_{k}"]) if null_safe_keys else t[k] == s[f"__k_{k}"]
        for k in keys
    ]
    joined = t.join(s, cond, "full_outer")
    # presence markers, NOT key-null tests: eqNullSafe admits NULL key
    # values, so a present row can still have a NULL key column
    in_s = F.col("__in_s").isNotNull()
    in_t = F.col("__in_t").isNotNull()
    out_cols = []
    for c in target.columns:
        if c in keys:
            # key survives from whichever side has it (insert path has
            # only the source key)
            out_cols.append(F.when(in_t, t[c]).otherwise(F.col(f"__k_{c}")).alias(c))
        elif c in shared:
            upd = F.col(f"__s_{c}") if c in update_cols else t[c]
            out_cols.append(
                F.when(in_t & in_s, upd)  # matched: update_cols rule
                .when(~in_t, F.col(f"__s_{c}"))  # insert: source value
                .otherwise(t[c])  # target-only row
                .alias(c)
            )
        else:
            out_cols.append(t[c])
    # keep: matched-not-deleted updates, untouched target rows, and
    # true inserts; drop deletes and deletes of never-existed keys
    keep = (in_t & ~(in_s & F.col("__del"))) | (~in_t & in_s & ~F.col("__del"))
    return joined.filter(keep).select(*out_cols)


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a CDC changelog: per key, the change with the highest
    ``(seq)`` wins (ties broken by preferring delete — a delete and an
    upsert at the same sequence is a malformed feed; the conservative
    read drops the row — then by the payload struct itself, largest
    wins, so duplicate same-seq upserts collapse DETERMINISTICALLY:
    ``max_by`` alone picks an arbitrary survivor among full-rank ties,
    which made the result depend on partitioning — caught by the
    hypothesis dict-model differential). ``op_col`` values:
    ``'insert'``/``'update'`` (both upsert — CDC feeds rarely
    distinguish reliably) or ``'delete'``. Payload columns must be
    orderable types (atomic/struct/array; not map) — true of CDC row
    feeds.

    The collapse is ONE aggregation: ``max_by(struct(all cols), (seq,
    is_delete, payload...))`` per key — map-side combinable, shuffle
    volume bounded by live keys per map task, never by changelog
    length. The merge then proceeds as :func:`merge_upsert`.
    """
    payload_cols = [c for c in changes.columns if c not in (op_col, seq_col)]
    value_cols = [c for c in payload_cols if c not in keys]
    is_del = (F.col(op_col) == "delete").cast("int")
    latest = (
        changes.groupBy(*[F.col(k) for k in keys])
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in value_cols], is_del.alias("__del")),
                F.struct(
                    F.col(seq_col).alias("s"),
                    is_del.alias("d"),
                    *[F.col(c).alias(f"p{i}") for i, c in enumerate(value_cols)],
                ),
            ).alias("__w")
        )
        .select(*keys, "__w.*")
    )
    return merge_upsert(target, latest, keys, delete_col="__del")
