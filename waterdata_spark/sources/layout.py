"""Sort-clustered parquet layout for data skipping (SURVEY.md §4
physical design; the companion to sources/bucketed.py).

Bucketing co-locates equi-JOIN keys; sort-clustering serves RANGE
predicates: ``write_sorted`` range-partitions the frame on the sort
key (each output file covers a DISJOINT key range) and sorts within
partitions (row groups inside each file cover nested sub-ranges).
Parquet footers then carry min/max statistics at both granularities,
and any engine's scan — Spark's parquet filter pushdown included —
skips whole files and row groups whose range cannot match a
predicate. At 100 TB this is the difference between scanning the
corpus and scanning the slice a date-bounded query touches: pruning
effectiveness is a property of the LAYOUT, paid once at write time.

``skipping_stats`` reads the footers back (pyarrow) and reports, for
a given predicate range, how many files/row groups a stats-respecting
scan must touch — the measurable pruning contract
(tools/layout_probe.py commits the numbers; tests pin disjointness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_sorted", "skipping_stats"]


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist range-clustered parquet: ``repartitionByRange`` over the
    sort key (disjoint per-file ranges via sampled boundaries) then
    ``sortWithinPartitions`` (ordered row groups inside each file).
    One shuffle at write time; every later range-filtered scan prunes.

    ``n_files`` trades pruning granularity against file count — at
    cluster scale set it so files land near the 128-256 MB scan-task
    sweet spot."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def skipping_stats(path: str, column: str, lo, hi) -> dict:
    """Footer-level pruning audit for ``column BETWEEN lo AND hi``:
    counts the files and row groups whose [min, max] intersects the
    predicate — exactly the set a statistics-respecting reader scans.
    Driver-side footer reads only (no data pages touched)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    n_rg = n_rg_hit = n_files_hit = 0
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        f_hit = False
        f_min = f_max = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            n_rg += 1
            if st is None or not st.has_min_max:
                # no stats recorded → a correct reader must scan it
                n_rg_hit += 1
                f_hit = True
                continue
            f_min = st.min if f_min is None else min(f_min, st.min)
            f_max = st.max if f_max is None else max(f_max, st.max)
            if not (st.max < lo or st.min > hi):
                n_rg_hit += 1
                f_hit = True
        n_files_hit += bool(f_hit)
        ranges.append((f_min, f_max))
    return {
        "n_files": len(files),
        "n_files_scanned": n_files_hit,
        "n_row_groups": n_rg,
        "n_row_groups_scanned": n_rg_hit,
        "file_ranges": ranges,
    }
