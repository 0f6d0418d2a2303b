"""Physical-plan introspection (SURVEY.md §4).

The reference has no optimizer; every rewrite is hand-applied. In the
engine, Catalyst owns the physical plan — but "let Catalyst do it"
only counts if the plan that comes out is the one you'd want. These
helpers make plan properties testable: filter pushdown reached the
scan, the dim side broadcast, no accidental extra Exchange, the fact
scanned exactly once. `tests/test_plans.py` pins them for the
flagship queries so a regression that silently de-optimizes a plan
(e.g. a cast that blocks pushdown) fails CI instead of shipping a
10× slower operator.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    text: str
    n_scans: int
    n_exchanges: int
    n_broadcast_joins: int
    n_sort_merge_joins: int
    pushed_filters: list[str]
    read_schemas: list[str]
    codegen_ids: int

    def scans_of(self, table: str) -> int:
        """Number of scan nodes over a parquet path containing `table`."""
        return len(re.findall(rf"Location.*{re.escape(table)}", self.text))


def plan_summary(df: DataFrame) -> PlanSummary:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    return PlanSummary(
        text=text,
        n_scans=len(re.findall(r"\(\d+\) Scan parquet", text)),
        n_exchanges=len(re.findall(r"\(\d+\) Exchange", text)),
        n_broadcast_joins=len(re.findall(r"\(\d+\) BroadcastHashJoin", text)),
        n_sort_merge_joins=len(re.findall(r"\(\d+\) SortMergeJoin", text)),
        pushed_filters=re.findall(r"PushedFilters: \[(.*?)\]", text),
        read_schemas=re.findall(r"ReadSchema: (.*)", text),
        codegen_ids=len(set(re.findall(r"codegen id : (\d+)", text))),
    )


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    min_broadcast_joins: int | None = None,
    max_sort_merge_joins: int | None = None,
    max_scans_of: dict[str, int] | None = None,
    require_pushed: list[str] | None = None,
) -> PlanSummary:
    """Raise AssertionError when the optimized physical plan violates
    the declared expectations. Use in tests to pin plan shape."""
    s = plan_summary(df)
    if max_exchanges is not None:
        assert s.n_exchanges <= max_exchanges, f"{s.n_exchanges} exchanges > {max_exchanges}\n{s.text}"
    if min_broadcast_joins is not None:
        assert s.n_broadcast_joins >= min_broadcast_joins, (
            f"{s.n_broadcast_joins} broadcast joins < {min_broadcast_joins}\n{s.text}"
        )
    if max_sort_merge_joins is not None:
        assert s.n_sort_merge_joins <= max_sort_merge_joins, (
            f"{s.n_sort_merge_joins} sort-merge joins > {max_sort_merge_joins}\n{s.text}"
        )
    for table, n in (max_scans_of or {}).items():
        got = s.scans_of(table)
        assert got <= n, f"{table} scanned {got}× > {n}\n{s.text}"
    for frag in require_pushed or []:
        assert any(frag in p for p in s.pushed_filters), (
            f"no pushed filter containing {frag!r}; pushed = {s.pushed_filters}"
        )
    return s
