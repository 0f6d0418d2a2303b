"""Dump `.explain("formatted")` for every declared query (r12 deliverable).

Writes plans/<round>/<query>_<tag>.txt for each entry in QUERIES plus the
two bench-path variants (x08 production xx-hash path, x07 IVF serve path).
Planning only — no job executes (except the x07 index build, which the
serve plan needs; it is bounded and runs at the chosen SF).

Usage: python tools/plan_dump.py [sf_dir] [tag] [query ...]
  sf_dir  default /root/testdata/sf0.1
  tag     default 'before' (use 'after' post-change)
  query   optional subset; default = all declared + bench variants
  round dir: $SPARK_GRAFT_PLAN_ROUND (default 'r13')
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waterdata_spark.queries import QUERIES  # noqa: E402
from waterdata_spark.session import get_spark  # noqa: E402


def _explain_str(df) -> str:
    # public API (ADVICE r12: the private PythonSQLUtils route breaks
    # under Spark Connect and across PySpark upgrades); behavior is
    # identical — explain() prints the formatted plan to stdout.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _bench_variants(spark, sf_dir):
    """The two headline paths whose bench form differs from the
    declared oracle form (see bench.py)."""
    import bench

    ivf = bench._IvfServing()
    return {
        "x08_minhash_bands_benchpath": lambda: bench._minhash_bench(spark, sf_dir),
        "x07_ivf_serve_benchpath": lambda: ivf(spark, sf_dir),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")

    jobs: dict[str, object] = {
        name: (lambda fn=spec.fn: fn(spark, sf_dir)) for name, spec in QUERIES.items()
    }
    jobs.update(_bench_variants(spark, sf_dir))
    unknown = only - jobs.keys()
    if unknown:  # ADVICE r12: a typo'd filter must not silently no-op
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    for name, make in jobs.items():
        if only and name not in only:
            continue
        try:
            plan = _explain_str(make())
        except Exception as e:  # pragma: no cover - diagnostic tool
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
