"""Dump `.explain("formatted")` for bench queries to plans/r13/.

Usage: python tools/plan_dump.py [suffix] [query ...]
  suffix: "before" or "after" (default "before")
  query:  subset of BENCH_QUERIES (default: all)

Writes plans/r13/<query>_<suffix>.txt. Plans are built lazily (no
execution), so this is cheap; queries whose builder itself runs Spark
jobs (iterative algorithms that loop in the driver) still execute
those jobs to produce the final plan — run on an otherwise idle host.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, SF_DIR  # noqa: E402
from pagerank_mapreduce_spark.queries import CATALOG  # noqa: E402
from pagerank_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump-r13")
    for name in names:
        try:
            df = CATALOG[name].fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # record the failure, keep going
            text = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} chars -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
