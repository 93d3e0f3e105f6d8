"""Louvain decade-row measurement on the portable R-MAT family
(the SCALE.md round-11/12 rows: scale → wall, levels accepted,
modularity trail). Edges are generated once, canonicalized and
pre-checkpointed so the measured wall is louvain_levels itself
(the catalog entry's bench wall additionally carries the generator).

Usage: python tools/louvain_scale.py [scale ...]   (default: 18)
Best-of-2 warm per scale, like the round-11 rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pagerank_mapreduce_spark.graph.algorithms import louvain_levels
from pagerank_mapreduce_spark.graph.rmat import rmat_edges_portable
from pagerank_mapreduce_spark.session import get_spark


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [18]
    spark = get_spark(app_name="louvain-scale")
    for scale in scales:
        edges = rmat_edges_portable(spark, scale=scale, edge_factor=8)
        edges = edges.localCheckpoint()
        n_edges = edges.count()
        best = None
        trail = levels = None
        for _ in range(2):
            info: dict = {}
            t0 = time.monotonic()
            louvain_levels(edges, max_levels=4, info=info).count()
            wall = time.monotonic() - t0
            if best is None or wall < best:
                best = wall
                trail = info["modularity_trail"]
                levels = info["levels_used"]
        print(
            f"| s{scale} | {n_edges/1000:.1f}k | {best:.1f} | {levels} | "
            + " → ".join(f"{q:.3f}".lstrip("0") for q in trail)
            + " |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
