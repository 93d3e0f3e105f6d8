"""Flagship PageRank decade rows on the portable R-MAT family — the
SCALE.md graph-scaling table stops at 2^15 (262k edges); this
extends the FLAGSHIP fixed point to 2^18/2^20 (2M/8M raw edges) so
the headline entry carries the same past-the-shuffle-threshold
evidence as the BFS centralities and Louvain.

Usage: python tools/pagerank_scale.py [scale ...]   (default: 18 20)
Best-of-2 warm, edges localCheckpointed (walls measure the fixed
point, not the generator). Reports iterations-to-convergence so the
per-iteration number is derivable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pagerank_mapreduce_spark.graph.pagerank import pagerank
from pagerank_mapreduce_spark.graph.rmat import rmat_edges_portable
from pagerank_mapreduce_spark.session import get_spark


def main() -> None:
    scales = [int(s) for s in sys.argv[1:]] or [18, 20]
    spark = get_spark(app_name="pagerank-scale")
    for scale in scales:
        edges = rmat_edges_portable(spark, scale=scale, edge_factor=8)
        edges = edges.localCheckpoint()
        n_edges = edges.count()
        best = None
        iters = None
        for _ in range(2):
            t0 = time.monotonic()
            res = pagerank(edges)
            res.ranks.count()
            wall = time.monotonic() - t0
            if best is None or wall < best:
                best = wall
                iters = res.iterations
        print(
            f"| s{scale} | {n_edges/1e6:.2f}M | {best:.1f} | {iters} | "
            f"{best/iters:.2f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
