"""Distributed R-MAT graph generator.

The reference's MR-MPI library ships an R-MAT matrix generator as one
of its canonical examples (`mapreduce-7Apr14/doc/Examples.txt`, "rmat
command"; implementation pattern `examples/rmat.cpp`): N map tasks
each generate a slice of the edges by recursively descending the
adjacency matrix, choosing a quadrant per bit level with probabilities
(a, b, c, d). The MR phase then deduplicates edges by collating on
(src, dst).

Spark-first re-expression: the generator is `mr_map_tasks` (one
generator task per slice — no input data to read, pure fan-out), the
per-task kernel is vectorized NumPy (all `scale` bit-levels for the
whole slice drawn as one (per_task, scale) uniform matrix), and the
dedup is a `distinct()` — a hash shuffle on the edge pair, exactly the
collate the reference example runs.

Determinism: each task seeds `default_rng((seed, task_id))`, so the
edge set is a pure function of (scale, edge_factor, a, b, c, seed,
n_tasks) — independent of cluster layout or scheduling. At 100 TB
scale the same code generates 2^30+-vertex graphs by raising n_tasks;
no driver-side materialization anywhere.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from pagerank_mapreduce_spark.operators.mapreduce import mr_map_tasks

__all__ = ["rmat_edges"]


def rmat_edges(
    spark: SparkSession,
    scale: int = 10,
    edge_factor: int = 8,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    n_tasks: int = 16,
    dedup: bool = True,
) -> DataFrame:
    """Generate a 2^scale-vertex R-MAT graph as edges(src, dst).

    Quadrant probabilities: a=(0,0) b=(0,1) c=(1,0) d=1-a-b-c=(1,1);
    the defaults are the Graph500 parameters (skewed, heavy-tailed
    degree distribution — the same regime as the reference's
    barabasi-* fixtures).
    """
    if a + b + c >= 1.0:
        raise ValueError("quadrant probabilities must satisfy a+b+c < 1")
    n_edges = edge_factor << scale
    per_task = math.ceil(n_edges / n_tasks)

    def gen(task_id: int):
        count = min(per_task, n_edges - task_id * per_task)
        if count <= 0:
            return []
        rng = np.random.default_rng((seed, task_id))
        # one uniform per (edge, bit-level); quadrant thresholds:
        # [0,a)->00  [a,a+b)->01  [a+b,a+b+c)->10  [a+b+c,1)->11
        u = rng.random((count, scale))
        src_bit = (u >= a + b).astype(np.int64)
        dst_bit = (((u >= a) & (u < a + b)) | (u >= a + b + c)).astype(np.int64)
        weights = (1 << np.arange(scale, dtype=np.int64))[::-1]
        src = src_bit @ weights
        dst = dst_bit @ weights
        return list(zip(src.tolist(), dst.tolist()))

    edges = mr_map_tasks(spark, n_tasks, gen, "src bigint, dst bigint")
    return edges.distinct() if dedup else edges
