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

from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators.mapreduce import mr_map_tasks

__all__ = ["rmat_edges", "rmat_edges_portable", "rmat_oracle_sql"]


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


_TWO_60 = float(1 << 60)


def _quadrant_thresholds(a: float, b: float, c: float) -> tuple[str, str, str]:
    # the cumulative thresholds are computed ONCE here in Python
    # float arithmetic; the Spark side compares against the floats,
    # the SQL side against their repr()s (repr round-trips exactly),
    # so both engines compare against bit-identical doubles
    return repr(float(a)), repr(float(a + b)), repr(float(a + b + c))


def rmat_edges_portable(
    spark: SparkSession,
    scale: int = 10,
    edge_factor: int = 8,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    dedup: bool = True,
) -> DataFrame:
    """R-MAT with portable coin flips — the cross-engine twin of
    :func:`rmat_edges` (same quadrant-descent semantics; different,
    replayable randomness).

    The per-(edge, level) uniform is ``portable_hash60("<i>:<l>:<seed>")
    / 2^60`` — the md5-derived hash both Spark and DuckDB compute
    identically (see ``dedup.portable_hash60``), so
    :func:`rmat_oracle_sql` regenerates the exact edge set.

    Shape: ``spark.range(n_edges)`` and one ``F.aggregate`` fold over
    ``sequence(0, scale-1)`` per vertex coordinate — expression-only,
    no explode, no Python, NO shuffle until the final ``distinct``.
    Generation parallelism is the range partitioning, so the same code
    generates 2^30+-vertex graphs across a cluster.
    """
    if a + b + c >= 1.0:
        raise ValueError("quadrant probabilities must satisfy a+b+c < 1")
    # derive the floats from the shared helper (repr round-trips
    # exactly) so both the generator and the SQL oracle compare coins
    # against bit-identical thresholds — a second inline computation
    # could drift under a future edit and silently break coin parity
    t1, t2, t3 = (float(t) for t in _quadrant_thresholds(a, b, c))
    n_edges = edge_factor << scale

    from pagerank_mapreduce_spark.operators.dedup import portable_hash60

    def u(l):  # noqa: E741 - level column inside the fold
        s = F.concat_ws(
            ":", F.col("id").cast("string"), l.cast("string"), F.lit(str(seed))
        )
        return portable_hash60(s) / F.lit(_TWO_60)

    def bits(bit_expr):
        # left fold in level order: acc*2 + bit  ==  sum(bit << (scale-1-l))
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(scale - 1)),
            F.lit(0).cast("bigint"),
            lambda acc, l: acc * 2 + bit_expr(u(l)),  # noqa: E741
        )

    src_bit = lambda uu: (uu >= t2).cast("bigint")  # noqa: E731
    dst_bit = lambda uu: (  # noqa: E731
        ((uu >= t1) & (uu < t2)) | (uu >= t3)
    ).cast("bigint")
    edges = spark.range(n_edges).select(
        bits(src_bit).alias("src"), bits(dst_bit).alias("dst")
    )
    return edges.distinct() if dedup else edges


def rmat_oracle_sql(
    scale: int = 10,
    edge_factor: int = 8,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> str:
    """DuckDB SQL regenerating :func:`rmat_edges_portable`'s edge set
    (post-dedup): unnest the (edge, level) grid, replay the portable
    coins, fold the quadrant bits back into vertex ids."""
    t1, t2, t3 = _quadrant_thresholds(a, b, c)
    n_edges = edge_factor << scale
    return f"""
      WITH grid AS (
        SELECT i.range AS i, l.range AS l
        FROM range({n_edges}) i CROSS JOIN range({scale}) l),
      coins AS (
        SELECT i, l,
               ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
                                   CAST(l AS VARCHAR) || ':' || '{seed}'),
                               1, 15))::BIGINT / {_TWO_60!r} AS u
        FROM grid),
      folded AS (
        SELECT i,
               CAST(sum(CASE WHEN u >= {t2} THEN 1 ELSE 0 END
                   * (CAST(1 AS BIGINT) << ({scale} - 1 - l))) AS BIGINT) AS src,
               CAST(sum(CASE WHEN (u >= {t1} AND u < {t2}) OR u >= {t3}
                        THEN 1 ELSE 0 END
                   * (CAST(1 AS BIGINT) << ({scale} - 1 - l))) AS BIGINT) AS dst
        FROM coins GROUP BY i)
      SELECT DISTINCT src, dst FROM folded"""
