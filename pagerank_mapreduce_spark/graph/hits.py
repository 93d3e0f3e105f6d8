"""HITS (hubs & authorities) over a directed edge DataFrame.

Beyond the reference (which is PageRank-only, mr-pr-cpp.cpp:110-180),
but the natural sibling capability on the same data model: the
Kleinberg power iteration over the same ``(src, dst)`` edge list the
PageRank pipeline consumes, with the same dense-vertex conventions
(ids ``0..n-1``, ``n = websize``, duplicate edges contribute
multiply — mr-pr-cpp.cpp:89-108, 203-210).

Per iteration (fixed count — the deterministic regime):

- ``a_raw[d] = sum_{s->d} hub[s]``; ``auth = a_raw / sum(a_raw)``
- ``h_raw[s] = sum_{s->d} auth[d]``; ``hub = h_raw / sum(h_raw)``

L1 normalization (not the textbook L2) keeps the oracle replay free
of cross-engine ``sqrt`` concerns; the per-iteration rescaling makes
the two conventions rank-identical and the fixed point unique up to
that scale.

Scale design (100 TB stance) — mirrors graph/pagerank.py:

- **No adjacency lists.** Both half-steps are algebraic ``sum``
  aggregates (map-side partial agg; AQE-safe under in-degree skew) —
  never a ``collect_list``.
- **Edges cached twice, each copy pre-partitioned on its half-step's
  join key** (``src`` for the authority step, ``dst`` for the hub
  step): only the O(n) score vector shuffles per iteration, the O(m)
  edge relation never moves after the one-time layout. The 2x edge
  memory is the explicit price for zero edge shuffles in-loop.
- **Driver sees scalars only**: each half-step's normalizer rides the
  checkpoint job as an ``Observation`` — two jobs per iteration, no
  separate aggregation pass, vectors never ``collect()``.
- **Lineage truncated per half-step** via ``localCheckpoint`` so plan
  analysis stays O(1) across iterations (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.graph.pagerank import websize

HITS_ITERATIONS = 20


def hits_oracle_sql(
    edges_sql: str,
    iterations: int = HITS_ITERATIONS,
    round_digits: int = 8,
) -> str:
    """DuckDB oracle replaying :func:`hits` generation for generation.

    Why exact hash equality is safe for an iterative float algorithm:
    every half-step re-normalizes to L1 mass 1, so summation-order
    noise between engines (~1e-16 relative) cannot compound beyond
    ~``iterations``x — absolute error ~1e-18 on scores of magnitude
    ~1/n, while the round-8 quantum is 1e-8. Scalar divisions are
    written with the same association order as the Spark expressions
    (``x / scalar``), and base-case literals are cast to DOUBLE
    explicitly (bare ``1.0`` is DECIMAL in DuckDB).
    """
    return f"""
      WITH RECURSIVE
      ed AS ({edges_sql}),
      ws AS (SELECT greatest(max(src), max(dst)) + 1 AS n FROM ed),
      verts AS (SELECT unnest(generate_series(0, (SELECT n FROM ws) - 1))
                       AS id),
      t(it, id, hub, auth) AS (
        SELECT 0, id, CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE) FROM verts
        UNION ALL
        (WITH cur AS (SELECT it, id, hub FROM t WHERE it < {iterations}),
         ar AS (SELECT v.id, coalesce(s.x, CAST(0.0 AS DOUBLE)) AS a_raw
                FROM verts v LEFT JOIN
                  (SELECT e.dst AS id, sum(c.hub) AS x
                   FROM cur c JOIN ed e ON c.id = e.src GROUP BY e.dst) s
                ON v.id = s.id),
         au AS (SELECT id, a_raw / (SELECT sum(a_raw) FROM ar) AS auth
                FROM ar),
         hr AS (SELECT v.id, coalesce(s.x, CAST(0.0 AS DOUBLE)) AS h_raw
                FROM verts v LEFT JOIN
                  (SELECT e.src AS id, sum(a.auth) AS x
                   FROM au a JOIN ed e ON a.id = e.dst GROUP BY e.src) s
                ON v.id = s.id)
         SELECT c.it + 1, h.id,
                h.h_raw / (SELECT sum(h_raw) FROM hr) AS hub,
                a.auth
         FROM cur c JOIN hr h ON c.id = h.id JOIN au a ON h.id = a.id)
      )
      SELECT id, round(hub, {round_digits}) AS hub,
             round(auth, {round_digits}) AS auth
      FROM t WHERE it = {iterations}"""


def hits(
    edges: DataFrame,
    iterations: int = HITS_ITERATIONS,
    num_vertices: int | None = None,
) -> DataFrame:
    """Run ``iterations`` full HITS rounds; returns (id, hub, auth)
    for every vertex in ``0..n-1`` (dangling / unreferenced vertices
    hold score 0 after the first round, like PageRank's conventions).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    spark = edges.sparkSession
    n = num_vertices if num_vertices is not None else websize(edges)
    if n <= 0:
        raise ValueError("empty graph")

    # One cached copy per half-step, pre-partitioned on that step's
    # join key — the vector (O(n)) shuffles per iteration, the edges
    # (O(m)) never do after this layout.
    by_src = edges.select("src", "dst").repartition("src").persist()
    by_dst = edges.select("src", "dst").repartition("dst").persist()
    verts = (
        spark.range(n).select(F.col("id").cast("bigint").alias("id")).persist()
    )

    hub = verts.select("id", F.lit(1.0).alias("hub"))
    auth = None
    try:
        for it in range(iterations):
            # authority step: a_raw[d] = sum over in-edges of hub[s]
            ar = (
                hub.alias("h")
                .join(by_src.alias("e"), F.col("h.id") == F.col("e.src"))
                .groupBy(F.col("e.dst").alias("id"))
                .agg(F.sum(F.col("h.hub")).alias("x"))
            )
            a = verts.join(ar, "id", "left").select(
                "id", F.coalesce("x", F.lit(0.0)).alias("a_raw")
            )
            obs_a = Observation(f"hits_a_{it}")
            a = a.observe(obs_a, F.sum("a_raw").alias("s")).localCheckpoint()
            sa = float(obs_a.get["s"])
            if sa == 0.0:
                # only possible with an empty edge relation — normalizing
                # would silently turn the whole vector into NaN
                raise ValueError("graph has no edges")
            auth = a.select("id", (F.col("a_raw") / F.lit(sa)).alias("auth"))

            # hub step: h_raw[s] = sum over out-edges of auth[d]
            hr = (
                auth.alias("a")
                .join(by_dst.alias("e"), F.col("a.id") == F.col("e.dst"))
                .groupBy(F.col("e.src").alias("id"))
                .agg(F.sum(F.col("a.auth")).alias("x"))
            )
            h = verts.join(hr, "id", "left").select(
                "id", F.coalesce("x", F.lit(0.0)).alias("h_raw")
            )
            obs_h = Observation(f"hits_h_{it}")
            h = h.observe(obs_h, F.sum("h_raw").alias("s")).localCheckpoint()
            sh = float(obs_h.get["s"])
            hub = h.select("id", (F.col("h_raw") / F.lit(sh)).alias("hub"))
    finally:
        by_src.unpersist()
        by_dst.unpersist()
        verts.unpersist()
    return hub.join(auth, "id").select("id", "hub", "auth")
