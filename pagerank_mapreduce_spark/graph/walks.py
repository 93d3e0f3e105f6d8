"""Deterministic random walks over a directed edge DataFrame —
DeepWalk/node2vec-style corpus generation for embedding training.

Beyond the reference (PageRank-only), but squarely in its data model:
the walk sampler consumes the same ``(src, dst)`` edge list and is
the standard way a 100 TB graph becomes a *text-like training
corpus* (walk sequences feeding skip-gram). Randomness is portable
md5 coins (the repo-wide convention: R-MAT generation, weighted
sampling, Luby priorities), so every step replays bit-for-bit in any
engine — the walks are a pure function of (graph, seed).

Semantics:

- duplicate edges collapse first (``distinct``): each live vertex
  picks uniformly over its *distinct* successors.
- successors are indexed ``0..deg-1`` in ``dst`` order (total order
  within a source, so the index is deterministic).
- a walk starts at every vertex with >= 1 out-edge,
  ``walks_per_vertex`` times; ``walk_id = src * walks_per_vertex + w``.
- step ``s`` draws ``idx = md5_16("seed:walk_id:s") % deg(cur)`` and
  moves to that successor; a walk parks when it reaches a vertex with
  no out-edges; all walks stop after ``walk_length`` steps.
- output: ``(walk_id, path)`` with ``path`` the comma-joined vertex
  sequence including the start (csv string, like the reverse-
  adjacency sink, so oracles compare strings not arrays).

Scale design (100 TB stance):

- The indexed successor relation (the only O(m) data) is cached
  pre-partitioned on ``src``; each step shuffles only the O(#walks)
  frontier to meet it — edges never move after the one-time layout.
  The per-source ``row_number`` index is the single full-relation
  window, partitioned by ``src`` (no global sort; skewed out-degree
  hubs are one partition's rows, same profile as the groupBy
  aggregations everywhere else).
- The coin and the successor pick are pure expressions: the step is
  ONE equi-join on ``(cur, pick) = (src, idx)`` — never a
  "join all successors then filter" fan-out, so a 10^6-degree hub
  costs one probe, not 10^6 matched rows, per visiting walk.
- Parked walks ride along unchanged (tiny rows) and each step
  ``localCheckpoint``s the frontier, keeping lineage O(1) in the
  walk length (graph/pagerank.py's loop discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["random_walks", "random_walks_oracle_sql"]


def _coin(walk_id, step: int, seed: int):
    """Portable 16-bit md5 uniform, the repo-wide convention:
    first 4 hex chars of md5('seed:walk_id:step')."""
    key = F.concat_ws(
        ":", F.lit(str(seed)), walk_id.cast("string"), F.lit(str(step))
    )
    return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int")


def _walk_step(live: DataFrame, succ: DataFrame, step: int, seed: int) -> DataFrame:
    """One frontier advance: equi-join the live walks to their picked
    successor on ``(cur, pick) = (src, idx)`` — factored out so the
    plan audit can pin that this stays a two-key hash join (never a
    join-all-successors fan-out)."""
    pick = _coin(F.col("walk_id"), step, seed) % F.col("d_cur")
    return (
        live.withColumn("pick", pick)
        .join(
            succ,
            (F.col("cur") == F.col("src")) & (F.col("pick") == F.col("idx")),
        )
        .select(
            "walk_id",
            F.col("dst").alias("cur"),
            F.col("d_dst").alias("d_cur"),
            F.concat(
                F.col("path"), F.lit(","), F.col("dst").cast("string")
            ).alias("path"),
        )
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Run the deterministic walk sampler; returns (walk_id, path)."""
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")

    # loop confs (the graph-suite discipline): AQE off + shuffle
    # partitions sized to the edge relation while stepping, restored
    # on exit — per-step plans are tiny and fixed-shape, AQE re-plan
    # latency dominates them at every scale below huge
    spark = edges.sparkSession
    conf = spark.conf
    saved = {
        "spark.sql.shuffle.partitions": conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
    }
    try:
        m = edges.count()
        loop_partitions = max(
            4, min(int(saved["spark.sql.shuffle.partitions"]), m // 250_000 + 1)
        )
        conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
        conf.set("spark.sql.adaptive.enabled", "false")
        return _walks_loop(edges, walk_length, walks_per_vertex, seed)
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def _walks_loop(
    edges: DataFrame, walk_length: int, walks_per_vertex: int, seed: int
) -> DataFrame:
    e = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    # successor table with the destination's own out-degree attached,
    # so a step lands already knowing whether the walk parks there
    succ = (
        e.select(
            "src", "dst", (F.row_number().over(w) - 1).alias("idx")
        )
        .join(
            deg.select(F.col("src").alias("dst"), F.col("d").alias("d_dst")),
            "dst",
            "left",
        )
        .select(
            "src",
            "idx",
            "dst",
            F.coalesce("d_dst", F.lit(0)).alias("d_dst"),
        )
        .repartition("src")
        .persist()
    )

    wpv = walks_per_vertex
    state = (
        deg.select(
            F.col("src"),
            F.col("d"),
            F.explode(F.sequence(F.lit(0), F.lit(wpv - 1))).alias("wi"),
        )
        .select(
            (F.col("src") * wpv + F.col("wi")).alias("walk_id"),
            F.col("src").alias("cur"),
            F.col("d").alias("d_cur"),
            F.col("src").cast("string").alias("path"),
        )
        .localCheckpoint()
    )
    try:
        for s in range(walk_length):
            live = state.filter(F.col("d_cur") > 0)
            parked = state.filter(F.col("d_cur") == 0)
            stepped = _walk_step(live, succ, s, seed)
            state = stepped.unionByName(parked).localCheckpoint()
    finally:
        succ.unpersist()
    return state.select("walk_id", "path")


def random_walks_oracle_sql(
    edges_sql: str,
    walk_length: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 42,
) -> str:
    """DuckDB oracle replaying :func:`random_walks` step for step —
    same distinct/index/coin arithmetic, parked walks carried forward
    through the recursion so the final generation holds every walk."""
    wpv = int(walks_per_vertex)
    return f"""
      WITH RECURSIVE
      ed AS (SELECT DISTINCT src, dst FROM ({edges_sql})),
      deg AS (SELECT src, count(*) AS d FROM ed GROUP BY src),
      succ AS (SELECT e.src,
                      row_number() OVER (PARTITION BY e.src
                                         ORDER BY e.dst) - 1 AS idx,
                      e.dst, coalesce(dd.d, 0) AS d_dst
               FROM ed e LEFT JOIN deg dd ON e.dst = dd.src),
      t(step, walk_id, cur, d_cur, path) AS (
        SELECT 0, g.src * {wpv} + u.wi, g.src, g.d,
               CAST(g.src AS VARCHAR)
        FROM deg g CROSS JOIN
             (SELECT unnest(generate_series(0, {wpv - 1})) AS wi) u
        UNION ALL
        (WITH cur AS (SELECT * FROM t WHERE step < {walk_length}),
         stepped AS (
           SELECT c.step + 1 AS step, c.walk_id, s.dst AS cur,
                  s.d_dst AS d_cur,
                  c.path || ',' || CAST(s.dst AS VARCHAR) AS path
           FROM cur c JOIN succ s
             ON c.cur = s.src
            AND s.idx = CAST(concat('0x',
                  substr(md5(concat('{seed}', ':',
                                    CAST(c.walk_id AS VARCHAR), ':',
                                    CAST(c.step AS VARCHAR))), 1, 4))
                  AS INTEGER) % c.d_cur
           WHERE c.d_cur > 0)
         SELECT * FROM stepped
         UNION ALL
         SELECT c.step + 1, c.walk_id, c.cur, c.d_cur, c.path
         FROM cur c WHERE c.d_cur = 0)
      )
      SELECT walk_id, path FROM t WHERE step = {walk_length}"""
