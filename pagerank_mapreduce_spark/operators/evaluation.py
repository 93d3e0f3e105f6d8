"""Model/classifier evaluation metrics as distributed aggregates.

A training-data pipeline scores corpora with quality classifiers
(text_quality, text_nb_predict, text_lm_score) and needs to evaluate
those scorers against labels at corpus scale. The metrics here are
rank statistics, whose textbook formulation ("sort everything, walk
the ranks") is a single-partition global sort — the one thing a
100 TB job must never do. Both operators compute exact average ranks
with the repo's two-phase distributed prefix-sum shape (see
operators/packing.py, the sequence-packing precedent):

1. collapse to DISTINCT score values (groupBy — algebraic, map-side
   partial aggregation absorbs heavy ties),
2. bucket the distinct values by RANK POSITION: the bucket edges are
   broadcast approx-percentiles of the distinct-value relation, so
   each bucket holds ~N/n_buckets distinct values BY CONSTRUCTION —
   a value-skewed distribution (one outlier max) cannot collapse the
   bucketing into a single giant window partition the way a
   min/max-range width_bucket would (round-9 ADVICE fix). Per-bucket
   prefix sums run under a window PARTITIONED by bucket,
3. bucket offsets from a window over the tiny (≤ n_buckets rows)
   bucket-totals relation — the only unpartitioned orderBy, on a
   provably constant-size input.

Global rank of a value = bucket offset + within-bucket prefix; ties
get the textbook average rank (min rank + (count-1)/2), so results
match scipy.stats.rankdata("average") / SQL rank()-based oracles
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _avg_ranks(
    df: DataFrame,
    score_col: str,
    agg_cols: list[Column],
    n_buckets: int = 1024,
    _keep_bucket: bool = False,
) -> DataFrame:
    """Average rank (1-based, ties averaged) per DISTINCT value of
    ``score_col``, plus the caller's per-value aggregates.

    Returns one row per distinct score with columns: the score,
    ``avg_rank``, ``n`` (multiplicity), and each of ``agg_cols``
    (aggregate expressions over the tied rows, e.g. how many are
    positive)."""
    per_score = df.groupBy(score_col).agg(
        F.count(F.lit(1)).alias("n"), *agg_cols
    )
    # bucket edges = approx percentiles of the DISTINCT values, so the
    # window partitions are balanced by rank position regardless of the
    # value distribution (an outlier max under a min/max width_bucket
    # would put ~every distinct value in one bucket and degenerate the
    # partitioned window into the global sort this module exists to
    # avoid). The edges relation is one row with a ≤(n_buckets-1)-wide
    # array — broadcast, never collected. Ties with an edge value land
    # deterministically via <=; duplicate edges just leave empty
    # buckets. The assignment is O(n_buckets) comparisons per distinct
    # value inside codegen — the price of skew-immunity, paid per
    # DISTINCT value (post-collapse), not per row.
    edges = per_score.agg(
        F.percentile_approx(
            F.col(score_col).cast("double"),
            F.array(
                *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
            ),
        ).alias("_edges")
    )
    bucketed = per_score.join(F.broadcast(edges)).withColumn(
        "_bkt",
        F.size(
            F.filter(
                "_edges",
                lambda e: e < F.col(score_col).cast("double"),
            )
        ),
    )
    in_bucket = Window.partitionBy("_bkt").orderBy(score_col)
    bucketed = bucketed.withColumn(
        "_below_in_bkt",
        F.coalesce(
            F.sum("n").over(
                in_bucket.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    totals = bucketed.groupBy("_bkt").agg(F.sum("n").alias("_bn"))
    # ≤ n_buckets + 1 rows: the unpartitioned orderBy is safe here
    offsets = totals.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_bn").over(
                Window.orderBy("_bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bkt", "_offset")
    ranked = bucketed.join(F.broadcast(offsets), "_bkt").withColumn(
        "avg_rank",
        F.col("_offset")
        + F.col("_below_in_bkt")
        + (F.col("n") + F.lit(1)) / F.lit(2.0),
    )
    drop = ["_edges", "_below_in_bkt", "_offset"]
    if not _keep_bucket:
        drop.append("_bkt")
    return ranked.drop(*drop)


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str | Column,
    n_buckets: int = 1024,
    round_to: int = 6,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` against a binary ``label_col``
    via the Mann-Whitney rank-sum identity::

        AUC = (R+ - n+(n+ + 1)/2) / (n+ · n-)

    where R+ is the sum of the positives' average ranks under an
    ascending sort of the scores. Equivalent to the trapezoidal area
    under the ROC curve with tie-handling (sklearn's roc_auc_score),
    but computed as two shuffles and a scalar aggregate — no global
    sort, no driver materialization. Output: one row
    (auc, n_pos, n_neg)."""
    y = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("int")
    base = df.select(F.col(score_col).alias("_s"), y.alias("_y")).filter(
        # explicit, not incidental: a NULL score would otherwise fall
        # out silently at the bucket join (NULL width_bucket), and a
        # NULL label would poison the positive count
        F.col("_s").isNotNull() & F.col("_y").isNotNull()
    )
    ranked = _avg_ranks(
        base,
        "_s",
        [F.sum("_y").alias("_np")],
        n_buckets,
    )
    agg = ranked.agg(
        F.sum(F.col("_np") * F.col("avg_rank")).alias("_rpos"),
        F.sum("_np").cast("bigint").alias("n_pos"),
        F.sum(F.col("n") - F.col("_np")).cast("bigint").alias("n_neg"),
    )
    return agg.select(
        F.round(
            (
                F.col("_rpos")
                - F.col("n_pos") * (F.col("n_pos") + F.lit(1)) / F.lit(2.0)
            )
            / (F.col("n_pos") * F.col("n_neg")),
            round_to,
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_buckets: int = 1024,
    round_to: int = 6,
) -> DataFrame:
    """Spearman rank correlation of two numeric columns: Pearson
    correlation of their average ranks (the tie-correct general form,
    matching scipy.stats.spearmanr). Each column is rank-transformed
    with the distributed average-rank machinery, the per-value ranks
    are mapped back over equi-joins on the value, and the final
    Pearson runs as one scalar aggregate. Rows where either side is
    NULL are excluded up front (pairwise-complete, the scipy
    convention). Output: one row (rho, n)."""
    base = df.select(
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    rx = _avg_ranks(base.select("_x"), "_x", [], n_buckets).select(
        "_x", F.col("avg_rank").alias("_rx")
    )
    ry = _avg_ranks(base.select("_y"), "_y", [], n_buckets).select(
        "_y", F.col("avg_rank").alias("_ry")
    )
    joined = base.join(rx, "_x").join(ry, "_y")
    return joined.agg(
        F.round(F.corr("_rx", "_ry"), round_to).alias("rho"),
        F.count(F.lit(1)).alias("n"),
    )
