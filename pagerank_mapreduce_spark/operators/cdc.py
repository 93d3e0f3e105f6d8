"""Changelog compaction and snapshot merge (MERGE INTO semantics).

The batch primitive under every lakehouse upsert pipeline: a base
snapshot plus an ordered stream of changes (upserts + deletes)
compacts to the new snapshot — last writer wins per key, a trailing
delete removes the key. ``rel_latest_by_key`` is the special case
with no deletes and no base.

Scale shape: ONE shuffle on the key columns (the ranking window);
per-key state is a single row, so the window never buffers a group
beyond its changes. A pathologically hot key serializes its own
changes only — at 100 TB the standard mitigation is compacting in
event-time buckets first (same coarse-bucket idea as
operators.asof.asof_join_bucketed), which composes because
last-per-key is associative across ordered buckets.

Null-ordering portability note (why the generation column exists):
base rows carry NULL order columns, and engines disagree on where
NULLs sort in DESC order (Spark: last; DuckDB: first). Ordering by
the generation first makes the NULLs unreachable as tie-breakers —
base rows only ever compare against each other (one per key) — so
the result is engine-independent without relying on null placement.

No reference counterpart — training-data / lakehouse extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Compact an ordered changelog to its final state: per key keep
    the payload of the last change (by ``order_cols``); keys whose
    last change is ``delete_op`` are absent from the output. A NULL
    op is an upsert (null-safe comparison — a plain ``!=`` would
    evaluate NULL and silently treat a malformed op as a delete)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    return (
        changes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .filter(~F.col(op_col).eqNullSafe(delete_op))
        .drop("_rk", op_col, *order_cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Inverse of :func:`merge_snapshot`: diff two key-unique
    snapshots into the minimal changelog that transforms ``old`` into
    ``new`` — one row per changed key with ``op`` ∈ {'I','U','D'} and
    the NEW payload ('D' rows carry NULL payload; unchanged keys are
    absent). ``merge_snapshot(old, snapshot_diff(old, new, k), k,
    [])`` reconstructs ``new`` exactly — the round-trip property the
    tests pin. The table-diff primitive under incremental
    re-publication: ship the diff, not the snapshot.

    Scale shape: ONE full-outer shuffle join on the key (both sides
    hash-partition; no window, no driver state). Payload equality is
    a null-safe struct comparison — a single JVM expression
    regardless of column count.
    """
    payload = [c for c in old.columns if c not in key_cols]
    if [c for c in new.columns if c not in key_cols] != payload:
        raise ValueError(
            f"snapshot payloads differ: {old.columns} vs {new.columns}"
        )
    o = old.select(*key_cols, F.struct(*payload).alias("_old"))
    n = new.select(*key_cols, F.struct(*payload).alias("_new"))
    j = o.join(n, key_cols, "full_outer")
    op = (
        F.when(F.col("_old").isNull(), "I")
        .when(F.col("_new").isNull(), "D")
        .otherwise("U")
    )
    return (
        j.filter(~F.col("_old").eqNullSafe(F.col("_new")))
        .select(
            *key_cols,
            op.alias(op_col),
            *[F.col(f"_new.{c}").alias(c) for c in payload],
        )
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension Type 2 history: collapse a per-key
    ordered event stream into validity intervals — one row per run of
    consecutive identical ``state_col`` values, with ``valid_from`` =
    the run's first order value and ``valid_to`` = the next run's
    ``valid_from`` (NULL for the current/open run). The standard
    dimension-history build of a warehouse load.

    Two window passes over ONE shuffle on the key (both windows share
    the partitioning, so Catalyst plans a single exchange): a lag()
    marks run starts (run-length encoding — consecutive duplicates
    collapse before any further work), then a lead() over the
    surviving run-start rows closes each interval. Per-key state is
    one row per *run*, never the full event list, so hot keys cost
    their own change count only — same skew posture as
    :func:`apply_changelog`.

    ``order_cols`` must be a deterministic total order per key
    (include a tie-breaker id alongside the timestamp — ties
    otherwise make both the run boundaries and ``valid_to``
    engine-dependent).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changed = (
        df.withColumn("_prev", F.lag(state_col).over(w))
        .filter(
            F.col("_prev").isNull()
            | ~F.col("_prev").eqNullSafe(F.col(state_col))
        )
        .drop("_prev")
    )
    first_order, *rest_order = order_cols
    return (
        changed.withColumnRenamed(first_order, "valid_from")
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy(*key_cols).orderBy("valid_from", *rest_order)
            ),
        )
        .select(*key_cols, state_col, "valid_from", "valid_to")
    )


def merge_snapshot(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE the changelog into a base snapshot: unchanged base keys
    pass through, changed keys take their last change's payload,
    deleted keys drop. ``base`` must be key-unique and carry exactly
    the payload columns of ``changes`` (i.e. ``changes`` minus
    ``op_col``/``order_cols``)."""
    payload = [
        c
        for c in changes.columns
        if c != op_col and c not in order_cols
    ]
    if sorted(base.columns) != sorted(payload):
        # ValueError, not assert: python -O would strip an assert and
        # let a mismatched base be silently projected down to the
        # changes payload, losing columns from the merged snapshot
        raise ValueError(
            f"base columns {base.columns} must equal changes payload {payload}"
        )
    tagged_base = base.select(
        F.lit(0).alias("_gen"),
        *[F.lit(None).cast(changes.schema[c].dataType).alias(c) for c in order_cols],
        F.lit("U").alias(op_col),
        *payload,
    )
    tagged_changes = changes.select(
        F.lit(1).alias("_gen"), *order_cols, op_col, *payload
    )
    return apply_changelog(
        tagged_base.unionByName(tagged_changes),
        key_cols,
        ["_gen", *order_cols],
        op_col=op_col,
        delete_op=delete_op,
    )
