"""Continuous ingest dedup — the streaming face of the incremental
MinHash index (operators/dedup.py:minhash_incremental_pairs).

Every micro-batch of incoming documents is checked two ways before
admission:

1. against the ACCUMULATED INDEX (seed corpus + everything accepted
   in earlier batches) via the bucket-scoped index×new pair generator
   — cost scales with the batch, not the corpus;
2. within the batch itself (``minhash_dedup``), keep-first by id, so
   two near-identical documents arriving together admit only one.

Accepted documents are appended to the index location, which the next
batch reads — the classic foreachBatch "transactional side effect"
pattern (sinks.py): the micro-batch boundary gives the index update
batch-atomic semantics without a lock manager. At 100 TB the index
location would be a partitioned/bucketed layout (sources/bucketed.py)
so the per-batch index read prunes to the touched LSH buckets; here
it is a plain parquet dir, the semantics are identical.

The batch kernel (:func:`ingest_batch`) is pure DataFrame-in/out —
the streaming wrapper adds only the read-index/append-accepted I/O,
so batch-vs-stream parity is testable exactly (kappa architecture:
one code path, two drivers).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators.dedup import (
    minhash_dedup,
    minhash_incremental_pairs,
)

__all__ = [
    "ingest_batch",
    "start_dedup_ingest",
    "paragraph_ingest_batch",
    "start_paragraph_ingest",
    "stop_ingest",
]


def _cooperative(once):
    """Wrap a foreachBatch body so the query can be stopped WITHOUT
    interrupting a mid-flight index append. ``StreamingQuery.stop()``
    interrupts the stream-execution thread; if that lands inside the
    parquet append the write dies with InterruptedException and (on
    the rate-source soak under host contention) zero batches commit.
    The wrapper adds a stop flag checked before each batch and a lock
    held across the batch body — :func:`stop_ingest` sets the flag,
    waits for the lock (i.e. for the in-flight append to finish),
    THEN calls ``q.stop()``, so the interrupt only ever lands between
    batches. Returns (wrapped_fn, stop_event, batch_lock)."""
    stop_event = threading.Event()
    batch_lock = threading.Lock()

    def _wrapped(batch_df: DataFrame, batch_id: int) -> None:
        if stop_event.is_set():
            return
        with batch_lock:
            if stop_event.is_set():
                return
            once(batch_df, batch_id)

    return _wrapped, stop_event, batch_lock


def stop_ingest(q, grace: float = 300.0) -> None:
    """Cooperatively stop an ingest query started by
    :func:`start_dedup_ingest` / :func:`start_paragraph_ingest`:
    flag future batches to no-op, wait up to ``grace`` seconds for
    the in-flight batch's index append to complete, then stop. Falls
    back to a plain ``q.stop()`` for queries without the hooks."""
    ev = getattr(q, "_graft_stop_event", None)
    lk = getattr(q, "_graft_batch_lock", None)
    if ev is not None:
        ev.set()
    if lk is not None and lk.acquire(timeout=grace):
        lk.release()
    q.stop()


def ingest_batch(
    batch: DataFrame,
    index: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """Admit the subset of ``batch`` that near-duplicates neither the
    index nor an earlier-id batch sibling. Returns accepted rows with
    ``batch``'s full schema. ``index`` may be empty but must carry
    (id_col, text_col)."""
    combined = index.select(
        F.col(id_col), F.col(text_col), F.lit(False).alias("_new")
    ).unionByName(
        batch.select(
            F.col(id_col), F.col(text_col), F.lit(True).alias("_new")
        )
    )
    vs_index = minhash_incremental_pairs(
        combined,
        F.col("_new"),
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        **lsh_kwargs,
    )
    within = minhash_dedup(
        batch,
        threshold=threshold,
        text_col=text_col,
        id_col=id_col,
        **lsh_kwargs,
    )
    rejected = (
        vs_index.select(F.col("b").alias(id_col))
        .unionByName(
            # keep-first within the batch: (a, b) pairs have a < b
            within.select(F.col("b").alias(id_col))
        )
        .distinct()
    )
    return batch.join(rejected, id_col, "left_anti")


def start_dedup_ingest(
    stream: DataFrame,
    seed_index: DataFrame,
    accepted_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger: dict | None = None,
    **lsh_kwargs,
):
    """Run the ingest loop: per micro-batch, dedup against
    seed_index ∪ previously-accepted and append survivors to
    ``accepted_path``. Returns the StreamingQuery.

    ``trigger``: writeStream trigger kwargs — default
    ``{"availableNow": True}`` (drain-what-exists, the file-source
    deployment); pass ``{"processingTime": "1 second"}`` for a
    continuous source (rate soak, Kafka-style feeds)."""
    spark: SparkSession = seed_index.sparkSession
    schema = stream.schema

    def _accepted_dir_exists() -> bool:
        # existence probed EXPLICITLY through the Hadoop FileSystem
        # API — classifying a read failure by exception-message
        # substring ('PATH_NOT_FOUND' / 'Path does not exist') is
        # version- and locale-fragile, and a differently-worded IO
        # failure must NOT be misread as "first batch, empty index"
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(accepted_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def _once(batch_df: DataFrame, batch_id: int) -> None:
        # only a MISSING accepted dir (first batch) may fall back to
        # empty — any failure while reading an EXISTING dir aborts
        # the batch, or the index silently shrinks and duplicates get
        # re-admitted
        if _accepted_dir_exists():
            prior = spark.read.schema(schema).parquet(accepted_path)
        else:
            prior = spark.createDataFrame([], schema)
        index = seed_index.select(id_col, text_col).unionByName(
            prior.select(id_col, text_col)
        )
        accepted = ingest_batch(
            batch_df,
            index,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            **lsh_kwargs,
        )
        accepted.write.mode("append").parquet(accepted_path)

    wrapped, stop_event, batch_lock = _cooperative(_once)
    q = (
        stream.writeStream.foreachBatch(wrapped)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    q._graft_stop_event = stop_event
    q._graft_batch_lock = batch_lock
    return q


# -------------------------- paragraph-granularity ingest (round 8)


def paragraph_ingest_batch(
    batch: DataFrame,
    index_fps: DataFrame,
    splitter=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "\n\n",
) -> tuple[DataFrame, DataFrame]:
    """Paragraph-granularity admission for one micro-batch: drop every
    paragraph whose fingerprint is already in the accumulated index
    (an anti-join on fp — cost scales with the batch, not the
    corpus), elect keep-first winners among the batch's own fresh
    paragraphs (two copies arriving together admit one), and rebuild
    the documents. Returns ``(accepted, new_fps)``: the rebuilt docs
    with (doc_id, text, n_kept, n_dropped), and the distinct
    fingerprints the index must absorb before the next batch.

    Same batch-kernel-pure shape as :func:`ingest_batch`: driving the
    batches sequentially with a growing index produces EXACTLY
    ``paragraph_dedup`` over the concatenated corpus whenever ids are
    monotone across batches (the kappa parity the tests pin)."""
    from pagerank_mapreduce_spark.operators.dedup import (
        reassemble_marked,
        split_paragraphs,
    )

    paras = split_paragraphs(batch, splitter, text_col, id_col)
    fresh = paras.join(
        index_fps.select("fp").distinct(), "fp", "left_anti"
    )
    winners = fresh.groupBy("fp").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    kept = (
        fresh.join(winners, "fp")
        .filter(
            (F.col("doc_id") == F.col("w.doc_id"))
            & (F.col("pos") == F.col("w.pos"))
        )
        .select("doc_id", "pos")
        .withColumn("keep", F.lit(True))
    )
    marked = paras.join(kept, ["doc_id", "pos"], "left").withColumn(
        "keep", F.coalesce(F.col("keep"), F.lit(False))
    )
    accepted = reassemble_marked(marked, text_col, joiner)
    new_fps = (
        marked.filter(F.col("keep")).select("fp").distinct()
    )
    return accepted, new_fps


def start_paragraph_ingest(
    stream: DataFrame,
    accepted_path: str,
    fps_path: str,
    checkpoint_path: str,
    splitter=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    joiner: str = "\n\n",
):
    """Run the paragraph-dedup ingest loop: per micro-batch, drop
    index-known paragraphs, elect in-batch winners, append the
    rebuilt documents to ``accepted_path`` and the newly-seen
    fingerprints to ``fps_path`` (the growing index the NEXT batch
    anti-joins). Same index-read failure posture as
    :func:`start_dedup_ingest`: only a genuinely missing fps dir may
    fall back to an empty index. Returns the StreamingQuery."""
    spark: SparkSession = stream.sparkSession

    def _dir_exists(path: str) -> bool:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def _once(batch_df: DataFrame, batch_id: int) -> None:
        if _dir_exists(fps_path):
            index_fps = spark.read.schema("fp string").parquet(fps_path)
        else:
            index_fps = spark.createDataFrame([], "fp string")
        accepted, new_fps = paragraph_ingest_batch(
            batch_df,
            index_fps,
            splitter=splitter,
            text_col=text_col,
            id_col=id_col,
            joiner=joiner,
        )
        accepted.write.mode("append").parquet(accepted_path)
        new_fps.write.mode("append").parquet(fps_path)

    wrapped, stop_event, batch_lock = _cooperative(_once)
    q = (
        stream.writeStream.foreachBatch(wrapped)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q._graft_stop_event = stop_event
    q._graft_batch_lock = batch_lock
    return q
