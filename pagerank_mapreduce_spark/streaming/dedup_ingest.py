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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pagerank_mapreduce_spark.operators.dedup import (
    minhash_dedup,
    minhash_incremental_pairs,
)

__all__ = ["ingest_batch", "start_dedup_ingest"]


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
    **lsh_kwargs,
):
    """Run the ingest loop: per micro-batch, dedup against
    seed_index ∪ previously-accepted and append survivors to
    ``accepted_path``. Returns the StreamingQuery."""
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

    return (
        stream.writeStream.foreachBatch(_once)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
