"""Continuous ingest dedup: batch kernel semantics + real-stream run
with a growing index (batch-vs-stream parity)."""

from __future__ import annotations

import pandas as pd

from pagerank_mapreduce_spark.streaming.dedup_ingest import (
    ingest_batch,
    start_dedup_ingest,
)

SEED = [(1, "the quick brown fox jumps over the lazy dog")]
B1 = [
    (10, "the quick brown fox jumps over the lazy dog today"),  # ~index
    (11, "completely different words about spark streaming pipelines"),
    (12, "completely different words about spark streaming pipelines extra"),
]
B2 = [
    (20, "completely different words about spark streaming pipelines again"),
    (21, "unique second batch content entirely novel tokens here"),
]
SCHEMA = "doc_id bigint, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_ingest_batch_rejects_index_and_sibling_dups(spark):
    out = ingest_batch(_df(spark, B1), _df(spark, SEED))
    assert sorted(r.doc_id for r in out.collect()) == [11]


def test_ingest_batch_empty_index_keeps_first_sibling(spark):
    out = ingest_batch(_df(spark, B1), _df(spark, []))
    # no index: 10 is unique, 11 beats its larger-id near-copy 12
    assert sorted(r.doc_id for r in out.collect()) == [10, 11]


def test_stream_ingest_grows_index_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    import os
    import time

    pd.DataFrame(B1, columns=["doc_id", "text"]).to_parquet(src / "b1.parquet")
    pd.DataFrame(B2, columns=["doc_id", "text"]).to_parquet(src / "b2.parquet")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = start_dedup_ingest(
        stream,
        _df(spark, SEED),
        str(tmp_path / "accepted"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "accepted")).collect()
    )
    # 10 dups the seed; 12 dups sibling 11; 20 dups the batch-1
    # ACCEPTED doc 11 (the growing-index property); 21 is novel
    assert got == [11, 21]

    # kappa parity: the same two batches driven as plain batch calls
    acc1 = ingest_batch(_df(spark, B1), _df(spark, SEED))
    idx2 = _df(spark, SEED).unionByName(acc1.select("doc_id", "text"))
    acc2 = ingest_batch(_df(spark, B2), idx2)
    batch_got = sorted(
        r.doc_id for r in acc1.unionByName(acc2).collect()
    )
    assert batch_got == got


# ----------------------------- paragraph-granularity ingest (r8)

P1 = [
    (10, "intro\n\nshared boiler\n\nalpha facts"),
    (11, "intro\n\nbeta facts"),  # "intro" loses to doc 10 in-batch
]
P2 = [
    (20, "shared boiler\n\ngamma facts"),  # boiler known from batch 1
    (21, "delta facts\n\ndelta facts"),  # self-repeat admits once
]


def test_paragraph_ingest_batch_semantics(spark):
    from pagerank_mapreduce_spark.streaming.dedup_ingest import (
        paragraph_ingest_batch,
    )

    empty = spark.createDataFrame([], "fp string")
    acc1, fps1 = paragraph_ingest_batch(_df(spark, P1), empty)
    got1 = {r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
            for r in acc1.collect()}
    assert got1[10] == ("intro\n\nshared boiler\n\nalpha facts", 3, 0)
    assert got1[11] == ("beta facts", 1, 1)
    assert fps1.count() == 4  # intro, boiler, alpha, beta

    acc2, fps2 = paragraph_ingest_batch(_df(spark, P2), fps1)
    got2 = {r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
            for r in acc2.collect()}
    assert got2[20] == ("gamma facts", 1, 1)
    assert got2[21] == ("delta facts", 1, 1)
    assert fps2.count() == 2  # gamma, delta


def test_stream_paragraph_ingest_matches_corpus_dedup(spark, tmp_path):
    import os
    import time

    from pagerank_mapreduce_spark.operators.dedup import paragraph_dedup
    from pagerank_mapreduce_spark.streaming.dedup_ingest import (
        start_paragraph_ingest,
    )

    src = tmp_path / "psrc"
    src.mkdir()
    pd.DataFrame(P1, columns=["doc_id", "text"]).to_parquet(src / "b1.parquet")
    pd.DataFrame(P2, columns=["doc_id", "text"]).to_parquet(src / "b2.parquet")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = start_paragraph_ingest(
        stream,
        str(tmp_path / "paccepted"),
        str(tmp_path / "pfps"),
        str(tmp_path / "pckpt"),
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["text"], r["n_kept"], r["n_dropped"])
        for r in spark.read.parquet(str(tmp_path / "paccepted")).collect()
    )
    # kappa parity: ids are monotone across batches, so the stream
    # must equal corpus-wide paragraph_dedup over all four docs
    expect = sorted(
        (r["doc_id"], r["text"], r["n_kept"], r["n_dropped"])
        for r in paragraph_dedup(_df(spark, P1 + P2)).collect()
    )
    assert got == expect


def test_cooperative_stop_wrapper_semantics():
    # the _cooperative wrapper is what lets stop_ingest() guarantee a
    # mid-flight index append is never interrupted: batches started
    # before the stop flag run to completion under the lock; batches
    # arriving after the flag no-op. Pure-Python check of both
    # properties plus stop_ingest's wait-for-lock behavior on a
    # query stub.
    import threading
    import time as _t

    from pagerank_mapreduce_spark.streaming.dedup_ingest import (
        _cooperative,
        stop_ingest,
    )

    ran = []
    release = threading.Event()

    def body(df, bid):
        ran.append(bid)
        release.wait(10)

    wrapped, stop_event, batch_lock = _cooperative(body)

    t = threading.Thread(target=wrapped, args=(None, 0))
    t.start()
    for _ in range(100):  # wait until batch 0 is inside the body
        if ran:
            break
        _t.sleep(0.02)
    assert ran == [0]

    class _Q:
        stopped = False

        def stop(self):
            self.stopped = True

    q = _Q()
    q._graft_stop_event = stop_event
    q._graft_batch_lock = batch_lock

    stopper = threading.Thread(target=stop_ingest, args=(q,))
    stopper.start()
    _t.sleep(0.2)
    # the in-flight batch holds the lock: stop must still be waiting
    assert not q.stopped
    release.set()  # batch 0's append completes
    stopper.join(10)
    assert q.stopped  # ...and only then was the query stopped
    wrapped(None, 1)  # post-stop batch no-ops
    assert ran == [0]
