"""SparkSession factory with scale-oriented defaults.

The reference engines hand-tune page sizes, spill paths and all-to-all
flow control (MR-MPI doc/settings.txt); on Spark the equivalents are
AQE, shuffle-partition sizing and Arrow-batched Python interop, set
once here so every entry point (tests, bench, driver) agrees.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "pagerank-mapreduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults are chosen for correctness at local[*] test scale while
    staying valid on a large cluster:

    - AQE on: runtime partition coalescing + skew-join splitting
      (replaces MR-MPI's hand-rolled flow control / scale-back loop,
      src/mapreduce.cpp:472-517).
    - Arrow on: Pandas UDF batches cross the Python boundary
      columnar, never row-at-a-time.
    - shuffle partitions sized from the available cores locally; a
      real cluster overrides via spark.sql.shuffle.partitions or AQE.

    MR-MPI settings (src/mapreduce.h:28-41, doc/settings.txt) → Spark
    conf mapping, for operators porting tuned jobs:

    ==================  =================================================
    MR-MPI setting      Spark equivalent
    ==================  =================================================
    mapstyle 0/1/2      task scheduler (built-in; 2≈dynamic allocation)
    all2all             shuffle implementation (sort-based; not a knob)
    memsize             spark.memory.fraction / executor memory sizing
    minpage/maxpage     spark.sql.files.maxPartitionBytes (input side),
                        spark.sql.shuffle.partitions (shuffle side)
    outofcore           automatic (UnsafeExternalSorter spills)
    zeropage            n/a (JVM zeroes allocations)
    keyalign/valuealign n/a (Tungsten rows are 8-byte aligned already)
    fpath               spark.local.dir
    verbosity/timer     Spark UI / event log / SparkListener
    ==================  =================================================
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python side of the handshake timeout (see the JVM conf below);
    # the worker daemon inherits this env in local mode. setdefault so
    # an explicit caller/CI value wins.
    os.environ.setdefault("SPARK_AUTH_SOCKET_TIMEOUT", "120")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bound plan-string rendering: an interrupted streaming
        # teardown otherwise stringifies + regex-redacts a multi-MB
        # plan on the stream-execution thread (observed as a
        # java.util.regex StackOverflowError dumped into test logs —
        # cosmetic but it buries real failures). Truncating the
        # rendered plan and field lists keeps teardown logs readable;
        # no effect on execution, only on log/UI strings.
        .config("spark.sql.debug.maxToStringFields", "25")
        .config("spark.sql.maxPlanStringLength", "100000")
        .config("spark.sql.maxMetadataStringLength", "200")
        # Python-worker handshake timeout: both sides of the
        # worker<->JVM connect-back default to 15 s (JVM accept:
        # spark.python.authenticate.socketTimeout; Python connect:
        # SPARK_AUTH_SOCKET_TIMEOUT read in util.py). On an
        # oversubscribed host (the 9-JVM concurrent test layout) a
        # fresh worker spawn — especially transformWithStateInPandas,
        # which adds a state-server socket per worker — can exceed
        # 15 s of scheduler delay and fail the stream with
        # CANNOT_OPEN_SOCKET / "Python worker failed to connect
        # back". 120 s changes nothing on a healthy host (the accept
        # completes in ms) and removes the spurious failure mode.
        .config("spark.python.authenticate.socketTimeout", "120s")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
