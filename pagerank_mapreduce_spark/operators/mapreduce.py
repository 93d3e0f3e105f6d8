"""The MapReduce operator algebra, re-expressed on DataFrames.

The reference's capability surface is the operator set of its two
vendored engines — MR-MPI (mapreduce-7Apr14/src/mapreduce.h:59-127)
and cdmh/mapreduce (include/detail/job.hpp) — whose data model is
(key, value) pair streams grouped into (key, multivalue) sets. On
Spark the idiomatic carrier is a DataFrame with arbitrary schema; the
"key" is whatever column(s) you group/partition by. These wrappers
keep the reference's operator names and semantics while lowering to
the DataFrame primitives Catalyst can optimize:

====================  ========================================
MR-MPI op             Spark lowering
====================  ========================================
map (v1 task fan)     spark.range(n) + mapInPandas
map (v5 KV iterate)   mapInPandas / select (narrow, pipelined)
aggregate(hash)       repartition(n, key)   [Exchange(Hash)]
convert()             partition-local group (mapInPandas)
collate(hash)         groupBy(key).agg(collect_list)
compress(func)        partition-local reduce (map-side combine)
clone()               array(value) singleton multivalue
collapse(key)         per-partition collect_list(struct(k,v))
gather(n)             coalesce(n)
broadcast(root)       F.broadcast (broadcast-hash-join side)
add(mr2)              unionAll
sort_keys             orderBy / sortWithinPartitions
sort_values           orderBy(value)
sort_multivalues      array_sort inside the group
scan(func)            foreachPartition (read-only)
print(kflag,vflag)    typed format_string dump (print_kv)
kv_stats              count + per-partition histogram
====================  ========================================

Scale notes: ``collate``/``collapse`` materialize per-key or
per-partition lists and are skew-fragile by construction (exactly
like MR-MPI's multi-block KMVs, src/mapreduce.cpp:1784-1830, which
exist because hot keys outgrow memory pages). Algebraic aggregation
(``compress`` → sum/count/...) gets automatic map-side partial
aggregation and is the scale path; prefer it whenever the reduce
function is associative — Catalyst cannot partial-aggregate a
``collect_list``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------- map


def mr_map_tasks(
    spark: SparkSession,
    nmap: int,
    func: Callable[[int], Iterator[tuple]],
    schema: str,
) -> DataFrame:
    """MR-MPI map() variant 1 (src/mapreduce.cpp:1009-1150): run
    ``nmap`` generator tasks distributed over the cluster, each
    emitting rows. Task→executor assignment is Spark's scheduler
    (the dynamic analogue of mapstyle=2 master/slave)."""

    # parse the DDL properly — a comma-split would misread types that
    # contain commas themselves (decimal(10,2), map<k,v>, struct<...>)
    from pyspark.sql.types import StructType

    cols = [f.name for f in StructType.fromDDL(schema).fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [row for task_id in pdf["id"] for row in func(int(task_id))]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(nmap).repartition(nmap).mapInPandas(run, schema)


def mr_map(
    df: DataFrame,
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """MR-MPI map() variant 5 — iterate an existing KV set, emit new
    rows (src/mapreduce.cpp:1455-1541). Arrow-batched; prefer plain
    ``select`` with built-in functions when the transform is
    expressible — this exists for genuinely imperative callbacks."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield func(pdf)

    return df.mapInPandas(run, schema)


# ---------------------------------------------- shuffle / group family


def aggregate(df: DataFrame, *key: str, num_partitions: int | None = None) -> DataFrame:
    """MR-MPI aggregate(hash) (src/mapreduce.cpp:382-536): route all
    copies of a key to one place. Pure Exchange(HashPartitioning);
    MR-MPI's page-at-a-time flow control is Spark shuffle-internal."""
    if num_partitions:
        return df.repartition(num_partitions, *key)
    return df.repartition(*key)


def convert(df: DataFrame, key: str, value: str) -> DataFrame:
    """MR-MPI convert() (src/keymultivalue.cpp:486-638): **partition-
    local** KV→KMV grouping, zero communication. Returns
    (key, values ARRAY) per distinct key *per partition* — apply
    after :func:`aggregate` to reproduce ``collate``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            g = pdf.groupby(key, sort=False)[value].agg(list).reset_index()
            g.columns = [key, "values"]
            yield g

    ktype = dict(df.dtypes)[key]
    vtype = dict(df.dtypes)[value]
    return df.mapInPandas(run, f"{key} {ktype}, values array<{vtype}>")


def mr_reduce(
    df: DataFrame,
    key: str,
    func: Callable[[object, pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """MR-MPI reduce(func) (src/mapreduce.cpp:1688-1777): call a user
    callback per (key, all values) group, emitting 0..n new rows — a
    per-group UDTF. ``func(key_value, group_pdf) -> pd.DataFrame``.

    Spark-first caveat: the whole group is materialized in one pandas
    frame (``applyInPandas`` semantics), so a skewed key can OOM one
    executor. Prefer algebraic ``groupBy().agg`` when the callback is
    expressible, or :func:`mr_reduce_blocks` — the analogue of the
    reference's block API for larger-than-memory groups."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return func(pdf[key].iloc[0], pdf)

    return df.groupBy(key).applyInPandas(run, schema)


def mr_reduce_blocks(
    df: DataFrame,
    key: str,
    func: Callable[[object, Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    schema: str,
) -> DataFrame:
    """MR-MPI multivalue_blocks iteration (src/mapreduce.cpp:1784-1830,
    ``doc/reduce.txt`` "nvalues=0 sentinel"): when a group exceeds one
    page, the reference streams it to the reduce callback block by
    block. Spark analogue: shuffle rows to their key's partition, sort
    within the partition, then stream Arrow batches — the callback
    receives ``(key_value, iterator of pd.DataFrame blocks)`` and
    yields result frames. At no point is a whole group materialized:
    memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
    regardless of group size, which is what makes a power-law hot key
    survivable where :func:`mr_reduce` would OOM."""
    import itertools

    part = df.repartition(key).sortWithinPartitions(key)

    def pieces(batches: Iterator[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf[key]
            # boundaries where the (sorted) key changes inside a batch
            change = keys.ne(keys.shift()).to_numpy().nonzero()[0]
            bounds = list(change) + [len(pdf)]
            for s, e in zip(bounds, bounds[1:]):
                yield keys.iloc[s], pdf.iloc[s:e]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for k, grp in itertools.groupby(pieces(batches), lambda t: t[0]):
            yield from func(k, (block for _, block in grp))

    return part.mapInPandas(run, schema)


def collate(df: DataFrame, key: str | Column, value: str | Column, sort: bool = False) -> DataFrame:
    """MR-MPI collate() = aggregate + convert (src/mapreduce.cpp:683-706):
    full shuffled group-by producing (key, values ARRAY)."""
    agg = F.collect_list(value)
    if sort:
        agg = F.array_sort(agg)
    return df.groupBy(key).agg(agg.alias("values"))


def compress(df: DataFrame, key: str, value: str, how: str = "sum") -> DataFrame:
    """MR-MPI compress() (src/mapreduce.cpp:717-819): partition-local
    reduce — the classic combiner. In Catalyst this is the automatic
    partial-aggregation half of ``groupBy().agg``; this wrapper makes
    the local-only step explicit and observable (no Exchange in the
    plan)."""

    fns = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
    if how not in fns:
        raise ValueError(f"unsupported combiner {how!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            g = pdf.groupby(key, sort=False)[value].agg(fns[how]).reset_index()
            g.columns = [key, value]
            yield g

    ktype = dict(df.dtypes)[key]
    vtype = "bigint" if how == "count" else dict(df.dtypes)[value]
    return df.mapInPandas(run, f"{key} {ktype}, {value} {vtype}")


def clone(df: DataFrame, value: str) -> DataFrame:
    """MR-MPI clone() (src/mapreduce.cpp:604-625): each value becomes a
    singleton multivalue."""
    return df.withColumn("values", F.array(F.col(value))).drop(value)


def collapse(df: DataFrame) -> DataFrame:
    """MR-MPI collapse() (src/mapreduce.cpp:654-675): per partition,
    the whole KV set becomes ONE row (partition_id, rows ARRAY<STRUCT>)."""
    return (
        df.withColumn("part", F.spark_partition_id())
        .groupBy("part")
        .agg(F.collect_list(F.struct(*df.columns)).alias("rows"))
    )


def scrunch(df: DataFrame, nprocs: int) -> DataFrame:
    """MR-MPI scrunch() = gather + collapse (src/mapreduce.cpp:1980-2005)."""
    return collapse(gather(df, nprocs))


# ------------------------------------------------- movement / set ops


def gather(df: DataFrame, nprocs: int = 1) -> DataFrame:
    """MR-MPI gather(n) (src/mapreduce.cpp:858-1001): concentrate data
    onto n partitions. ``coalesce`` avoids a full shuffle, matching
    the reference's point-to-point sends (no all-to-all)."""
    return df.coalesce(nprocs)


def broadcast_small(df: DataFrame) -> DataFrame:
    """MR-MPI broadcast(root) (src/mapreduce.cpp:542-596): mark a
    (small) dataset for replication to every executor — Spark realizes
    it as the build side of a broadcast hash join."""
    return F.broadcast(df)


def add(df: DataFrame, other: DataFrame) -> DataFrame:
    """MR-MPI add(mr2) (src/mapreduce.cpp:345-371): append pairs —
    union-all (the reference has no dedup semantics)."""
    return df.unionAll(other)


# --------------------------------------------------------------- sort


def sort_keys(df: DataFrame, *key: str, ascending: bool = True, local: bool = False) -> DataFrame:
    """MR-MPI sort_keys (src/mapreduce.cpp:2007-2054). ``local=True``
    reproduces the reference's per-processor sort
    (sortWithinPartitions); default is the global sort users actually
    want (Spark range-partitions + externally sorts, the same
    spill-to-disk merge the reference hand-rolls with Spool runs)."""
    cols = [F.col(k).asc() if ascending else F.col(k).desc() for k in key]
    return df.sortWithinPartitions(*cols) if local else df.orderBy(*cols)


def sort_values(
    df: DataFrame, *value: str, ascending: bool = True, local: bool = False
) -> DataFrame:
    """MR-MPI sort_values (src/mapreduce.cpp:2061-2108): order the KV
    stream by value column(s) — same engine as :func:`sort_keys`, key
    and value being just columns on a DataFrame."""
    return sort_keys(df, *value, ascending=ascending, local=local)


def sort_multivalues(df: DataFrame, values_col: str = "values", ascending: bool = True) -> DataFrame:
    """MR-MPI sort_multivalues (src/mapreduce.cpp:2115-2265): sort
    within each group's value array."""
    arr = F.array_sort(F.col(values_col))
    if not ascending:
        arr = F.reverse(arr)
    return df.withColumn(values_col, arr)


# ---------------------------------------------------- scan / stats


def scan(df: DataFrame, func: Callable) -> None:
    """MR-MPI scan() (src/mapreduce.cpp:1838-1970): read-only visit of
    every pair, no emission."""
    df.foreachPartition(lambda rows: [func(r) for r in rows] and None)


def kv_stats(df: DataFrame) -> DataFrame:
    """MR-MPI kv_stats (src/mapreduce.cpp:2845-2913): global pair count
    plus per-partition distribution (the reference prints per-proc
    histograms)."""
    return (
        df.withColumn("part", F.spark_partition_id())
        .groupBy("part")
        .agg(F.count("*").alias("pairs"))
        .agg(
            F.sum("pairs").alias("total_pairs"),
            F.count("*").alias("partitions"),
            F.min("pairs").alias("min_pairs"),
            F.max("pairs").alias("max_pairs"),
        )
    )


# --------------------------------------------------- typed KV print


def _kv_size(flag: int, col: Column) -> Column:
    """Byte width MR-MPI would report for a pair element under the
    given format flag (keyvalue.cpp:771-772): fixed-width for numeric
    flags, strlen+1 (C string incl. NUL) for strings."""
    widths = {0: 0, 1: 4, 2: 8, 3: 4, 4: 8, 6: 8, 7: 16}
    if flag == 5:
        return (F.length(col) + 1).cast("int")
    return F.lit(widths[flag])


def _kv_uint64(col: Column) -> Column:
    """Render a BIGINT as C's %lu would render the same 64 bits:
    values with the sign bit set print as their unsigned
    reinterpretation (conv() treats the hex digits as unsigned).
    NULL renders as the string 'null', matching what format_string
    (Java %d) produces for the signed flags — without the coalesce,
    flag 2 would propagate NULL into the whole line and flag 7's
    concat_ws would silently drop the element."""
    return F.coalesce(F.conv(F.hex(col), 16, 10), F.lit("null"))


def _kv_fmt(flag: int, col: Column) -> Column:
    """Formatted element per MR-MPI flag (keyvalue.cpp:790-815):
    0=NULL, 1=int %d, 2=uint64 %lu, 3=float %g, 4=double %g,
    5=string %s, 6=int pair, 7=uint64 pair. Flags 6/7 expect a
    2-element array column. Java's %g keeps trailing zeros where C's
    strips them — a cosmetic deviation, same as format_ranks notes.
    The uint64 flags (2 and 7) reinterpret the sign bit like C's %lu
    does, so a high-bit hash prints as its unsigned value."""
    if flag == 0:
        return F.lit("NULL")
    if flag == 7:
        return F.concat_ws(
            " ", _kv_uint64(col.getItem(0)), _kv_uint64(col.getItem(1))
        )
    if flag == 6:
        return F.format_string("%d %d", col.getItem(0), col.getItem(1))
    if flag in (3, 4):
        return F.format_string("%g", col)
    if flag == 5:
        return col.cast("string")
    if flag == 2:
        return _kv_uint64(col)
    return F.format_string("%d", col)


def print_kv(
    df: DataFrame,
    kflag: int = 1,
    vflag: int = 1,
    nstride: int = 1,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """MR-MPI typed ``print()`` dump (src/mapreduce.cpp:1566-1686 +
    keyvalue.cpp:758-818): one ``"KV pair: proc P, sizes K V, key X,
    value Y"`` line per (every ``nstride``-th, partition-local, like
    the reference's per-proc istride counter) pair, with key/value
    rendered per the 0-7 format flags.

    Returns the lines as a DataFrame; ``df.write.text(path)`` gives
    MR-MPI's fflag=1 per-proc-files mode (one file per task),
    ``coalesce(1)`` the fflag=0 single-file mode. ``proc`` is the
    Spark partition id. The stride uses the per-partition sequence
    embedded in monotonically_increasing_id (low 33 bits), so no
    shuffle or window is needed."""
    if not (0 <= kflag <= 7 and 0 <= vflag <= 7):
        raise ValueError("Invalid print args")  # mapreduce.cpp:1572-1573
    kv = df.select(
        F.spark_partition_id().alias("_proc"),
        F.monotonically_increasing_id()
        .bitwiseAND(F.lit((1 << 33) - 1))
        .alias("_seq"),
        F.col(key_col).alias("_k"),
        F.col(value_col).alias("_v"),
    )
    if nstride > 1:
        kv = kv.filter(((F.col("_seq") + 1) % nstride) == 0)
    line = F.concat(
        F.format_string(
            "KV pair: proc %d, sizes %d %d, key ",
            F.col("_proc"),
            _kv_size(kflag, F.col("_k")),
            _kv_size(vflag, F.col("_v")),
        ),
        _kv_fmt(kflag, F.col("_k")),
        F.lit(", value "),
        _kv_fmt(vflag, F.col("_v")),
    )
    return kv.select(line.alias("line"))


# ------------------------------------------------- canonical example


def word_frequency(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The MR-MPI word-frequency example (doc/Examples.txt): tokenize,
    count per word. Algebraic agg → map-side combine, skew-safe."""
    return (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def top_k(df: DataFrame, k: int, *order_cols: Column) -> DataFrame:
    """Top-k (the example's "top 10 words"): global order + limit.
    Spark plans this as TakeOrderedAndProject — per-partition heaps,
    no full sort — which is what you want at 100 TB."""
    return df.orderBy(*order_cols).limit(k)


def mr_map_udtf(df: DataFrame, text_col: str = "text") -> DataFrame:
    """MR-MPI map() as a Python USER-DEFINED TABLE FUNCTION — the
    third of Spark's per-row-emit mechanisms this engine demonstrates
    for the reference's map-callback shape (SURVEY.md §2.4;
    mymap_wordfreq in doc/Examples.txt emits one KV per word):
    mapInPandas (mr_map, Arrow-batched — the default), applyInPandas
    (grouped), and this ``@udtf`` (row-at-a-time lateral emit, the
    literal 0..n-emits-per-input contract of the MR-MPI callback,
    src/mapreduce.cpp:1009-1150).

    A UDTF is the SLOW path (per-row Python, no Arrow batching) —
    this exists to pin the API surface with an oracle, not for hot
    paths; the wordfreq family's production shape stays the
    exploded-builtin one (word_frequency)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string")
    class EmitWords:
        def eval(self, text: str):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            for w in text.lower().split():
                if w:
                    yield (w,)

    spark = df.sparkSession
    df.select(F.col(text_col)).createOrReplaceTempView("_udtf_src")
    spark.udtf.register("emit_words", EmitWords)
    return spark.sql(
        "SELECT t.word FROM _udtf_src, LATERAL emit_words(text) t"
    )
