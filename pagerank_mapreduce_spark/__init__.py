"""pagerank_mapreduce_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark implementation of the query and
data-processing capabilities of the reference MapReduce PageRank
project (harsh-apcr/Pagerank-MapReduce):

- ``graph``     — PageRank pipeline (reference semantics: mr-pr-cpp.cpp:110-180)
- ``sources``   — edge-list reader (mr-pr-cpp.cpp:89-108), parquet tables
- ``operators`` — the MapReduce operator algebra (MR-MPI src/mapreduce.h:59-127)
                  re-expressed as DataFrame transformations, plus
                  dedup / similarity operators for training-data pipelines
- ``functions`` — text analysis and vector helpers (built-in-function based)
- ``streaming`` — Structured Streaming over the events table
- ``plans``     — physical-plan audit (pushdown / pruning / shuffle assertions)

Everything is DataFrame-first: logical plans are declared with the
DataFrame/SQL API and Catalyst/Tungsten choose the physical strategy.
"""

from pagerank_mapreduce_spark.functions.text import chunk_tokens
from pagerank_mapreduce_spark.graph import out_degrees, pagerank, websize
from pagerank_mapreduce_spark.graph.io import format_ranks, ranks_close
from pagerank_mapreduce_spark.operators.asof import asof_join, range_join
from pagerank_mapreduce_spark.operators.dedup import exact_dedup, minhash_dedup
from pagerank_mapreduce_spark.operators.sessions import (
    sessionize,
    stratified_sample,
)
from pagerank_mapreduce_spark.session import get_spark
from pagerank_mapreduce_spark.sources.bucketed import read_bucketed, write_bucketed
from pagerank_mapreduce_spark.sources.edges import read_edge_list
from pagerank_mapreduce_spark.sources.tables import load_table

__all__ = [
    "asof_join",
    "chunk_tokens",
    "exact_dedup",
    "format_ranks",
    "get_spark",
    "load_table",
    "minhash_dedup",
    "out_degrees",
    "pagerank",
    "range_join",
    "ranks_close",
    "read_bucketed",
    "read_edge_list",
    "sessionize",
    "stratified_sample",
    "websize",
    "write_bucketed",
]
__version__ = "0.1.0"
