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

Everything is DataFrame-first: logical plans are declared with the
DataFrame/SQL API and Catalyst/Tungsten choose the physical strategy.
"""

from pagerank_mapreduce_spark.graph import out_degrees, pagerank, websize
from pagerank_mapreduce_spark.graph.io import format_ranks, ranks_close
from pagerank_mapreduce_spark.session import get_spark
from pagerank_mapreduce_spark.sources.edges import read_edge_list
from pagerank_mapreduce_spark.sources.tables import load_table

__all__ = [
    "format_ranks",
    "get_spark",
    "load_table",
    "out_degrees",
    "pagerank",
    "ranks_close",
    "read_edge_list",
    "websize",
]
__version__ = "0.1.0"
