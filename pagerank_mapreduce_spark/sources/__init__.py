from pagerank_mapreduce_spark.sources.edges import (
    EDGE_LINE_REGEX,
    derive_edges,
    read_edge_list,
)
from pagerank_mapreduce_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = [
    "EDGE_LINE_REGEX",
    "read_edge_list",
    "derive_edges",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
]
