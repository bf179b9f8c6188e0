"""tantivy_spark — a from-scratch PySpark-native inverted-index builder and
BM25 top-k query engine with tantivy's (paradedb fork) indexing and ranking
semantics. See SURVEY.md for the blueprint and reference citations."""

from tantivy_spark.config import IndexConfig
from tantivy_spark.operators.build import build_index, load_manifest
from tantivy_spark.operators.merge import (
    LogMergePolicy,
    delete_term,
    garbage_collect,
    maybe_merge,
    merge_segments,
)
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as queries
from tantivy_spark.plans.parser import QueryParser
from tantivy_spark.writer import Index, IndexWriter

__all__ = [
    "IndexConfig", "build_index", "load_manifest", "Searcher", "queries",
    "QueryParser", "Index", "IndexWriter", "LogMergePolicy", "delete_term",
    "merge_segments", "maybe_merge", "garbage_collect",
]
__version__ = "0.1.0"
