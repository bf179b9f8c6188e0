"""tantivy_spark — a from-scratch PySpark-native inverted-index builder and
BM25 top-k query engine with tantivy's (paradedb fork) indexing and ranking
semantics. See SURVEY.md for the blueprint and reference citations."""

from tantivy_spark.config import IndexConfig
from tantivy_spark.operators.build import build_index, load_manifest
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as queries

__all__ = ["IndexConfig", "build_index", "load_manifest", "Searcher", "queries"]
__version__ = "0.1.0"
