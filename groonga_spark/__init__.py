"""groonga_spark — a PySpark-native fulltext analytics engine.

A from-scratch re-expression of Groonga's inverted-index core + query
surface (reference: AkioKanno/groonga 5.0.4, surveyed in SURVEY.md) in
idiomatic PySpark: DataFrame plans, Arrow-vectorized UDF kernels only where
built-ins can't express the semantics, explicit partitioning/salting for
the 100 TB-scale shuffle paths.
"""

from . import encoding, normalize, scoring, tokenize  # noqa: F401
from .index.build import InvertedIndex, build_index  # noqa: F401
from .query.engine import SearchEngine  # noqa: F401

__version__ = "0.1.0"
