"""Processor library: Spark-first re-creations of the reference's processors.

Each module cites the reference component it re-creates (file:line under
/root/reference). The implementations are declarative DataFrame transforms
so Catalyst keeps pushdown/pruning/codegen; Python only appears in
Arrow-batched UDF stages.
"""

from bento_spark.operators import batching, dedupe_fuzzy, enrich, errors, grouping, mapping, similarity, skew, switch, text

__all__ = [
    "batching",
    "dedupe_fuzzy",
    "enrich",
    "errors",
    "grouping",
    "mapping",
    "similarity",
    "skew",
    "switch",
    "text",
]
