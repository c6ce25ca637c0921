"""Expression layer: the Bloblang-subset -> Catalyst Column compiler."""

from bento_spark.functions.bloblang import compile_expr, compile_mapping

__all__ = ["compile_expr", "compile_mapping"]
