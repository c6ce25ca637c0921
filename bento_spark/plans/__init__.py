"""YAML pipeline compiler: Bento-shaped configs -> DataFrame DAGs."""

from bento_spark.plans.compiler import Pipeline, compile_yaml

__all__ = ["Pipeline", "compile_yaml"]
