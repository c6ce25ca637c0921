"""Shared availability gates for optional Spark classpath components.

Kafka / avro / protobuf / JDBC connectors all depend on jars that are
optional --packages/--jars and absent in some environments (including this
sandbox). Every gated entrypoint fails FAST with an error naming the
missing coordinate, never deep inside Spark analysis. Probe results are
memoized per (JVM, class): gates sit on per-call entrypoints and a
Class.forName round-trip per call is waste.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_PROBES: dict[tuple[int, str], bool] = {}


def classpath_available(spark: SparkSession, class_name: str) -> bool:
    key = (id(spark._jvm), class_name)
    hit = _PROBES.get(key)
    if hit is None:
        try:
            spark._jvm.java.lang.Class.forName(class_name)
            hit = True
        except Exception:
            hit = False
        _PROBES[key] = hit
    return hit


def require_classpath(spark: SparkSession, class_name: str, package: str, what: str) -> None:
    if not classpath_available(spark, class_name):
        raise RuntimeError(
            f"{what} requires the {package} package on the Spark classpath; "
            f"launch with --packages {package} (provides {class_name})"
        )
