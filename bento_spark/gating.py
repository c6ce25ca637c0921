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


# object-store path gating (reference connector families internal/impl/aws/,
# gcp/, azure/): the engine's file inputs/outputs take object-store URLs
# directly (s3a://bucket/key, gs://bucket/key) — the Spark-native shape of
# the reference's aws_s3 / gcp_cloud_storage / azure_blob_storage
# connectors. Hadoop filesystem jars are optional: fail fast, name the
# package, never deep inside a Spark scan.
_OBJECT_STORES = {
    "s3a": ("org.apache.hadoop.fs.s3a.S3AFileSystem", "org.apache.hadoop:hadoop-aws"),
    "s3n": ("org.apache.hadoop.fs.s3a.S3AFileSystem", "org.apache.hadoop:hadoop-aws"),
    "s3": ("org.apache.hadoop.fs.s3a.S3AFileSystem", "org.apache.hadoop:hadoop-aws"),
    "gs": (
        "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
        "com.google.cloud.bigdataoss:gcs-connector",
    ),
    "abfs": ("org.apache.hadoop.fs.azurebfs.AzureBlobFileSystem", "org.apache.hadoop:hadoop-azure"),
    "abfss": ("org.apache.hadoop.fs.azurebfs.AzureBlobFileSystem", "org.apache.hadoop:hadoop-azure"),
    "wasb": ("org.apache.hadoop.fs.azure.NativeAzureFileSystem", "org.apache.hadoop:hadoop-azure"),
    "wasbs": ("org.apache.hadoop.fs.azure.NativeAzureFileSystem", "org.apache.hadoop:hadoop-azure"),
}


def require_object_store(spark: SparkSession, path: str) -> str:
    """Gate an input/output path on its filesystem scheme; returns the path
    (s3:// normalized to s3a:// — the maintained Hadoop S3 connector).
    Local paths and file:// pass through untouched."""
    if "://" not in str(path):
        return path
    scheme = str(path).split("://", 1)[0].lower()
    spec = _OBJECT_STORES.get(scheme)
    if spec is None:
        return path  # file://, hdfs://, or anything Spark handles natively
    class_name, package = spec
    require_classpath(spark, class_name, package, f"{scheme}:// object-store path")
    if scheme == "s3":
        return "s3a://" + str(path).split("://", 1)[1]
    return path
