"""Kafka source/sink — the reference's flagship connector, availability-gated.

Reference semantics (/root/reference/internal/impl/kafka/input_sarama_kafka.go:26,
46-50; output_kafka.go): consumer-group input with `checkpoint_limit`
bounding in-flight messages, topic/partition metadata on every message, and
a keyed producer output.

Spark-first mapping:
- input  -> `readStream.format("kafka")`: offsets live in the CHECKPOINT
  (Spark's WAL replaces the reference's consumer-group commit + ack chain;
  `checkpoint_limit` ≡ `maxOffsetsPerTrigger` — both bound the un-committed
  window). topic/partition/offset/timestamp arrive as columns, the payload
  as `value binary` — parse with from_json/avro_decode downstream.
- output -> foreachBatch `write.format("kafka")` with an optional key
  expression; combined with checkpointing this is at-least-once into Kafka
  (exactly-once into Kafka needs its transactions — out of scope, like the
  reference).

The kafka connector jar (`spark-sql-kafka-0-10`) is an optional --packages
dependency and absent in this sandbox, so everything here raises a clear
error naming the package when unavailable; the YAML compiler gates on
`kafka_available` the same way the Iceberg path gates on its runtime.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bento_spark.gating import classpath_available, require_classpath

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
_KAFKA_CLASS = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def kafka_available(spark: SparkSession) -> bool:
    return classpath_available(spark, _KAFKA_CLASS)


def _require(spark: SparkSession, what: str) -> None:
    require_classpath(spark, _KAFKA_CLASS, KAFKA_PACKAGE, what)


def read_kafka_stream(
    spark: SparkSession,
    addresses: Sequence[str],
    topics: Sequence[str],
    starting_offsets: str = "earliest",
    checkpoint_limit: int | None = None,
    value_schema: str | None = None,
    value_format: str = "json",
    include_headers: bool = False,
) -> DataFrame:
    """Streaming Kafka source. Output columns: kafka_key, kafka_topic,
    kafka_partition, kafka_offset, kafka_ts (+ parsed payload columns when
    value_schema is given, else `value binary`) — mirroring the metadata the
    reference attaches per message (input_sarama_kafka.go kafka_* meta).
    """
    _require(spark, "kafka input")
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", ",".join(addresses))
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
    )
    if checkpoint_limit is not None:
        # reference checkpoint_limit bounds un-acked in-flight messages; the
        # Spark analogue bounds un-committed offsets per micro-batch
        r = r.option("maxOffsetsPerTrigger", int(checkpoint_limit))
    if include_headers:
        r = r.option("includeHeaders", "true")
    df = r.load().select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_ts"),
        "value",
        *(["headers"] if include_headers else []),
    )
    meta_cols = ["kafka_key", "kafka_topic", "kafka_partition", "kafka_offset", "kafka_ts"] + (
        ["headers"] if include_headers else []
    )
    if value_schema is not None:
        if value_format == "json":
            parsed = F.from_json(F.col("value").cast("string"), value_schema)
        elif value_format == "avro":
            from bento_spark.operators.codec import avro_decode  # noqa: F401

            return avro_decode(df, "value", value_schema, out_col="record").select(
                *meta_cols, "record.*"
            )
        else:
            raise ValueError(f"unsupported kafka value_format: {value_format}")
        df = df.withColumn("_rec", parsed).select(*meta_cols, "_rec.*")
    return df


def kafka_sink(
    spark: SparkSession,
    addresses: Sequence[str],
    topic: str,
    key_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: rows are serialized as JSON values (the
    reference output's default codec) with an optional key column."""
    _require(spark, "kafka output")
    servers = ",".join(addresses)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # the FULL message is the value — the key is projected separately,
        # not carved out of the payload (the reference's kafka output
        # serializes the whole message and takes the key from an
        # interpolated field: internal/impl/kafka/output_sarama_kafka.go:347)
        out = batch_df.select(
            *([F.col(key_col).cast("string").alias("key")] if key_col else []),
            F.to_json(F.struct(*[F.col(c) for c in batch_df.columns])).alias("value"),
        )
        (
            out.write.format("kafka")
            .option("kafka.bootstrap.servers", servers)
            .option("topic", topic)
            .save()
        )

    return write_batch
