"""Iceberg exactly-once sink — the production path of the north rule.

The sandbox has no iceberg-spark-runtime jar, so this module self-detects
availability: `iceberg_available(spark)` is False here and the engine falls
back to `IdempotentParquetSink` (identical contract: idempotent per-epoch
commit + last-writer-wins MERGE by key). On a real cluster, launch with

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=s3://bucket/warehouse ...

and `IcebergMergeSink` becomes live.

Exactly-once recipe (standard Structured Streaming + Iceberg pattern):
- Spark's checkpoint (offset/commit logs) guarantees each micro-batch is
  replayed with the SAME epoch_id after failure;
- an `_epochs` bookkeeping table records committed (sink_id, epoch_id) so a
  replayed epoch is detected and skipped. NOTE the `_epochs` INSERT is a
  SEPARATE statement from the data write (two Iceberg commits, not one
  transaction) — the guard is an optimization, not the correctness proof;
- keyed mode: `MERGE INTO ... ON <key> WHEN MATCHED UPDATE ALL WHEN NOT
  MATCHED INSERT ALL` keyed on (clip_id, window_start) per the north rule —
  the MERGE itself is idempotent, so a crash between the MERGE and the
  `_epochs` INSERT replays harmlessly: exactly-once by idempotent replay;
- append mode (no key): each batch carries an `_epoch_id` column and replay
  first runs `DELETE FROM table WHERE _epoch_id = <epoch>` before
  re-appending — the replayed epoch converges to exactly one copy. A reader
  that races the DELETE+append window can observe the epoch missing/partial
  (Iceberg snapshots make each statement atomic, but the pair is not); for
  strict snapshot-atomic appends use Iceberg WAP (write-audit-publish)
  branch commits instead.

Reference parity: the reference is at-least-once via transaction acks
(/root/reference/internal/message/transaction.go:20-38); this sink is the
'exceed the reference' half of the north rule.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergMergeSink:
    """foreachBatch sink: MERGE INTO an Iceberg table with an epoch guard.

    table:    fully qualified Iceberg identifier, e.g. 'lake.db.windows'
    key_cols: MERGE key, e.g. ('clip_id', 'window_start'); None = append
    """

    def __init__(self, spark: SparkSession, table: str, key_cols: Sequence[str] | None = None,
                 epochs_table: str | None = None):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use IdempotentParquetSink "
                "(same contract) or launch with --packages iceberg-spark-runtime"
            )
        self.spark = spark
        self.table = table
        self.key_cols = list(key_cols) if key_cols else None
        self.epochs_table = epochs_table or f"{table}_epochs"
        self.sink_id = table
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.epochs_table} "
            "(sink_id STRING, epoch_id BIGINT, rows BIGINT) USING iceberg"
        )

    def _already_committed(self, epoch_id: int) -> bool:
        n = self.spark.sql(
            f"SELECT count(*) AS n FROM {self.epochs_table} "
            f"WHERE sink_id = '{self.sink_id}' AND epoch_id = {int(epoch_id)}"
        ).collect()[0].n
        return n > 0

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self._already_committed(epoch_id):
            return  # replayed micro-batch: already applied (guard fast-path)
        spark = batch_df.sparkSession
        from pyspark.sql import functions as F

        if not self.key_cols:
            batch_df = batch_df.withColumn("_epoch_id", F.lit(int(epoch_id)))
        # materialize ONCE: the MERGE/append and the row count would
        # otherwise each re-execute the micro-batch plan
        batch_df = batch_df.persist()
        # per-sink/per-epoch view name: a FIXED name would let concurrent
        # write_batch calls in one session (main + DLQ sinks, per-case
        # sinks) replace each other's source between registration and the
        # MERGE, merging sink B's rows into sink A's table
        import re as _re

        view = f"_bento_batch_{_re.sub(r'[^A-Za-z0-9_]', '_', self.table)}_{int(epoch_id)}"
        try:
            n = batch_df.count()
            batch_df.createOrReplaceTempView(view)
            if not spark.catalog.tableExists(self.table):
                batch_df.writeTo(self.table).using("iceberg").create()
            elif self.key_cols:
                # idempotent by construction: replay re-MERGEs the same keys
                on = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
                spark.sql(
                    f"MERGE INTO {self.table} t USING {view} s ON {on} "
                    "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
                )
            else:
                # idempotent replay for appends: remove any partial copy of
                # this epoch first (crash between append and the guard INSERT
                # would otherwise duplicate the batch)
                spark.sql(f"DELETE FROM {self.table} WHERE _epoch_id = {int(epoch_id)}")
                batch_df.writeTo(self.table).append()
            spark.sql(
                f"INSERT INTO {self.epochs_table} VALUES "
                f"('{self.sink_id}', {int(epoch_id)}, {int(n)})"
            )
        finally:
            batch_df.unpersist()

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        return self.write_batch

    def read(self) -> DataFrame:
        return self.spark.read.table(self.table)

    def output_sent(self) -> int:
        return int(
            self.spark.sql(
                f"SELECT coalesce(sum(rows), 0) AS n FROM {self.epochs_table} "
                f"WHERE sink_id = '{self.sink_id}'"
            ).collect()[0].n
        )


def read_clips_stream(spark: SparkSession, table: str, stream_from: str | None = None) -> DataFrame:
    """The north-rule source: an Iceberg table streamed incrementally.

    spark.readStream.format('iceberg') consumes snapshot appends; pass
    stream_from='<snapshot-id>' to resume-from-snapshot explicitly (the
    checkpoint normally owns this).
    """
    r = spark.readStream.format("iceberg")
    if stream_from:
        # snapshot id, per the docstring — 'stream-from-timestamp' would
        # read the id as epoch-ms and silently start past every snapshot
        r = r.option("start-snapshot-id", stream_from)
    return r.load(table)
