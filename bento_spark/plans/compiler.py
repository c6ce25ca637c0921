"""YAML config -> Pipeline (a DAG of DataFrame transforms).

Re-creates the reference's declarative model — a YAML config declaring
`input -> pipeline.processors -> output`
(/root/reference/internal/config/schema.go:29-40, stream section
internal/stream/config.go:21-24) — compiled to DataFrame transforms
instead of a goroutine chain (stream assembly in the reference:
internal/stream/type.go:100-154). The config IS the logical plan; Catalyst
owns the physical plan.

Config shape (the Bento-shaped subset we support, plus `window` which the
reference expresses as the system_window buffer):

    input:
      generate_clips: {count: 1000, event_step_ms: 100}   # or
      parquet: {path: ..., schema: ...}                    # batch or stream
    pipeline:
      processors:
        - mapping: |
            root.key = this.clip_id.slice(10, 12)
            root = deleted() if this.dur_ms > 60000
        - audio_decode: {}
        - audio_features: {}
        - audio_normalize: {target_sr: 16000}
        - bounds_check: {column: bytes, min: 1}
        - dedupe: {keys: [clip_id], watermark: [event_ts, "10 seconds"]}
        - set_error: {when: "this.sr_hz < 8000", message: "bad sr"}
        - catch: {set: {sr_hz: "16000"}}
        - spread_skew: {cost: dur_ms}
    window:
      type: tumbling            # tumbling | sliding | session
      size: 10 seconds
      slide: 5 seconds          # sliding only
      gap: 30 seconds           # session only
      keys: [key]
      lateness: 2 seconds
      aggs: {n: "count()", total_ms: "sum(dur_ms)"}
    output:
      path: /tmp/out
      keys: [window_start, key]     # exactly-once MERGE key
      dlq: /tmp/dlq                 # errored rows routed here
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

import yaml
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bento_spark.audio.generate import CLIP_SCHEMA, clips_df
from bento_spark.audio.udfs import with_audio_features, with_decoded_pcm, with_normalized_clip
from bento_spark.functions.bloblang import compile_expr, compile_interpolated, compile_mapping
from bento_spark.gating import require_object_store
from bento_spark.operators import errors as err_ops
from bento_spark.operators import grouping, mapping as map_ops, skew
from bento_spark.streaming.sink import IdempotentParquetSink, dlq_split_writer
from bento_spark.streaming.windows import session_windowed, sliding_windowed, tumbling_windowed

_AGG_RE = re.compile(r"^\s*(\w+)\s*\(\s*(.*?)\s*\)\s*$")


def _parse_agg(src: str) -> Column:
    m = _AGG_RE.match(src)
    if not m:
        raise ValueError(f"bad aggregate expression: {src!r}")
    fn, arg = m.group(1).lower(), m.group(2)
    col = compile_expr(arg) if arg else F.lit(1)
    table = {
        "count": lambda c: F.count(F.lit(1)) if not arg else F.count(c),
        "count_distinct": F.countDistinct,
        "approx_count_distinct": F.approx_count_distinct,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "avg": F.avg,
        "mean": F.avg,
        "collect_list": F.collect_list,
        "first": F.first,
        "stddev": F.stddev,
    }
    if fn not in table:
        raise ValueError(f"unsupported aggregate fn: {fn}")
    return table[fn](col)


@dataclass
class Pipeline:
    conf: dict[str, Any]
    _sink: IdempotentParquetSink | None = field(default=None, init=False)
    _dlq_query: Any = field(default=None, init=False)  # StreamingQuery for window+dlq configs
    _case_sinks: list = field(default_factory=list, init=False)  # switch/fan_out sinks
    _read_until: Any = field(default=None, init=False)  # compiled stop predicate
    _stop_requested: bool = field(default=False, init=False)
    # error_handling reject capture: batch defers the DLQ write to
    # run_batch/flush time; streaming stashes the errored branch for a side
    # DLQ query started by run_stream
    _batch_dlq_pending: Any = field(default=None, init=False)
    _reject_errored: Any = field(default=None, init=False)
    _eh_dlq_query: Any = field(default=None, init=False)

    def __post_init__(self) -> None:
        # zmq4n (zeromq/input_zmq4n.go, output_zmq4n.go): the reference's
        # pure-Go client registration of the SAME ZMTP 3.0 wire contract
        # — normalize onto the zmq4 sections once so every consumer
        # (plan build, start_zmq_subscriber, run_stream) sees one name.
        for section in ("input", "output"):
            sec = self.conf.get(section)
            if isinstance(sec, dict) and "zmq4n" in sec:
                sec["zmq4"] = sec.pop("zmq4n")

    # ------------------------------------------------------------------ input
    def _input(self, spark: SparkSession, streaming: bool) -> DataFrame:
        inp = self.conf.get("input") or {}
        if "zmq4n" in inp:  # lint registration; normalized in __post_init__
            inp = {**inp, "zmq4": inp.pop("zmq4n")}
        if "generate_clips" in inp:
            opts = inp["generate_clips"] or {}
            df = clips_df(
                spark,
                int(opts.get("count", 1000)),
                seed=int(opts.get("seed", 42)),
                event_step_ms=int(opts.get("event_step_ms", 100)),
            )
            if streaming:
                raise ValueError(
                    "generate_clips streams via a staging dir: use input.parquet with "
                    "a path written by clips_df (see Pipeline.stage_clips)"
                )
            return df
        if "generate_images" in inp:
            # images twin of generate_clips (images/generate.py)
            from bento_spark.images.generate import images_df

            opts = inp["generate_images"] or {}
            if streaming:
                raise ValueError(
                    "generate_images streams via a staging dir: use input.parquet "
                    "with a path written by images_df"
                )
            return images_df(
                spark, int(opts.get("count", 300)), seed=int(opts.get("seed", 42))
            )
        if "generate_videos" in inp:
            # videos twin of generate_clips/generate_images (video/generate.py)
            from bento_spark.video.generate import videos_df

            opts = inp["generate_videos"] or {}
            if streaming:
                raise ValueError(
                    "generate_videos streams via a staging dir: use input.parquet "
                    "with a path written by videos_df"
                )
            return videos_df(
                spark, int(opts.get("count", 100)), seed=int(opts.get("seed", 42))
            )
        if "generate" in inp:
            # general generate input (input_generate.go:22): a Bloblang
            # mapping over a generated sequence. Batch = spark.range(count)
            # (the `id` column is the 0-based message index, usable as
            # this.id for deterministic rows); streaming = the rate source
            # paced by `interval` (rows/sec = 1/interval), value -> id.
            o = inp["generate"] or {}
            if streaming:
                from bento_spark.streaming.cep import duration_ms

                iv = str(o.get("interval", "1s")) or "1s"
                ms = max(duration_ms(iv), 1)
                if ms <= 1000:
                    rps, every = int(round(1000.0 / ms)), 1
                else:
                    # rate source floors at 1 row/sec: pace longer intervals
                    # by keeping every Nth row (interval 1m = every 60th)
                    rps, every = 1, int(round(ms / 1000.0))
                src = (
                    spark.readStream.format("rate")
                    .option("rowsPerSecond", rps)
                    .load()
                    .filter((F.col("value") % every) == 0)
                    .select((F.col("value") / every).cast("long").alias("id"))
                    # timestamp dropped: wall-clock in the data path breaks
                    # determinism AND batch/stream schema parity
                )
                if "count" in o:
                    # bounded generate: emit exactly `count` rows then
                    # nothing (the reference stops its input; a Spark rate
                    # stream stays alive — pair with read_until to stop)
                    src = src.filter(F.col("id") < int(o["count"]))
            else:
                src = spark.range(int(o.get("count", 100)))
            if o.get("mapping"):
                src = compile_mapping(str(o["mapping"])).apply(src)
            return src
        if "http_server" in inp:
            # push ingestion via the spool-dir bridge (input_http_server.go:44):
            # the listener (start_http_listener) persists request bodies as
            # spool files; the replayable file source IS the input, so the
            # streaming guarantees (offset log, exactly-once downstream) hold
            o = inp["http_server"]
            if not streaming:
                raise ValueError("http_server input is streaming-only (push source)")
            from bento_spark.streaming.http_server import read_spool_stream

            return read_spool_stream(
                spark,
                o["spool_dir"],
                whole_body=bool(o.get("whole_body", True)),
                max_files_per_trigger=o.get("max_files_per_trigger"),
                # sync mode stamps the spool stem as request_id, the
                # routing key output.sync_response replies by
                with_request_id=bool(o.get("sync")),
            )
        if "parquet" in inp:
            opts = inp["parquet"]
            path = require_object_store(spark, opts["path"])
            if streaming:
                reader = spark.readStream.schema(opts.get("schema", CLIP_SCHEMA))
                if "max_files_per_trigger" in opts:
                    reader = reader.option("maxFilesPerTrigger", int(opts["max_files_per_trigger"]))
                return reader.parquet(path)
            return spark.read.parquet(path)
        # file-format scanners (reference scanners: lines/csv/json_documents,
        # internal/impl/pure/scanner_*.go) — Spark readers ARE the scanners
        if "csv" in inp:
            opts = inp["csv"]
            rd = spark.readStream if streaming else spark.read
            if streaming or "schema" in opts:
                rd = rd.schema(opts["schema"])
            return rd.options(
                header=str(opts.get("header", True)).lower(),
                **({"maxFilesPerTrigger": str(opts["max_files_per_trigger"])} if streaming and "max_files_per_trigger" in opts else {}),
            ).csv(require_object_store(spark, opts["path"]))
        if "json" in inp:
            opts = inp["json"]
            rd = spark.readStream if streaming else spark.read
            if streaming or "schema" in opts:
                rd = rd.schema(opts["schema"])
            return rd.json(require_object_store(spark, opts["path"]))
        if "lines" in inp:
            opts = inp["lines"]
            rd = (spark.readStream if streaming else spark.read).format("text")
            if opts.get("whole"):
                # to_the_end scanner (scanner_to_the_end.go): the whole file
                # is ONE message — Spark's wholetext option is exactly that.
                # format+load, not .text(): text()'s wholetext KEYWORD
                # (default False) overrides a reader-level option
                rd = rd.option("wholetext", "true")
            return rd.load(require_object_store(spark, opts["path"])).withColumnRenamed(
                "value", opts.get("column", "line"))
        if "cassandra" in inp:
            # SELECT as a batch source (cassandra/input.go) — driver-side
            # single-batch read for control-plane-sized tables; bulk data
            # belongs in parquet/Iceberg
            o = inp["cassandra"]
            if streaming:
                raise ValueError("cassandra input is batch-only (a bounded SELECT)")
            from bento_spark.streaming.cassandra import cassandra_read

            addr = (o.get("addresses") or [o.get("address", "127.0.0.1:9042")])[0]
            return cassandra_read(spark, str(addr), str(o["query"]))
        if "mongodb" in inp:
            # collection find as a batch source (mongodb/input.go) —
            # driver-side single-batch read for control-plane-sized
            # collections; bulk data belongs in parquet/Iceberg
            o = inp["mongodb"]
            if streaming:
                raise ValueError("mongodb input is batch-only (a bounded find query)")
            from bento_spark.streaming.mongodb import mongodb_read

            import json as _json

            flt = o.get("filter")
            if isinstance(flt, str):
                flt = _json.loads(flt)
            return mongodb_read(
                spark, str(o["url"]), str(o.get("database", "bento")),
                str(o["collection"]), flt=flt, limit=int(o.get("limit", 0)),
            )
        if "binary_file" in inp:
            # whole-file binary rows (path, modificationTime, length,
            # content) — the byte-stream the reference's scanners consume;
            # follow with unarchive_tar/chunker/re_split processors
            opts = inp["binary_file"]
            rd = spark.readStream if streaming else spark.read
            rd = rd.format("binaryFile")
            if "glob" in opts:
                rd = rd.option("pathGlobFilter", opts["glob"])
            if streaming:
                rd = rd.schema(
                    "path string, modificationTime timestamp, length bigint, content binary"
                )
            return rd.load(opts["path"])
        if "xml" in inp:
            # native XML datasource (Spark 4) — the reference's xml scanner/
            # processor to_json path (internal/impl/xml/processor.go)
            opts = inp["xml"]
            rd = spark.readStream if streaming else spark.read
            rd = rd.format("xml").option("rowTag", opts.get("row_tag", "row"))
            if streaming and "schema" not in opts:
                raise ValueError("xml streaming input requires an explicit schema")
            if "schema" in opts:
                rd = rd.schema(opts["schema"])
            return rd.load(opts["path"])
        if "stdin" in inp:
            # stdin line input (reference internal/impl/io/input_stdin.go) —
            # inherently a single-process feed, read on the driver
            if streaming:
                raise ValueError("stdin input is batch-only (single-process feed)")
            import sys as _sys

            col = (inp["stdin"] or {}).get("column", "line")
            rows = [(ln.rstrip("\n"),) for ln in _sys.stdin]
            return spark.createDataFrame(rows, f"{col} string")
        if "websocket" in inp:
            # ws:// client source (input_websocket.go) via the spool bridge;
            # the client connects via start_websocket()
            o = inp["websocket"]
            if not streaming:
                raise ValueError("websocket input is streaming-only (push source)")
            from bento_spark.streaming.http_server import read_spool_stream

            return read_spool_stream(
                spark,
                o["spool_dir"],
                whole_body=True,  # one message per frame, like the reference
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "mqtt" in inp:
            # MQTT subscription (mqtt/input.go) via the spool bridge —
            # dependency-free 3.1.1 client (streaming/mqtt.py); the
            # subscriber starts via start_mqtt_subscriber(). QoS1 PUBACK
            # fires only after the spool rename, so at-least-once holds
            # into the replayable file source.
            o = inp["mqtt"]
            if not streaming:
                raise ValueError("mqtt input is streaming-only (push source)")
            from bento_spark.streaming.mqtt import read_mqtt_stream

            return read_mqtt_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "nats_object_store" in inp:
            # watch an object-store bucket; each metadata update fetches
            # the OBJECT and spools it as one message (nats/input_os.go).
            # Consumer starts via start_nats_os_consumer().
            o = inp["nats_object_store"]
            if not streaming:
                raise ValueError("nats_object_store input is streaming-only (pull source)")
            from bento_spark.streaming.nats import read_nats_os_stream

            return read_nats_os_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "nats_jetstream" in inp:
            # durable JetStream pull consumer (nats/input_jetstream.go) via
            # the spool bridge; +ACK fires only after the spool rename
            # (at-least-once, server-tracked redelivery). Consumer starts
            # via start_jetstream_consumer().
            o = inp["nats_jetstream"]
            if not streaming:
                raise ValueError("nats_jetstream input is streaming-only (pull source)")
            from bento_spark.streaming.nats import read_jetstream_stream

            return read_jetstream_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "nats" in inp:
            # core-NATS subscription (nats/input.go) via the spool bridge —
            # dependency-free text-protocol client (streaming/nats.py); the
            # subscriber starts via start_nats_subscriber(). Core NATS is
            # at-most-once by protocol (no acks) — everything the spooler
            # received is durable in the replayable file source.
            o = inp["nats"]
            if not streaming:
                raise ValueError("nats input is streaming-only (push source)")
            from bento_spark.streaming.nats import read_nats_stream

            return read_nats_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "pulsar" in inp:
            # Pulsar subscription (pulsar/input.go) via the spool bridge —
            # dependency-free binary-protocol client (streaming/pulsar.py);
            # the subscriber starts via start_pulsar_subscriber(). ACK fires
            # only after the spool rename, so at-least-once holds into the
            # replayable file source.
            o = inp["pulsar"]
            if not streaming:
                raise ValueError("pulsar input is streaming-only (push source)")
            from bento_spark.streaming.pulsar import read_pulsar_stream

            return read_pulsar_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "aws_kinesis" in inp:
            # Kinesis shard iteration (aws/input_kinesis.go) via the spool
            # bridge — JSON protocol over the vector-pinned SigV4
            # (streaming/kinesis.py); the consumer starts via
            # start_kinesis_consumer(). Sequence numbers checkpoint to the
            # spool dir AFTER the covered records are durable.
            o = inp["aws_kinesis"]
            if not streaming:
                raise ValueError("aws_kinesis input is streaming-only (pull source)")
            from bento_spark.streaming.kinesis import read_kinesis_stream

            return read_kinesis_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "gcp_spanner_cdc" in inp:
            # Spanner change-stream consumption (gcp/input_spanner_cdc.go)
            # via the spool bridge — REST v1 PartialResultSet streaming
            # client (streaming/spanner.py); the partition-tree watcher
            # starts via start_spanner_cdc_consumer().
            o = inp["gcp_spanner_cdc"]
            if not streaming:
                raise ValueError(
                    "gcp_spanner_cdc input is streaming-only (push source)")
            from bento_spark.streaming.spanner import read_spanner_cdc_stream

            return read_spanner_cdc_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "gcp_pubsub" in inp:
            # Pub/Sub pull (gcp/input_pubsub.go) via the spool bridge —
            # dependency-free REST client with service-account JWT-bearer
            # auth (streaming/pubsub.py); the consumer starts via
            # start_pubsub_consumer(). acknowledge fires only after the
            # spool rename — at-least-once via the ack deadline.
            o = inp["gcp_pubsub"]
            if not streaming:
                raise ValueError("gcp_pubsub input is streaming-only (pull source)")
            from bento_spark.streaming.pubsub import read_pubsub_stream

            return read_pubsub_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "aws_sqs" in inp:
            # SQS long-poll (aws/input_sqs.go) via the spool bridge —
            # dependency-free JSON-protocol + SigV4 client
            # (streaming/sqs.py); the consumer starts via
            # start_sqs_consumer(). DeleteMessage fires only after the
            # spool rename — at-least-once via the visibility timeout.
            o = inp["aws_sqs"]
            if not streaming:
                raise ValueError("aws_sqs input is streaming-only (pull source)")
            from bento_spark.streaming.sqs import read_sqs_stream

            return read_sqs_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "azure_queue_storage" in inp:
            # queue polling (azure/input_queue_storage.go) via the spool
            # bridge — Delete Message (pop receipt) only after the rename;
            # the consumer starts via start_azure_queue_consumer().
            o = inp["azure_queue_storage"]
            if not streaming:
                raise ValueError(
                    "azure_queue_storage input is streaming-only (pull source)")
            from bento_spark.streaming.azure_queue import read_azure_queue_stream

            return read_azure_queue_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "azure_blob_storage" in inp:
            # container-listing consumption (azure/input_blob_storage.go)
            # via the spool bridge — dependency-free SharedKey REST client
            # (streaming/azure_blob.py); the consumer starts via
            # start_azure_blob_consumer().
            o = inp["azure_blob_storage"]
            if not streaming:
                raise ValueError(
                    "azure_blob_storage input is streaming-only (pull source)")
            from bento_spark.streaming.azure_blob import read_azure_blob_stream

            return read_azure_blob_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "cypher" in inp:
            # one-shot graph query (cypher/input_cypher.go) via the spool
            # bridge — Bolt 4.4 client (streaming/cypher.py); starts via
            # start_cypher_consumer().
            o = inp["cypher"]
            if not streaming:
                raise ValueError("cypher input is streaming-only (pull source)")
            from bento_spark.streaming.cypher import read_cypher_stream

            return read_cypher_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "cockroachdb_changefeed" in inp:
            # core-changefeed consumption (cockroachdb/input_changefeed.go)
            # via the spool bridge — pgwire v3 client
            # (streaming/cockroachdb.py); starts via
            # start_cockroachdb_consumer().
            o = inp["cockroachdb_changefeed"]
            if not streaming:
                raise ValueError(
                    "cockroachdb_changefeed input is streaming-only "
                    "(push source)")
            from bento_spark.streaming.cockroachdb import read_changefeed_stream

            return read_changefeed_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "etcd" in inp:
            # watch-stream consumption (etcd/input.go) via the spool
            # bridge — gRPC/HTTP/2 wire client (streaming/etcd.py,
            # grpc_wire.py); starts via start_etcd_consumer().
            o = inp["etcd"]
            if not streaming:
                raise ValueError("etcd input is streaming-only (push source)")
            from bento_spark.streaming.etcd import read_etcd_stream

            return read_etcd_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "discord" in inp:
            # channel-backlog polling (discord/input.go) via the spool
            # bridge — REST v10 + Bot token (streaming/discord.py); the
            # poller starts via start_discord_consumer().
            o = inp["discord"]
            if not streaming:
                raise ValueError("discord input is streaming-only (poll source)")
            from bento_spark.streaming.discord import read_discord_stream

            return read_discord_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "gcp_bigquery_select" in inp:
            # paged query consumption (gcp/input_bigquery_select.go) via
            # the spool bridge — BigQuery REST jobs.query
            # (streaming/bigquery.py); starts via start_bigquery_consumer().
            o = inp["gcp_bigquery_select"]
            if not streaming:
                raise ValueError(
                    "gcp_bigquery_select input is streaming-only (pull source)")
            from bento_spark.streaming.bigquery import read_bigquery_stream

            return read_bigquery_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "gcp_cloud_storage" in inp:
            # bucket-listing consumption (gcp/input_cloud_storage.go) via
            # the spool bridge — GCS JSON API + service-account OAuth
            # (streaming/gcs.py); the consumer starts via
            # start_gcs_consumer().
            o = inp["gcp_cloud_storage"]
            if not streaming:
                raise ValueError(
                    "gcp_cloud_storage input is streaming-only (pull source)")
            from bento_spark.streaming.gcs import read_gcs_stream

            return read_gcs_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "sftp" in inp:
            # glob-resolved file consumption (sftp/input.go) over the
            # from-scratch SSH transport via the spool bridge; the
            # consumer starts via start_sftp_consumer().
            o = inp["sftp"]
            if not streaming:
                raise ValueError("sftp input is streaming-only (pull source)")
            from bento_spark.streaming.sftp import read_sftp_stream

            return read_sftp_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "azure_service_bus_queue" in inp:
            # CBS-authenticated AMQP 1.0 receiver
            # (azure/input_service_bus_queue.go) via the spool bridge; the
            # consumer starts via start_service_bus_consumer().
            o = inp["azure_service_bus_queue"]
            if not streaming:
                raise ValueError(
                    "azure_service_bus_queue input is streaming-only "
                    "(push source)")
            from bento_spark.streaming.azure_servicebus import (
                read_service_bus_stream,
            )

            return read_service_bus_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "azure_cosmosdb" in inp:
            # parametrized-query consumption (azure/input_cosmosdb.go) via
            # the spool bridge — dependency-free master-key REST client
            # (streaming/cosmosdb.py); the consumer starts via
            # start_cosmos_consumer().
            o = inp["azure_cosmosdb"]
            if not streaming:
                raise ValueError(
                    "azure_cosmosdb input is streaming-only (pull source)")
            from bento_spark.streaming.cosmosdb import read_cosmos_stream

            return read_cosmos_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "azure_table_storage" in inp:
            # entity-query consumption (azure/input_table_storage.go) via
            # the spool bridge — dependency-free SharedKey(Table) REST
            # client (streaming/azure_table.py); the consumer starts via
            # start_azure_table_consumer().
            o = inp["azure_table_storage"]
            if not streaming:
                raise ValueError(
                    "azure_table_storage input is streaming-only (pull source)")
            from bento_spark.streaming.azure_table import read_azure_table_stream

            return read_azure_table_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "amqp_1" in inp:
            # AMQP 1.0 receiver link (amqp1/input.go) via the spool bridge
            # — dependency-free OASIS-spec client (streaming/amqp1.py);
            # the consumer starts via start_amqp1_consumer(). The accepted
            # disposition fires only after the spool rename.
            o = inp["amqp_1"]
            if not streaming:
                raise ValueError("amqp_1 input is streaming-only (push source)")
            from bento_spark.streaming.amqp1 import read_amqp1_stream

            return read_amqp1_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "sql_raw" in inp:
            # one-shot query, each result row a message (input_sql_raw.go)
            o = inp["sql_raw"]
            if streaming:
                raise ValueError("sql_raw input is batch-only (one-shot query)")
            from bento_spark.operators.sql_raw import sql_raw_query

            return sql_raw_query(
                spark, str(o.get("driver", "sqlite")), str(o["dsn"]),
                str(o["query"]), args=o.get("args"))
        if "aws_s3" in inp:
            # S3 object consumption (aws/input_s3.go) via the spool bridge —
            # one listing pass or SQS-notified objects, fetched with the
            # dependency-free REST + SigV4 client (streaming/s3.py); the
            # consumer starts via start_s3_consumer(). DeleteObject /
            # DeleteMessage fire only after the spool rename.
            o = inp["aws_s3"]
            if not streaming:
                raise ValueError("aws_s3 input is streaming-only (pull source)")
            from bento_spark.streaming.s3 import read_s3_stream

            return read_s3_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "hdfs" in inp:
            # HDFS directory consumption, file == message (hdfs/input.go)
            # via the spool bridge over the public WebHDFS REST API
            # (streaming/hdfs.py); the consumer starts via
            # start_hdfs_consumer() and finishes after one listing pass
            o = inp["hdfs"]
            if not streaming:
                raise ValueError("hdfs input is streaming-only (pull source)")
            from bento_spark.streaming.hdfs import read_hdfs_stream

            return read_hdfs_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "nanomsg" in inp:
            # nanomsg PULL/SUB (nanomsg/input.go) via the spool bridge —
            # dependency-free SP-over-TCP implementation
            # (streaming/nanomsg.py); the socket starts via
            # start_nanomsg_subscriber(). At-most-once once delivered.
            o = inp["nanomsg"]
            if not streaming:
                raise ValueError("nanomsg input is streaming-only (push source)")
            from bento_spark.streaming.nanomsg import read_nanomsg_stream

            return read_nanomsg_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "zmq4" in inp:
            # ZeroMQ PULL/SUB (zeromq/input_zmq4.go) via the spool bridge —
            # dependency-free ZMTP 3.0 implementation (streaming/zeromq.py);
            # the socket starts via start_zmq_subscriber(). At-most-once
            # once delivered, the zmq4 contract (no acks in the protocol).
            o = inp["zmq4"]
            if not streaming:
                raise ValueError("zmq4 input is streaming-only (push source)")
            from bento_spark.streaming.zeromq import read_zmq_stream

            return read_zmq_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "beanstalkd" in inp:
            # beanstalkd reserve-poll (beanstalkd/input.go) via the spool
            # bridge — dependency-free text-protocol client
            # (streaming/beanstalkd.py); the consumer starts via
            # start_beanstalkd_consumer(). `delete` fires only after the
            # spool rename, so at-least-once holds (un-deleted jobs
            # re-deliver after TTR).
            o = inp["beanstalkd"]
            if not streaming:
                raise ValueError("beanstalkd input is streaming-only (pull source)")
            from bento_spark.streaming.beanstalkd import read_beanstalkd_stream

            return read_beanstalkd_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "nsq" in inp:
            # NSQ channel subscription (nsq/input.go) via the spool bridge —
            # dependency-free V2-protocol client (streaming/nsq.py); the
            # consumer starts via start_nsq_consumer(). FIN fires only after
            # the spool rename, so at-least-once holds into the replayable
            # file source.
            o = inp["nsq"]
            if not streaming:
                raise ValueError("nsq input is streaming-only (push source)")
            from bento_spark.streaming.nsq import read_nsq_stream

            return read_nsq_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "amqp_0_9" in inp:
            # AMQP 0.9.1 consume (amqp09/input.go) via the spool bridge —
            # dependency-free spec client (streaming/amqp.py); the consumer
            # starts via start_amqp_consumer(). basic.ack fires only after
            # the spool rename, so at-least-once holds into the replayable
            # file source.
            o = inp["amqp_0_9"]
            if not streaming:
                raise ValueError("amqp_0_9 input is streaming-only (push source)")
            from bento_spark.streaming.amqp import read_amqp_stream

            return read_amqp_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "redis_list" in inp or "redis_pubsub" in inp:
            # redis list pop / pub-sub subscription (redis/input_list.go,
            # input_pubsub.go) via the spool bridge — dependency-free RESP2
            # client (streaming/redis.py); the spooler starts via
            # start_redis_spooler(). The source key/channel rides the spool
            # filename and decodes JVM-side into `redis_key`/`redis_channel`.
            name = "redis_list" if "redis_list" in inp else "redis_pubsub"
            o = inp[name]
            if not streaming:
                raise ValueError(f"{name} input is streaming-only (push source)")
            from bento_spark.streaming.redis import read_redis_spool_stream

            return read_redis_spool_stream(
                spark, o["spool_dir"],
                tag_col="redis_key" if name == "redis_list" else "redis_channel",
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "redis_streams" in inp:
            # redis streams consumer group (redis/input_streams.go) via the
            # spool bridge: XREADGROUP entries spool with a JSON envelope,
            # XACK fires only after the atomic rename — at-least-once into
            # the replayable file source
            o = inp["redis_streams"]
            if not streaming:
                raise ValueError("redis_streams input is streaming-only (push source)")
            from bento_spark.streaming.redis import read_redis_streams_stream

            return read_redis_streams_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "redis_scan" in inp:
            # keyspace-as-batch input (redis/input_scan.go): driver-side
            # SCAN cursor, executor-side pipelined MGET per partition
            o = inp["redis_scan"]
            if streaming:
                raise ValueError("redis_scan input is batch-only (bounded keyspace walk)")
            from bento_spark.streaming.redis import read_redis_scan

            host, port = self._redis_addr(o)
            return read_redis_scan(spark, host, port, match=o.get("match", "*"))
        if "http_client" in inp:
            # polling HTTP source (input_http_client.go) via the spool
            # bridge; the poller starts via start_http_poller()
            o = inp["http_client"]
            if not streaming:
                raise ValueError("http_client input is streaming-only (polled source)")
            from bento_spark.streaming.http_server import read_spool_stream

            return read_spool_stream(
                spark,
                o["spool_dir"],
                whole_body=bool(o.get("whole_body", True)),
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "socket_server" in inp:
            # listener-side TCP ingestion (input_socket_server.go) via the
            # spool bridge — replayable, unlike the raw socket source; the
            # listener itself starts via start_socket_listener()
            o = inp["socket_server"]
            if not streaming:
                raise ValueError("socket_server input is streaming-only (push source)")
            from bento_spark.streaming.http_server import read_spool_stream

            return read_spool_stream(
                spark,
                o["spool_dir"],
                whole_body=not bool(o.get("lines", True)),
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "socket" in inp:
            # TCP line source (reference net input internal/impl/io/
            # input_socket.go) — Spark's native socket source; dev/debug
            # grade (no offset replay), like the reference's
            o = inp["socket"]
            if not streaming:
                raise ValueError("socket input is streaming-only")
            return (
                spark.readStream.format("socket")
                .option("host", o.get("host", "127.0.0.1"))
                .option("port", int(o["port"]))
                .load()
                .withColumnRenamed("value", o.get("column", "line"))
            )
        if "kafka" in inp:
            from bento_spark.streaming.kafka import read_kafka_stream

            opts = inp["kafka"]
            if not streaming:
                raise ValueError("kafka input is streaming-only; use build_stream/run_stream")
            return read_kafka_stream(
                spark,
                addresses=opts["addresses"],
                topics=opts["topics"],
                starting_offsets=opts.get("starting_offsets", "earliest"),
                checkpoint_limit=opts.get("checkpoint_limit"),
                value_schema=opts.get("value_schema"),
                value_format=opts.get("value_format", "json"),
            )
        if "kafka_franz" in inp:
            # dependency-free Kafka consumption (kafka/input_kafka_franz.go:
            # seed_brokers/topics/checkpoint_limit) via the spool bridge —
            # wire-protocol client (streaming/kafka_wire.py); the consumer
            # starts via start_kafka_franz_consumer(). Offsets commit only
            # AFTER the spool rename, so at-least-once holds into the
            # replayable file source. kafka_* metadata decodes JVM-side.
            o = inp["kafka_franz"]
            if not streaming:
                raise ValueError("kafka_franz input is streaming-only (push source)")
            from bento_spark.streaming.kafka_wire import read_kafka_wire_stream

            return read_kafka_wire_stream(
                spark, o["spool_dir"],
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "read_until" in inp:
            # consume the child input until a predicate fires
            # (input_read_until.go:34). Granularity is the micro-batch: the
            # batch containing the first matching row is DELIVERED, later
            # batches are discarded and the query stops (run_stream wires
            # the monitor). The check runs on the rows reaching the output.
            if not streaming:
                raise ValueError(
                    "read_until is streaming-only: tables are unordered, so "
                    "'until the first match' has no batch meaning"
                )
            o = inp["read_until"]
            self._read_until = compile_expr(str(o["check"]))
            return Pipeline({"input": o["input"]})._input(spark, streaming)
        if "broker" in inp:
            # fan-in of child inputs (input_broker.go:78) = streaming union
            children = inp["broker"]["inputs"]
            dfs = [Pipeline({"input": c})._input(spark, streaming) for c in children]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return out
        if "dynamic" in inp:
            # labeled broker (input_dynamic.go): the static `inputs` map
            # compiles to a fan-in union tagged with _dynamic_label.
            # Runtime add/remove maps to the StreamManager REST API
            # (update/recreate) — Spark cannot graft sources onto a live
            # DAG, and the manager's stream-level mutation is the
            # supported equivalent of the reference's /inputs/{id}.
            children = inp["dynamic"].get("inputs") or {}
            if not children:
                raise ValueError("dynamic input: `inputs` map is empty")
            dfs = [
                Pipeline({"input": c})._input(spark, streaming)
                .withColumn("_dynamic_label", F.lit(str(label)))
                for label, c in sorted(children.items())
            ]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return out
        if "subprocess" in inp:
            # stdout-line consumption (input_subprocess.go) via the spool
            # bridge — the child runs driver-side (one OS process, like
            # the reference itself); starts via start_subprocess_consumer()
            o = inp["subprocess"]
            if not streaming:
                raise ValueError("subprocess input is streaming-only (push source)")
            from bento_spark.streaming.http_server import read_spool_stream

            return read_spool_stream(
                spark, o["spool_dir"], whole_body=True,
                max_files_per_trigger=o.get("max_files_per_trigger"),
            )
        if "sequence" in inp:
            # ordered consumption: child i's rows all precede child i+1's
            # (input_sequence.go:35 "once that input gracefully terminates
            # starts consuming from the next"). Tables have no arrival
            # order, so the sequence position is materialized as _seq_input
            # — downstream order-sensitive ops sort on it. Batch-only: a
            # stream never "gracefully terminates".
            if streaming:
                raise ValueError("sequence input is batch-only (streams do not terminate)")
            children = inp["sequence"]["inputs"]
            dfs = [
                Pipeline({"input": c})._input(spark, streaming=False).withColumn("_seq_input", F.lit(i))
                for i, c in enumerate(children)
            ]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return out
        raise ValueError(f"unsupported input config: {list(inp)}")

    @staticmethod
    def stage_clips(spark: SparkSession, path: str, count: int, **kw) -> None:
        """Materialize the deterministic clips table to a dir usable as a
        (file-)stream source."""
        clips_df(spark, count, **kw).write.mode("overwrite").parquet(path)

    def start_http_listener(self):
        """Start the driver-side HTTP listener for an `input.http_server`
        pipeline and return its handle (caller owns `.stop()`; `.url` is the
        POST endpoint). Separate from build_stream on purpose: the listener
        is a runtime resource, the stream is a plan."""
        o = (self.conf.get("input") or {}).get("http_server")
        if not o:
            raise ValueError("pipeline has no input.http_server section")
        from bento_spark.streaming.http_server import HttpSpoolServer

        host, _, port = str(o.get("address", "127.0.0.1:0")).partition(":")
        return HttpSpoolServer(
            spool_dir=o["spool_dir"],
            host=host or "127.0.0.1",
            port=int(port or 0),
            path=o.get("path", "/post"),
            sync_dir=self._sync_dir_of(o) if o.get("sync") else None,
            sync_timeout=float(o.get("sync_timeout", 15.0)),
        ).start()

    def start_mqtt_subscriber(self):
        """Start the subscriber bridge for an `input.mqtt` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("mqtt")
        if not o:
            raise ValueError("pipeline has no input.mqtt section")
        from bento_spark.streaming.mqtt import MqttSpooler

        host, port = self._mqtt_addr(o)
        return MqttSpooler(
            host=host, port=port, topics=list(o["topics"]),
            spool_dir=o["spool_dir"], qos=int(o.get("qos", 1)),
            client_id=o.get("client_id"),
            clean_session=bool(o.get("clean_session", True)),
        ).start()

    @staticmethod
    def _mqtt_addr(o: dict) -> tuple[str, int]:
        """First entry of the reference's `urls` list (tcp://host:port)
        or a bare `address: host:port`."""
        url = (o.get("urls") or [o.get("address", "127.0.0.1:1883")])[0]
        hp = str(url).removeprefix("tcp://").removeprefix("mqtt://")
        host, _, port = hp.partition(":")
        return host or "127.0.0.1", int(port or 1883)

    def start_kafka_franz_consumer(self):
        """Start the consumer bridge for an `input.kafka_franz` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("kafka_franz")
        if not o:
            raise ValueError("pipeline has no input.kafka_franz section")
        from bento_spark.streaming.kafka_wire import KafkaSpooler

        host, port = self._kafka_addr(o)
        return KafkaSpooler(
            host=host, port=port, topics=list(o["topics"]),
            spool_dir=o["spool_dir"],
            checkpoint_limit=int(o.get("checkpoint_limit", 4096)),
            sasl=self._kafka_sasl(o),
        ).start()

    @staticmethod
    def _kafka_sasl(o: dict) -> dict | None:
        """First entry of the reference's `sasl` list (mechanism/username/
        password — input_kafka_franz.go saslField); None = no auth."""
        entries = o.get("sasl") or []
        if not entries:
            return None
        e = entries[0] if isinstance(entries, list) else entries
        out = {"mechanism": str(e.get("mechanism", "PLAIN")),
               "username": str(e.get("username", e.get("user", ""))),
               "password": str(e.get("password", ""))}
        for k in ("access_key", "secret_key", "region", "host"):
            if e.get(k) is not None:
                out[k] = str(e[k])
        return out

    @staticmethod
    def _kafka_addr(o: dict) -> tuple[str, int]:
        """First entry of the reference's `seed_brokers` list (host:port)."""
        hp = str((o.get("seed_brokers") or ["127.0.0.1:9092"])[0])
        hp = hp.removeprefix("kafka://").removeprefix("tcp://")
        host, _, port = hp.partition(":")
        return host or "127.0.0.1", int(port or 9092)

    def start_nats_os_consumer(self):
        """Start the bucket-watch bridge for an `input.nats_object_store`
        pipeline and return its handle (caller owns `.stop()`)."""
        o = (self.conf.get("input") or {}).get("nats_object_store")
        if not o:
            raise ValueError("pipeline has no input.nats_object_store section")
        from bento_spark.streaming.nats import NatsOsSpooler

        host, port = self._nats_addr(o)
        return NatsOsSpooler(
            host=host, port=port, bucket=str(o["bucket"]),
            durable=str(o.get("durable", "bento_spark_os")),
            spool_dir=o["spool_dir"],
        ).start()

    def start_jetstream_consumer(self):
        """Start the pull-consumer bridge for an `input.nats_jetstream`
        pipeline and return its handle (caller owns `.stop()`). Same
        runtime-resource/plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("nats_jetstream")
        if not o:
            raise ValueError("pipeline has no input.nats_jetstream section")
        from bento_spark.streaming.cep import duration_ms
        from bento_spark.streaming.nats import JetStreamSpooler

        host, port = self._nats_addr(o)
        return JetStreamSpooler(
            host=host, port=port, stream=str(o["stream"]),
            durable=str(o.get("durable", "bento_spark")),
            spool_dir=o["spool_dir"], subject=str(o.get("subject", "")),
            deliver=str(o.get("deliver", "all")),
            ack_wait_s=duration_ms(str(o.get("ack_wait", "30s"))) / 1000.0,
        ).start()

    def start_nats_subscriber(self):
        """Start the subscriber bridge for an `input.nats` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("nats")
        if not o:
            raise ValueError("pipeline has no input.nats section")
        from bento_spark.streaming.nats import NatsSpooler

        host, port = self._nats_addr(o)
        return NatsSpooler(
            host=host, port=port, subject=o["subject"],
            spool_dir=o["spool_dir"], queue=o.get("queue"),
        ).start()

    @staticmethod
    def _nats_addr(o: dict) -> tuple[str, int]:
        """First entry of the reference's `urls` list (nats://host:port)
        or a bare `address: host:port`."""
        url = (o.get("urls") or [o.get("address", "127.0.0.1:4222")])[0]
        hp = str(url).removeprefix("nats://").removeprefix("tcp://")
        host, _, port = hp.partition(":")
        return host or "127.0.0.1", int(port or 4222)

    def start_pulsar_subscriber(self):
        """Start the subscriber bridge for an `input.pulsar` pipeline and
        return its handle (caller owns `.stop()`). Fields follow
        pulsar/input.go: url, topics / topics_pattern, subscription_name,
        subscription_type, auth.token."""
        o = (self.conf.get("input") or {}).get("pulsar")
        if not o:
            raise ValueError("pipeline has no input.pulsar section")
        from bento_spark.streaming.pulsar import PulsarSpooler, parse_pulsar_url

        host, port = parse_pulsar_url(str(o.get("url", "pulsar://127.0.0.1:6650")))
        auth = (o.get("auth") or {}).get("token") or {}
        token = auth.get("token") if auth.get("enabled") else None
        return PulsarSpooler(
            host=host, port=port, topics=list(o.get("topics") or []),
            subscription=o["subscription_name"], spool_dir=o["spool_dir"],
            sub_type=o.get("subscription_type", "shared"),
            topics_pattern=o.get("topics_pattern"), token=token,
        ).start()

    def start_kinesis_consumer(self):
        """Start the consumer bridge for an `input.aws_kinesis` pipeline
        and return its handle (caller owns `.stop()`)."""
        import os

        o = (self.conf.get("input") or {}).get("aws_kinesis")
        if not o:
            raise ValueError("pipeline has no input.aws_kinesis section")
        from bento_spark.streaming.kinesis import KinesisSpooler

        return KinesisSpooler(
            endpoint=str(o.get("endpoint") or
                         f"https://kinesis.{o.get('region', 'us-east-1')}.amazonaws.com"),
            streams=[str(s) for s in o["streams"]],
            access_key=str(o.get("access_key")
                           or os.environ.get("AWS_ACCESS_KEY_ID", "")),
            secret_key=str(o.get("secret_key")
                           or os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
            spool_dir=o["spool_dir"],
            region=str(o.get("region", "us-east-1")),
            checkpoint_limit=int(o.get("checkpoint_limit", 1000)),
        ).start()

    def start_spanner_cdc_consumer(self):
        """Start the partition-tree watcher for an `input.gcp_spanner_cdc`
        pipeline (caller owns `.stop()`). Fields follow
        input_spanner_cdc.go: spanner_dsn, stream_name, start_time,
        end_time (RFC3339), heartbeat_interval; plus the repo's GCP
        conventions (endpoint override, credentials file/dict)."""
        o = (self.conf.get("input") or {}).get("gcp_spanner_cdc")
        if not o:
            raise ValueError("pipeline has no input.gcp_spanner_cdc section")
        from bento_spark.streaming.cep import duration_ms
        from bento_spark.streaming.spanner import SpannerCdcSpooler

        return SpannerCdcSpooler(
            dsn=str(o["spanner_dsn"]),
            stream_name=str(o["stream_name"]),
            spool_dir=o["spool_dir"],
            start_time=(str(o["start_time"]) if o.get("start_time") else None),
            end_time=(str(o["end_time"]) if o.get("end_time") else None),
            heartbeat_ms=duration_ms(str(o.get("heartbeat_interval", "3s"))),
            endpoint=str(o.get("endpoint")
                         or "https://spanner.googleapis.com"),
            credentials=self._pubsub_creds(o),
        ).start()

    def start_pubsub_consumer(self):
        """Start the consumer bridge for an `input.gcp_pubsub` pipeline
        and return its handle (caller owns `.stop()`). `credentials` is
        the service-account JSON (path or inline dict); absent =
        unauthenticated emulator mode (PUBSUB_EMULATOR_HOST contract)."""
        o = (self.conf.get("input") or {}).get("gcp_pubsub")
        if not o:
            raise ValueError("pipeline has no input.gcp_pubsub section")
        from bento_spark.streaming.pubsub import PubSubSpooler

        creds = self._pubsub_creds(o)
        create = o.get("create_subscription") or {}
        return PubSubSpooler(
            endpoint=str(o.get("endpoint") or "https://pubsub.googleapis.com"),
            project=str(o["project"]), subscription=str(o["subscription"]),
            spool_dir=o["spool_dir"], credentials=creds,
            max_messages=int(o.get("max_outstanding_messages", 10)),
            create_topic=(str(create["topic"])
                          if create.get("enabled") else None),
        ).start()

    @staticmethod
    def _pubsub_creds(o: dict) -> dict | None:
        import json as _json

        c = o.get("credentials_json")
        if c is None:
            return None
        if isinstance(c, dict):
            return c
        with open(str(c), encoding="utf-8") as f:
            return _json.load(f)

    def start_sqs_consumer(self):
        """Start the consumer bridge for an `input.aws_sqs` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener. Credentials come from the
        section or the standard AWS_* env vars."""
        import os

        o = (self.conf.get("input") or {}).get("aws_sqs")
        if not o:
            raise ValueError("pipeline has no input.aws_sqs section")
        from bento_spark.streaming.sqs import SqsSpooler

        return SqsSpooler(
            endpoint=str(o.get("endpoint") or
                         f"https://sqs.{o.get('region', 'us-east-1')}.amazonaws.com"),
            queue_url=str(o["url"]),
            access_key=str(o.get("access_key")
                           or os.environ.get("AWS_ACCESS_KEY_ID", "")),
            secret_key=str(o.get("secret_key")
                           or os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
            spool_dir=o["spool_dir"],
            region=str(o.get("region", "us-east-1")),
            wait_time_s=int(o.get("wait_time_seconds", 1)),
            max_messages=int(o.get("max_number_of_messages", 10)),
            delete_message=bool(o.get("delete_message", True)),
        ).start()

    def start_azure_queue_consumer(self):
        """Start the consumer bridge for an `input.azure_queue_storage`
        pipeline and return its handle (caller owns `.stop()`)."""
        import os

        from bento_spark.streaming.cep import duration_ms

        o = (self.conf.get("input") or {}).get("azure_queue_storage")
        if not o:
            raise ValueError("pipeline has no input.azure_queue_storage section")
        from bento_spark.streaming.azure_queue import AzureQueueSpooler

        account = str(o.get("storage_account")
                      or os.environ.get("AZURE_STORAGE_ACCOUNT", ""))
        vis = o.get("dequeue_visibility_timeout", "30s")
        return AzureQueueSpooler(
            endpoint=str(o.get("endpoint")
                         or f"https://{account}.queue.core.windows.net"),
            account=account,
            account_key=str(o.get("storage_access_key")
                            or os.environ.get("AZURE_STORAGE_ACCESS_KEY", "")),
            queue=str(o["queue_name"]),
            spool_dir=o["spool_dir"],
            max_messages=int(o.get("max_in_flight", 16)),
            visibility_timeout_s=max(1, duration_ms(str(vis)) // 1000),
        ).start()

    @staticmethod
    def _gcs_creds(o: dict) -> dict | None:
        """Service-account fields from the section, a credentials_file
        (the service-account JSON), or None (emulator/unauthenticated)."""
        import json as _json

        if o.get("credentials_file"):
            from pathlib import Path as _Path

            sa = _json.loads(_Path(str(o["credentials_file"])).read_text())
            return {"client_email": sa["client_email"],
                    "private_key": sa["private_key"],
                    "token_uri": sa.get(
                        "token_uri", "https://oauth2.googleapis.com/token")}
        c = o.get("credentials")
        if c:
            return {"client_email": str(c["client_email"]),
                    "private_key": str(c["private_key"]),
                    "token_uri": str(c.get(
                        "token_uri", "https://oauth2.googleapis.com/token"))}
        return None

    def start_cypher_consumer(self):
        """Start the consumer bridge for an `input.cypher` pipeline
        (caller owns `.stop()`; `.wait_finished()` — the reference input
        shuts down once the query's records are exhausted). Fields
        follow cypher/input_cypher.go + conn_fields.go: uri, database,
        query, no_auth / basic_auth.{user,password}."""
        o = (self.conf.get("input") or {}).get("cypher")
        if not o:
            raise ValueError("pipeline has no input.cypher section")
        from bento_spark.streaming.cypher import CypherSpooler

        auth = o.get("basic_auth") or {}
        no_auth = bool(o.get("no_auth", False))
        return CypherSpooler(
            uri=str(o["uri"]), query=str(o["query"]),
            spool_dir=o["spool_dir"], database=str(o.get("database", "")),
            user=None if no_auth else auth.get("user"),
            password=None if no_auth else auth.get("password"),
        ).start()

    def start_cockroachdb_consumer(self):
        """Start the consumer bridge for an `input.cockroachdb_changefeed`
        pipeline (caller owns `.stop()`; the changefeed statement never
        completes). Fields follow cockroachdb/input_changefeed.go: dsn,
        tables, options, cursor_cache (here a spool-dir dotfile playing
        the reference's cache-resource role — set truthy to resume from
        the last delivered row's `updated` timestamp)."""
        o = (self.conf.get("input") or {}).get("cockroachdb_changefeed")
        if not o:
            raise ValueError(
                "pipeline has no input.cockroachdb_changefeed section")
        from bento_spark.streaming.cockroachdb import ChangefeedSpooler

        return ChangefeedSpooler(
            dsn=str(o["dsn"]),
            tables=[str(t) for t in (o.get("tables") or [])],
            spool_dir=o["spool_dir"],
            options=[str(x) for x in (o.get("options") or [])],
            cursor_cache=bool(o.get("cursor_cache")),
        ).start()

    def start_subprocess_consumer(self):
        """Start the child-process bridge for an `input.subprocess`
        pipeline (caller owns `.stop()`). Fields follow
        input_subprocess.go: name, args, restart_on_exit, max_buffer."""
        o = (self.conf.get("input") or {}).get("subprocess")
        if not o:
            raise ValueError("pipeline has no input.subprocess section")
        from bento_spark.streaming.subprocess_io import SubprocessSpooler

        return SubprocessSpooler(
            name=str(o["name"]),
            args=[str(a) for a in (o.get("args") or [])],
            spool_dir=o["spool_dir"],
            restart_on_exit=bool(o.get("restart_on_exit", False)),
            max_buffer=int(o.get("max_buffer", 65536)),
        ).start()

    def start_etcd_consumer(self):
        """Start the watcher bridge for an `input.etcd` pipeline (caller
        owns `.stop()`; the watch never completes). Fields follow
        etcd/input.go + client.go: endpoints, key, options.{with_prefix,
        with_range, with_progress_notify, with_created_notify,
        with_filter_put, with_filter_delete}, auth.{enabled, username,
        password}."""
        o = (self.conf.get("input") or {}).get("etcd")
        if not o:
            raise ValueError("pipeline has no input.etcd section")
        from bento_spark.streaming.etcd import EtcdWatchSpooler

        opts = o.get("options") or {}
        auth = o.get("auth") or {}
        return EtcdWatchSpooler(
            endpoints=[str(e) for e in (o.get("endpoints") or [])],
            key=str(o["key"]),
            spool_dir=o["spool_dir"],
            with_prefix=bool(opts.get("with_prefix", False)),
            with_range=str(opts.get("with_range", "")),
            progress_notify=bool(opts.get("with_progress_notify", False)),
            filter_put=bool(opts.get("with_filter_put", False)),
            filter_delete=bool(opts.get("with_filter_delete", False)),
            created_notify=bool(opts.get("with_created_notify", False)),
            username=str(auth.get("username", "")),
            password=str(auth.get("password", "")),
            auth_enabled=bool(auth.get("enabled", False)),
        ).start()

    def start_discord_consumer(self):
        """Start the poller bridge for an `input.discord` pipeline
        (caller owns `.stop()`). Fields follow discord/input.go:
        channel_id, bot_token, poll_period, limit."""
        o = (self.conf.get("input") or {}).get("discord")
        if not o:
            raise ValueError("pipeline has no input.discord section")
        from bento_spark.streaming.cep import duration_ms
        from bento_spark.streaming.discord import DiscordSpooler

        return DiscordSpooler(
            endpoint=str(o.get("endpoint") or "https://discord.com"),
            channel_id=str(o["channel_id"]),
            bot_token=str(o["bot_token"]),
            spool_dir=o["spool_dir"],
            poll_period_s=duration_ms(str(o.get("poll_period",
                                                "1m"))) / 1000.0,
            limit=int(o.get("limit", 100)),
        ).start()

    def start_bigquery_consumer(self):
        """Start the consumer bridge for an `input.gcp_bigquery_select`
        pipeline (caller owns `.stop()`; `.wait_finished()`). Fields
        follow gcp/input_bigquery_select.go: project, table, columns,
        where + positional `args`, prefix/suffix."""
        o = (self.conf.get("input") or {}).get("gcp_bigquery_select")
        if not o:
            raise ValueError(
                "pipeline has no input.gcp_bigquery_select section")
        from bento_spark.streaming.bigquery import BigQuerySpooler

        return BigQuerySpooler(
            endpoint=str(o.get("endpoint")
                         or "https://bigquery.googleapis.com"),
            project=str(o["project"]), table=str(o["table"]),
            columns=[str(c) for c in (o.get("columns") or ["*"])],
            spool_dir=o["spool_dir"], where=str(o.get("where", "")),
            args=list(o.get("args") or []) or None,
            prefix=str(o.get("prefix", "")), suffix=str(o.get("suffix", "")),
            credentials=self._gcs_creds(o),
        ).start()

    def start_gcs_consumer(self):
        """Start the consumer bridge for an `input.gcp_cloud_storage`
        pipeline and return its handle (caller owns `.stop()`;
        `.wait_finished()` — the reference consumes the listing then
        stops). Fields follow gcp/input_cloud_storage.go: bucket, prefix,
        delete_objects."""
        o = (self.conf.get("input") or {}).get("gcp_cloud_storage")
        if not o:
            raise ValueError("pipeline has no input.gcp_cloud_storage section")
        from bento_spark.streaming.gcs import GcsSpooler

        return GcsSpooler(
            endpoint=str(o.get("endpoint") or "https://storage.googleapis.com"),
            bucket=str(o["bucket"]),
            spool_dir=o["spool_dir"],
            prefix=str(o.get("prefix", "")),
            delete_objects=bool(o.get("delete_objects", False)),
            credentials=self._gcs_creds(o),
        ).start()

    def start_sftp_consumer(self):
        """Start the consumer bridge for an `input.sftp` pipeline and
        return its handle (caller owns `.stop()`; `.wait_finished()` for
        the one-pass mode). Fields follow sftp/input.go: address,
        credentials.username/password, paths (globs), delete_on_finish,
        watcher.{enabled,poll_interval,minimum_age}. private_key_file
        credentials raise: the transport implements password auth (see
        streaming/sftp.py's credential-scope note)."""
        o = (self.conf.get("input") or {}).get("sftp")
        if not o:
            raise ValueError("pipeline has no input.sftp section")
        from bento_spark.streaming.cep import duration_ms
        from bento_spark.streaming.sftp import SftpSpooler, parse_sftp_address

        creds = o.get("credentials") or {}
        host, port = parse_sftp_address(str(o.get("address",
                                                  "127.0.0.1:22")))
        w = o.get("watcher") or {}
        return SftpSpooler(
            host=host, port=port,
            username=str(creds.get("username", "")),
            password=str(creds.get("password", "")),
            private_key_pem=self._sftp_private_key(creds),
            paths=[str(p) for p in (o.get("paths") or [])],
            spool_dir=o["spool_dir"],
            delete_on_finish=bool(o.get("delete_on_finish", False)),
            watcher=bool(w.get("enabled", False)),
            poll_interval_s=duration_ms(str(w.get("poll_interval",
                                                  "1s"))) / 1000.0,
            minimum_age_s=duration_ms(str(w.get("minimum_age",
                                                "0s"))) / 1000.0,
        ).start()

    @staticmethod
    def _sftp_private_key(creds: dict) -> str | None:
        """credentials.private_key_file -> PEM text (RFC 4252 §7
        publickey auth, rsa-sha2-256). Passphrase-encrypted keys need
        PEM decryption the pure-Python parser doesn't do — name it."""
        if not creds.get("private_key_file"):
            return None
        if creds.get("private_key_pass"):
            raise ValueError(
                "sftp: private_key_pass (encrypted PEM) is not supported "
                "by the built-in SSH transport — decrypt the key first "
                "(openssl pkcs8) or use credentials.password")
        from pathlib import Path as _Path

        return _Path(str(creds["private_key_file"])).read_text()

    def start_service_bus_consumer(self):
        """Start the consumer bridge for an `input.azure_service_bus_queue`
        pipeline and return its handle (caller owns `.stop()`). The
        connection string follows the reference
        (input_service_bus_queue.go): Endpoint=sb://..;
        SharedAccessKeyName=..;SharedAccessKey=..[;EntityPath=..]."""
        o = (self.conf.get("input") or {}).get("azure_service_bus_queue")
        if not o:
            raise ValueError(
                "pipeline has no input.azure_service_bus_queue section")
        from bento_spark.streaming.azure_servicebus import (
            ServiceBusSpooler,
            parse_sb_connection_string,
        )

        host, key_name, key, entity = parse_sb_connection_string(
            str(o["connection_string"]))
        # real Service Bus listens on 5671 (amqps); the Endpoint may carry
        # an explicit port (the mini broker / emulators do)
        port = int(o.get("port", 0))
        if not port:
            m = re.search(r"Endpoint=sb://[^:;/]+:(\d+)",
                          str(o["connection_string"]))
            port = int(m.group(1)) if m else 5671
        return ServiceBusSpooler(
            host=host, port=port,
            queue=str(o.get("queue") or entity or ""),
            spool_dir=o["spool_dir"], key_name=key_name, key=key,
            nack_reject_patterns=[str(p) for p in
                                  (o.get("nack_reject_patterns") or [])],
        ).start()

    def start_cosmos_consumer(self):
        """Start the consumer bridge for an `input.azure_cosmosdb`
        pipeline and return its handle (caller owns `.stop()`; exposes
        `.wait_finished()`). `partition_keys_map` follows the reference:
        a Bloblang mapping evaluated once with no input — i.e. a literal
        (input_cosmosdb.go:96)."""
        o = (self.conf.get("input") or {}).get("azure_cosmosdb")
        if not o:
            raise ValueError("pipeline has no input.azure_cosmosdb section")
        from bento_spark.streaming.cosmosdb import CosmosSpooler, parse_pk_mapping

        endpoint, key = self._cosmos_creds(o)
        pk = (parse_pk_mapping(str(o["partition_keys_map"]))
              if o.get("partition_keys_map") is not None
              else o.get("partition_key"))
        # engine contract: STRING partition keys end-to-end (the per-row
        # mapping on the write side compiles to a string column)
        if pk is not None and not isinstance(pk, str):
            pk = ("true" if pk is True else "false" if pk is False
                  else str(pk))
        params = [{"name": str(p["name"]), "value": p["value"]}
                  for p in (o.get("args") or [])]
        return CosmosSpooler(
            endpoint=endpoint, account_key=key,
            database=str(o["database"]), container=str(o["container"]),
            partition_key=pk, query=str(o["query"]),
            spool_dir=o["spool_dir"], parameters=params,
            page_size=int(o.get("batch_count", 100)),
        ).start()

    @staticmethod
    def _cosmos_creds(o: dict) -> tuple[str, str]:
        """connection_string wins over endpoint+account_key, like the
        reference's credential docs."""
        if o.get("connection_string"):
            from bento_spark.streaming.cosmosdb import parse_connection_string

            return parse_connection_string(str(o["connection_string"]))
        return str(o["endpoint"]), str(o["account_key"])

    def start_azure_table_consumer(self):
        """Start the consumer bridge for an `input.azure_table_storage`
        pipeline and return its handle (caller owns `.stop()`; exposes
        `.wait_finished()` — the reference's pager consumes the query then
        stops). Credentials come from the section or the standard
        AZURE_STORAGE_* env vars."""
        import os

        o = (self.conf.get("input") or {}).get("azure_table_storage")
        if not o:
            raise ValueError("pipeline has no input.azure_table_storage section")
        from bento_spark.streaming.azure_table import AzureTableSpooler

        account = str(o.get("storage_account")
                      or os.environ.get("AZURE_STORAGE_ACCOUNT", ""))
        return AzureTableSpooler(
            endpoint=str(o.get("endpoint")
                         or f"https://{account}.table.core.windows.net"),
            account=account,
            account_key=str(o.get("storage_access_key")
                            or os.environ.get("AZURE_STORAGE_ACCESS_KEY", "")),
            table=str(o["table_name"]),
            spool_dir=o["spool_dir"],
            filter=str(o.get("filter", "")),
            select=str(o.get("select", "")),
            page_size=int(o.get("page_size", 1000)),
        ).start()

    def start_azure_blob_consumer(self):
        """Start the consumer bridge for an `input.azure_blob_storage`
        pipeline and return its handle (caller owns `.stop()`; exposes
        `.wait_finished()` — the reference consumes the listing then
        stops). Credentials come from the section or the standard
        AZURE_STORAGE_* env vars."""
        import os

        o = (self.conf.get("input") or {}).get("azure_blob_storage")
        if not o:
            raise ValueError("pipeline has no input.azure_blob_storage section")
        from bento_spark.streaming.azure_blob import AzureBlobSpooler

        account = str(o.get("storage_account")
                      or os.environ.get("AZURE_STORAGE_ACCOUNT", ""))
        return AzureBlobSpooler(
            endpoint=str(o.get("endpoint")
                         or f"https://{account}.blob.core.windows.net"),
            account=account,
            account_key=str(o.get("storage_access_key")
                            or os.environ.get("AZURE_STORAGE_ACCESS_KEY", "")),
            container=str(o["container"]),
            spool_dir=o["spool_dir"],
            prefix=str(o.get("prefix", "")),
            delete_blobs=bool(o.get("delete_objects", False)),
        ).start()

    def start_amqp1_consumer(self):
        """Start the consumer bridge for an `input.amqp_1` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("amqp_1")
        if not o:
            raise ValueError("pipeline has no input.amqp_1 section")
        from bento_spark.streaming.amqp1 import Amqp1Spooler

        url = o.get("url") or (o.get("urls") or [None])[0]
        if not url:
            raise ValueError("input.amqp_1 needs `url` (or `urls`)")
        return Amqp1Spooler(
            url=str(url),
            source_address=str(o["source_address"]),
            spool_dir=o["spool_dir"],
            credit=int(o.get("credit", 64)),
        ).start()

    def start_s3_consumer(self):
        """Start the consumer bridge for an `input.aws_s3` pipeline and
        return its handle (caller owns `.stop()`; plain-listing mode also
        exposes `.wait_finished()` — the reference consumes the listing
        then stops, input_s3.go). Credentials come from the section or
        the standard AWS_* env vars."""
        import os

        o = (self.conf.get("input") or {}).get("aws_s3")
        if not o:
            raise ValueError("pipeline has no input.aws_s3 section")
        from bento_spark.streaming.s3 import S3Spooler

        sqs_block = o.get("sqs") or {}
        return S3Spooler(
            endpoint=str(o.get("endpoint") or
                         f"https://s3.{o.get('region', 'us-east-1')}.amazonaws.com"),
            bucket=str(o["bucket"]),
            access_key=str(o.get("access_key")
                           or os.environ.get("AWS_ACCESS_KEY_ID", "")),
            secret_key=str(o.get("secret_key")
                           or os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
            spool_dir=o["spool_dir"],
            prefix=str(o.get("prefix", "")),
            region=str(o.get("region", "us-east-1")),
            delete_objects=bool(o.get("delete_objects", False)),
            sqs_queue_url=(str(sqs_block["url"]) if sqs_block.get("url") else None),
            sqs_endpoint=(str(sqs_block["endpoint"])
                          if sqs_block.get("endpoint") else None),
            sqs_key_path=str(sqs_block.get("key_path", "Records.*.s3.object.key")),
            sqs_bucket_path=str(sqs_block.get("bucket_path",
                                              "Records.*.s3.bucket.name")),
            sqs_wait_time_s=int(sqs_block.get("wait_time_seconds", 1)),
            sqs_max_messages=int(sqs_block.get("max_number_of_messages", 10)),
        ).start()

    def start_hdfs_consumer(self):
        """Start the consumer bridge for an `input.hdfs` pipeline and
        return its handle (caller owns `.stop()`; `.wait_finished()`
        blocks for the single listing pass — hdfs/input.go consumes the
        directory then stops). Same runtime-resource/plan split as
        start_http_listener."""
        o = (self.conf.get("input") or {}).get("hdfs")
        if not o:
            raise ValueError("pipeline has no input.hdfs section")
        from bento_spark.streaming.hdfs import HdfsSpooler

        return HdfsSpooler(
            hosts=o.get("hosts") or [str(o.get("host", "127.0.0.1:9870"))],
            user=str(o.get("user", "bento")),
            directory=str(o["directory"]),
            spool_dir=o["spool_dir"],
        ).start()

    def start_nanomsg_subscriber(self):
        """Start the socket bridge for an `input.nanomsg` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("nanomsg")
        if not o:
            raise ValueError("pipeline has no input.nanomsg section")
        from bento_spark.streaming.nanomsg import NanomsgSpooler

        return NanomsgSpooler(
            socket_type=str(o.get("socket_type", "PULL")).upper(),
            spool_dir=o["spool_dir"],
            urls=[str(u) for u in o.get("urls") or []],
            bind=bool(o.get("bind", False)),
            sub_filters=[str(f) for f in o["sub_filters"]]
            if o.get("sub_filters") is not None else None,
        ).start()

    def start_zmq_subscriber(self):
        """Start the socket bridge for an `input.zmq4` pipeline and return
        its handle (caller owns `.stop()`). Same runtime-resource/plan
        split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("zmq4")
        if not o:
            raise ValueError("pipeline has no input.zmq4 section")
        from bento_spark.streaming.zeromq import ZmqSpooler

        return ZmqSpooler(
            socket_type=str(o.get("socket_type", "PULL")).upper(),
            spool_dir=o["spool_dir"],
            urls=[str(u) for u in o.get("urls") or []],
            bind=bool(o.get("bind", False)),
            sub_filters=[str(f) for f in o.get("sub_filters") or []],
        ).start()

    def start_beanstalkd_consumer(self):
        """Start the consumer bridge for an `input.beanstalkd` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("beanstalkd")
        if not o:
            raise ValueError("pipeline has no input.beanstalkd section")
        from bento_spark.streaming.beanstalkd import (
            BeanstalkdSpooler,
            parse_beanstalkd_addr,
        )

        host, port = parse_beanstalkd_addr(str(o.get("address", "127.0.0.1:11300")))
        return BeanstalkdSpooler(host=host, port=port, spool_dir=o["spool_dir"]).start()

    def start_nsq_consumer(self):
        """Start the consumer bridge for an `input.nsq` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("nsq")
        if not o:
            raise ValueError("pipeline has no input.nsq section")
        from bento_spark.streaming.nsq import NsqSpooler, parse_nsqd_addr

        addr = (o.get("nsqd_tcp_addresses") or ["127.0.0.1:4150"])[0]
        host, port = parse_nsqd_addr(str(addr))
        return NsqSpooler(
            host=host, port=port, topic=str(o["topic"]),
            channel=str(o.get("channel", "bento_spark")),
            spool_dir=o["spool_dir"],
            max_in_flight=int(o.get("max_in_flight", 64)),
            max_attempts=int(o.get("max_attempts", 5)),
        ).start()

    def start_amqp_consumer(self):
        """Start the consumer bridge for an `input.amqp_0_9` pipeline and
        return its handle (caller owns `.stop()`). Same runtime-resource/
        plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("amqp_0_9")
        if not o:
            raise ValueError("pipeline has no input.amqp_0_9 section")
        from bento_spark.streaming.amqp import AmqpSpooler, parse_amqp_url

        url = (o.get("urls") or [o.get("url", "amqp://127.0.0.1:5672")])[0]
        host, port, vhost = parse_amqp_url(str(url))
        qd = o.get("queue_declare") or {}
        binds = [
            (b["exchange"], b.get("key", ""))
            for b in o.get("bindings_declare") or []
        ]
        return AmqpSpooler(
            host=host, port=port, queue=o["queue"], spool_dir=o["spool_dir"],
            vhost=vhost, declare=bool(qd.get("enabled", False)), bindings=binds,
            consumer_tag=o.get("consumer_tag", "bento_spark"),
            prefetch_count=int(o.get("prefetch_count", 64)),
        ).start()

    def start_redis_spooler(self):
        """Start the subscriber/consumer bridge for a redis_list /
        redis_pubsub / redis_streams input pipeline and return its handle
        (caller owns `.stop()`). Same runtime-resource/plan split as
        start_http_listener."""
        inp = self.conf.get("input") or {}
        from bento_spark.streaming.redis import (
            RedisListSpooler,
            RedisPubSubSpooler,
            RedisStreamsSpooler,
        )

        if "redis_list" in inp:
            o = inp["redis_list"]
            host, port = self._redis_addr(o)
            return RedisListSpooler(
                host=host, port=port, spool_dir=o["spool_dir"], key=o["key"],
                command=o.get("command", "blpop"),
            ).start()
        if "redis_pubsub" in inp:
            o = inp["redis_pubsub"]
            host, port = self._redis_addr(o)
            return RedisPubSubSpooler(
                host=host, port=port, spool_dir=o["spool_dir"],
                channels=list(o["channels"]),
                use_patterns=bool(o.get("use_patterns", False)),
            ).start()
        if "redis_streams" in inp:
            o = inp["redis_streams"]
            host, port = self._redis_addr(o)
            return RedisStreamsSpooler(
                host=host, port=port, spool_dir=o["spool_dir"],
                streams=list(o["streams"]),
                body_key=o.get("body_key", "body"),
                consumer_group=o.get("consumer_group", "bento_spark"),
                client_id=o.get("client_id", "bento_spark_consumer"),
                limit=int(o.get("limit", 10)),
            ).start()
        raise ValueError(
            "pipeline has no redis_list/redis_pubsub/redis_streams input section"
        )

    @staticmethod
    def _redis_addr(o: dict) -> tuple[str, int]:
        """First entry of the reference's `url` field (redis://host:port)
        or a bare `address: host:port`."""
        from bento_spark.streaming.redis import parse_redis_url

        url = (o.get("urls") or [None])[0] or o.get("url") or o.get("address", "127.0.0.1:6379")
        return parse_redis_url(str(url))

    @staticmethod
    def _sync_dir_of(o: dict) -> str:
        """The reply handoff dir shared by the listener and the
        sync_response writer (defaults next to the spool dir)."""
        return str(o.get("sync_dir") or (str(o["spool_dir"]).rstrip("/") + "_resp"))

    def start_http_poller(self):
        """Start the driver-side poller for an `input.http_client` pipeline
        and return its handle (caller owns `.stop()`)."""
        o = (self.conf.get("input") or {}).get("http_client")
        if not o:
            raise ValueError("pipeline has no input.http_client section")
        from bento_spark.streaming.http_server import HttpPollSpooler

        from bento_spark.streaming.cep import duration_ms

        return HttpPollSpooler(
            url=o["url"],
            spool_dir=o["spool_dir"],
            interval_s=duration_ms(str(o.get("interval", "1s"))) / 1000.0,
            method=o.get("method", "GET"),
            headers=o.get("headers"),
            drop_empty=bool(o.get("drop_empty", True)),
            drop_repeats=bool(o.get("drop_repeats", False)),
        ).start()

    def start_websocket(self):
        """Connect the ws:// client for an `input.websocket` pipeline and
        return its handle (caller owns `.stop()`)."""
        o = (self.conf.get("input") or {}).get("websocket")
        if not o:
            raise ValueError("pipeline has no input.websocket section")
        from bento_spark.streaming.http_server import WebSocketSpooler

        return WebSocketSpooler(
            url=o["url"], spool_dir=o["spool_dir"],
            open_message=o.get("open_message"),
            tls_insecure=bool(o.get("tls_insecure", False)),
        ).start()

    def start_socket_listener(self):
        """Start the TCP listener for an `input.socket_server` pipeline and
        return its handle (caller owns `.stop()`; `.address` is (host,
        port)). Same runtime-resource/plan split as start_http_listener."""
        o = (self.conf.get("input") or {}).get("socket_server")
        if not o:
            raise ValueError("pipeline has no input.socket_server section")
        from bento_spark.streaming.http_server import TcpSpoolServer

        host, _, port = str(o.get("address", "127.0.0.1:0")).partition(":")
        return TcpSpoolServer(
            spool_dir=o["spool_dir"], host=host or "127.0.0.1", port=int(port or 0)
        ).start()

    # -------------------------------------------------------- cache resources
    def _cache_backend(self, resource: str, spark: SparkSession, key_col: str = "key",
                       _visiting: frozenset | None = None):
        """Resolve a `resource:` reference to a cache backend. A label
        declared under top-level `cache_resources:` wins (the reference
        registers caches as named resources — config/schema.go's
        cache_resources section, 16 backends under internal/impl/*/
        cache_*.go); an undeclared resource falls back to the historical
        behavior of treating the string as a parquet KeyValueCache path.

        In-process kinds (memory/lru/ttlru/noop) and multilevel compositions
        are memoized per Pipeline by label — a `set` in one processor and a
        `get` in a later one must hit the SAME store, exactly as the
        reference shares one registered resource instance across components."""
        from bento_spark.operators.cache import FileCache, KeyValueCache

        mem = self.__dict__.setdefault("_mem_cache_instances", {})
        if resource in mem:
            return mem[resource]
        for r in self.conf.get("cache_resources") or []:
            if isinstance(r, dict) and r.get("label") == resource:
                if any(k in r for k in ("memory", "lru", "ttlru", "ristretto")):
                    from bento_spark.operators.cache import MemoryCache

                    kind = next(k for k in ("memory", "lru", "ttlru",
                                            "ristretto") if k in r)
                    o = r[kind] or {}
                    # reference defaults: lru cap 1000 (cache_lru.go:17),
                    # ttlru cap 1024 + default_ttl 5m (cache_ttlru.go:15-19),
                    # memory uncapped + default_ttl 5m (cache_memory.go);
                    # ristretto (dgraph/cache_ristretto.go) = an in-process
                    # TTL cache — same engine-level semantics as ttlru here
                    # (the reference's frequency-based admission is an
                    # eviction heuristic, not an API contract), default_ttl
                    # optional like the reference's
                    cap = o.get("cap", {"lru": 1000, "ttlru": 1024}.get(kind))
                    ttl = o.get("default_ttl",
                                "5m" if kind in ("memory", "ttlru") else None)
                    mem[resource] = MemoryCache(
                        spark, cap=cap, default_ttl=ttl,
                        init_values=o.get("init_values"),
                    )
                    return mem[resource]
                if "noop" in r:
                    from bento_spark.operators.cache import NoopCache

                    mem[resource] = NoopCache(spark)
                    return mem[resource]
                if "multilevel" in r:
                    from bento_spark.operators.cache import MultilevelCache

                    names = r["multilevel"] or []
                    if resource in names:
                        raise ValueError(f"multilevel cache {resource!r} references itself")
                    # mutual cycles (A: multilevel [B], B: multilevel [A])
                    # would recurse to RecursionError — the memo entry only
                    # lands after construction, so thread a visiting-set
                    visiting = _visiting or frozenset()
                    if resource in visiting:
                        raise ValueError(
                            f"multilevel cache cycle through {resource!r} "
                            f"(visiting: {sorted(visiting)})")
                    mem[resource] = MultilevelCache(
                        [self._cache_backend(str(n), spark,
                                             _visiting=visiting | {resource})
                         for n in names]
                    )
                    return mem[resource]
                if "file" in r:
                    f = r["file"] or {}
                    if "directory" not in f:
                        raise ValueError(
                            f"cache resource {resource!r}: file backend needs `directory`"
                        )
                    return FileCache(
                        spark, f["directory"], key_col=key_col,
                        value_col=f.get("value_col", "value"), ttl=f.get("ttl"),
                    )
                if "parquet" in r:
                    p = r["parquet"] or {}
                    if "path" not in p:
                        raise ValueError(
                            f"cache resource {resource!r}: parquet backend needs `path`"
                        )
                    return KeyValueCache(spark, p["path"], key_col=key_col)
                if "sqlite" in r:
                    s = r["sqlite"] or {}
                    if "path" not in s:
                        raise ValueError(
                            f"cache resource {resource!r}: sqlite backend needs `path`"
                        )
                    from bento_spark.operators.cache import SqliteCache

                    return SqliteCache(
                        spark, s["path"], table=s.get("table", "bento_cache"),
                        key_col=key_col, value_col=s.get("value_col", "value"),
                    )
                if "mongodb" in r:
                    d = r["mongodb"] or {}
                    if "url" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: mongodb backend needs `url`"
                        )
                    from bento_spark.streaming.mongodb import MongoCache

                    return MongoCache(
                        spark, d["url"], database=d.get("database", "bento"),
                        collection=d.get("collection", "cache"),
                        key_field=d.get("key_field", "key"),
                        value_field=d.get("value_field", "value"),
                        key_col=key_col, value_col=d.get("value_col", "value"),
                    )
                if "aws_dynamodb" in r:
                    d = r["aws_dynamodb"] or {}
                    if "table" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: aws_dynamodb "
                            "backend needs `table`"
                        )
                    import os as _os

                    from bento_spark.streaming.dynamodb import DynamoCache

                    return DynamoCache(
                        spark,
                        str(d.get("endpoint")
                            or f"https://dynamodb.{d.get('region', 'us-east-1')}.amazonaws.com"),
                        str(d["table"]),
                        str(d.get("access_key")
                            or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                        str(d.get("secret_key")
                            or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                        region=str(d.get("region", "us-east-1")),
                        hash_key=str(d.get("hash_key", "key")),
                        data_key=str(d.get("data_key", "value")),
                        ttl_key=d.get("ttl_key"),
                        default_ttl=d.get("default_ttl"),
                        key_col=key_col, value_col=d.get("value_col", "value"),
                    )
                if "aws_s3" in r:
                    d = r["aws_s3"] or {}
                    if "bucket" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: aws_s3 backend "
                            "needs `bucket`"
                        )
                    import os as _os

                    from bento_spark.streaming.s3 import S3Cache

                    return S3Cache(
                        spark,
                        str(d.get("endpoint")
                            or f"https://s3.{d.get('region', 'us-east-1')}.amazonaws.com"),
                        str(d["bucket"]),
                        str(d.get("access_key")
                            or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                        str(d.get("secret_key")
                            or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                        region=str(d.get("region", "us-east-1")),
                        content_type=str(d.get("content_type",
                                               "application/octet-stream")),
                        key_col=key_col, value_col=d.get("value_col", "value"),
                    )
                if "gcp_cloud_storage" in r:
                    d = r["gcp_cloud_storage"] or {}
                    if "bucket" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: gcp_cloud_storage "
                            "backend needs `bucket`"
                        )
                    from bento_spark.streaming.gcs import GcsCache

                    return GcsCache(
                        spark,
                        str(d.get("endpoint")
                            or "https://storage.googleapis.com"),
                        str(d["bucket"]),
                        credentials=self._gcs_creds(d),
                        content_type=str(d.get("content_type",
                                               "application/octet-stream")),
                        key_col=key_col, value_col=d.get("value_col", "value"),
                    )
                if "couchbase" in r:
                    d = r["couchbase"] or {}
                    if "url" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: couchbase backend "
                            "needs `url`"
                        )
                    from bento_spark.streaming.couchbase import CouchbaseCache

                    return CouchbaseCache(
                        spark, str(d["url"]), bucket=d.get("bucket"),
                        username=d.get("username"), password=d.get("password"),
                        key_col=key_col, value_col=d.get("value_col", "value"),
                        default_ttl=d.get("default_ttl"),
                    )
                if "nats_kv" in r:
                    # KV bucket over JetStream subjects (nats/cache_kv.go):
                    # acknowledged publishes, Create via expected-last-seq 0,
                    # DIRECT.GET last_by_subj reads, DEL markers
                    d = r["nats_kv"] or {}
                    if "bucket" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: nats_kv backend "
                            "needs `bucket`"
                        )
                    from bento_spark.streaming.nats import NatsKvCache

                    url = (d.get("urls") or [d.get("url", "127.0.0.1:4222")])[0]
                    return NatsKvCache(
                        spark, str(url),
                        bucket=str(d["bucket"]), key_col=key_col,
                        value_col=d.get("value_col", "value"),
                    )
                if "memcached" in r:
                    d = r["memcached"] or {}
                    if "addresses" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: memcached backend "
                            "needs `addresses`"
                        )
                    from bento_spark.streaming.memcached import MemcachedCache

                    return MemcachedCache(
                        spark, str(d["addresses"][0]), key_col=key_col,
                        value_col=d.get("value_col", "value"),
                        prefix=d.get("prefix", ""),
                        default_ttl=d.get("default_ttl", "300s"),
                    )
                if "redis" in r:
                    d = r["redis"] or {}
                    if "url" not in d:
                        raise ValueError(
                            f"cache resource {resource!r}: redis backend needs `url`"
                        )
                    from bento_spark.streaming.redis import RedisCache

                    return RedisCache(
                        spark, d["url"], key_col=key_col,
                        value_col=d.get("value_col", "value"),
                        prefix=d.get("prefix", ""),
                        default_ttl=d.get("default_ttl"),
                    )
                raise ValueError(
                    f"cache resource {resource!r} needs a backend section "
                    "(file: {directory: ...}, parquet: {path: ...}, "
                    "sqlite: {path: ...}, redis: {url: ...}, "
                    "memcached: {addresses: [...]}, "
                    "memory/lru/ttlru: {cap, default_ttl, init_values}, "
                    "noop: {}, or multilevel: [labels...])"
                )
        return KeyValueCache(spark, resource, key_col=key_col)

    # ------------------------------------------------------------ rate limits
    def _rate_limit_conf(self, label: str) -> dict:
        """Look up a named entry in top-level `rate_limit_resources:`
        (reference: rate limits registered as shared resources,
        rate_limit_local.go:31; both the flat `{label, count, interval}`
        and the reference's nested `{label, local: {...}}` shapes parse)."""
        for r in self.conf.get("rate_limit_resources") or []:
            if isinstance(r, dict) and r.get("label") == label:
                return r.get("local") or r
        known = [
            r.get("label") for r in self.conf.get("rate_limit_resources") or []
            if isinstance(r, dict)
        ]
        raise ValueError(
            f"unknown rate_limit resource {label!r} (declared: {known or 'none'} "
            "— add it under top-level rate_limit_resources:)"
        )

    def _rate_limit_share(self, label, df: DataFrame):
        """Resolve a component's `rate_limit: label` reference to a
        picklable limiter spec for operators/rate_limit.make_limiter:
        the default local resource becomes a per-partition
        (rate_per_s, burst) token-bucket share (dividing by max task
        concurrency bounds the cluster-wide rate without coordination);
        a `redis:` resource becomes a shared fixed-window spec — ONE
        Redis-keyed window for every worker and every pipeline naming
        the resource (rate_limit.go:89), no division needed."""
        if label is None:
            return None
        body = self._rate_limit_conf(str(label))
        from bento_spark.streaming.cep import duration_ms

        if isinstance(body.get("redis"), dict):
            rd = body["redis"]
            from bento_spark.streaming.redis import parse_redis_url

            host, port = parse_redis_url(rd.get("url", "tcp://127.0.0.1:6379"))
            return {
                "kind": "redis",
                "host": host,
                "port": port,
                "key": str(rd.get("key", f"bento_rl_{label}")),
                "count": int(rd.get("count", body.get("count", 1000))),
                "interval_ms": duration_ms(str(rd.get("interval", body.get("interval", "1s")))),
            }
        from bento_spark.operators.rate_limit import per_partition_share

        parallelism = int(
            body.get("parallelism")
            or df.sparkSession.sparkContext.defaultParallelism
        )
        return per_partition_share(
            int(body.get("count", 1000)),
            duration_ms(str(body.get("interval", "1s"))),
            parallelism,
        )

    @staticmethod
    def _proto_source(o: dict) -> str | None:
        """Concatenated .proto source for the protobuf processors: inline
        `proto` and/or `proto_file`/`proto_files` paths (the reference's
        import_paths model — all sources share one registry). None when
        only `descriptor_file` is configured (jar-gated path)."""
        parts = []
        if o.get("proto"):
            parts.append(o["proto"])
        files = o.get("proto_files") or ([o["proto_file"]] if o.get("proto_file") else [])
        for path in files:
            with open(path, encoding="utf-8") as fh:
                parts.append(fh.read())
        if parts:
            return "\n".join(parts)
        if not o.get("descriptor_file"):
            raise ValueError(
                "protobuf processor needs a schema: `proto` (inline source), "
                "`proto_file(s)` (paths), or `descriptor_file` (compiled set, "
                "requires the spark-protobuf jar)"
            )
        return None

    # ------------------------------------------------------------- processors
    def _apply_processors(self, df: DataFrame) -> DataFrame:
        procs = (self.conf.get("pipeline") or {}).get("processors") or []
        return self._error_strategy(self._chain(procs), df)

    def _error_strategy(self, chain, df: DataFrame) -> DataFrame:
        """Engine-level `error_handling:` strategy (errorhandling/docs.go:7,
        applied in cli/common/manager.go:114-121) — ONE knob that flips the
        whole pipeline's error posture, composing the in-band error-column
        machinery:

        - none (default): errored rows flow flagged; outputs decide.
        - reject: errored rows are split off the main output after the
          chain (strict mode, bundle/strict/processor.go) — to
          `error_handling.dlq` (parquet) when given, else dropped.
        - retry: re-run the chain while errored rows exist, up to
          `max_attempts` (default 3), then apply `on_exhausted`
          (none|reject, default none). The reference's feedback pipeline
          retries failed messages forever (strict/pipeline.go backoff with
          MaxElapsedTime=0); a bounded loop is the deliberate deviation —
          an unbounded retry of a deterministic failure is a hang, not a
          feature. A full deterministic chain converges on attempt 2 (same
          errors), so permanent failures cost max_attempts-1 extra passes;
          transient stages (http/subprocess) get real second chances.
        """
        eh = self.conf.get("error_handling") or {}
        strategy = eh.get("strategy", "none")
        if strategy not in ("none", "reject", "retry"):
            raise ValueError(
                f"error_handling.strategy must be none|reject|retry, got {strategy!r}"
            )
        out = chain(df)
        if df.isStreaming:
            # streaming: reject filters here; retry is applied at the SINK —
            # errored rows raise inside foreachBatch so Spark replays the
            # micro-batch (task retries + checkpoint restart), the native
            # analogue of the reference's feedback pipeline (see run_stream's
            # retry wrapper)
            if strategy == "reject" and "error" in out.columns:
                if eh.get("dlq"):
                    # capture BEFORE the filter: run_stream starts a side
                    # DLQ query over this branch (same dual-query pattern
                    # as window+output.dlq) — filtering first would mean
                    # the DLQ sink never sees an errored row
                    self._reject_errored = (
                        out.filter(F.col("error").isNotNull()),
                        str(eh["dlq"]),
                    )
                return out.filter(F.col("error").isNull())
            return out
        if strategy == "retry":
            max_attempts = int(eh.get("max_attempts", 3))
            for _ in range(max_attempts - 1):
                # cheap driver-side convergence probe on a bounded sample —
                # acceptable because retry loops are per-micro-batch, not
                # per-row, and exit immediately for clean batches
                if not out.filter(F.col("error").isNotNull()).limit(1).take(1):
                    return out
                out = chain(df)
            if eh.get("on_exhausted", "none") == "reject":
                strategy = "reject"
        if strategy == "reject":
            dlq = eh.get("dlq")
            if dlq and "error" in out.columns:
                # materialize ONCE so DLQ and main output agree on which
                # rows errored (non-deterministic stages — http, subprocess
                # — could otherwise diverge between the two evaluations);
                # the write itself is DEFERRED to run_batch/flush time so
                # plan-building stays side-effect-free and repeated builds
                # don't append duplicate DLQ rows
                out = out.localCheckpoint(eager=True)
                self._batch_dlq_pending = (
                    out.filter(F.col("error").isNotNull()),
                    str(dlq),
                )
            return out.filter(F.col("error").isNull()) if "error" in out.columns else out
        return out

    def processor_chain(self, procs: list | None):
        """Public chain compiler — the `bento test` runner targets a
        processor list selected by JSON pointer (cli/test/case.go Provide)."""
        return self._chain(procs)

    def _chain(self, procs: list | None):
        """Compile a processor list to a DataFrame transform — the unit of
        composition for nested sections (switch cases, group_by groups, try
        bodies, while loops: the reference nests processor lists the same
        way, internal/impl/pure/processor_switch.go:104)."""

        def run(df: DataFrame) -> DataFrame:
            for p in procs or []:
                if not isinstance(p, dict) or len(p) != 1:
                    raise ValueError(f"each processor must be a single-key map, got {p!r}")
                name, opts = next(iter(p.items()))
                df = self._apply_one(df, name, opts)
            return df

        return run

    def _apply_one(self, df: DataFrame, name: str, opts: Any) -> DataFrame:
        if name in ("mapping", "mutation", "bloblang"):
            # mutation = mapping with in-place assignment semantics
            # (processor_mutation.go:15) — identical compilation here since
            # our assignments are withColumn either way; `bloblang` is the
            # reference's older name for the same processor
            return compile_mapping(opts).apply(df)
        if name == "sleep":
            return df  # throttling is a trigger/rate concern in Spark (below)
        if name == "rate_limit":
            # token-bucket rate limiting (processor_rate_limit.go:32,
            # rate_limit_local.go:16) maps to source-side pacing in Spark:
            # maxFilesPerTrigger/maxOffsetsPerTrigger + trigger interval.
            # Recorded on the plan; run_stream maps `interval` to the
            # processingTime trigger in continuous mode (see run_stream).
            # `resource: label` references a shared rate_limit_resources
            # entry (the reference processor's only field) — its interval
            # becomes the pacing interval.
            o = dict(opts or {})
            if "resource" in o:
                body = self._rate_limit_conf(str(o.pop("resource")))
                o.setdefault(
                    "interval",
                    body.get("interval")
                    or (body.get("redis") or {}).get("interval", "1s"),
                )
            self.conf.setdefault("_rate_limit", o)
            return df
        if name == "filter":
            return df.filter(compile_expr(opts))
        if name == "audio_decode":
            return with_decoded_pcm(df)
        if name == "image_resize":
            # thumbnail stage: decode -> box-average/nearest resize ->
            # deterministic re-encode (images/udfs.py)
            from bento_spark.images.udfs import with_image_resize

            o = opts or {}
            return with_image_resize(
                df, int(o["width"]), int(o["height"]),
                col=o.get("column", "bytes"), out_col=o.get("out"),
            )
        if name == "image_features":
            # second multimodal family (images/udfs.py): PNG decode +
            # feature scalars, same Arrow contract as audio_features
            from bento_spark.images.udfs import with_image_features

            o = opts or {}
            return with_image_features(
                df, col=o.get("column", "bytes"),
                keep_payload=bool(o.get("keep_payload", True)),
            )
        if name == "video_meta":
            # third multimodal family (video/udfs.py): O(1) header-only
            # metadata parse, no frame decode
            from bento_spark.video.udfs import with_video_meta

            o = opts or {}
            return with_video_meta(df, col=o.get("column", "bytes"))
        if name == "frame_sample":
            # explode one row per sampled frame; frames are sliced out of
            # the container decode-free (video/container.py)
            from bento_spark.video.udfs import with_frame_sample

            o = opts or {}
            mf = o.get("max_frames")
            return with_frame_sample(
                df, int(o["every"]), col=o.get("column", "bytes"),
                max_frames=None if mf is None else int(mf),
                keep_payload=bool(o.get("keep_payload", False)),
            )
        if name == "video_features":
            from bento_spark.video.udfs import with_video_features

            o = opts or {}
            return with_video_features(
                df, col=o.get("column", "bytes"),
                keep_payload=bool(o.get("keep_payload", True)),
            )
        if name == "audio_features":
            o = opts or {}
            # YAML pipelines keep pass-through semantics by default; set
            # keep_payload: false to drop `bytes` from the UDF output (the
            # scale-path default for agg-bound pipelines)
            return with_audio_features(df, keep_payload=bool(o.get("keep_payload", True)))
        if name == "audio_normalize":
            o = opts or {}
            return with_normalized_clip(
                df, target_sr=int(o.get("target_sr", 16000)), target_codec=o.get("codec", "pcm_s16le")
            )
        if name == "bounds_check":
            o = opts or {}
            return map_ops.bounds_check(
                df, col=o.get("column", "bytes"), min_len=int(o.get("min", 0)),
                max_len=int(o["max"]) if "max" in o else None,
            )
        if name == "dedupe":
            o = opts or {}
            wm = tuple(o["watermark"]) if "watermark" in o else None
            return grouping.dedupe(df, o["keys"], watermark=wm)
        if name == "set_error":
            # message is an interpolated field (`${! expr }` segments,
            # field/expression.go:19) so errors can carry per-row context
            msg = compile_interpolated(str(opts.get("message", "error")))
            return err_ops.set_error_when(df, compile_expr(opts["when"]), msg)
        if name == "catch":
            o = opts or {}
            sets = o.get("set") or {}

            def fix(d: DataFrame) -> DataFrame:
                for colname, expr_src in sets.items():
                    d = d.withColumn(colname, compile_expr(str(expr_src)))
                return d

            fixes = [fix] if sets else []
            if "processors" in o:
                fixes.append(self._chain(o["processors"]))
            return err_ops.catch_(df, *fixes)
        if name == "try":
            # try: run children, already-errored rows short-circuit
            # (processor_try.go:15)
            return err_ops.try_(df, self._chain(opts["processors"]))
        if name == "switch":
            # processor-level switch: first matching case's chain processes
            # the row (processor_switch.go:181-184)
            from bento_spark.operators.switch import switch_transform

            o = opts or {}
            cases = [(compile_expr(c["check"]), self._chain(c.get("processors"))) for c in o["cases"]]
            default = self._chain(o["default"]) if "default" in o else None
            return switch_transform(df, cases, default=default)
        if name == "group_by":
            # ordered checks label rows; each group gets its own processor
            # chain (processor_group_by.go:75,130-185)
            o = opts or {}
            checks = [(c["name"], compile_expr(c["check"])) for c in o["checks"]]
            df = grouping.group_by(df, checks, default=o.get("default", "default"))
            chains = {c["name"]: self._chain(c["processors"]) for c in o["checks"] if c.get("processors")}
            return grouping.per_group(df, chains) if chains else df
        if name == "group_by_value":
            # the reference's group key IS an interpolated string
            # (processor_group_by_value.go:21)
            v = str(opts["value"])
            key = compile_interpolated(v) if "${!" in v else compile_expr(v)
            return grouping.group_by_value(df, key)
        if name == "while":
            # driver-side loop, bounded by max_loops (processor_while.go:20):
            # re-run children while any row matches `check`. Batch-only —
            # iteration count is data-dependent, which a streaming plan
            # cannot express; localCheckpoint truncates lineage per round.
            o = opts or {}
            if df.isStreaming:
                raise ValueError("while is batch-only (data-dependent iteration)")
            cond = compile_expr(o["check"])
            body = self._chain(o["processors"])
            for _ in range(int(o.get("max_loops", 10))):
                if df.filter(cond).isEmpty():
                    break
                df = body(df).localCheckpoint()
            return df
        if name == "select_parts":
            from bento_spark.operators import batching

            o = opts or {}
            return batching.select_parts(df, o["key"], o["order_by"], o["indexes"])
        if name == "insert_part":
            from bento_spark.operators import batching

            o = opts or {}
            row = {k: compile_expr(str(v)) for k, v in o["row"].items()}
            return batching.insert_part(df, o["key"], o["order_by"], int(o.get("index", -1)), row)
        if name == "cache":
            # per-batch get/set/add/delete on a named keyed state table
            # (processor_cache.go:125; the key field is interpolated in the
            # reference — here `key` names the column holding it)
            o = opts or {}
            cache = self._cache_backend(
                o["resource"], df.sparkSession, key_col=o.get("key_col", "key")
            )
            op = o.get("operator", "get")
            key = o["key"]
            # ttl (seconds or duration string) + optional pinned now_ms for
            # deterministic tests/oracles (processor_cache.go:150)
            ttl, now_ms = o.get("ttl"), o.get("now_ms")
            if op == "get":
                return cache.get(df, on=key, now_ms=now_ms)
            if df.isStreaming:
                raise ValueError(f"cache {op} is batch-only in YAML pipelines; stream writes go through outputs")
            cols = o.get("columns") or [c for c in df.columns if c != key]
            if getattr(cache, "single_value", False) and op in ("set", "add"):
                # one entry holds ONE string value (file: the content IS the
                # value, cache_file.go; redis: SET k v) — a multi-column
                # write has no encoding in these backends
                if len(cols) != 1:
                    raise ValueError(
                        f"cache {o['resource']!r} stores a single value column; "
                        f"got columns={cols} (pick one with `columns: [col]`)"
                    )
                sel = df.select(key, F.col(cols[0]).cast("string").alias(cache.value_col))
                if key != cache.key_col:
                    sel = sel.withColumnRenamed(key, cache.key_col)
                if op == "set":
                    cache.set(sel, ttl=ttl, now_ms=now_ms)
                    return df
                # op == "add" falls through to the shared rejection routing
            else:
                sel = df.select(key, *cols)
                if key != cache.key_col:
                    sel = sel.withColumnRenamed(key, cache.key_col)
            if op == "set":
                cache.set(sel, ttl=ttl, now_ms=now_ms)
                return df
            if op == "delete":
                cache.delete(sel.select(cache.key_col))
                return df
            if op == "add":
                # rejected keys (already present) error their rows, matching
                # the reference's add-operator failure semantics
                rejected = cache.add(sel, ttl=ttl, now_ms=now_ms).select(F.col(cache.key_col).alias(key)).withColumn(
                    "_cache_dup", F.lit(True)
                )
                out = df.join(F.broadcast(rejected), key, "left")
                out = err_ops.set_error_when(
                    out, F.col("_cache_dup").isNotNull(), f"cache add: key exists in {o['resource']}"
                )
                return out.drop("_cache_dup")
            raise ValueError(f"unsupported cache operator: {op}")
        if name == "cached":
            # memoize the child chain per key (processor_cached.go)
            from bento_spark.operators.cache import KeyValueCache, cached

            o = opts or {}
            cache = self._cache_backend(o["resource"], df.sparkSession)
            if not isinstance(cache, KeyValueCache):
                raise ValueError(
                    "cached memoization needs a parquet-backed cache resource "
                    "(it stores arbitrary value columns; the file backend holds "
                    "one string per key)"
                )
            return cached(cache, o["key_cols"], self._chain(o["processors"]),
                          ttl=o.get("ttl"), now_ms=o.get("now_ms"))(df)
        if name == "lookup":
            # broadcast dimension enrichment — the reference's cache-get /
            # sql_select lookup patterns as a real join (enrich.py); works on
            # streams too (stream-static join, dimension read per micro-batch)
            from bento_spark.operators.enrich import lookup_join

            o = opts or {}
            dim = Pipeline({"input": o["right"]})._input(df.sparkSession, streaming=False)
            # accept `keys:` (preferred — YAML 1.1 parses a bare `on:` key as
            # boolean True, the classic Norway problem) but tolerate both
            on = o.get("keys", o.get("on", o.get(True)))
            if on is None:
                raise ValueError("lookup needs `keys:` (join key or {left,right} pair)")
            if isinstance(on, dict):  # differently-named keys: {left: l_k, right: r_k}
                dim = dim.withColumnRenamed(on["right"], on["left"])
                on = on["left"]
            keys = on if isinstance(on, list) else [on]
            if "columns" in o:
                dim = dim.select(*keys, *o["columns"])
            return lookup_join(df, dim, on=on, how=o.get("how", "left"),
                               broadcast_dim=bool(o.get("broadcast", True)))
        if name == "spread_skew":
            o = opts or {}
            return skew.spread_by_cost(df, cost_col=o.get("cost", "dur_ms"))
        if name == "repartition":
            o = opts or {}
            if "by" in o:
                return df.repartition(int(o.get("num", 0)) or df.sparkSession.sparkContext.defaultParallelism,
                                      *[F.col(c) for c in o["by"]])
            return df.repartition(int(o["num"]))
        if name == "compress":
            o = opts or {}
            from bento_spark.operators.codec import compress_col

            col = o.get("column", "bytes")
            return df.withColumn(o.get("out", col), compress_col(col, o.get("algorithm", "gzip")))
        if name == "decompress":
            o = opts or {}
            from bento_spark.operators.codec import decompress_col

            col = o.get("column", "bytes")
            out = o.get("out", col)
            dfd = df.withColumn(out, decompress_col(col, o.get("algorithm", "gzip")))
            return err_ops.set_error_when(dfd, F.col(out).isNull() & F.col(col).isNotNull(), "decompress failed")
        if name == "grok":
            from bento_spark.operators.codec import grok

            return grok(df, opts["column"], opts["pattern"])
        if name == "parse_log":
            from bento_spark.operators.codec import parse_log

            o = opts or {}
            return parse_log(df, o.get("column", "line"), o.get("format", "apache_common"))
        if name == "json_map":
            from bento_spark.operators.codec import json_map

            o = dict(opts)
            col = o.pop("column")
            outputs = {k: (v["path"], v.get("type", "string")) for k, v in o["fields"].items()}
            return json_map(df, col, outputs)
        if name == "json_schema":
            from bento_spark.operators.codec import json_schema_check

            return json_schema_check(df, opts["column"], [(f["field"], f["type"]) for f in opts["required"]])
        if name == "archive":
            from bento_spark.operators import batching

            o = opts or {}
            return batching.archive(
                df, o["key"], o["order_by"], o["column"],
                fmt=o.get("format", "lines"), out_col=o.get("out", "archived"),
            )
        if name == "unarchive":
            from bento_spark.operators import batching

            o = opts or {}
            return batching.unarchive(df, o["column"], fmt=o.get("format", "lines"), out_col=o.get("out", "part"))
        if name == "branch":
            # expression-only branch: request_map/result_map of Bloblang
            # exprs, optional skip_when (processor_branch.go:152)
            from bento_spark.operators.branch import Branch, apply_branch_inline

            o = opts or {}
            br = Branch(
                name=o.get("name", "branch"),
                request_map={k: compile_expr(v) for k, v in (o.get("request_map") or {}).items()} or None,
                processors=lambda d: d,
                result_map={k: compile_expr(v) for k, v in o["result_map"].items()},
                skip_when=compile_expr(o["skip_when"]) if "skip_when" in o else None,
            )
            return apply_branch_inline(df, br)
        if name == "workflow":
            from bento_spark.operators.branch import Branch, workflow as run_workflow

            brs = []
            for b in opts["branches"]:
                brs.append(
                    Branch(
                        name=b["name"],
                        request_map=None,
                        processors=lambda d: d,
                        result_map={k: compile_expr(v) for k, v in b["result_map"].items()},
                        skip_when=compile_expr(b["skip_when"]) if "skip_when" in b else None,
                        depends_on=b.get("depends_on", ()),
                    )
                )
            return run_workflow(df, brs)
        if name == "xml_extract":
            from bento_spark.operators.codec import xml_extract

            o = dict(opts)
            col = o.pop("column")
            fields = {k: (v["xpath"], v.get("type", "string")) for k, v in o["fields"].items()}
            return xml_extract(df, col, fields)
        if name == "parquet_encode":
            from bento_spark.operators.codec import parquet_encode

            o = opts or {}
            return parquet_encode(df, o["group_by"], out_col=o.get("out", "parquet_blob"))
        if name == "parquet_decode":
            from bento_spark.operators.codec import parquet_decode

            o = opts or {}
            return parquet_decode(df, o.get("column", "parquet_blob"), o["schema"],
                                  keep_cols=o.get("keep", ()))
        if name == "msgpack_encode":
            from bento_spark.operators.msgpack_codec import msgpack_encode

            o = opts or {}
            return msgpack_encode(df, o["columns"], out_col=o.get("out", "msgpack_blob"))
        if name == "msgpack_decode":
            from bento_spark.operators.msgpack_codec import msgpack_decode

            o = opts or {}
            return msgpack_decode(df, o.get("column", "msgpack_blob"), o["schema"],
                                  keep_cols=o.get("keep", ()))
        if name == "jmespath":
            # full JMESPath query over a JSON column (processor_jmespath.go:65);
            # the result document replaces the column (reference: replaces
            # the message) unless `out` is given
            from bento_spark.operators.codec import jmespath_map

            o = opts or {}
            return jmespath_map(df, o.get("column", "bytes"), o["query"], out_col=o.get("out"))
        if name == "avro_decode":
            # dependency-free spec codec by default (avro/scanner.go:46,
            # processor.go:21 — see operators/avro_codec.py); `engine: spark`
            # opts into the jar-gated from_avro (struct `out` column) for
            # clusters that ship spark-avro
            o = opts or {}
            if o.get("engine") == "spark":
                from bento_spark.operators.codec import avro_decode

                return avro_decode(df, o.get("column", "value"), o["schema"],
                                   out_col=o.get("out", "record"))
            from bento_spark.operators.avro_codec import avro_record_decode

            return avro_record_decode(df, o.get("column", "value"), o["schema"],
                                      keep_cols=o.get("keep", ()))
        if name == "avro_encode":
            o = opts or {}
            if o.get("engine") == "spark":
                from bento_spark.operators.codec import avro_encode

                return avro_encode(df, o["columns"], o["schema"], out_col=o.get("out", "avro_bytes"))
            from bento_spark.operators.avro_codec import avro_record_encode

            return avro_record_encode(df, o["columns"], o["schema"],
                                      out_col=o.get("out", "avro_bytes"))
        if name == "sentry_capture":
            # sentry/processor_capture.go: interpolated message + tags,
            # envelope POST per non-errored row, rows pass through
            o = opts or {}
            from bento_spark.operators.sentry import sentry_capture

            work = df.withColumn("_sn_msg", compile_interpolated(str(o["message"])))
            tag_cols = {}
            for tname, expr in (o.get("tags") or {}).items():
                col = f"_sn_tag_{tname}"
                work = work.withColumn(col, compile_interpolated(str(expr)))
                tag_cols[tname] = col
            return sentry_capture(
                work, str(o["dsn"]), "_sn_msg", tag_cols=tag_cols,
                level=str(o.get("level", "ERROR")).lower(),
                environment=o.get("environment"), release=o.get("release"),
            )
        if name == "azure_cosmosdb":
            # azure/processor_cosmosdb.go over cosmosdb/docs.go: operation
            # Create|Upsert|Read|Replace|Delete|Patch, per-row partition
            # key (`partition_keys_map` compiled to a COLUMN), interpolated
            # item_id; the document is the message JSON rendered JVM-side
            o = opts or {}
            from bento_spark.streaming.cosmosdb import cosmos_map

            endpoint, key = self._cosmos_creds(o)
            op = str(o.get("operation", "Create"))
            work = df
            pk_src = str(o.get("partition_keys_map", "root = null"))
            pk_expr = re.sub(r"^\s*root\s*=\s*", "", pk_src)
            work = work.withColumn(
                "_cdb_pk", compile_expr(pk_expr).cast("string"))
            id_col = None
            if o.get("item_id"):
                work = work.withColumn(
                    "_cdb_id", compile_interpolated(str(o["item_id"])))
                id_col = "_cdb_id"
            doc_col = None
            if op in ("Create", "Upsert", "Replace"):
                data_cols = [c for c in df.columns if c != "error"]
                work = work.withColumn("_cdb_doc", F.to_json(F.struct(*[
                    F.col(c) for c in data_cols])))
                doc_col = "_cdb_doc"
            patches = [{"operation": str(p["operation"]),
                        "path": str(p["path"]),
                        **({"value": p["value"]} if "value" in p else {})}
                       for p in (o.get("patch_operations") or [])]
            out = cosmos_map(
                work, endpoint, key, str(o["database"]), str(o["container"]),
                "_cdb_pk", operation=op, doc_col=doc_col, id_col=id_col,
                auto_id=bool(o.get("auto_id", True)),
                patch_operations=patches or None,
                patch_condition=(str(o["patch_condition"])
                                 if o.get("patch_condition") else None),
                out_col=str(o.get("out", "cosmosdb")))
            return out
        if name == "couchbase":
            # couchbase/processor.go: interpolated id, Bloblang content,
            # operation get|insert|remove|replace|upsert; KV binary
            # protocol client (streaming/couchbase.py)
            o = opts or {}
            from bento_spark.streaming.couchbase import couchbase_map

            work = df.withColumn("_cb_id", compile_interpolated(str(o["id"])))
            content_col = None
            if o.get("content") is not None:
                work = work.withColumn("_cb_content", compile_expr(str(o["content"])))
                # object/array content must be JSON on the wire (the gocb
                # default transcoder) — a bare str() of a struct row would
                # store Python repr; scalars pass through as strings
                dt = work.schema["_cb_content"].dataType.simpleString()
                if dt.startswith(("struct", "array", "map")):
                    work = work.withColumn("_cb_content", F.to_json("_cb_content"))
                else:
                    work = work.withColumn("_cb_content",
                                           F.col("_cb_content").cast("string"))
                content_col = "_cb_content"
            out = couchbase_map(
                work, str(o.get("url", "127.0.0.1:11210")), "_cb_id",
                operation=str(o.get("operation", "get")),
                content_col=content_col, bucket=o.get("bucket"),
                username=o.get("username"), password=o.get("password"),
                out_col=o.get("out", "couchbase"),
            )
            return out.drop("_cb_id", "_cb_content")
        if name == "schema_registry_encode":
            # confluent/processor_schema_registry_encode.go: subject's
            # latest Avro schema resolved at plan time, wire-format
            # magic+id header prepended
            o = opts or {}
            from bento_spark.operators.schema_registry import schema_registry_encode

            return schema_registry_encode(
                df, str(o["url"]), str(o["subject"]), o["columns"],
                out_col=o.get("out", "sr_blob"))
        if name == "schema_registry_decode":
            # confluent/processor_schema_registry_decode.go: per-row schema
            # id, per-executor schema memo, standard-JSON output column
            o = opts or {}
            from bento_spark.operators.schema_registry import schema_registry_decode

            keep = o.get("keep") or [c for c in df.columns
                                     if c != o.get("column", "sr_blob")]
            return schema_registry_decode(
                df, str(o["url"]), blob_col=o.get("column", "sr_blob"),
                out_col=o.get("out", "decoded"), keep_cols=keep)
        if name == "unarchive_avro":
            # `avro` scanner (scanner.go:46): a binary column of whole OCF
            # files -> one row per record, standard-JSON content (schema
            # carried per file)
            from bento_spark.operators.avro_codec import avro_ocf_scan

            o = opts or {}
            return avro_ocf_scan(df, o.get("column", "content"), keep_cols=o.get("keep", ()),
                                 out_col=o.get("out", "record_json"))
        if name == "protobuf_decode":
            # .proto SOURCE schemas (`proto` inline / `proto_file` path —
            # processor_protobuf.go:66 import_paths model) use the
            # dependency-free wire codec; `descriptor_file` keeps the
            # jar-gated spark-protobuf path for compiled descriptor sets.
            o = opts or {}
            src = self._proto_source(o)
            if src is not None:
                from bento_spark.operators.protobuf_codec import protobuf_record_decode

                keep = o.get("keep", [c for c in df.columns if c != o.get("column", "value")])
                return protobuf_record_decode(df, o.get("column", "value"), src,
                                              o["message"], keep_cols=keep)
            from bento_spark.operators.codec import protobuf_decode

            return protobuf_decode(df, o.get("column", "value"), o["message"], o["descriptor_file"],
                                   out_col=o.get("out", "record"))
        if name == "protobuf_encode":
            o = opts or {}
            src = self._proto_source(o)
            if src is not None:
                from bento_spark.operators.protobuf_codec import protobuf_record_encode

                return protobuf_record_encode(df, o["columns"], src, o["message"],
                                              out_col=o.get("out", "proto_bytes"))
            from bento_spark.operators.codec import protobuf_encode

            return protobuf_encode(df, o["columns"], o["message"], o["descriptor_file"],
                                   out_col=o.get("out", "proto_bytes"))
        if name == "match_sequence":
            # CEP funnel: A then B ... within T per key (streaming/cep.py)
            from bento_spark.streaming.cep import match_sequence, match_sequence_stream

            o = opts or {}
            steps = [compile_expr(str(s)) for s in o["steps"]]
            common = dict(key=o["key"], ts_col=o.get("ts", "ts"), steps=steps,
                          within=o["within"], step_names=o.get("names"))
            if df.isStreaming:
                return match_sequence_stream(df, watermark=o.get("watermark", "2 minutes"),
                                             late_policy=o.get("late_policy", "eager"), **common)
            return match_sequence(df, **common)
        if name == "http":
            # HTTP enrichment (processor_http.go:16): interpolated url/body,
            # response into out (error column on failure); `rate_limit`
            # names a shared resource capping request rate across all
            # parallel components (processor_http.go:18)
            from bento_spark.operators.http_enrich import http_enrich

            o = opts or {}
            return http_enrich(
                df,
                compile_interpolated(str(o["url"])),
                out_col=o.get("out", "http_response"),
                method=o.get("method", "GET"),
                headers=o.get("headers"),
                body=compile_interpolated(str(o["body"])) if "body" in o else None,
                timeout=float(o.get("timeout", 5)),
                retries=int(o.get("retries", 1)),
                rate_limit=self._rate_limit_share(o.get("rate_limit"), df),
            )
        if name == "nats_request_reply":
            # request-reply over core NATS (nats/processor_request_reply.go):
            # interpolated subject, unique inbox reply-to per row, reply
            # into `out` (timeout -> error column)
            from bento_spark.streaming.cep import duration_ms
            from bento_spark.streaming.nats import nats_request_reply_enrich

            o = opts or {}
            host, port = self._nats_addr(o)
            return nats_request_reply_enrich(
                df, host, port,
                compile_interpolated(str(o["subject"])),
                out_col=o.get("out", "nats_reply"),
                timeout=duration_ms(str(o.get("timeout", "3s"))) / 1000.0,
                inbox_prefix=str(o.get("inbox_prefix", "_INBOX")),
            )
        if name == "gcp_bigquery_select":
            # gcp/processor_bigquery_select.go: the sql_raw amortization —
            # args_mapping compiles to a Catalyst ARRAY column, one
            # jobs.query per DISTINCT args tuple, JSON row arrays
            # broadcast-joined back
            from bento_spark.streaming.bigquery import bigquery_select_map

            o = opts or {}
            args_col = None
            d = df
            if o.get("args_mapping"):
                if df.isStreaming:
                    raise ValueError(
                        "gcp_bigquery_select with args_mapping is batch-only "
                        "(the per-distinct-tuple query runs driver-side); "
                        "argless enrichment works in streams")
                d = df.withColumn("_bq_args",
                                  compile_expr(str(o["args_mapping"])))
                args_col = "_bq_args"
            out = bigquery_select_map(
                d, str(o.get("endpoint") or "https://bigquery.googleapis.com"),
                str(o["project"]), str(o["table"]),
                [str(c) for c in (o.get("columns") or ["*"])], args_col,
                where=str(o.get("where", "")),
                prefix=str(o.get("prefix", "")),
                suffix=str(o.get("suffix", "")),
                credentials=self._gcs_creds(o),
                result_col=str(o.get("result_col", "bigquery_rows")))
            return out.drop("_bq_args") if args_col else out
        if name == "sql_raw":
            # arbitrary statement with placeholder binds
            # (processor_sql_raw.go:30-80): args_mapping compiles to a
            # Catalyst ARRAY column; SELECTs amortize one query per
            # DISTINCT args tuple + broadcast join; exec_only runs one
            # executemany transaction per batch (sqlite DB-API path —
            # server DBs route to sql_select/sql_insert over JDBC)
            from bento_spark.operators.sql_raw import sql_raw_processor

            o = opts or {}
            args_col = None
            d = df
            if o.get("args_mapping"):
                d = df.withColumn("_sql_args", compile_expr(str(o["args_mapping"])))
                args_col = "_sql_args"
            out = sql_raw_processor(
                d, str(o.get("driver", "sqlite")), str(o["dsn"]),
                str(o["query"]), args_col=args_col,
                exec_only=bool(o.get("exec_only", False)),
                result_col=str(o.get("result_col", "sql_rows")),
            )
            return out.drop("_sql_args") if args_col else out
        if name == "mongodb":
            # find-one enrichment (mongodb/processor.go): filter_map fields
            # compile to a JVM-side to_json struct; the matched document
            # lands as a JSON string column (NULL on miss)
            from bento_spark.streaming.mongodb import mongodb_find_one

            o = opts or {}
            if str(o.get("operation", "find-one")) != "find-one":
                raise ValueError(
                    "mongodb processor supports operation: find-one "
                    "(write operations belong on output.mongodb)"
                )
            flt = o.get("filter_map") or {}
            if not flt:
                raise ValueError("mongodb processor requires `filter_map`")
            df = df.withColumn(
                "_mongo_filter",
                F.to_json(F.struct(*[
                    compile_expr(str(v)).alias(str(k)) for k, v in flt.items()
                ])),
            )
            return mongodb_find_one(
                df, str(o["url"]), str(o.get("database", "bento")),
                str(o["collection"]), "_mongo_filter",
                out_col=o.get("out_col", "mongodb"),
            ).drop("_mongo_filter")
        if name == "nats_object_store":
            # get/put against an object-store bucket (nats/processor_os.go)
            from bento_spark.streaming.nats import nats_os_map

            o = opts or {}
            host, port = self._nats_addr(o)
            d = df.withColumn("_os_name",
                              compile_interpolated(str(o["object_name"])))
            out = nats_os_map(
                d, host, port, str(o["bucket"]),
                str(o.get("operation", "get")), name_col="_os_name",
                value_col=o.get("value_col"),
                out_col=str(o.get("out", "nats_os")),
                chunk_size=int(o.get("chunk_size", 128 * 1024)))
            return out.drop("_os_name")
        if name == "redis":
            # one command per row (redis/processor.go): `command`
            # interpolates, args_mapping -> ARRAY column; legacy
            # `operator:`+`key:` form maps onto the same path. Batch
            # pipelines as one round trip per partition.
            from bento_spark.streaming.redis import (
                parse_redis_url,
                redis_command_map,
            )

            o = opts or {}
            host, port = parse_redis_url(
                str(o.get("url") or o.get("address", "127.0.0.1:6379")))
            d = df
            if o.get("operator"):
                if o.get("args_mapping"):
                    raise ValueError(
                        "redis processor: args_mapping is invalid with an "
                        "operator set (processor.go config lint)")
                op = str(o["operator"])
                if op not in ("keys", "scard", "sadd", "incrby"):
                    raise ValueError(f"redis processor: unknown operator {op!r}")
                key = compile_interpolated(str(o.get("key", "")))
                content = F.col(o.get("column", "value")).cast("string")
                args = (F.array(key, content) if op in ("sadd", "incrby")
                        else F.array(key))
                d = (d.withColumn("_redis_cmd", F.lit(op))
                       .withColumn("_redis_args", args))
            else:
                if not o.get("command"):
                    raise ValueError(
                        "redis processor: one of `operator` or `command` "
                        "must be specified")
                d = d.withColumn("_redis_cmd",
                                 compile_interpolated(str(o["command"])))
                if o.get("args_mapping"):
                    d = d.withColumn("_redis_args",
                                     compile_expr(str(o["args_mapping"])))
            args_col = "_redis_args" if "_redis_args" in d.columns else None
            out = redis_command_map(
                d, host, port, "_redis_cmd", args_col=args_col,
                out_col=str(o.get("out", "redis")),
                retries=int(o.get("retries", 3)))
            return out.drop("_redis_cmd", *([args_col] if args_col else []))
        if name == "redis_script":
            # Lua script per row via the script-cache protocol
            # (redis/script_processor.go): EVALSHA, -NOSCRIPT rows retry
            # as EVAL with the body
            from bento_spark.streaming.redis import (
                parse_redis_url,
                redis_script_map,
            )

            o = opts or {}
            host, port = parse_redis_url(
                str(o.get("url") or o.get("address", "127.0.0.1:6379")))
            d = df
            keys_col = args_col = None
            if o.get("keys_mapping"):
                d = d.withColumn("_rs_keys", compile_expr(str(o["keys_mapping"])))
                keys_col = "_rs_keys"
            if o.get("args_mapping"):
                d = d.withColumn("_rs_args", compile_expr(str(o["args_mapping"])))
                args_col = "_rs_args"
            out = redis_script_map(
                d, host, port, str(o["script"]),
                keys_col=keys_col, args_col=args_col,
                out_col=str(o.get("out", "redis")),
                retries=int(o.get("retries", 3)))
            return out.drop(*[c for c in (keys_col, args_col) if c])
        if name == "aws_lambda":
            # invoke a Lambda per message (aws/processor_lambda.go:20):
            # result replaces the payload column; function errors set
            # lambda_function_error; transport failures flag the error
            # column with content unchanged
            import os as _os

            from bento_spark.streaming.cep import duration_ms
            from bento_spark.streaming.lambda_proc import lambda_map

            o = opts or {}
            region = str(o.get("region", "us-east-1"))
            return lambda_map(
                df,
                endpoint=str(o.get("endpoint")
                             or f"https://lambda.{region}.amazonaws.com"),
                access_key=str(o.get("access_key")
                               or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                secret_key=str(o.get("secret_key")
                               or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                function=str(o["function"]),
                payload_col=str(o.get("column", "value")),
                region=region,
                retries=int(o.get("retries", 3)),
                # reference-style duration strings ('5s') parse via
                # duration_ms (ADVICE r05); bare YAML numbers keep the old
                # seconds semantics
                timeout=(
                    float(o["timeout"])
                    if isinstance(o.get("timeout"), (int, float))
                    else duration_ms(str(o.get("timeout", "5s"))) / 1000.0
                ),
            )
        if name == "aws_dynamodb_partiql":
            # PartiQL per message over BatchExecuteStatement
            # (aws/processor_dynamodb_partiql.go:106); args_mapping
            # compiles to a Catalyst ARRAY column
            import os as _os

            from bento_spark.streaming.dynamodb import dynamodb_partiql

            o = opts or {}
            region = str(o.get("region", "us-east-1"))
            d, args_col = df, None
            if o.get("args_mapping"):
                d = df.withColumn("_pq_args", compile_expr(str(o["args_mapping"])))
                args_col = "_pq_args"
            out = dynamodb_partiql(
                d,
                endpoint=str(o.get("endpoint")
                             or f"https://dynamodb.{region}.amazonaws.com"),
                access_key=str(o.get("access_key")
                               or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                secret_key=str(o.get("secret_key")
                               or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                query=str(o["query"]),
                args_col=args_col,
                region=region,
                result_col=str(o.get("result_col", "partiql")),
            )
            return out.drop("_pq_args") if args_col else out
        if name == "aws_s3":
            # GetObject per message with interpolated bucket/key
            # (aws/processor_s3.go:26); body lands in out_col,
            # delete_objects removes only successfully fetched objects
            import os as _os

            from bento_spark.streaming.s3 import s3_get_map

            o = opts or {}
            region = str(o.get("region", "us-east-1"))
            d = (df.withColumn("_s3_bucket", compile_interpolated(str(o["bucket"])))
                   .withColumn("_s3_key", compile_interpolated(str(o["key"]))))
            out = s3_get_map(
                d,
                endpoint=str(o.get("endpoint")
                             or f"https://s3.{region}.amazonaws.com"),
                access_key=str(o.get("access_key")
                               or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                secret_key=str(o.get("secret_key")
                               or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                bucket_col="_s3_bucket", key_col="_s3_key",
                region=region,
                out_col=str(o.get("out_col", "s3_object")),
                delete_objects=bool(o.get("delete_objects", False)),
            )
            return out.drop("_s3_bucket", "_s3_key")
        if name == "awk":
            # per-message AWK run over the system binary with the
            # reference's custom json_*/metadata_*/timestamp functions
            # (awk/processor.go; codecs none|text|json) — slow path like
            # `command`, a fork per message
            from bento_spark.operators.awk_proc import awk_map

            o = opts or {}
            return awk_map(
                df,
                o["program"],
                codec=o.get("codec", "text"),
                col=o.get("column", "text"),
                meta_cols=o.get("meta_columns"),
                binary=o.get("binary", "awk"),
                timeout=float(o.get("timeout", 10)),
                now_unix=o.get("now_unix"),
            )
        if name == "opensnowcat":
            # Snowplow/OpenSnowcat enriched-TSV events: drop filters, PII
            # transforms, TSV->flattened-JSON (opensnowcat/
            # processor_opensnowcat.go) — filters/transforms compile to
            # codegen over the split line
            from bento_spark.operators.opensnowcat import opensnowcat

            o = opts or {}
            flt = o.get("filters") or {}
            return opensnowcat(
                df,
                col=o.get("column", "line"),
                output_format=o.get("output_format", "tsv"),
                drop=flt.get("drop"),
                transform=flt.get("transform"),
            )
        if name == "subprocess":
            # long-lived child per partition, lockstep line protocol
            # (processor_subprocess.go:47-66); stderr -> error column
            from bento_spark.operators.subprocess_proc import subprocess_map

            o = opts or {}
            return subprocess_map(
                df,
                o["name"],
                args=[str(a) for a in o.get("args", [])],
                col=o.get("column", "text"),
                codec_send=o.get("codec_send", "lines"),
                codec_recv=o.get("codec_recv", "lines"),
                timeout=float(o.get("timeout", 10)),
                rate_limit=self._rate_limit_share(o.get("rate_limit"), df),
            )
        if name == "command":
            # one exec per message (processor_command.go:17); args_mapping
            # is a Bloblang expression resolving to array<string> per row
            from bento_spark.operators.subprocess_proc import command_map

            o = opts or {}
            args = (
                compile_expr(str(o["args_mapping"]))
                if "args_mapping" in o
                else [str(a) for a in o.get("args", [])]
            )
            return command_map(
                df,
                o["name"],
                args=args,
                col=o.get("column", "text"),
                timeout=float(o.get("timeout", 10)),
                rate_limit=self._rate_limit_share(o.get("rate_limit"), df),
            )
        if name == "unarchive_tar":
            from bento_spark.operators.scanners import unarchive_tar

            o = opts or {}
            return unarchive_tar(df, o.get("column", "content"), keep_cols=o.get("keep", ()),
                                 fmt=o.get("format", "tar"))
        if name == "tar_encode":
            from bento_spark.operators.scanners import tar_encode

            o = opts or {}
            return tar_encode(df, o["group_by"], o["name"], o["payload"],
                              out_col=o.get("out", "tar_blob"))
        if name == "chunker":
            from bento_spark.operators.scanners import chunker

            o = opts or {}
            return chunker(df, o["column"], int(o["size"]), out_col=o.get("out", "chunk"))
        if name == "re_split":
            from bento_spark.operators.scanners import re_split

            o = opts or {}
            return re_split(df, o["column"], o["pattern"], out_col=o.get("out", "part"))
        if name == "skip_bom":
            from bento_spark.operators.scanners import skip_bom

            return skip_bom(df, (opts or {}).get("column", "line"))
        if name == "metric":
            # custom metrics (processor_metric.go:22): counter / counter_by /
            # gauge over message fields. Spark-first: df.observe() — the
            # native Observation API evaluates the aggregate DURING the
            # existing pass (no extra job) and surfaces per-micro-batch
            # values in QueryProgress.observedMetrics, which the metrics
            # listener collects (observed_totals()).
            o = opts or {}
            if "name" not in o:
                raise ValueError("metric requires `name`")
            mtype = o.get("type", "counter")
            val = compile_expr(str(o["value"])) if "value" in o else None
            cond = compile_expr(str(o["check"])) if "check" in o else None
            if mtype == "counter":
                agg = F.count(F.when(cond, 1)) if cond is not None else F.count(F.lit(1))
            elif mtype == "counter_by":
                if val is None:
                    raise ValueError("metric counter_by requires `value`")
                agg = F.sum(F.when(cond, val) if cond is not None else val)
            elif mtype == "gauge":
                if val is None:
                    raise ValueError("metric gauge requires `value`")
                if "order_by" in o:
                    # deterministic gauge: value of the max-order row
                    agg = F.max_by(val, compile_expr(str(o["order_by"])))
                else:
                    # no total order exists inside a distributed micro-batch
                    # (the reference processes sequentially): F.last is
                    # partition-merge-order dependent — pass `order_by`
                    # (e.g. the event-time column) for a deterministic gauge
                    agg = F.last(val, ignorenulls=True)
            else:
                raise ValueError(f"unsupported metric type {mtype!r} (counter/counter_by/gauge)")
            return df.observe(str(o["name"]), agg.alias(mtype))
        if name in ("noop", "log"):
            return df  # log side effects live in the metrics listener
        raise ValueError(f"unsupported processor: {name}")

    # ------------------------------------------------------------------- join
    def _apply_join(self, df: DataFrame, spark: SparkSession, streaming: bool) -> DataFrame:
        """Stateful stream-stream join section (the north-rule clip ⋈
        transcript join; reference analogue is the cache-hydration pattern,
        config/examples/joining_streams.yaml:32-56 in the reference repo).

            join:
              right: {parquet: {path: ..., schema: ..., max_files_per_trigger: N}}
              key: clip_id
              left_ts: event_ts
              right_ts: t_event_ts
              watermark: 10 seconds
              max_lag: 30 seconds
              how: inner          # or leftOuter
        """
        j = self.conf.get("join")
        if not j:
            return df
        from bento_spark.streaming.joins import stream_stream_join

        right = Pipeline({"input": j["right"]})._input(spark, streaming)
        return stream_stream_join(
            df,
            right,
            key=j.get("key", "clip_id"),
            left_ts=j.get("left_ts", "event_ts"),
            right_ts=j.get("right_ts", "t_event_ts"),
            watermark=j.get("watermark", "10 seconds"),
            max_lag=j.get("max_lag", "30 seconds"),
            how=j.get("how", "inner"),
        )

    # ----------------------------------------------------------------- window
    def _apply_window(self, df: DataFrame) -> DataFrame:
        w = self.conf.get("window")
        if not w:
            return df
        keys = w.get("keys") or []
        aggs = {n: _parse_agg(s) for n, s in (w.get("aggs") or {"n": "count()"}).items()}
        event_col = w.get("event_col", "event_ts")
        lateness = w.get("lateness")
        typ = w.get("type", "tumbling")
        if typ == "tumbling":
            return tumbling_windowed(df, event_col, w["size"], keys, aggs,
                                     offset=w.get("offset"), allowed_lateness=lateness)
        if typ == "sliding":
            return sliding_windowed(df, event_col, w["size"], w["slide"], keys, aggs,
                                    offset=w.get("offset"), allowed_lateness=lateness)
        if typ == "session":
            return session_windowed(df, event_col, w["gap"], keys, aggs, allowed_lateness=lateness)
        raise ValueError(f"unsupported window type: {typ}")

    # ------------------------------------------------------------------ build
    def build_batch(self, spark: SparkSession) -> DataFrame:
        """Bounded run: same plan on a batch DataFrame (the reference's
        bounded test mode; SURVEY §1 streams-vs-tables)."""
        df = self._apply_processors(self._input(spark, streaming=False))
        df = self._apply_join(df, spark, streaming=False)
        return self._apply_window(df)

    def run_batch(self, spark: SparkSession) -> DataFrame:
        """build_batch + deferred side effects: flushes the error_handling
        reject DLQ capture (one append per run, reading the already-
        materialized localCheckpoint — no re-evaluation of the chain).
        Callers that only build (tests, `bento test`) pay no write."""
        df = self.build_batch(spark)
        self.flush_batch_dlq()
        return df

    def flush_batch_dlq(self) -> None:
        pending, self._batch_dlq_pending = self._batch_dlq_pending, None
        if pending is not None:
            errored, path = pending
            errored.write.mode("append").parquet(path)

    def build_stream(self, spark: SparkSession) -> DataFrame:
        df = self._apply_processors(self._input(spark, streaming=True))
        df = self._apply_join(df, spark, streaming=True)
        return self._apply_window(df)

    def run_stream(self, spark: SparkSession, checkpoint: str, available_now: bool = True):
        """Execute as a StreamingQuery with the exactly-once parquet sink
        (Iceberg MERGE on a real cluster) and optional DLQ routing."""
        out = self.conf.get("output") or {}
        if "path" not in out and not (
            out.get("switch")
            or out.get("fan_out")
            or out.get("round_robin")
            or out.get("kafka")
            or out.get("kafka_franz")
            or out.get("fallback")
            or out.get("http_client")
            or out.get("splunk_hec")
            or out.get("slack_webhook")
            or out.get("questdb")
            or out.get("elasticsearch")
            or out.get("elasticsearch_v2")
            or out.get("opensearch")
            or out.get("pusher")
            or out.get("cassandra")
            or out.get("mongodb")
            or out.get("mqtt")
            or out.get("beanstalkd")
            or out.get("zmq4")
            or out.get("aws_sqs")
            or out.get("aws_s3")
            or out.get("aws_dynamodb")
            or out.get("sql_raw")
            or out.get("aws_kinesis")
            or out.get("gcp_pubsub")
            or out.get("nanomsg")
            or out.get("nsq")
            or out.get("nats")
            or out.get("nats_jetstream")
            or out.get("nats_object_store")
            or out.get("pulsar")
            or out.get("redis_list")
            or out.get("redis_pubsub")
            or out.get("redis_streams")
            or out.get("redis_hash")
            or out.get("amqp_0_9")
            or out.get("amqp_1")
            or out.get("azure_blob_storage")
            or out.get("azure_queue_storage")
            or out.get("azure_table_storage")
            or out.get("azure_cosmosdb")
            or out.get("aws_sns")
            or out.get("aws_kinesis_firehose")
            or out.get("snowflake_put")
            or out.get("sftp")
            or out.get("gcp_cloud_storage")
            or out.get("gcp_bigquery")
            or out.get("discord")
            or out.get("cypher")
            or out.get("socket")
            or out.get("websocket")
            or out.get("subprocess")
            or out.get("dynamic")
            or out.get("http_server")
            or out.get("hdfs")
            or "sync_response" in out
        ):
            raise ValueError(
                "output.path (or switch/fan_out/round_robin/kafka/fallback/"
                "http_client/elasticsearch/mqtt/nats/redis_*/amqp_0_9/"
                "sync_response) required for run_stream"
            )
        if "path" in out:
            self._sink = IdempotentParquetSink(require_object_store(spark, out["path"]),
                                               key_cols=out.get("keys"), checkpoint=checkpoint)
        self._reject_errored = None  # re-stashed by the build below
        has_window = bool(self.conf.get("window"))
        dlq_path = out.get("dlq")

        def _trigger() -> dict:
            """Trigger selection shared by the main query and the DLQ
            side-query: availableNow in bounded mode; otherwise a
            processingTime interval — rate_limit.interval (if the pipeline
            declared one) takes precedence over output.trigger."""
            if available_now:
                return {"availableNow": True}
            rl = self.conf.get("_rate_limit") or {}
            ivl = rl.get("interval", out.get("trigger", "5 seconds"))
            # normalize through duration_ms: the pipeline accepts '1s' /
            # '500 ms' everywhere else, but Spark's trigger parser does not —
            # render as '<n> milliseconds', which both dialects agree on
            from bento_spark.streaming.cep import duration_ms

            return {"processingTime": f"{duration_ms(str(ivl))} milliseconds"}

        if dlq_path and has_window and self._sink is None:
            # the window+dlq dual-query path writes the windowed output
            # through self._sink, which only exists for output.path configs
            raise ValueError(
                "window + dlq requires output.path (the windowed main sink); "
                "switch/fan_out/round_robin/kafka/fallback outputs cannot take "
                "the pre-window DLQ split"
            )
        if dlq_path and has_window:
            # Errored rows must be routed BEFORE the window agg (the agg
            # output has no per-row error column — reference semantics:
            # reject_errored sits between pipeline and the window-fed
            # output). Idiomatic Spark: a SECOND streaming query over the
            # same source feeds the DLQ, each with its own checkpoint —
            # exactly-once holds independently for both sinks. (A single
            # query can't window correctly per-micro-batch: a window's rows
            # may span batches and last-writer-wins MERGE would drop the
            # earlier partials.)
            rows = self._apply_processors(self._input(spark, streaming=True))
            if "error" in rows.columns:
                dlq = IdempotentParquetSink(dlq_path, checkpoint=checkpoint.rstrip("/") + "_dlq")
                errored = rows.filter(F.col("error").isNotNull())
                self._dlq_query = (
                    errored.writeStream.outputMode("append")
                    .option("checkpointLocation", checkpoint.rstrip("/") + "_dlq")
                    .foreachBatch(dlq.foreach_batch())
                    .trigger(**_trigger())
                    .start()
                )
                rows = rows.filter(F.col("error").isNull())
            rows = self._apply_join(rows, spark, streaming=True)
            df = self._apply_window(rows)
            writer = self._sink.foreach_batch()
        elif out.get("switch"):
            # predicate-routed multi-sink (output_switch.go:164): first
            # matching case wins; `default: path` is the catch-all
            from bento_spark.streaming.sink import route_outputs

            df = self.build_stream(spark)
            cases = [
                (compile_expr(c["check"]), IdempotentParquetSink(c["path"], checkpoint=checkpoint))
                for c in out["switch"]
            ]
            if out.get("default"):
                cases.append((None, IdempotentParquetSink(out["default"], checkpoint=checkpoint)))
            self._case_sinks = [s for _, s in cases]
            writer = route_outputs(cases, mode="switch")
        elif out.get("kafka"):
            # keyed JSON producer (output_kafka.go); availability-gated —
            # at-least-once into Kafka (exactly-once needs Kafka txns,
            # out of scope like the reference)
            from bento_spark.streaming.kafka import kafka_sink

            df = self.build_stream(spark)
            k = out["kafka"]
            writer = kafka_sink(spark, k["addresses"], k["topic"], key_col=k.get("key"))
        elif out.get("kafka_franz"):
            # dependency-free wire-protocol producer
            # (kafka/output_kafka_franz.go: seed_brokers, topic,
            # interpolated key, murmur2 default partitioner) — the per-row
            # key compiles to a COLUMN, value serializes JVM-side
            from bento_spark.streaming.kafka_wire import kafka_wire_sink

            k = out["kafka_franz"]
            df = self.build_stream(spark)
            key_col = None
            if k.get("key"):
                df = df.withColumn("_kafka_key", compile_interpolated(str(k["key"])))
                key_col = "_kafka_key"
            host, port = self._kafka_addr(k)
            writer = kafka_wire_sink(host, port, str(k["topic"]),
                                     key_col=key_col,
                                     sasl=self._kafka_sasl(k))
        elif out.get("http_client"):
            # per-row JSON POSTs, executor-side pooled connections,
            # at-least-once via micro-batch retry (output_http_client.go)
            from bento_spark.streaming.sink import http_post_writer

            df = self.build_stream(spark)
            h = out["http_client"]
            writer = http_post_writer(
                h["url"], method=h.get("method", "POST"), headers=h.get("headers"),
                timeout=float(h.get("timeout", 10)),
                retries=int(h.get("retries", 3)),
                backoff_s=float(h.get("backoff", 0.25)),
            )
        elif out.get("questdb"):
            # ILP-over-TCP (questdb/output.go: table, symbols -> tags,
            # doubles, designated_timestamp_field) — the whole line
            # renders JVM-side, executors stream pre-built text
            from bento_spark.streaming.questdb import questdb_sink

            qd = out["questdb"]
            df = self.build_stream(spark)
            host, _, port = str(qd.get("address", "127.0.0.1:9009")).partition(":")
            writer = questdb_sink(
                host or "127.0.0.1", int(port or 9009), str(qd["table"]),
                symbols=qd.get("symbols"), doubles=qd.get("doubles"),
                designated_timestamp_field=qd.get("designated_timestamp_field"),
            )
        elif out.get("slack_webhook"):
            # slack/output_slack_webhook.go: POST the message JSON to the
            # webhook URL — the message must already be WebhookMessage-
            # shaped (`text`, `blocks`, ... — the reference passes the
            # payload through verbatim the same way)
            from bento_spark.streaming.cep import duration_ms
            from bento_spark.streaming.sink import http_post_writer

            sl = out["slack_webhook"]
            df = self.build_stream(spark)
            writer = http_post_writer(
                str(sl["webhook"]),
                timeout=float(duration_ms(str(sl.get("timeout", "5s"))) / 1000.0),
                retries=int(sl.get("retries", 3)),
            )
        elif out.get("splunk_hec"):
            # Splunk HTTP Event Collector (splunk/template_output.yaml —
            # the reference implements this output as an http_client
            # template wrapping rows in the HEC event envelope with
            # Splunk-token auth; same composition here). The envelope is
            # built JVM-side: the whole row becomes `event`, the optional
            # host/source/sourcetype/index fields ride alongside.
            from bento_spark.streaming.sink import http_post_writer

            s = out["splunk_hec"]
            df = self.build_stream(spark)
            envelope = [F.struct(*[F.col(c) for c in df.columns]).alias("event")]
            for fld in ("host", "source", "sourcetype", "index"):
                v = s.get(f"event_{fld}")
                if v:
                    envelope.append(F.lit(str(v)).alias(fld))
            df = df.select(*envelope)
            writer = http_post_writer(
                str(s["url"]),
                headers={"Authorization": f"Splunk {s['token']}",
                         **(s.get("headers") or {})},
                timeout=float(s.get("timeout", 10)),
                retries=int(s.get("retries", 3)),
                backoff_s=float(s.get("backoff", 0.25)),
            )
        elif (out.get("elasticsearch") or out.get("opensearch")
              or out.get("elasticsearch_v2")):
            # bulk indexer (elasticsearch/output.go; opensearch/output.go
            # and elasticsearch/output_v2.go register the SAME _bulk API
            # shape — the reference maintains three near-identical
            # outputs, this one serves all the names; v2's `auth:` object
            # is accepted alongside `basic_auth:`):
            # index/action/id/routing/pipeline interpolate PER MESSAGE
            # (:353-363) — each compiles to a COLUMN, and both NDJSON bulk
            # lines are built JVM-side; the executor loop only chunks
            # bytes and POSTs
            from bento_spark.streaming.elasticsearch import ACTIONS, es_bulk_writer

            e = (out.get("elasticsearch") or out.get("opensearch")
                 or out["elasticsearch_v2"])
            url = (e.get("urls") or [e.get("url", "http://127.0.0.1:9200")])[0]
            if "index" not in e:
                raise ValueError("output.elasticsearch requires `index`")
            action = str(e.get("action", "index"))
            if "${!" not in action and action not in ACTIONS:
                raise ValueError(
                    f"elasticsearch action {action!r} is not allowed "
                    f"(one of {', '.join(ACTIONS)})"  # output.go:499
                )
            act = compile_interpolated(action)
            # an interpolated action resolving outside the allowed set fails
            # the row at runtime, like the reference's build error
            act = F.when(act.isin(*ACTIONS), act).otherwise(
                F.raise_error(F.concat(F.lit("elasticsearch action not allowed: "), act))
            )
            hdrs = dict(e.get("headers") or {})
            auth = e.get("basic_auth") or e.get("auth") or {}
            if auth.get("enabled"):
                import base64

                tok = base64.b64encode(
                    f"{auth.get('username', '')}:{auth.get('password', '')}".encode()
                ).decode()
                hdrs["Authorization"] = f"Basic {tok}"
            df = (
                self.build_stream(spark)
                .withColumn("_es_index", compile_interpolated(str(e["index"])))
                .withColumn("_es_action", act)
                .withColumn("_es_id", compile_interpolated(str(e.get("id", ""))))
                .withColumn("_es_routing", compile_interpolated(str(e.get("routing", ""))))
                .withColumn("_es_pipeline", compile_interpolated(str(e.get("pipeline", ""))))
            )
            writer = es_bulk_writer(
                str(url),
                max_batch_bytes=int(e.get("max_batch_bytes", 4 * 2**20)),
                timeout=float(e.get("timeout", 10)),
                retries=int(e.get("retries", 3)),
                backoff_s=float(e.get("backoff", 0.25)),
                headers=hdrs,
            )
        elif out.get("pusher"):
            # signed Pusher Channels REST output (pusher/output_pusher.go:
            # interpolated channel, event, appId/key/secret) — channel
            # compiles to a COLUMN, executors sign per request
            from bento_spark.streaming.pusher import pusher_sink

            pu = out["pusher"]
            df = self.build_stream(spark).withColumn(
                "_pusher_channel", compile_interpolated(str(pu["channel"])))
            host, _, port = str(pu.get("address", "api.pusherapp.com:443")).partition(":")
            https = bool(pu.get("https", port in ("", "443")))
            writer = pusher_sink(
                host, int(port or 443), str(pu["appId"]), str(pu["key"]),
                str(pu["secret"]), str(pu["event"]), "_pusher_channel",
                https=https,
            )
        elif out.get("cassandra"):
            # CQL v4 PREPARE/EXECUTE writer (cassandra/output.go: `query` +
            # `args_mapping` array) — each arg compiles to a typed COLUMN,
            # rendered as one JVM-side JSON struct; executors bind against
            # the PREPARED statement's column types
            from bento_spark.streaming.cassandra import cassandra_writer

            ca = out["cassandra"]
            df = self.build_stream(spark)
            am = ca.get("args_mapping")
            if isinstance(am, list):
                exprs = [str(e) for e in am]
            else:
                exprs = _split_args_array(str(am))
            args_cols = [compile_expr(e) for e in exprs]
            addr = (ca.get("addresses") or [ca.get("address", "127.0.0.1:9042")])[0]
            writer = cassandra_writer(str(addr), str(ca["query"]), args_cols)
        elif out.get("mongodb"):
            # write operations per message (mongodb/output.go via
            # common.go:102-126): document_map/filter_map are maps of
            # field -> Bloblang expression, each compiling to a COLUMN and
            # folding into ONE JVM-side to_json struct — the executor only
            # converts JSON->BSON and batches commands per partition
            from bento_spark.streaming.mongodb import mongodb_writer

            mg = out["mongodb"]
            op = str(mg.get("operation", "insert-one"))
            df = self.build_stream(spark)

            def _json_map(spec, default_all: bool) -> Column:
                if spec:
                    return F.to_json(F.struct(*[
                        compile_expr(str(v)).alias(str(k)) for k, v in spec.items()
                    ]))
                if not default_all:
                    raise ValueError(
                        f"output.mongodb operation {op!r} requires `filter_map`"
                    )
                return F.to_json(F.struct(*[F.col(c) for c in df.columns]))

            if op not in ("delete-one", "delete-many"):
                df = df.withColumn(
                    "_mongo_doc", _json_map(mg.get("document_map"), default_all=True)
                )
            if op != "insert-one":
                df = df.withColumn(
                    "_mongo_filter", _json_map(mg.get("filter_map"), default_all=False)
                )
            writer = mongodb_writer(
                str(mg["url"]), str(mg.get("database", "bento")),
                str(mg["collection"]), operation=op,
                upsert=bool(mg.get("upsert", False)),
            )
        elif out.get("aws_kinesis"):
            # SigV4-signed PutRecords (aws/output_kinesis.go) — the
            # interpolated partition key as a COLUMN, <=500 records per
            # request
            import os as _os

            from bento_spark.streaming.kinesis import kinesis_sink

            kn = out["aws_kinesis"]
            df = self.build_stream(spark)
            pk_col = None
            if kn.get("partition_key"):
                df = df.withColumn(
                    "_kinesis_pk", compile_interpolated(str(kn["partition_key"])))
                pk_col = "_kinesis_pk"
            writer = kinesis_sink(
                str(kn.get("endpoint") or
                    f"https://kinesis.{kn.get('region', 'us-east-1')}.amazonaws.com"),
                str(kn["stream"]),
                str(kn.get("access_key") or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                str(kn.get("secret_key") or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                region=str(kn.get("region", "us-east-1")),
                partition_key_col=pk_col,
            )
        elif out.get("gcp_pubsub"):
            # Pub/Sub publisher (gcp/output_pubsub.go: project +
            # interpolated topic) — topic as a COLUMN, batched publishes
            from bento_spark.streaming.pubsub import pubsub_sink

            pb = out["gcp_pubsub"]
            df = self.build_stream(spark).withColumn(
                "_pubsub_topic", compile_interpolated(str(pb["topic"])))
            writer = pubsub_sink(
                str(pb.get("endpoint") or "https://pubsub.googleapis.com"),
                str(pb["project"]), "_pubsub_topic",
                credentials=self._pubsub_creds(pb),
            )
        elif out.get("aws_sqs"):
            # SigV4-signed SendMessage per row (aws/output_sqs.go) —
            # optional FIFO message_group_id as an interpolated COLUMN
            import os as _os

            from bento_spark.streaming.sqs import sqs_sink

            sq = out["aws_sqs"]
            df = self.build_stream(spark)
            group_col = None
            if sq.get("message_group_id"):
                df = df.withColumn(
                    "_sqs_group", compile_interpolated(str(sq["message_group_id"])))
                group_col = "_sqs_group"
            writer = sqs_sink(
                str(sq.get("endpoint") or
                    f"https://sqs.{sq.get('region', 'us-east-1')}.amazonaws.com"),
                str(sq["url"]),
                str(sq.get("access_key") or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                str(sq.get("secret_key") or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                region=str(sq.get("region", "us-east-1")),
                group_id_col=group_col,
            )
        elif out.get("azure_queue_storage"):
            # one Put Message per row (azure/output_queue_storage.go)
            import os as _os

            from bento_spark.streaming.azure_queue import azure_queue_sink
            from bento_spark.streaming.cep import duration_ms

            aq = out["azure_queue_storage"]
            account = str(aq.get("storage_account")
                          or _os.environ.get("AZURE_STORAGE_ACCOUNT", ""))
            df = self.build_stream(spark)
            writer = azure_queue_sink(
                str(aq.get("endpoint")
                    or f"https://{account}.queue.core.windows.net"),
                account,
                str(aq.get("storage_access_key")
                    or _os.environ.get("AZURE_STORAGE_ACCESS_KEY", "")),
                str(aq["queue_name"]),
                ttl_s=(max(1, duration_ms(str(aq["ttl"])) // 1000)
                       if aq.get("ttl") else None),
            )
        elif out.get("aws_sns"):
            # PublishBatch per partition (aws/output_sns.go): FIFO
            # group/dedupe ids as interpolated COLUMNS
            import os as _os

            from bento_spark.streaming.sns import sns_sink

            sn = out["aws_sns"]
            df = self.build_stream(spark)
            group_col = dedupe_col = None
            if sn.get("message_group_id"):
                df = df.withColumn(
                    "_sns_group", compile_interpolated(str(sn["message_group_id"])))
                group_col = "_sns_group"
            if sn.get("message_deduplication_id"):
                df = df.withColumn(
                    "_sns_dedupe",
                    compile_interpolated(str(sn["message_deduplication_id"])))
                dedupe_col = "_sns_dedupe"
            writer = sns_sink(
                str(sn.get("endpoint") or
                    f"https://sns.{sn.get('region', 'us-east-1')}.amazonaws.com"),
                str(sn["topic_arn"]),
                str(sn.get("access_key") or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                str(sn.get("secret_key") or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                region=str(sn.get("region", "us-east-1")),
                group_id_col=group_col, dedupe_id_col=dedupe_col,
            )
        elif out.get("aws_kinesis_firehose"):
            # PutRecordBatch with per-record failure retry
            # (aws/output_kinesis_firehose.go)
            import os as _os

            from bento_spark.streaming.firehose import firehose_sink

            fh = out["aws_kinesis_firehose"]
            df = self.build_stream(spark)
            writer = firehose_sink(
                str(fh.get("endpoint") or
                    f"https://firehose.{fh.get('region', 'us-east-1')}.amazonaws.com"),
                str(fh["stream"]),
                str(fh.get("access_key") or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                str(fh.get("secret_key") or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                region=str(fh.get("region", "us-east-1")),
            )
        elif out.get("azure_blob_storage"):
            # one Put Blob per message (azure/output_blob_storage.go) —
            # interpolated blob `path` renders JVM-side as a column
            import os as _os

            from bento_spark.streaming.azure_blob import azure_blob_sink

            ab = out["azure_blob_storage"]
            if "path" not in ab:
                raise ValueError(
                    "output.azure_blob_storage requires an interpolated `path`")
            account = str(ab.get("storage_account")
                          or _os.environ.get("AZURE_STORAGE_ACCOUNT", ""))
            df = self.build_stream(spark)
            df = df.withColumn("_blob_path",
                               compile_interpolated(str(ab["path"])))
            writer = azure_blob_sink(
                str(ab.get("endpoint")
                    or f"https://{account}.blob.core.windows.net"),
                account,
                str(ab.get("storage_access_key")
                    or _os.environ.get("AZURE_STORAGE_ACCESS_KEY", "")),
                str(ab["container"]),
                path_col="_blob_path",
                content_type=str(ab.get("content_type",
                                        "application/octet-stream")),
                value_col=(str(ab["value_col"]) if ab.get("value_col") else None),
            )
        elif out.get("cypher"):
            # one RUN per row (cypher/output_cypher.go): the `values` map
            # of interpolations renders JVM-side as ONE JSON column whose
            # keys feed the query's $param references
            from bento_spark.streaming.cypher import cypher_sink

            cy = out["cypher"]
            vals = cy.get("values") or {}
            df = self.build_stream(spark)
            df = df.withColumn("_cypher_values", F.to_json(F.struct(*[
                compile_interpolated(str(v)).alias(str(k))
                for k, v in vals.items()])) if vals else F.lit("{}"))
            auth = cy.get("basic_auth") or {}
            no_auth = bool(cy.get("no_auth", False))
            writer = cypher_sink(
                str(cy["uri"]), str(cy["query"]), "_cypher_values",
                database=str(cy.get("database", "")),
                user=None if no_auth else auth.get("user"),
                password=None if no_auth else auth.get("password"))
        elif out.get("discord"):
            # one POST per message (discord/output.go: API message objects
            # post verbatim, plain content wraps) — rendered JVM-side
            from bento_spark.streaming.discord import discord_sink

            dc = out["discord"]
            df = self.build_stream(spark)
            writer = discord_sink(
                str(dc.get("endpoint") or "https://discord.com"),
                str(dc["channel_id"]), str(dc["bot_token"]),
                value_col=(str(dc["value_col"]) if dc.get("value_col")
                           else None))
        elif out.get("gcp_bigquery"):
            # one inline-data load job per partition batch
            # (gcp/output_bigquery.go: dataset/table, format
            # NEWLINE_DELIMITED_JSON|CSV + csv.header) — rows render
            # JVM-side (to_json / to_csv)
            from bento_spark.streaming.bigquery import bigquery_sink

            bq = out["gcp_bigquery"]
            csv_opts = bq.get("csv") or {}
            df = self.build_stream(spark)
            writer = bigquery_sink(
                str(bq.get("endpoint") or "https://bigquery.googleapis.com"),
                str(bq["project"]), str(bq["dataset"]), str(bq["table"]),
                credentials=self._gcs_creds(bq),
                source_format=str(bq.get("format",
                                         "NEWLINE_DELIMITED_JSON")),
                csv_header=[str(h) for h in (csv_opts.get("header") or [])]
                or None,
                csv_field_delimiter=str(csv_opts.get("field_delimiter", ",")))
        elif out.get("gcp_cloud_storage"):
            # one upload per message (gcp/output_cloud_storage.go) —
            # interpolated object `path` renders JVM-side as a column;
            # collision_mode overwrite|append|error-if-exists|ignore
            from bento_spark.streaming.gcs import gcs_sink

            gc = out["gcp_cloud_storage"]
            if "path" not in gc:
                raise ValueError(
                    "output.gcp_cloud_storage requires an interpolated `path`")
            df = self.build_stream(spark)
            df = df.withColumn("_gcs_path",
                               compile_interpolated(str(gc["path"])))
            writer = gcs_sink(
                str(gc.get("endpoint") or "https://storage.googleapis.com"),
                str(gc["bucket"]), "_gcs_path",
                credentials=self._gcs_creds(gc),
                content_type=str(gc.get("content_type",
                                        "application/octet-stream")),
                collision_mode=str(gc.get("collision_mode", "overwrite")),
                value_col=(str(gc["value_col"]) if gc.get("value_col")
                           else None))
        elif out.get("sftp"):
            # per-row upload to the interpolated path (sftp/output.go:
            # codec all|lines|append) over the from-scratch SSH transport
            from bento_spark.streaming.sftp import parse_sftp_address, sftp_sink

            sf = out["sftp"]
            creds = sf.get("credentials") or {}
            host, port = parse_sftp_address(str(sf.get("address",
                                                       "127.0.0.1:22")))
            df = self.build_stream(spark)
            df = df.withColumn("_sftp_path",
                               compile_interpolated(str(sf["path"])))
            writer = sftp_sink(host, port,
                               str(creds.get("username", "")),
                               str(creds.get("password", "")),
                               "_sftp_path",
                               codec=str(sf.get("codec", "all")),
                               private_key_pem=self._sftp_private_key(creds))
        elif out.get("snowflake_put"):
            # snowflake/output_snowflake_put.go: rows group into stage
            # files per interpolated (stage, path), compressed, announced
            # via the public Snowpipe insertFiles REST (key-pair JWT);
            # stage upload transport modeled — see streaming/snowflake.py
            from bento_spark.streaming.snowflake import snowflake_put_sink

            sf = out["snowflake_put"]
            pem = sf.get("private_key")
            if not pem and sf.get("private_key_file"):
                from pathlib import Path as _Path

                pem = _Path(str(sf["private_key_file"])).read_text()
            if not pem:
                raise ValueError(
                    "output.snowflake_put requires private_key or "
                    "private_key_file (key-pair JWT auth)")
            account = str(sf["account"])
            endpoint = str(sf.get("endpoint")
                           or f"https://{account}.snowflakecomputing.com")
            df = self.build_stream(spark)
            df = (df.withColumn("_sf_stage",
                                compile_interpolated(str(sf["stage"])))
                    .withColumn("_sf_path",
                                compile_interpolated(str(sf.get("path", "")))))
            writer = snowflake_put_sink(
                endpoint, account, str(sf["user"]), str(pem),
                stage_col="_sf_stage", path_col="_sf_path",
                pipe=(str(sf["snowpipe"]) if sf.get("snowpipe") else None),
                compression=str(sf.get("compression", "AUTO")))
        elif out.get("azure_cosmosdb"):
            # per-row document operation (azure/output_cosmosdb.go) — the
            # partition key compiles to a COLUMN (`partition_keys_map`),
            # the document renders JVM-side, item_id interpolates
            from bento_spark.streaming.cosmosdb import cosmos_sink

            cd = out["azure_cosmosdb"]
            endpoint, key = self._cosmos_creds(cd)
            df = self.build_stream(spark)
            data_cols = [c for c in df.columns if c != "error"]
            pk_src = str(cd.get("partition_keys_map", "root = null"))
            df = (df.withColumn("_cdb_pk",
                                compile_expr(re.sub(r"^\s*root\s*=\s*", "",
                                                    pk_src)).cast("string"))
                    .withColumn("_cdb_doc", F.to_json(F.struct(*[
                        F.col(c) for c in data_cols]))))
            id_col = None
            if cd.get("item_id"):
                df = df.withColumn("_cdb_id",
                                   compile_interpolated(str(cd["item_id"])))
                id_col = "_cdb_id"
            writer = cosmos_sink(
                endpoint, key, str(cd["database"]), str(cd["container"]),
                pk_col="_cdb_pk", doc_col="_cdb_doc", id_col=id_col,
                operation=str(cd.get("operation", "Create")),
                auto_id=bool(cd.get("auto_id", True)))
        elif out.get("azure_table_storage"):
            # per-row entity operation (azure/output_table_storage.go) —
            # interpolated table_name/partition_key/row_key/transaction_type
            # render JVM-side as columns; properties default to ALL json
            # fields stringified (the reference's marshalling contract)
            import os as _os

            from bento_spark.streaming.azure_table import azure_table_sink

            at = out["azure_table_storage"]
            account = str(at.get("storage_account")
                          or _os.environ.get("AZURE_STORAGE_ACCOUNT", ""))
            df = self.build_stream(spark)
            data_cols = list(df.columns)
            df = (df.withColumn("_at_table",
                                compile_interpolated(str(at["table_name"])))
                    .withColumn("_at_pk",
                                compile_interpolated(str(at.get("partition_key", ""))))
                    .withColumn("_at_rk",
                                compile_interpolated(str(at.get("row_key", ""))))
                    .withColumn("_at_op",
                                compile_interpolated(str(at.get("transaction_type",
                                                                "INSERT")))))
            props = at.get("properties") or {}
            if props:
                df = df.withColumn("_at_props", F.to_json(F.struct(*[
                    compile_interpolated(str(v)).alias(str(k))
                    for k, v in props.items()])))
            else:
                df = df.withColumn("_at_props", F.to_json(F.struct(*[
                    F.col(c) for c in data_cols])))
            writer = azure_table_sink(
                str(at.get("endpoint")
                    or f"https://{account}.table.core.windows.net"),
                account,
                str(at.get("storage_access_key")
                    or _os.environ.get("AZURE_STORAGE_ACCESS_KEY", "")),
                table_col="_at_table", pk_col="_at_pk", rk_col="_at_rk",
                op_col="_at_op", props_col="_at_props")
        elif out.get("amqp_1"):
            # AMQP 1.0 sender link (amqp1/output.go): rows publish as JSON
            # amqp-value sections; the batch waits for accepted
            # dispositions (the reference's outcome wait)
            from bento_spark.streaming.amqp1 import amqp1_sink

            a1 = out["amqp_1"]
            url = a1.get("url") or (a1.get("urls") or [None])[0]
            if not url:
                raise ValueError("output.amqp_1 needs `url` (or `urls`)")
            df = self.build_stream(spark)
            writer = amqp1_sink(str(url), str(a1["target_address"]))
        elif out.get("aws_dynamodb"):
            # keyed-document PutItem writer (aws/output_dynamodb.go):
            # string_columns interpolations render JVM-side into S
            # attributes; json_map_columns paths render via to_json into
            # typed attribute trees ('.'/'' = the whole row, the
            # reference's root-path rule); BatchWriteItem in 25-item chunks
            import os as _os

            from bento_spark.streaming.dynamodb import dynamodb_sink

            do = out["aws_dynamodb"]
            df = self.build_stream(spark)
            base_cols = list(df.columns)
            string_cols: list[str] = []
            for attr, expr in (do.get("string_columns") or {}).items():
                df = df.withColumn(str(attr), compile_interpolated(str(expr)))
                string_cols.append(str(attr))
            json_cols: dict[str, str] = {}
            for attr, path in (do.get("json_map_columns") or {}).items():
                attr, path = str(attr), str(path or "")
                if path in ("", "."):
                    rendered = F.to_json(F.struct(*[F.col(c) for c in base_cols]))
                else:
                    src_typ = df.schema[path].dataType.simpleString()
                    rendered = (F.col(path) if src_typ == "string"
                                else F.to_json(F.col(path)))
                df = df.withColumn(f"_ddb_{attr}", rendered)
                json_cols[attr] = f"_ddb_{attr}"
            writer = dynamodb_sink(
                str(do.get("endpoint") or
                    f"https://dynamodb.{do.get('region', 'us-east-1')}.amazonaws.com"),
                str(do["table"]),
                str(do.get("access_key") or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                str(do.get("secret_key") or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                region=str(do.get("region", "us-east-1")),
                string_cols=string_cols,
                json_map_cols=json_cols,
                ttl=do.get("ttl"), ttl_key=do.get("ttl_key"),
            )
        elif out.get("sql_raw"):
            # statement-with-binds per batch (output_sql_raw.go): the
            # args_mapping array renders JVM-side; ONE executemany
            # transaction per micro-batch (at-least-once under replay)
            from bento_spark.operators.sql_raw import sql_raw_exec

            so = out["sql_raw"]
            if "args_mapping" not in so:
                raise ValueError("output.sql_raw requires `args_mapping`")
            df = self.build_stream(spark)
            df = df.withColumn("_sql_args", compile_expr(str(so["args_mapping"])))
            _drv, _dsn, _q = (str(so.get("driver", "sqlite")),
                              str(so["dsn"]), str(so["query"]))

            def writer(batch_df, epoch_id: int,
                       _drv=_drv, _dsn=_dsn, _q=_q) -> None:
                it = batch_df.select("_sql_args").toLocalIterator()
                sql_raw_exec(_drv, _dsn, _q,
                             args_rows=(tuple(row[0]) for row in it))
        elif out.get("aws_s3"):
            # one PutObject per message (aws/output_s3.go) — the
            # interpolated object `path` renders JVM-side as a column;
            # the body is the row JSON-serialized (or `value_col` raw)
            import os as _os

            from bento_spark.streaming.s3 import s3_sink

            s3o = out["aws_s3"]
            if "path" not in s3o:
                # the reference defaults to ${!count(...)}-${!timestamp...}
                # — wall-clock/counter interpolations violate the repo's
                # determinism invariant, so the path must be explicit
                raise ValueError("output.aws_s3 requires an interpolated `path`")
            df = self.build_stream(spark)
            df = df.withColumn("_s3_path", compile_interpolated(str(s3o["path"])))
            writer = s3_sink(
                str(s3o.get("endpoint") or
                    f"https://s3.{s3o.get('region', 'us-east-1')}.amazonaws.com"),
                str(s3o["bucket"]),
                str(s3o.get("access_key") or _os.environ.get("AWS_ACCESS_KEY_ID", "")),
                str(s3o.get("secret_key") or _os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                path_col="_s3_path",
                region=str(s3o.get("region", "us-east-1")),
                content_type=str(s3o.get("content_type", "application/octet-stream")),
                value_col=(str(s3o["value_col"]) if s3o.get("value_col") else None),
            )
        elif out.get("nanomsg"):
            # dependency-free SP-over-TCP publisher (nanomsg/output.go:
            # socket_type PUSH|PUB, bind flag) — rows publish as JSON
            from bento_spark.streaming.nanomsg import nanomsg_sink

            nn = out["nanomsg"]
            df = self.build_stream(spark)
            writer = nanomsg_sink(
                [str(u) for u in nn.get("urls") or []],
                socket_type=str(nn.get("socket_type", "PUSH")).upper(),
                bind=bool(nn.get("bind", False)),
            )
        elif out.get("zmq4"):
            # dependency-free ZMTP 3.0 publisher (zeromq/output_zmq4.go:
            # socket_type PUSH|PUB, bind flag) — rows publish as JSON, the
            # PUB topic as a pre-computed COLUMN
            from bento_spark.streaming.zeromq import zmq_sink

            z = out["zmq4"]
            df = self.build_stream(spark)
            st = str(z.get("socket_type", "PUSH")).upper()
            topic_col = None
            if st == "PUB" and z.get("topic"):
                df = df.withColumn("_zmq_topic", compile_interpolated(str(z["topic"])))
                topic_col = "_zmq_topic"
            writer = zmq_sink(
                [str(u) for u in z.get("urls") or []], socket_type=st,
                bind=bool(z.get("bind", False)), topic_col=topic_col,
            )
        elif out.get("beanstalkd"):
            # dependency-free beanstalkd producer (beanstalkd/output.go:
            # Put pri 2, no delay, 2s TTR) — rows publish as JSON, each
            # put confirmed by INSERTED
            from bento_spark.streaming.beanstalkd import (
                beanstalkd_sink,
                parse_beanstalkd_addr,
            )

            df = self.build_stream(spark)
            o = out["beanstalkd"]
            host, port = parse_beanstalkd_addr(str(o.get("address", "127.0.0.1:11300")))
            writer = beanstalkd_sink(host, port)
        elif out.get("nsq"):
            # dependency-free NSQ publisher (nsq/output.go:
            # nsqd_tcp_address, topic) — rows publish as JSON, each PUB
            # confirmed by its OK frame
            from bento_spark.streaming.nsq import nsq_sink, parse_nsqd_addr

            df = self.build_stream(spark)
            o = out["nsq"]
            host, port = parse_nsqd_addr(str(o.get("nsqd_tcp_address", "127.0.0.1:4150")))
            writer = nsq_sink(host, port, str(o["topic"]))
        elif out.get("mqtt"):
            # dependency-free publisher (mqtt/output.go: topic, qos,
            # retained) — rows publish as JSON executor-side
            from bento_spark.streaming.mqtt import mqtt_sink

            df = self.build_stream(spark)
            m = out["mqtt"]
            host, port = self._mqtt_addr(m)
            writer = mqtt_sink(host, port, m["topic"], qos=int(m.get("qos", 1)),
                               retained=bool(m.get("retained", False)))
        elif out.get("nats_object_store"):
            # chunked object put per row at the interpolated name
            # (nats/output_os.go)
            from bento_spark.streaming.nats import nats_os_sink

            no = out["nats_object_store"]
            df = self.build_stream(spark).withColumn(
                "_os_name", compile_interpolated(str(no["object_name"])))
            host, port = self._nats_addr(no)
            writer = nats_os_sink(host, port, str(no["bucket"]), "_os_name",
                                  value_col=no.get("value_col"),
                                  chunk_size=int(no.get("chunk_size",
                                                        128 * 1024)))
        elif out.get("nats_jetstream"):
            # acknowledged JetStream publish per row
            # (nats/output_jetstream.go) — error acks fail/replay the task
            from bento_spark.streaming.nats import nats_jetstream_sink

            nj = out["nats_jetstream"]
            df = self.build_stream(spark).withColumn(
                "_js_subject", compile_interpolated(str(nj["subject"])))
            host, port = self._nats_addr(nj)
            writer = nats_jetstream_sink(host, port, "_js_subject",
                                         value_col=nj.get("value_col"))
        elif out.get("nats"):
            # dependency-free core-NATS publisher (nats/output.go:
            # interpolated subject) — the per-row subject compiles to a
            # COLUMN (never row-at-a-time Python), rows publish as JSON
            from bento_spark.streaming.nats import nats_sink

            n = out["nats"]
            df = self.build_stream(spark).withColumn(
                "_nats_subject", compile_interpolated(str(n["subject"])))
            host, port = self._nats_addr(n)
            writer = nats_sink(host, port, "_nats_subject")
        elif out.get("pulsar"):
            # dependency-free Pulsar producer (pulsar/output.go: topic +
            # interpolated key / ordering_key, max_in_flight) — the per-row
            # keys compile to COLUMNS, rows publish as JSON with pipelined
            # sends + a receipt drain per partition
            from bento_spark.streaming.pulsar import parse_pulsar_url, pulsar_sink

            p = out["pulsar"]
            host, port = parse_pulsar_url(
                str(p.get("url", "pulsar://127.0.0.1:6650")))
            df = self.build_stream(spark)
            key_col = ok_col = None
            if p.get("key"):
                df = df.withColumn("_pulsar_key",
                                   compile_interpolated(str(p["key"])))
                key_col = "_pulsar_key"
            if p.get("ordering_key"):
                df = df.withColumn("_pulsar_ordering_key",
                                   compile_interpolated(str(p["ordering_key"])))
                ok_col = "_pulsar_ordering_key"
            auth = (p.get("auth") or {}).get("token") or {}
            token = auth.get("token") if auth.get("enabled") else None
            writer = pulsar_sink(host, port, str(p["topic"]), key_col=key_col,
                                 ordering_key_col=ok_col, token=token,
                                 max_in_flight=int(p.get("max_in_flight", 64)))
        elif out.get("amqp_0_9"):
            # AMQP 0.9.1 publisher (amqp09/output.go: interpolated exchange
            # `key`) — the routing key compiles to a COLUMN, rows publish
            # as JSON executor-side
            from bento_spark.streaming.amqp import amqp_sink, parse_amqp_url

            a = out["amqp_0_9"]
            url = (a.get("urls") or [a.get("url", "amqp://127.0.0.1:5672")])[0]
            host, port, vhost = parse_amqp_url(str(url))
            df = self.build_stream(spark).withColumn(
                "_amqp_key", compile_interpolated(str(a.get("key", ""))))
            ex = a.get("exchange", "")
            exd = a.get("exchange_declare") or {}
            if exd.get("enabled"):
                from bento_spark.streaming.amqp import AmqpClient

                c = AmqpClient(host, port, vhost=vhost)
                try:
                    c.exchange_declare(ex, exd.get("type", "direct"),
                                       durable=bool(exd.get("durable", False)))
                finally:
                    c.close()
            writer = amqp_sink(host, port, ex, "_amqp_key", vhost=vhost)
        elif any(out.get(k) for k in ("redis_list", "redis_pubsub", "redis_streams", "redis_hash")):
            # redis outputs (redis/output_list.go, output_pubsub.go,
            # output_streams.go:154, output_hash.go:193): the interpolated
            # key/channel/stream compiles to a COLUMN, rows write as one
            # pipelined round-trip per partition
            from bento_spark.streaming import redis as _redis

            name = next(k for k in ("redis_list", "redis_pubsub", "redis_streams", "redis_hash") if out.get(k))
            r = out[name]
            host, port = self._redis_addr(r)
            df = self.build_stream(spark)
            if name == "redis_list":
                df = df.withColumn("_redis_key", compile_interpolated(str(r["key"])))
                writer = _redis.redis_list_sink(host, port, "_redis_key")
            elif name == "redis_pubsub":
                df = df.withColumn("_redis_channel", compile_interpolated(str(r["channel"])))
                writer = _redis.redis_pubsub_sink(host, port, "_redis_channel")
            elif name == "redis_streams":
                df = df.withColumn("_redis_stream", compile_interpolated(str(r["stream"])))
                writer = _redis.redis_streams_sink(
                    host, port, "_redis_stream", body_key=r.get("body_key", "body"),
                    meta_cols=r.get("metadata"), max_length=r.get("max_length"),
                )
            else:
                df = df.withColumn("_redis_hkey", compile_interpolated(str(r["key"])))
                writer = _redis.redis_hash_sink(host, port, "_redis_hkey",
                                                fields=r.get("fields"))
        elif "sync_response" in out:
            # reply-to-request output (output_sync_response.go:15): the
            # processed row answers the HTTP request that produced it,
            # routed by the request_id the sync http_server input stamped
            from bento_spark.streaming.sink import sync_response_writer

            hs = (self.conf.get("input") or {}).get("http_server") or {}
            if not hs.get("sync"):
                raise ValueError(
                    "output.sync_response requires input.http_server with "
                    "`sync: true` (the input must hold requests open and "
                    "stamp request ids)"
                )
            df = self.build_stream(spark)
            sr = out.get("sync_response") or {}
            writer = sync_response_writer(
                self._sync_dir_of(hs), content_col=sr.get("content"))
        elif out.get("fallback"):
            # ordered try-next-sink failover (output_fallback.go:18)
            from bento_spark.streaming.sink import fallback_writer

            df = self.build_stream(spark)
            sinks = [IdempotentParquetSink(p, checkpoint=checkpoint) for p in out["fallback"]]
            self._case_sinks = sinks
            writer = fallback_writer(sinks)
        elif out.get("fan_out") or out.get("round_robin"):
            # broker patterns (output_broker.go:150): fan_out = every sink
            # gets the batch; round_robin = deterministic row-hash spread
            from bento_spark.streaming.sink import route_outputs

            df = self.build_stream(spark)
            mode = "fan_out" if out.get("fan_out") else "round_robin"
            sinks = [(None, IdempotentParquetSink(p, checkpoint=checkpoint)) for p in out[mode]]
            self._case_sinks = [s for _, s in sinks]
            writer = route_outputs(sinks, mode=mode)
        elif out.get("dynamic"):
            # labeled fan_out broker (output_dynamic.go: "the broker
            # pattern used is always fan_out"); runtime add/remove maps
            # to the StreamManager REST API, like input.dynamic
            from bento_spark.streaming.sink import route_outputs

            df = self.build_stream(spark)
            outputs = out["dynamic"].get("outputs") or {}
            if not outputs:
                raise ValueError("dynamic output: `outputs` map is empty")
            sinks = [(None, IdempotentParquetSink(p, checkpoint=checkpoint))
                     for _label, p in sorted(outputs.items())]
            self._case_sinks = [s for _, s in sinks]
            writer = route_outputs(sinks, mode="fan_out")
        elif out.get("socket"):
            # tcp/udp/unix lines producer (output_socket.go) — one
            # connection per partition, rows rendered JVM-side
            from bento_spark.streaming.sink import socket_sink

            s = out["socket"]
            df = self.build_stream(spark)
            writer = socket_sink(str(s.get("network", "tcp")), str(s["address"]))
        elif out.get("websocket"):
            # masked text frames over an RFC 6455 client connection
            # (output_websocket.go) — handshake per partition
            from bento_spark.streaming.sink import websocket_sink

            w = out["websocket"]
            df = self.build_stream(spark)
            tls = w.get("tls") or {}
            writer = websocket_sink(str(w["url"]),
                                    tls_insecure=bool(tls.get("skip_cert_verify")))
        elif out.get("hdfs"):
            # one file per message at interpolated directory/path over
            # WebHDFS two-step CREATE (hdfs/output.go)
            from bento_spark.streaming.hdfs import hdfs_sink

            ho = out["hdfs"]
            df = self.build_stream(spark)
            df = (df.withColumn("_hdfs_dir",
                                compile_interpolated(str(ho["directory"])))
                    .withColumn("_hdfs_path",
                                compile_interpolated(str(ho["path"]))))
            writer = hdfs_sink(
                ho.get("hosts") or [str(ho.get("host", "127.0.0.1:9870"))],
                user=str(ho.get("user", "bento")),
                value_col=ho.get("value_col"),
            )
        elif out.get("http_server"):
            # GET/stream/websocket serving endpoints over a bounded queue
            # (output_http_server.go:147) — driver-side serving bridge;
            # push blocks on a full queue (backpressure)
            from bento_spark.streaming.http_server import (
                HttpServeOutput,
                http_serve_sink,
            )

            hs = out["http_server"]
            df = self.build_stream(spark)
            addr = str(hs.get("address", "127.0.0.1:0"))
            host, _, port = addr.partition(":")
            self._http_serve = HttpServeOutput(
                host=host or "127.0.0.1", port=int(port or 0),
                path=str(hs.get("path", "/get")),
                stream_path=str(hs.get("stream_path", "/get/stream")),
                ws_path=str(hs.get("ws_path", "/get/ws")),
                timeout_s=float(hs.get("timeout", 5.0)),
                maxsize=int(hs.get("max_pending", 1024)),
            ).start()
            writer = http_serve_sink(self._http_serve,
                                     content_col=hs.get("content_col"))
        elif out.get("subprocess"):
            # stdin lines into a driver-side child process
            # (output_subprocess.go: maxInFlight=1, relaunch on exit)
            from bento_spark.streaming.subprocess_io import subprocess_sink

            sp = out["subprocess"]
            df = self.build_stream(spark)
            writer = subprocess_sink(str(sp["name"]),
                                     [str(a) for a in (sp.get("args") or [])])
        else:
            df = self.build_stream(spark)
            if dlq_path:
                # same query => same checkpoint binds the DLQ's markers too
                dlq = IdempotentParquetSink(dlq_path, checkpoint=checkpoint)
                writer = dlq_split_writer(self._sink, dlq)
            else:
                writer = self._sink.foreach_batch()
        if self._read_until is not None:
            writer = self._wrap_read_until(writer)
        eh = self.conf.get("error_handling") or {}
        if eh.get("strategy") == "retry":
            writer = self._wrap_retry_writer(writer, eh)
        if self._reject_errored is not None:
            # streaming error_handling: {strategy: reject, dlq: ...} —
            # the errored branch stashed by _error_strategy feeds a SIDE
            # query with its own checkpoint (same dual-query pattern as
            # window+output.dlq); without this the reject filter silently
            # drops errored rows that batch mode DLQs
            errored, eh_dlq_path = self._reject_errored
            eh_ck = checkpoint.rstrip("/") + "_ehdlq"
            eh_sink = IdempotentParquetSink(eh_dlq_path, checkpoint=eh_ck)
            self._eh_dlq_query = (
                errored.writeStream.outputMode("append")
                .option("checkpointLocation", eh_ck)
                .foreachBatch(eh_sink.foreach_batch())
                .trigger(**_trigger())
                .start()
            )
        q = (
            df.writeStream.outputMode(out.get("mode", "append"))
            .option("checkpointLocation", checkpoint)
            .foreachBatch(writer)
        )
        query = q.trigger(**_trigger()).start()
        if self._read_until is not None:
            import threading

            def monitor() -> None:
                while query.isActive:
                    if self._stop_requested:
                        query.stop()
                        return
                    import time

                    time.sleep(0.1)

            threading.Thread(target=monitor, daemon=True).start()
        return query

    def _wrap_retry_writer(self, inner, eh: dict):
        """Streaming `error_handling: {strategy: retry}` — the reference's
        feedback pipeline (bundle/strict/pipeline.go) re-feeds failed
        messages; the micro-batch analogue re-EVALUATES the epoch's plan
        (foreachBatch frames are lazy, so each evaluation re-runs the
        chain's transient stages — http/subprocess get real second
        chances). Each attempt is materialized via localCheckpoint so the
        checked rows ARE the written rows; after `max_attempts` (default 3,
        bounded by design — the reference retries forever, which turns a
        permanent failure into a hang), `on_exhausted` decides: 'none'
        writes the batch with errors flagged, 'reject' writes only clean
        rows (pair with output.dlq to capture)."""
        max_attempts = int(eh.get("max_attempts", 3))
        on_exhausted = eh.get("on_exhausted", "none")

        def writer(batch_df, epoch_id: int) -> None:
            has_error_col = "error" in batch_df.columns
            mat, has_err = batch_df, False
            for _ in range(max_attempts):
                mat = batch_df.localCheckpoint(eager=True)
                has_err = has_error_col and bool(
                    mat.filter(F.col("error").isNotNull()).limit(1).take(1)
                )
                if not has_err:
                    break
            if has_err and on_exhausted == "reject":
                mat = mat.filter(F.col("error").isNull())
            inner(mat, epoch_id)

        return writer

    def _wrap_read_until(self, inner):
        """Wrap the sink writer with read_until semantics: the triggering
        batch is written, subsequent batches are discarded while the stop
        monitor tears the query down (the reference likewise drops messages
        consumed after the predicate fires)."""
        cond = self._read_until

        def writer(batch_df, epoch_id: int) -> None:
            if self._stop_requested:
                return
            inner(batch_df, epoch_id)
            if not batch_df.filter(cond).isEmpty():
                self._stop_requested = True

        return writer

    @property
    def sink(self) -> IdempotentParquetSink:
        if self._sink is None:
            raise RuntimeError("run_stream has not been called")
        return self._sink


_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")
# same pattern but also matching (and preserving) the $$-escaped form
_ENV_ESC_RE = re.compile(r"\$?\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def _split_args_array(mapping: str) -> list[str]:
    """Split the reference's `args_mapping` form `root = [e1, e2, ...]`
    into element expressions (top-level commas only — brackets, parens
    and string quotes nest)."""
    import re

    m = re.match(r"\s*root\s*=\s*\[(.*)\]\s*$", mapping, re.S)
    if not m:
        raise ValueError(
            "args_mapping must be `root = [expr, ...]` (cassandra/output.go) "
            "or a YAML list of expressions")
    body = m.group(1)
    out: list[str] = []
    depth = 0
    quote: str | None = None
    cur: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if quote:
            cur.append(ch)
            if ch == quote:
                # closed only when preceded by an EVEN number of
                # backslashes ("\\" ends the string; "\"" does not)
                nbs = 0
                j = i - 1
                while j >= 0 and body[j] == "\\":
                    nbs += 1
                    j -= 1
                if nbs % 2 == 0:
                    quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    if not out:
        raise ValueError("args_mapping array is empty")
    return out


def interpolate_env(src: str, env: dict[str, str] | None = None) -> str:
    """Environment-variable interpolation in raw config text, BEFORE YAML
    parse: `${VAR}` / `${VAR:default}` (reference
    internal/config/env_vars.go). Missing vars without a default raise —
    the reference lints these. `${! ... }` Bloblang interpolations are a
    different mini-language resolved per row at compile time; the leading
    `!` keeps them out of this regex. `$${VAR}` escapes to a literal
    `${VAR}` (the reference's env_vars interpolation supports the same
    double-dollar escape)."""
    import os as _os

    env = _os.environ if env is None else env

    def sub(m: re.Match) -> str:
        if m.group(0).startswith("$$"):
            return m.group(0)[1:]  # $${VAR} -> literal ${VAR}
        val = env.get(m.group(1), m.group(2))
        if val is None:
            raise ValueError(f"config references unset environment variable ${{{m.group(1)}}}")
        return val

    return _ENV_ESC_RE.sub(sub, src)


def apply_overrides(conf: dict, overrides: dict[str, Any]) -> dict:
    """`-s field.path=value` CLI overrides (reference internal/cli/run.go
    runFlags :97): dotted paths into the parsed config, creating
    intermediate maps; values are YAML-parsed so `-s a.b=3` is an int."""
    for path, val in overrides.items():
        node = conf
        keys = path.split(".")
        for k in keys[:-1]:
            nxt = node.get(k)
            if not isinstance(nxt, dict):
                nxt = {}
                node[k] = nxt
            node = nxt
        node[keys[-1]] = yaml.safe_load(val) if isinstance(val, str) else val
    return conf


def compile_yaml(
    src: str,
    overrides: dict[str, Any] | None = None,
    env: dict[str, str] | None = None,
) -> Pipeline:
    conf = yaml.safe_load(interpolate_env(src, env))
    if not isinstance(conf, dict):
        raise ValueError("pipeline config must be a mapping")
    if overrides:
        conf = apply_overrides(conf, overrides)
    return Pipeline(conf)
