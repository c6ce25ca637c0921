"""sql_select / sql_insert over JDBC — availability-gated connectors.

Reference: parameterized SQL lookup and insert processors
(/root/reference/internal/impl/sql/processor_sql_select.go:30-51,
processor_sql_insert.go) over database/sql drivers.

Spark-first mapping: `sql_select` is a table/query read through the JDBC
datasource — as a DIMENSION (the enrichment then being a broadcast
lookup_join), never a per-row query: the reference amortizes per-batch, we
amortize per-table. `sql_insert` is a foreachBatch `df.write.jdbc` append —
at-least-once (JDBC has no idempotent upsert primitive across engines;
keyed exactly-once belongs to the Iceberg MERGE sink).

No JDBC driver jar ships in this sandbox, so both gate on the driver class
with an error naming the jar, exactly like the kafka/avro/protobuf paths.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_DRIVERS = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlite": "org.sqlite.JDBC",
    "clickhouse": "com.clickhouse.jdbc.ClickHouseDriver",
}


def _driver_for(url: str) -> str:
    scheme = url.removeprefix("jdbc:").split(":", 1)[0]
    driver = _DRIVERS.get(scheme)
    if driver is None:
        raise ValueError(f"unsupported jdbc scheme {scheme!r} (one of {sorted(_DRIVERS)})")
    return driver


def jdbc_available(spark: SparkSession, url: str) -> bool:
    from bento_spark.gating import classpath_available

    return classpath_available(spark, _driver_for(url))


def _require(spark: SparkSession, url: str, what: str) -> None:
    from bento_spark.gating import require_classpath

    require_classpath(spark, _driver_for(url), f"<{_driver_for(url)} JDBC driver jar>", what)


def sql_select(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_options: dict | None = None,
    **props: str,
) -> DataFrame:
    """Read a table/query through JDBC. partition_options
    (partitionColumn/lowerBound/upperBound/numPartitions) split the read
    across executors — without them a JDBC read is one connection."""
    _require(spark, url, "sql_select")
    if (table is None) == (query is None):
        raise ValueError("sql_select needs exactly one of table= or query=")
    rd = spark.read.format("jdbc").option("url", url).option("driver", _driver_for(url))
    rd = rd.option("dbtable", table) if table else rd.option("query", query)
    for k, v in {**(partition_options or {}), **props}.items():
        rd = rd.option(k, str(v))
    return rd.load()


def sql_insert_writer(
    spark: SparkSession, url: str, table: str, **props: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch JDBC append (at-least-once; see module docstring)."""
    _require(spark, url, "sql_insert")
    driver = _driver_for(url)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        w = batch_df.write.format("jdbc").mode("append").option("url", url)
        w = w.option("driver", driver).option("dbtable", table)
        for k, v in props.items():
            w = w.option(k, str(v))
        w.save()

    return write_batch
