"""CDC ingest bridges (reference S6/S7): how binlog events become the
wire-form change stream the engine consumes.

Binlog parsing is outside Spark (BASELINE.json notes this explicitly);
the reference runs a go-mysql BinlogSyncer in-process. The Spark-native
topology is a small bridge process that publishes wire-form records
(streaming/wire.py schema) to a staging directory or Kafka topic, and
the engine's ``readStream`` picks them up. Three bridges:

- FileBridge (implemented): append wire-form parquet files to a dir —
  the relay-log analogue (S7); used by every streaming test.
- KafkaBridge (config-only here): ``readStream.format("kafka")`` over a
  Debezium-ish topic; needs the spark-sql-kafka jars on the cluster.
- MySQLBinlogBridge (import-gated): the python-mysql-replication
  BinlogStreamReader loop -> wire rows; the lib isn't in this
  environment, so construction raises with instructions.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from dtle_spark.streaming.wire import WIRE_SCHEMA, to_wire


class FileBridge:
    """Publish change batches as wire-form parquet files (relay log)."""

    def __init__(self, source_dir: str):
        self.source_dir = source_dir
        os.makedirs(source_dir, exist_ok=True)

    def publish(self, changes: DataFrame, typed: bool = True) -> str:
        """Append one batch (typed ChangeRecords by default)."""
        out = to_wire(changes) if typed else changes
        path = os.path.join(self.source_dir, f"batch-{uuid.uuid4().hex[:12]}")
        out.write.parquet(path)
        return path

    def read_stream(self, spark: SparkSession, max_files_per_trigger: int = 10):
        return (
            spark.readStream.schema(WIRE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(os.path.join(self.source_dir, "*"))
        )


def kafka_stream(spark: SparkSession, bootstrap: str, topic: str):
    """Kafka-topic bridge: value column carries the wire JSON. Requires
    spark-sql-kafka jars (cluster deployment; not in this image)."""
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), WIRE_SCHEMA).alias("c")
    ).select("c.*")
    return parsed


class MySQLBinlogBridge:
    """GTID-positioned MySQL binlog tail -> wire rows (reference S6,
    binlog_reader.go:242-415).

    The TRANSLATION layer (binlog event -> wire row, GTID/seq/
    last_committed bookkeeping, DDL query entries, do/ignore table
    selection) is fully implemented in sources/binlog_events.py and
    golden-tested offline against canned event dicts — only the network
    socket needs python-mysql-replication, which is absent here, so
    ``tail()`` raises while everything else works. Deployment shape:
    run this next to the MySQL source, publish each commit's rows
    through a FileBridge (relay spool) or Kafka; the engine's
    readStream consumes the wire form.
    """

    def __init__(self, selector=None, resume_from=None):
        from dtle_spark.sources.binlog_events import BinlogEventTranslator

        self.translator = BinlogEventTranslator(selector, resume_from)

    def translate(self, events: list[dict]) -> list[dict]:
        """Canned/offline path: event dicts -> wire-row dicts."""
        return self.translator.feed_all(events)

    def position(self) -> str:
        """Executed-GTID set (the coordinates the reference keeps in
        dtle.gtid_executed_v4 and exposes over the position API)."""
        return self.translator.gtid_executed.to_str()

    def publish(self, spark: SparkSession, bridge: FileBridge, events: list[dict]) -> str | None:
        """Translate canned events and append them to a FileBridge
        spool as one wire-form batch (None when nothing committed)."""
        rows = self.translate(events)
        if not rows:
            return None
        df = spark.createDataFrame(rows, WIRE_SCHEMA)
        return bridge.publish(df, typed=False)

    def tail(self, *a, **kw):
        """The live socket loop (BinlogStreamReader -> feed ->
        publish). Import-gated: the library is not in this image."""
        try:
            import pymysqlreplication  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "python-mysql-replication not installed; deploy the bridge "
                "next to the MySQL source and publish via FileBridge/Kafka"
            ) from e


class OracleLogMinerBridge:
    """Oracle redo-log source (reference S8: DBMS_LOGMNR add/start +
    v$logmnr_contents polled by SCN window, per-tx commit/rollback cache
    — log_miner.go:36-618).

    Everything except the DB socket is implemented offline:
    sources/oracle_ddl.py translates DDL redo SQL to MySQL dialect
    (S10, golden-matched to log_miner_test.go), parses DML redo SQL
    into ordinal rows, builds the V$LOGMNR_CONTENTS filter, and the
    LogMinerRecordTranslator replays the reference's per-tx
    commit/rollback cache into wire rows. Value-literal conversion
    lives in sources/oracle_values.py. Only ``tail()`` (the SCN-window
    poll loop) needs the absent oracledb client.
    """

    def __init__(self, source_id: str = "oracle-src",
                 columns: dict | None = None):
        from dtle_spark.sources.oracle_ddl import LogMinerRecordTranslator

        self.translator = LogMinerRecordTranslator(source_id, columns or {})

    def translate(self, records: list[dict]) -> list[dict]:
        """Canned/offline path: LogMiner record dicts -> wire rows."""
        return self.translator.feed_all(records)

    def publish(self, spark: SparkSession, bridge: FileBridge, records: list[dict]) -> str | None:
        rows = self.translate(records)
        if not rows:
            return None
        return bridge.publish(spark.createDataFrame(rows, WIRE_SCHEMA), typed=False)

    def tail(self, *a, **kw):
        try:
            import oracledb  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "oracledb client not installed; deploy the LogMiner bridge "
                "next to the Oracle source and publish via FileBridge/Kafka "
                "(translation: dtle_spark.sources.oracle_ddl)"
            ) from e
