"""Wire form of the change stream: row images as JSON strings.

A streaming source has a static schema, but replicated tables evolve
mid-stream (DDL). The reference solves this by shipping column defs
in-band (DefChangedSent, binlog_reader.go:1911-1925); the Spark-native
equivalent is what Debezium topics do: images travel as JSON text and
are parsed per micro-batch with the schema the catalog holds *at that
point in the stream* (``from_json`` against the evolving StructType).

Typed form (structs) is used by batch operators; these two functions
convert between the forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("sid", T.StringType(), False),
        T.StructField("gno", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("lc", T.LongType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("schema_name", T.StringType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("before", T.StringType(), True),
        T.StructField("after", T.StringType(), True),
        T.StructField("query", T.StringType(), True),
    ]
)


# default to_json truncates timestamps to milliseconds; MySQL DATETIME(6)
# carries microseconds (type map §1.3) — force a micros format both ways
_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def to_wire(changes: DataFrame) -> DataFrame:
    """Typed change stream -> wire form (struct images to JSON text)."""
    return changes.withColumn("before", F.to_json("before", _JSON_OPTS)).withColumn(
        "after", F.to_json("after", _JSON_OPTS)
    )


def from_wire(wire: DataFrame, row_schema: T.StructType) -> DataFrame:
    """Wire form -> typed, parsing images with the given (current)
    table schema. Columns added by later DDL are absent from older
    JSON and parse as null; columns dropped later are ignored — the
    exact forward/backward tolerance in-band schema evolution needs."""
    return wire.withColumn(
        "before", F.from_json("before", row_schema, _JSON_OPTS)
    ).withColumn("after", F.from_json("after", row_schema, _JSON_OPTS))
