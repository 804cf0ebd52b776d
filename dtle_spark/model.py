"""Core data model: change records, table configs, type mapping.

Mirrors the reference's single IR — ``DataEntry``/``DataEvent``
(/root/reference/driver/common/type.schema:53-91) — and per-table job
config (``Table``, /root/reference/driver/common/tabletypes.go:94-112),
re-expressed as a Spark row schema + a small dataclass.

A change stream is a DataFrame (batch or streaming) with the columns of
:func:`change_schema`:

- ``sid``/``gno``       source server UUID + tx number; (sid, gno) is the
                        idempotence/dedupe key (reference
                        applier_incr.go:290-313, gtid_executed bookkeeping)
- ``seq``/``lc``        sequence_number / last_committed of the MySQL MTS
                        logical clock (type.schema:24-27). We keep them as
                        plain columns: ordering is re-established per key
                        with a window, not with the reference's clock
                        (see operators/apply.py).
- ``op``                'i' | 'u' | 'd' | 'ddl' (type.schema:60 DML enum)
- ``ts``                event timestamp (delay metric source)
- ``schema_name``/``table_name``  pre-rename source identifiers
- ``before``/``after``  row images as structs of the source table schema;
                        insert has only ``after``, delete only ``before``
                        (type.schema:65-79 rows union)
- ``query``             DDL text when op='ddl'
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

OP_INSERT = "i"
OP_UPDATE = "u"
OP_DELETE = "d"
OP_DDL = "ddl"


def change_schema(row_schema: T.StructType) -> T.StructType:
    """Build the ChangeRecord schema for a table with ``row_schema``."""
    return T.StructType(
        [
            T.StructField("sid", T.StringType(), False),
            T.StructField("gno", T.LongType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("lc", T.LongType(), True),
            T.StructField("op", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("schema_name", T.StringType(), True),
            T.StructField("table_name", T.StringType(), True),
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("query", T.StringType(), True),
        ]
    )


# MySQL type name -> Spark type, per the reference's column enumeration
# (/root/reference/driver/mysql/mysqlconfig/types.go:24-57) and its Kafka
# encodings (kafka/kafka2.go:339-601). Unsigned integers widen; unsigned
# bigint needs DecimalType(20,0) to hold > int64 values.
MYSQL_TO_SPARK: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "tinyint unsigned": T.ShortType(),
    "smallint": T.ShortType(),
    "smallint unsigned": T.IntegerType(),
    "mediumint": T.IntegerType(),
    "mediumint unsigned": T.IntegerType(),
    "int": T.IntegerType(),
    "int unsigned": T.LongType(),
    "bigint": T.LongType(),
    "bigint unsigned": T.DecimalType(20, 0),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "tinytext": T.StringType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "blob": T.BinaryType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "timestamp": T.TimestampType(),
    # MySQL TIME is a signed interval (kafka2.go:397-454 encodes signed
    # microseconds); Spark has no TIME type -> microseconds as long.
    "time": T.LongType(),
    "year": T.IntegerType(),
    "enum": T.StringType(),
    "set": T.StringType(),
    "bit1": T.BooleanType(),
    "bit": T.BinaryType(),
    "json": T.StringType(),
}


def mysql_type_to_spark(name: str, precision: int = 0, scale: int = 0) -> T.DataType:
    base = name.strip().lower()
    if base.startswith("decimal"):
        return T.DecimalType(precision or 10, scale or 0)
    if base == "bit":
        return MYSQL_TO_SPARK["bit1"] if precision == 1 else MYSQL_TO_SPARK["bit"]
    if base in MYSQL_TO_SPARK:
        return MYSQL_TO_SPARK[base]
    raise ValueError(f"unmapped MySQL type: {name!r}")


@dataclass
class TableConfig:
    """Per-table replication config (reference ``Table``,
    tabletypes.go:94-112): selection, rename, column map, row filter,
    and the chosen unique key used for chunking + apply matching."""

    schema_name: str
    table_name: str
    rename_schema: str | None = None  # TableSchemaRename
    rename_table: str | None = None  # TableRename
    # ColumnMapFrom -> ColumnMapTo: projection + positional reorder
    # (mysqlconfig/types.go:204-214); empty = all columns unchanged
    column_map_from: list[str] = field(default_factory=list)
    column_map_to: list[str] = field(default_factory=list)
    # SQL boolean expression over source column names (qlbridge grammar in
    # the reference, tabletypes.go:151-195; Catalyst SQL here — F2's
    # function registry is a subset of Spark's built-ins)
    where: str | None = None
    # chosen unique key columns (GetCandidateUniqueKeys,
    # base/utils.go:609-712); empty = no-PK table (full-row matching).
    # NOTE: expressed in TARGET-side (post-column-map) names — the
    # merge runs after map_changes renames the images.
    unique_key: list[str] = field(default_factory=list)

    @property
    def target_schema(self) -> str:
        return self.rename_schema or self.schema_name

    @property
    def target_table(self) -> str:
        return self.rename_table or self.table_name


@dataclass
class JobConfig:
    """A replication job: the reference's src+dest task pair
    (taskconfig.go:38-82) minus the transport (Spark moves the data)."""

    name: str
    tables: list[TableConfig]
    # group-commit analogue: micro-batch trigger (extractor.go:979-1058)
    trigger_seconds: float = 1.0
    # skip transactions originated by this server id (two-way sync cycle
    # prevention, applier_incr.go:292-294)
    local_sid: str | None = None
    # per-tx atomicity across micro-batch boundaries: hold back each
    # source's frontier (possibly still-incomplete) tx in a spool until
    # a later gno proves it committed (streaming/pipeline.py TxSpool)
    tx_atomic: bool = False

    def table(self, schema_name: str, table_name: str) -> TableConfig | None:
        for t in self.tables:
            if t.schema_name == schema_name and t.table_name == table_name:
                return t
        return None


def reverse_table_config(cfg: TableConfig) -> TableConfig:
    """Invert one table's replication direction (the reference's
    reverse-job construction, api/handler/v2/job.go:1970-2006): the
    TARGET names become the source selection, renames point back, and
    ColumnMapFrom/ColumnMapTo swap — rejected when ColumnMapFrom is a
    projection without a ColumnMapTo (not invertible), exactly the
    reference's conflict check (:1999-2004). The unique key is mapped
    through the column map into target-side names. ``where`` is written
    against source column names and does not survive inversion — it is
    dropped with the same "operator re-adds filters explicitly"
    expectation the reference has."""
    if cfg.column_map_from and not cfg.column_map_to:
        raise ValueError(
            f"{cfg.schema_name}.{cfg.table_name}: job can't be reversed with "
            "ColumnMapFrom not matching ColumnMapTo"
        )
    # unique_key is expressed in TARGET-side (post-map) names — the
    # merge runs after map_changes — so the reverse key maps each
    # forward-target name back to its forward-source name (which is the
    # reverse job's target side).
    to_source = dict(zip(cfg.column_map_to, cfg.column_map_from))
    return TableConfig(
        schema_name=cfg.target_schema,
        table_name=cfg.target_table,
        rename_schema=cfg.schema_name if cfg.rename_schema else None,
        rename_table=cfg.table_name if cfg.rename_table else None,
        column_map_from=list(cfg.column_map_to),
        column_map_to=list(cfg.column_map_from),
        where=None,
        unique_key=[to_source.get(k, k) for k in cfg.unique_key],
    )


def reverse_job_config(job: JobConfig, local_sid: str | None = None) -> JobConfig:
    """Build the reverse job ("reverse-<name>", :1971) from a forward
    job: every table inverted, and ``local_sid`` set to the FORWARD
    source's server id so transactions that originated there are not
    echoed back (A11 cycle prevention — the reference couples this to
    AutoGtid + WaitOnJob handoff)."""
    return JobConfig(
        name=f"reverse-{job.name}",
        tables=[reverse_table_config(t) for t in job.tables],
        trigger_seconds=job.trigger_seconds,
        local_sid=local_sid if local_sid is not None else job.local_sid,
        tx_atomic=job.tx_atomic,
    )
