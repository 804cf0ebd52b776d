"""dtle_spark — a PySpark-native re-expression of actiontech/dtle.

The reference (at /root/reference, cited by file:line throughout) is a
MySQL/Oracle CDC + replication engine: chunked snapshot copy, binlog
streaming, per-row SQL ``Where`` filters, table/column mapping, parallel
idempotent apply, and a Kafka (Debezium) sink. This package re-expresses
that capability surface Spark-first:

- snapshot scans     -> batch DataFrame reads with pushdown (sources/)
- change streams     -> Structured Streaming over ChangeRecord rows
- Where/row filters  -> Catalyst ``F.expr`` (operators/filters.py)
- column map/rename  -> ``select``/``alias`` projections (operators/projection.py)
- apply/merge        -> key-latest merge in ``foreachBatch`` (operators/apply.py)
- Kafka envelope     -> ``to_json`` struct envelopes (sinks/debezium.py)
- beyond-parity      -> dedup / similarity / text analysis (functions/)

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning
and join strategy; Python UDFs appear only where built-ins cannot express
the semantics (and then as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
