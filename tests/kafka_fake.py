"""A behavioral in-memory fake of kafka-python's producer surface —
stronger than the recording transcript in test_transport_contract: it
models the parts of the REAL client whose semantics the sink relies
on, so produce_frames is exercised against client behavior, not
against a log of its own calls (VERDICT r10 task 8).

Modeled semantics (kafka-python KafkaProducer):

- ``send()`` is ASYNC: it enqueues and returns a future; the record
  is NOT visible on the broker until the background sender delivers
  it. Here delivery happens on ``flush()`` (the max-linger
  execution) or on ``future.get()`` (which in the real client blocks
  until that record's delivery — modeled by delivering the in-order
  prefix up to it, never the record alone: per-partition ordering is
  the property the sink's correctness argument stands on).
- ``flush()`` delivers every buffered record IN SEND ORDER and
  resolves their futures with RecordMetadata(topic, partition,
  offset) carrying broker-assigned monotone offsets.
- ``close()`` flushes, then refuses further sends (IllegalState in
  the real client).
- the broker keeps an append-only per-topic log and can apply LOG
  COMPACTION (keep each key's last record; drop keys whose last
  record is a tombstone) — the retention mode Debezium topics run
  under, and the reason send ORDER is correctness, not tidiness.

Single partition per topic (the sink sends without a partition arg
and orders globally per drain, so one partition is the faithful
model).
"""

from __future__ import annotations


class RecordMetadata:
    def __init__(self, topic: str, partition: int, offset: int):
        self.topic = topic
        self.partition = partition
        self.offset = offset


class FakeFuture:
    """kafka-python FutureRecordMetadata surface: get/succeeded plus
    callbacks, resolved at delivery time."""

    def __init__(self, producer: "FakeKafkaProducer", rec_id: int):
        self._producer = producer
        self._rec_id = rec_id
        self._meta: RecordMetadata | None = None
        self._callbacks: list = []

    def get(self, timeout=None) -> RecordMetadata:
        if self._meta is None:
            # the real client blocks until the background sender has
            # delivered this record — everything sent BEFORE it on the
            # same producer delivers first (in-order pipeline)
            self._producer._deliver_through(self._rec_id)
        assert self._meta is not None
        return self._meta

    def is_done(self) -> bool:
        return self._meta is not None

    def succeeded(self) -> bool:
        return self._meta is not None

    def add_callback(self, fn) -> "FakeFuture":
        if self._meta is not None:
            fn(self._meta)
        else:
            self._callbacks.append(fn)
        return self

    def _resolve(self, meta: RecordMetadata) -> None:
        self._meta = meta
        for fn in self._callbacks:
            fn(meta)
        self._callbacks.clear()


class FakeBroker:
    """Append-only per-topic log with broker-assigned offsets and a
    log-compaction view."""

    def __init__(self):
        self.logs: dict[str, list[tuple[bytes | None, bytes | None]]] = {}

    def append(self, topic: str, key: bytes | None,
               value: bytes | None) -> RecordMetadata:
        log = self.logs.setdefault(topic, [])
        log.append((key, value))
        return RecordMetadata(topic, 0, len(log) - 1)

    def log(self, topic: str) -> list[tuple[bytes | None, bytes | None]]:
        return list(self.logs.get(topic, []))

    def compacted(self, topic: str) -> dict[bytes | None, bytes]:
        """Each key's LAST record; keys whose last record is a
        tombstone (value None) are deleted — Kafka log compaction."""
        state: dict[bytes | None, bytes | None] = {}
        for key, value in self.logs.get(topic, []):
            state[key] = value
        return {k: v for k, v in state.items() if v is not None}


class FakeKafkaProducer:
    """kafka-python KafkaProducer surface over a FakeBroker."""

    def __init__(self, broker: FakeBroker):
        self._broker = broker
        self._buffer: list[tuple[int, str, bytes | None, bytes | None,
                                 FakeFuture]] = []
        self._next_id = 0
        self._closed = False
        self.flushes = 0

    def send(self, topic: str, value: bytes | None = None,
             key: bytes | None = None) -> FakeFuture:
        if self._closed:
            raise RuntimeError("cannot send on a closed producer")
        for b in (key, value):
            if b is not None and not isinstance(b, (bytes, bytearray)):
                # the real client (no serializers configured) raises
                # on non-bytes payloads — a sink that forgets to
                # encode must fail here, not on the broker
                raise TypeError(
                    f"key/value must be bytes or None, got {type(b).__name__}"
                )
        fut = FakeFuture(self, self._next_id)
        self._buffer.append((self._next_id, topic, key, value, fut))
        self._next_id += 1
        return fut

    def _deliver_through(self, rec_id: int) -> None:
        while self._buffer and self._buffer[0][0] <= rec_id:
            _, topic, key, value, fut = self._buffer.pop(0)
            fut._resolve(self._broker.append(topic, key, value))

    def flush(self, timeout=None) -> None:
        self.flushes += 1
        if self._buffer:
            self._deliver_through(self._buffer[-1][0])

    def close(self, timeout=None) -> None:
        self.flush()
        self._closed = True
