"""SCD2 (type-2) history: turn a change stream into a versioned
history table — every row version with its validity interval — the
temporal-table / audit product a replication pipeline is often built
to feed.

Semantics: per key, each insert/update after-image OPENS a version at
its seq; the next event on the key (a newer version, a delete, or a
PK-move-away) CLOSES it. Version rows carry (valid_from_seq,
valid_to_seq, is_current); deletes and move-aways leave no row of
their own — they only bound the previous version. A PK-changing
update is delete(before-key) + open(after-key), the A3 convention
(reference applier driver/mysql/applier_incr.go UpdateDML).

Redeliveries must be deduped first (A10) — a duplicated open would
fabricate a zero-length version.

Spark shape: one unioned event stream, one per-key window (lead over
seq) — a single shuffle on the key, the same layout every apply-
family operator uses. No state reads: history is derived purely from
the ordered events, so it scales as a window over the batch (plus the
optional snapshot seed). The streaming form (streaming/history.py
Scd2HistoryJob) stores EVENTS per batch and derives versions on read
— closed versions are immutable, so its compaction folds them
append-only; no version row is ever updated in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dtle_spark.model import OP_DELETE, OP_INSERT, OP_UPDATE


def events_of_changes(changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """The version-event stream of a (deduped) change batch: key cols
    + ``seq`` + ``kind`` ('o' opens a version carrying ``row``, 'c'
    closes one) — the persistable half of the history derivation
    (streaming/history.py stores these per batch; closed versions are
    immutable once both events exist, which is what makes the
    fold-on-compaction protocol correct)."""
    # ONE read of the change stream (r16, guide §2.4): each change row
    # emits its 0-2 version events as an array of conditionally-present
    # structs, exploded — the r15 shape unioned three filtered reads
    # (opens / closes / move-aways), re-deriving the batch three times
    # per consumer. Multiset of events is identical: a leg's filter is
    # its WHEN guard, and a PK-moving update matches two guards
    # (open at the after-key + close at the before-key).
    key_changed = F.lit(False)
    for k in key_cols:
        key_changed = key_changed | ~(
            F.col(f"before.{k}").eqNullSafe(F.col(f"after.{k}"))
        )
    row_type = changes.schema["after"].dataType
    null_row = F.lit(None).cast(row_type)

    def ev(cond, img: str, kind: str, row_col) -> F.Column:
        return F.when(cond, F.struct(
            *[F.col(f"{img}.{k}").alias(k) for k in key_cols],
            F.col("seq").alias("seq"),
            F.col("ts").alias("ts"),
            F.lit(kind).alias("kind"),
            row_col.alias("row"),
        ))

    els = F.array(
        ev(
            F.col("op").isin(OP_INSERT, OP_UPDATE) & F.col("after").isNotNull(),
            "after", "o", F.col("after"),
        ),
        ev(
            (F.col("op") == OP_DELETE) & F.col("before").isNotNull(),
            "before", "c", null_row,
        ),
        ev(
            (F.col("op") == OP_UPDATE)
            & F.col("before").isNotNull()
            & F.col("after").isNotNull()
            & key_changed,
            "before", "c", null_row,
        ),
    )
    return (
        changes.select(F.explode(els).alias("__e"))
        .filter(F.col("__e").isNotNull())
        .select(
            *[F.col(f"__e.{k}").alias(k) for k in key_cols],
            F.col("__e.seq").alias("seq"),
            F.col("__e.ts").alias("ts"),
            # coalesce restores the union shape's non-null type only;
            # kept events always carry a kind
            F.coalesce(F.col("__e.kind"), F.lit("o")).alias("kind"),
            F.col("__e.row").alias("row"),
        )
    )


def seed_events(
    base: DataFrame,
    key_cols: list[str],
    base_seq: int = -1,
    base_ts=None,
) -> DataFrame:
    """Snapshot rows as open events at ``base_seq`` (before every
    change) — the initial-load leg of the event stream. ``base_ts``
    is the seed's event time; leave None for an un-timed seed (it
    reads as "open since before all time" in :func:`as_of_ts`)."""
    return base.select(
        *[F.col(k) for k in key_cols],
        F.lit(base_seq).cast("long").alias("seq"),
        F.lit(base_ts).cast("timestamp").alias("ts"),
        F.lit("o").alias("kind"),
        F.struct(*[F.col(c) for c in base.columns]).alias("row"),
    )


def versions_of_events(events: DataFrame, key_cols: list[str]) -> DataFrame:
    """Fold an event stream into version rows: per key, each open's
    valid_to is the next event's seq (lead window — one key shuffle).

    'c' sorts before 'o' at equal seq so a same-seq close cannot
    swallow the version it accompanies; the stream contract keeps seq
    unique per key, the tie-break only pins determinism if violated.

    When the events carry a ``ts`` column (event time), versions also
    get ``valid_from_ts`` / ``valid_to_ts`` — the SAME lead window
    (both leads share one window spec, so Catalyst plans a single
    Window operator; the as-of plan pin stays at exactly one), so the
    ts intervals inherit the seq intervals' disjointness as long as ts
    is non-decreasing in seq per key (true of binlog streams: commit
    time orders the log).
    """
    w = Window.partitionBy(*key_cols).orderBy("seq", "kind")
    versions = events.withColumn("valid_to_seq", F.lead("seq").over(w))
    ts_cols = []
    if "ts" in events.columns:
        versions = versions.withColumn("valid_to_ts", F.lead("ts").over(w))
        ts_cols = [
            F.col("ts").alias("valid_from_ts"),
            F.col("valid_to_ts"),
        ]
    return (
        versions.filter(F.col("kind") == "o")
        .select(
            *key_cols,
            "row",
            F.col("seq").alias("valid_from_seq"),
            "valid_to_seq",
            *ts_cols,
            F.col("valid_to_seq").isNull().alias("is_current"),
        )
    )


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    base: DataFrame | None = None,
    base_seq: int = -1,
    base_ts=None,
) -> DataFrame:
    """Versioned history of a (deduped) change batch, optionally
    seeded by a snapshot whose rows open at ``base_seq`` (and
    ``base_ts`` event time, if the stream is timed).

    Returns key cols + ``row`` (the version's image struct) +
    ``valid_from_seq`` / ``valid_to_seq`` (null = still open) +
    ``valid_from_ts`` / ``valid_to_ts`` (event-time intervals) +
    ``is_current``.
    """
    events = events_of_changes(changes, key_cols)
    if base is not None:
        events = seed_events(base, key_cols, base_seq, base_ts).unionByName(
            events
        )
    return versions_of_events(events, key_cols)


def as_of_seq(history: DataFrame, seq: int) -> DataFrame:
    """Time-travel read: the table state as of (inclusive) ``seq``,
    reconstructed from the history — the version open at that point
    per key, flattened back to row shape.

    A version covers seq s when ``valid_from_seq <= s`` and
    (``valid_to_seq`` is null or ``s < valid_to_seq``) — intervals are
    half-open [from, to), so the event AT s is visible and a delete
    at s removes the row. Map-only over the history (one filter, no
    window): the history's disjoint-interval invariant (at most one
    open version per key at any seq) is what makes the read a filter
    instead of a per-key argmax."""
    cover = (F.col("valid_from_seq") <= F.lit(seq)) & (
        F.col("valid_to_seq").isNull() | (F.lit(seq) < F.col("valid_to_seq"))
    )
    return history.filter(cover).select("row.*")


def as_of_ts(history, ts) -> DataFrame:
    """Event-time time-travel: the table state as of (inclusive)
    timestamp ``ts`` — "what did orders look like on 2026-07-01" —
    the read real temporal users ask for (seq is the replication
    cursor, not a business time).

    Same half-open [from, to) pinning as :func:`as_of_seq`, over the
    ``valid_from_ts`` / ``valid_to_ts`` intervals: the event AT ts is
    visible, a delete at ts removes the row. A NULL ``valid_from_ts``
    (un-timed snapshot seed) reads as "open since before all time".
    Requires a uniformly TIMED change stream — if closes can carry a
    NULL ts the version would read as still open past it; seed the
    history with ``base_ts`` or accept the -infinity convention only
    for the seed. Map-only over the history, like the seq read: the
    disjoint-interval invariant (ts non-decreasing in seq per key)
    makes it a filter, not a per-key argmax."""
    t = F.lit(ts).cast("timestamp")
    cover = (
        F.col("valid_from_ts").isNull() | (F.col("valid_from_ts") <= t)
    ) & (F.col("valid_to_ts").isNull() | (t < F.col("valid_to_ts")))
    return history.filter(cover).select("row.*")


def temporal_join(
    facts: DataFrame,
    history: DataFrame,
    fk_map: dict[str, str],
    ts_col: str,
    select: dict[str, str],
    how: str = "left",
) -> DataFrame:
    """PER-ROW temporal enrichment — the ``FOR SYSTEM_TIME AS OF``
    every fact row asks individually: join each fact to the dim
    VERSION whose event-time validity interval contains the fact's
    own ``ts_col`` (late-arriving facts meet the dim as it was THEN,
    not as it is now). ``fk_map`` maps fact fk columns to the
    history's key columns; ``select`` maps history expressions
    (``row.c_acctbal``, ``valid_from_seq``) to output names.

    Semantics: half-open [from, to) pinning, exactly :func:`as_of_ts`
    applied at each fact's own timestamp — the invariant test states
    it that way. A NULL ``valid_from_ts`` (un-timed snapshot seed)
    reads as open-since-forever; a NULL fact fk or NULL fact ts
    matches nothing (unknown key/time enriches as NULL under 'left',
    drops under 'inner'). The history's disjoint-interval invariant
    guarantees AT MOST ONE version matches per fact row, so the join
    never fans out.

    Plan shape: Catalyst extracts the key equalities as the hash-join
    keys and keeps the interval containment as the join residual —
    one shuffle of facts on the fk (or a broadcast when the history
    is dim-sized), never a time-range cross product. At 100 TB the
    history side is version-grain (|dim| x churn), facts shuffle
    once; pair with a fact-side fk clustering for the same row-group
    pruning the join-view maintainer uses."""
    clash = set(select.values()) & set(facts.columns)
    if clash:
        raise ValueError(f"select names collide with fact columns: {sorted(clash)}")
    hks = list(fk_map.values())
    h = history.select(
        *[F.col(hk).alias(f"__hk_{i}") for i, hk in enumerate(hks)],
        F.col("valid_from_ts").alias("__vf"),
        F.col("valid_to_ts").alias("__vt"),
        *[F.expr(src).alias(dst) for src, dst in select.items()],
    )
    t = F.col(ts_col)
    cond = (F.col("__vf").isNull() | (F.col("__vf") <= t)) & (
        F.col("__vt").isNull() | (t < F.col("__vt"))
    )
    for i, fc in enumerate(fk_map):
        cond = cond & (F.col(fc) == F.col(f"__hk_{i}"))
    return facts.join(h, cond, how).drop(
        "__vf", "__vt", *[f"__hk_{i}" for i in range(len(hks))]
    )
