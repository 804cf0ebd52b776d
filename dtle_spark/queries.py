"""Query registry: every implemented operator exposed as a
(spark_fn, duckdb_oracle_sql) pair.

This is the engine's correctness gate surface: the driver (and
tests/test_oracle_parity.py) runs each Spark query and its oracle SQL on
the same parquet fixtures and hash-compares values.

Cross-engine determinism rules used throughout (documented once here):

- **No raw double aggregation.** A double SUM's value depends on
  accumulation order, which differs between engines (and between Spark
  runs!). Nor double->decimal casts: Spark rounds the shortest-repr
  string (BigDecimal.valueOf) while DuckDB rounds the exact binary
  value — they disagree per-row (observed empirically at scales 10 and
  4). Instead: the fixture money columns are exactly 2-decimal, so
  convert to integer cents (``round(x*100)`` — deterministic, inputs are
  ~1e-10 from integers, never near a .5 boundary), do all arithmetic and
  SUMs in longs (exact, order-free), and divide once at the end.
- **Averages / rescales** = CAST(exact_sum AS DOUBLE) / constant /
  COUNT — identical IEEE divisions of identical operands, same order.
- **Ties**: every ORDER BY ... LIMIT has a unique-key tiebreaker.
- **md5** (identical hex output in both engines) backs all hashing —
  never Spark-internal hash/xxhash64.
- **Regex**: patterns restricted to the syntax subset where Java regex
  (Spark) and RE2 (DuckDB) agree; DuckDB regexp_replace needs the 'g'
  flag to match Spark's replace-all default.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtle_spark.functions import textstats as tx
from dtle_spark.tableio import load_table
from dtle_spark.operators.apply import apply_changes
from dtle_spark.operators.filters import apply_where_to_changes, snapshot_filter
from dtle_spark.operators.projection import column_map
from dtle_spark.plans import cdc_demo
from dtle_spark.sources.snapshot import snapshot_chunk

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryPair:
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None -> rows-only check


REGISTRY: dict[str, QueryPair] = {}


def query(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QueryPair(fn, oracle)
        return fn

    return deco


def _cents(col) -> F.Column:
    """Exact integer representation of a 2-decimal money/percent column."""
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Core relational queries (the analytics surface the reference lacks,
# SURVEY §2.6 — groupBy/join/window come from Catalyst)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
        CAST(round(l_quantity) AS BIGINT) AS qty,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS ep,
        CAST(round(l_discount * 100) AS BIGINT) AS db,
        CAST(round(l_tax * 100) AS BIGINT) AS tb
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(qty) AS DOUBLE) AS sum_qty,
      CAST(SUM(ep) AS DOUBLE) / 100.0 AS sum_base_price,
      CAST(SUM(ep * (100 - db)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(SUM(ep * (100 - db) * (100 + tb)) AS DOUBLE) / 1000000.0 AS sum_charge,
      CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(ep) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
      CAST(SUM(db) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Scan-heavy group-by: at 100 TB this is a pure
    map-side-partial + 6-group final agg — no risk; the win is column
    pruning (only 7 of 11 columns read) and pushdown of the date filter."""
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    qty, ep = F.col("qty"), F.col("ep")
    disc = ep * (100 - F.col("db"))
    charge = disc * (100 + F.col("tb"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_quantity")).cast("long").alias("qty"),
            _cents(F.col("l_extendedprice")).alias("ep"),
            _cents(F.col("l_discount")).alias("db"),
            _cents(F.col("l_tax")).alias("tb"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            (F.sum(ep).cast("double") / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(disc).cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(ep).cast("double") / F.lit(100.0) / cnt).alias("avg_price"),
            (F.sum(F.col("db")).cast("double") / F.lit(100.0) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
      o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer is ~1/6000 of lineitem -> explicit
    broadcast; orders⋈lineitem shuffles on the join key. At 100 TB both
    dims of this star stay broadcast-able (customer sf-scaled ~15 GB
    would not — AQE would pick SMJ; the hint is advisory, not load-bearing)."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))))
                .cast("double")
                / F.lit(10000.0)
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "topk_per_group",
    """
    SELECT event_type, event_id, value, rk FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
      FROM events
    ) WHERE rk <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window. At scale: the window shuffles
    once on event_type; skewed group sizes are handled by AQE. For huge
    K-extraction prefer groupBy + min_by/top-k agg to avoid full sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("event_type", "event_id", "value", "rk")
    )


@query(
    "sessionize",
    """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
    g AS (
      SELECT *, CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
                          > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM e),
    s AS (
      SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(tsu) AS t_start, MAX(tsu) AS t_end
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + running sum windows.
    Streaming twin: session_window(ts, '30 minutes') in
    streaming/pipeline.py. Exact integer (epoch-micros) arithmetic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tsu")
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    brk = F.when(F.col("tsu") - F.lag("tsu").over(w) > 1_800_000_000, 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("tsu", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("brk", brk)
        .withColumn("session_id", F.sum("brk").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("tsu").alias("t_start"),
            F.max("tsu").alias("t_end"),
        )
    )


@query(
    "event_rollup_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def event_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup, batch form of the streaming windowed agg
    (streaming/pipeline.py uses window(ts, '1 hour') + watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# dtle parity surface: snapshot scan, filters, projections, CDC apply
# ---------------------------------------------------------------------------


@query(
    "where_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
           sqrt(l_quantity) AS q_sqrt,
           replace(lower(l_returnflag), 'a', 'z') AS flag_repl
    FROM lineitem
    WHERE l_quantity > 30 AND pow(l_discount, 2) < 0.0025
      AND length(l_returnflag) = 1 AND lower(l_linestatus) = 'o'
    """,
)
def where_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: the per-row Where expression (reference qlbridge VM,
    tabletypes.go:151-235) as one Catalyst expr — the function registry
    (pow/sqrt/replace/char_length/lower..., tabletypes.go:15-27) maps
    to Spark built-ins. Pushed into the parquet scan on the snapshot path."""
    li = load_table(spark, sf_dir, "lineitem")
    out = snapshot_filter(
        li,
        "l_quantity > 30 AND pow(l_discount, 2) < 0.0025 "
        "AND char_length(l_returnflag) = 1 AND lower(l_linestatus) = 'o'",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        F.sqrt("l_quantity").alias("q_sqrt"),
        F.replace(F.lower("l_returnflag"), F.lit("a"), F.lit("z")).alias("flag_repl"),
    )


@query(
    "column_map",
    "SELECT c_custkey AS id, c_mktsegment AS segment, c_name AS name FROM customer",
)
def column_map_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F9 ColumnMap: projection + reorder + rename
    (dumper.go:227-236, binlog_reader.go:1985-1998). Catalyst prunes the
    dropped columns out of the scan."""
    cu = load_table(spark, sf_dir, "customer")
    return column_map(cu, ["c_custkey", "c_mktsegment", "c_name"], ["id", "segment", "name"])


@query(
    "charset_decode_utf8",
    """
    SELECT n_nationkey,
           n_name || ' 中文数据流' AS gbk_text,
           n_name || ' déjà vu ñÖß' AS latin1_text
    FROM nation
    """,
)
def charset_decode_utf8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 charset -> UTF-8 (operators/projection.charset_to_utf8;
    reference mysqlconfig/types.go:87-113 converts legacy-charset
    column bytes at row-decode time). The stream carries gbk/latin1
    BYTES (synthesized deterministically by encoding known UTF-8 text,
    the only way to manufacture legacy bytes without a live MySQL);
    the operator decodes them back via JVM charsets. The oracle knows
    only the ORIGINAL text — so the value-hash match proves the decode
    is the exact inverse of each charset's encoding, not an identity
    pass-through (gbk moves every CJK char to a different byte
    sequence; latin1 moves every accented char)."""
    from dtle_spark.operators.projection import charset_to_utf8

    n = load_table(spark, sf_dir, "nation")
    # the legacy-charset whitelist is captured when the encode/decode
    # EXPRESSION is constructed, not at execution — set it before
    # building the gbk encode below (charset_to_utf8 re-sets it for
    # its own decode columns)
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    raw = n.select(
        "n_nationkey",
        F.encode(
            F.concat(F.col("n_name"), F.lit(" 中文数据流")), "gbk"
        ).alias("gbk_text"),
        F.encode(
            F.concat(F.col("n_name"), F.lit(" déjà vu ñÖß")), "latin1"
        ).alias("latin1_text"),
    )
    return charset_to_utf8(raw, {"gbk_text": "gbk", "latin1_text": "latin1"})


@query(
    "tz_normalize_events",
    """
    SELECT event_id, user_id, event_type,
           epoch_us(timezone('Asia/Kolkata', ts)) AS utc_micros
    FROM events
    WHERE event_id % 7 = 0
    """,
)
def tz_normalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 timezone conversion (operators/projection.to_utc; reference
    sql/builder.go:189-194 wraps applied values in
    ``convert_tz(?, tz, '+00:00')``): event timestamps recorded as
    source-local wall time normalize to UTC instants before apply.
    Asia/Kolkata deliberately: a real IANA zone (exercises the tz
    database lookup, not arithmetic) with NO daylight rule, so both
    engines agree on every instant — a DST zone's ambiguous/skipped
    local hours are engine-defined and would gate tzdb edge policy,
    not the operator. Output is BIGINT micros (the driver-portable
    instant representation; timestamps re-enter display zones at the
    edge)."""
    from dtle_spark.operators.projection import to_utc

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 7 == 0
    )
    out = to_utc(ev, ["ts"], "Asia/Kolkata")
    return out.select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("utc_micros"),
    )


@query(
    "snapshot_chunk",
    """
    SELECT * FROM orders
    WHERE ((o_custkey > 50) OR (o_custkey = 50 AND o_orderkey > 300))
      AND o_totalprice > 50000
    ORDER BY o_custkey, o_orderkey
    LIMIT 2000
    """,
)
def snapshot_chunk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 keyset-paginated snapshot chunk over a composite unique key
    (o_custkey, o_orderkey), with the user Where pushed into the scan
    (dumper.go:106-156). ChunkSize=2000 is the reference default
    (taskconfig.go:13). The chunk key must be a total order for
    deterministic LIMIT boundaries — same requirement the reference's
    GetCandidateUniqueKeys enforces (base/utils.go:609-712)."""
    o = load_table(spark, sf_dir, "orders")
    return snapshot_chunk(o, ["o_custkey", "o_orderkey"], [50, 300], 2000, "o_totalprice > 50000")


@query("cdc_apply_orders", cdc_demo.ORDERS_CDC_ORACLE)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3/A7/A10 end-to-end: scripted change stream (inserts incl.
    re-delivered duplicates, updates, PK-moving updates, deletes) applied
    onto the snapshot via redelivery-dedupe -> per-key latest image ->
    merge. The heart of the engine; see operators/apply.py."""
    base = cdc_demo.orders_base(spark, sf_dir)
    changes = cdc_demo.orders_changes(spark, sf_dir)
    return apply_changes(base, changes, ["o_orderkey"])


@query(
    "cdc_join_view_orders",
    f"""
    SELECT a.o_orderkey, a.o_custkey, a.o_orderstatus, a.o_totalprice,
           a.o_orderdate, a.o_orderpriority,
           d.c_name AS cust_name, d.c_nationkey AS cust_nation,
           d.c_acctbal AS cust_acctbal
    FROM ({cdc_demo.ORDERS_CDC_ORACLE}) a
    LEFT JOIN (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 9 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 13 <> 0
    ) d ON a.o_custkey = d.c_custkey
    """,
)
def cdc_join_view_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view (operators/
    join_view.py — Blakeley-style delta-join IVM): the denormalized
    orders ⟕ customer read table is folded forward by BOTH sides'
    batches — the scripted orders change stream through the shared
    apply core (A10 dedupe, per-key winners, PK moves), and a dim
    mutation batch (every 9th customer's balance +100, every 13th
    deleted — its rows go NULL, left-join semantics) as an
    already-applied state plus its touched-key set. The oracle is the
    FULL RECOMPUTE: applied orders LEFT JOIN mutated customers — the
    IVM invariant, gated value-exact.
    At 100 TB nothing data-sized shuffles: the view is carved by
    broadcast anti/semi joins on the two bounded Δ-key sets and the
    dim is pruned to visible keys before it broadcasts into the
    rebuild join (pytest pins zero SortMergeJoin in the maintenance
    plan) — the untouched mass of the view never moves."""
    from dtle_spark.operators.join_view import join_view_of, maintain_join_view

    rmap = {"c_name": "cust_name", "c_nationkey": "cust_nation",
            "c_acctbal": "cust_acctbal"}
    base = cdc_demo.orders_base(spark, sf_dir)
    changes = cdc_demo.orders_changes(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    dim_new = c.filter(k % 13 != 0).withColumn(
        "c_acctbal",
        F.when(k % 9 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal")),
    )
    touched = c.filter((k % 9 == 0) | (k % 13 == 0)).select("c_custkey")
    view0 = join_view_of(base, c, "o_custkey", "c_custkey", rmap)
    return maintain_join_view(
        view0, changes, ["o_orderkey"], "o_custkey",
        dim_new, "c_custkey", rmap, touched,
    )


@query(
    "cdc_star_view_lineitem",
    f"""
    SELECT a.*, p.p_name AS part_name, p.p_brand AS part_brand,
           s.s_name AS supp_name, s.s_nationkey AS supp_nation
    FROM ({cdc_demo.LINEITEM_CDC_ORACLE}) a
    LEFT JOIN (
      SELECT p_partkey,
             CASE WHEN p_partkey % 9 = 0 THEN p_name || '*' ELSE p_name END
               AS p_name,
             p_brand
      FROM part WHERE p_partkey % 13 <> 0
    ) p ON a.l_partkey = p.p_partkey
    LEFT JOIN (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 4 = 0 THEN s_name || '*' ELSE s_name END
               AS s_name,
             s_nationkey
      FROM supplier WHERE s_suppkey % 6 <> 0
    ) s ON a.l_suppkey = s.s_suppkey
    """,
)
def cdc_star_view_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-schema view maintenance (operators/join_view.py
    maintain_star_view): the denormalized lineitem ⟕ part ⟕ supplier
    read table folded forward by a composite-PK fact change stream
    (inserts/updates/deletes on (l_orderkey, l_lineuid) — the fixture
    re-keys lineitem with an engine-independent full-order row_number
    because its (l_orderkey, l_linenumber) is NOT unique — through the
    shared apply core) and BOTH dims moving in the same step (part:
    every 9th renamed, every 13th deleted; supplier: every 4th
    renamed, every 6th deleted) — a fact row referencing two moved
    dims gets both rewrites sequentially. Oracle = the full recompute
    (applied lineitem LEFT JOIN both mutated dims), the IVM invariant
    value-exact.
    At 100 TB this is the fact-table shape (lineitem is the big one):
    per-dim broadcast carves over the bounded touched-key sets, dims
    pruned to visible keys before the broadcast rebuild joins — the
    view mass never shuffles, same plan discipline as the single-dim
    lane (zero SortMergeJoin, pytest-pinned there)."""
    from dtle_spark.operators.join_view import (
        DimSpec, maintain_star_view, star_view_of,
    )

    # one rekey sort shared by the base and the change stream (the
    # rekey is a full-order row_number over lineitem — the single most
    # expensive piece of this query's fixture derivation)
    rekeyed = cdc_demo.rekeyed_lineitem_pinned(spark, sf_dir)
    base = cdc_demo.lineitem_base(spark, sf_dir, rekeyed=rekeyed)
    changes = cdc_demo.lineitem_changes(spark, sf_dir, rekeyed=rekeyed)
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    pk, sk_ = F.col("p_partkey"), F.col("s_suppkey")
    p_new = p.filter(pk % 13 != 0).withColumn(
        "p_name",
        F.when(pk % 9 == 0, F.concat(F.col("p_name"), F.lit("*")))
        .otherwise(F.col("p_name")),
    )
    s_new = s.filter(sk_ % 6 != 0).withColumn(
        "s_name",
        F.when(sk_ % 4 == 0, F.concat(F.col("s_name"), F.lit("*")))
        .otherwise(F.col("s_name")),
    )
    p_touched = p.filter((pk % 9 == 0) | (pk % 13 == 0)).select("p_partkey")
    s_touched = s.filter((sk_ % 4 == 0) | (sk_ % 6 == 0)).select("s_suppkey")
    specs = [
        DimSpec("l_partkey", "p_partkey",
                {"p_name": "part_name", "p_brand": "part_brand"}),
        DimSpec("l_suppkey", "s_suppkey",
                {"s_name": "supp_name", "s_nationkey": "supp_nation"}),
    ]
    view0 = star_view_of(base, [(p, specs[0]), (s, specs[1])])
    return maintain_star_view(
        view0, changes, ["l_orderkey", "l_lineuid"],
        [(p_new, specs[0], p_touched), (s_new, specs[1], s_touched)],
    )


@query(
    "cdc_rollup_orders",
    f"""
    SELECT o_orderpriority,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
           COUNT(*) AS n_orders
    FROM ({cdc_demo.ORDERS_CDC_ORACLE}) GROUP BY o_orderpriority
    """,
)
def cdc_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance (operators/
    rollup.py): the per-priority revenue rollup of the orders snapshot
    is folded forward by the scripted change batch's per-group DELTAS
    — old images read with one keyed join (rollup_delta_vs_target,
    correct for this stream's self-conflicting interior images), new
    images from the apply operator's own per-key winners. The oracle
    is the FULL RECOMPUTE over the applied table, so the gate is
    exactly the incremental-view-maintenance invariant: delta-folded
    state == groupBy of the final table. At 100 TB the delta is
    group-grain and the join rides the apply merge's own key
    partitioning — the rollup never rescans the table."""
    from dtle_spark.operators.apply import dedupe_redelivered
    from dtle_spark.operators.rollup import (
        merge_rollup, rollup_delta_vs_target, rollup_of,
    )

    base = cdc_demo.orders_base(spark, sf_dir)
    changes = dedupe_redelivered(cdc_demo.orders_changes(spark, sf_dir))
    groups = {"o_orderpriority": "o_orderpriority"}
    measures = {"rev_cents": "CAST(round(o_totalprice * 100) AS BIGINT)"}
    state = rollup_of(base, groups, measures)
    delta = rollup_delta_vs_target(
        base, changes, ["o_orderkey"], groups, measures
    )
    view = merge_rollup(state, delta, ["o_orderpriority"], ["rev_cents"])
    return view.select(
        "o_orderpriority", "rev_cents", F.col("__n").alias("n_orders")
    )


@query(
    "cdc_minmax_orders",
    f"""
    SELECT o_orderpriority,
           CAST(MIN(round(o_totalprice * 100)) AS BIGINT) AS min_cents,
           CAST(MAX(round(o_totalprice * 100)) AS BIGINT) AS max_cents
    FROM ({cdc_demo.ORDERS_CDC_ORACLE}) GROUP BY o_orderpriority
    """,
)
def cdc_minmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-additive rollup maintenance (operators/rollup.py
    maintain_minmax_rollup): the per-priority MIN/MAX order value is
    kept current under the scripted change stream by DIRTY-GROUP
    RECOMPUTE — MIN/MAX can't ride signed deltas (a delete of the
    extremum needs the runner-up), so exactly the groups the batch
    touched (dirty_groups: old images via one keyed join + new upsert
    images) recompute from the applied table while untouched state
    rows pass through an anti-join. The oracle is the full recompute
    over the final table, so the gate is the IVM invariant for the
    non-additive half of the agg vocabulary: a missed dirty group
    would surface as a stale extremum."""
    from dtle_spark.operators.apply import (
        apply_changes, dedupe_redelivered, latest_image_per_key,
    )
    from dtle_spark.operators.rollup import (
        dirty_groups, maintain_minmax_rollup, minmax_rollup_of,
    )

    base = cdc_demo.orders_base(spark, sf_dir)
    changes = dedupe_redelivered(cdc_demo.orders_changes(spark, sf_dir))
    groups = {"o_orderpriority": "o_orderpriority"}
    aggs = {
        "min_cents": ("min", "CAST(round(o_totalprice * 100) AS BIGINT)"),
        "max_cents": ("max", "CAST(round(o_totalprice * 100) AS BIGINT)"),
    }
    state = minmax_rollup_of(base, groups, aggs)
    # ONE net-effect window shared by the dirty-scope and the apply
    # (r16; each previously derived its own — two effect windows per
    # invocation for the same batch)
    net = latest_image_per_key(changes, ["o_orderkey"])
    dirty = dirty_groups(base, changes, ["o_orderkey"], groups, net=net)
    applied = apply_changes(base, changes, ["o_orderkey"], net=net)
    return maintain_minmax_rollup(state, applied, dirty, groups, aggs)


@query(
    "snapshot_diff_orders",
    f"""
    WITH b0 AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
    final AS ({cdc_demo.ORDERS_CDC_ORACLE}),
    j AS (
      SELECT b.o_orderkey AS bk, f.o_orderkey AS fk,
             b.o_totalprice AS bp, f.o_totalprice AS fp,
             CASE WHEN b.o_orderkey IS NULL THEN 'i'
                  WHEN f.o_orderkey IS NULL THEN 'd'
                  WHEN (b.o_custkey IS DISTINCT FROM f.o_custkey)
                    OR (b.o_orderstatus IS DISTINCT FROM f.o_orderstatus)
                    OR (b.o_totalprice IS DISTINCT FROM f.o_totalprice)
                    OR (b.o_orderdate IS DISTINCT FROM f.o_orderdate)
                    OR (b.o_orderpriority IS DISTINCT FROM f.o_orderpriority)
                  THEN 'u' END AS op
      FROM b0 b FULL OUTER JOIN final f ON b.o_orderkey = f.o_orderkey
    )
    SELECT COALESCE(fk, bk) AS o_orderkey, op,
           CASE WHEN op <> 'i' THEN CAST(round(bp * 100) AS BIGINT) END AS before_price_cents,
           CASE WHEN op <> 'd' THEN CAST(round(fp * 100) AS BIGINT) END AS after_price_cents
    FROM j WHERE op IS NOT NULL
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/diff.py): the minimal change set
    between the orders snapshot and its post-CDC state — the apply
    round-trip closed: diff(base, apply(base, changes)) recovers
    exactly the NET effect (inserts, content updates, deletes, and a
    PK move surfacing as its delete + insert pair). One full-outer
    join co-partitioned on the PK with a single struct eqNullSafe row
    comparison; the oracle restates it as FULL OUTER JOIN + IS
    DISTINCT FROM classification over the applied table."""
    from dtle_spark.operators.apply import apply_changes
    from dtle_spark.operators.diff import snapshot_diff

    base = cdc_demo.orders_base(spark, sf_dir)
    changes = cdc_demo.orders_changes(spark, sf_dir)
    final = apply_changes(base, changes, ["o_orderkey"])
    d = snapshot_diff(base, final, ["o_orderkey"])
    return d.select(
        "o_orderkey",
        "op",
        F.when(F.col("op") != "i", _cents(F.col("before.o_totalprice"))).alias(
            "before_price_cents"
        ),
        F.when(F.col("op") != "d", _cents(F.col("after.o_totalprice"))).alias(
            "after_price_cents"
        ),
    )


@query(
    "snapshot_diff_triaged_orders",
    f"""
    WITH b0 AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
    final AS ({cdc_demo.ORDERS_CDC_ORACLE}),
    j AS (
      SELECT b.o_orderkey AS bk, f.o_orderkey AS fk,
             b.o_totalprice AS bp, f.o_totalprice AS fp,
             CASE WHEN b.o_orderkey IS NULL THEN 'i'
                  WHEN f.o_orderkey IS NULL THEN 'd'
                  WHEN (b.o_custkey IS DISTINCT FROM f.o_custkey)
                    OR (b.o_orderstatus IS DISTINCT FROM f.o_orderstatus)
                    OR (b.o_totalprice IS DISTINCT FROM f.o_totalprice)
                    OR (b.o_orderdate IS DISTINCT FROM f.o_orderdate)
                    OR (b.o_orderpriority IS DISTINCT FROM f.o_orderpriority)
                  THEN 'u' END AS op
      FROM b0 b FULL OUTER JOIN final f ON b.o_orderkey = f.o_orderkey
    )
    SELECT COALESCE(fk, bk) AS o_orderkey, op,
           CASE WHEN op <> 'i' THEN CAST(round(bp * 100) AS BIGINT) END AS before_price_cents,
           CASE WHEN op <> 'd' THEN CAST(round(fp * 100) AS BIGINT) END AS after_price_cents
    FROM j WHERE op IS NOT NULL
    """,
)
def snapshot_diff_triaged_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunked-compare triage end-to-end (operators/diff.py
    snapshot_diff_triaged): per-key-range digests on both sides
    (map-side partial-aggregated sums of truncated xxhash64 — the
    pt-table-checksum strategy, vs reference extractor.go:859-879
    which only counts rows), exact re-diff of ONLY the disagreeing
    ranges. The oracle is the FULL diff, so the gate is the
    advertised 100 TB equivalence: triage + re-diff ≡ full diff —
    ranges proven equal by digest contribute nothing, every differing
    key lives in a flagged range. The xxhash64 digests never cross
    engines (DuckDB re-derives the diff relationally); the FINAL rows
    are what's compared. range_width=1024 makes the sf0.01 scenario
    genuinely multi-range (~70 ranges, most pruned)."""
    from dtle_spark.operators.apply import apply_changes
    from dtle_spark.operators.diff import snapshot_diff_triaged

    base = cdc_demo.orders_base(spark, sf_dir)
    changes = cdc_demo.orders_changes(spark, sf_dir)
    # pin the applied state: the triage reads each side TWICE (range
    # digests, then the exact re-diff of flagged ranges) — in
    # production both sides are materialized replica tables, so the
    # fixture should price two scans of a table, not two executions
    # of the apply pipeline
    final = apply_changes(base, changes, ["o_orderkey"]).localCheckpoint(
        eager=False
    )
    d = snapshot_diff_triaged(
        base, final, ["o_orderkey"], range_width=1024
    )
    return d.select(
        "o_orderkey",
        "op",
        F.when(F.col("op") != "i", _cents(F.col("before.o_totalprice"))).alias(
            "before_price_cents"
        ),
        F.when(F.col("op") != "d", _cents(F.col("after.o_totalprice"))).alias(
            "after_price_cents"
        ),
    )


@query(
    "scd2_orders_history",
    """
    WITH ev AS (
      SELECT o_orderkey AS k, CAST(-1 AS BIGINT) AS seq, 'o' AS kind, o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+1, 'o', o_totalprice
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+2, 'o', o_totalprice * 2
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderkey*10+4, 'o', o_totalprice
      FROM orders WHERE o_orderkey % 17 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+3, 'c', NULL
      FROM orders WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+4, 'c', NULL
      FROM orders WHERE o_orderkey % 17 = 0
    ),
    v AS (
      SELECT k, seq, kind, o_totalprice,
             lead(seq) OVER (PARTITION BY k ORDER BY seq, kind) AS valid_to_seq
      FROM ev
    )
    SELECT k AS o_orderkey, seq AS valid_from_seq, valid_to_seq,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           (valid_to_seq IS NULL) AS is_current
    FROM v WHERE kind = 'o'
    """,
)
def scd2_orders_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 temporal history (operators/scd2.py): the scripted orders
    stream rendered as versioned rows with validity intervals —
    snapshot seed at seq -1, every insert/update opening a version,
    deletes and PK-move-aways bounding the previous one (A3: update =
    delete(before)+open(after)). One per-key lead() window over the
    unioned event stream — a single key shuffle, no state reads; the
    oracle restates the event union + lead in SQL."""
    from dtle_spark.operators.apply import dedupe_redelivered
    from dtle_spark.operators.scd2 import scd2_history

    base = cdc_demo.orders_base(spark, sf_dir)
    changes = dedupe_redelivered(cdc_demo.orders_changes(spark, sf_dir))
    h = scd2_history(changes, ["o_orderkey"], base=base)
    return h.select(
        "o_orderkey",
        "valid_from_seq",
        "valid_to_seq",
        _cents(F.col("row.o_totalprice")).alias("price_cents"),
        "is_current",
    )


@query(
    "dq_orders_report",
    """
    WITH r AS (
      SELECT
        CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
              OR o_orderstatus NOT IN ('O','F','P')) AS BIGINT) AS v_accept,
        CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL
              OR NOT (length(o_orderpriority) >= 3)) AS BIGINT) AS v_expr,
        CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS v_notnull,
        CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
              OR o_totalprice < 0 OR o_totalprice > 400000) AS BIGINT) AS v_range,
        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
        COUNT(*) AS n
      FROM orders
    ),
    ref AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
             (SELECT COUNT(*) FROM orders) AS n
      FROM orders o WHERE o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM (
      SELECT 'accepted_values:o_orderstatus' AS check_name,
             v_accept AS violations, n AS n_rows FROM r
      UNION ALL SELECT 'expression:priority_format', v_expr, n FROM r
      UNION ALL SELECT 'not_null:o_custkey', v_notnull, n FROM r
      UNION ALL SELECT 'range:o_totalprice', v_range, n FROM r
      UNION ALL SELECT 'referential:o_custkey->c_custkey', v, n FROM ref
      UNION ALL SELECT 'unique:o_orderkey', v_unique, n FROM r
    ) ORDER BY check_name
    """,
)
def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (functions/dq.py): five row-level
    checks compiled into ONE aggregation pass over orders (conditional
    counts — N checks, one scan) plus the referential anti-join
    against customer, all as integral violation counts. The range
    check is calibrated to actually fire (orders above $400k exist),
    so the gate covers nonzero violations, not just all-green."""
    from dtle_spark.functions.dq import dq_referential, dq_report

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    checks = [
        {"check": "not_null", "col": "o_custkey"},
        {"check": "unique", "cols": ["o_orderkey"]},
        {"check": "accepted_values", "col": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"check": "range", "col": "o_totalprice", "lo": 0, "hi": 400000},
        {"check": "expression", "name": "priority_format",
         "sql": "length(o_orderpriority) >= 3"},
    ]
    rep = dq_report(o, checks)
    ref = dq_referential(o, c, "o_custkey", "c_custkey")
    return rep.unionByName(ref).orderBy("check_name")


_AS_OF_SEQ = 600_000


@query(
    "orders_as_of_seq",
    f"""
    WITH ev AS (
      SELECT o_orderkey AS k, CAST(-1 AS BIGINT) AS seq, 'o' AS kind, o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+1, 'o', o_totalprice
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+2, 'o', o_totalprice * 2
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderkey*10+4, 'o', o_totalprice
      FROM orders WHERE o_orderkey % 17 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+3, 'c', NULL
      FROM orders WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+4, 'c', NULL
      FROM orders WHERE o_orderkey % 17 = 0
    ),
    last AS (
      SELECT * FROM (
        SELECT k, seq, kind, o_totalprice,
               row_number() OVER (PARTITION BY k ORDER BY seq DESC, kind DESC) AS rn
        FROM ev WHERE seq <= {_AS_OF_SEQ}
      ) WHERE rn = 1
    )
    SELECT k AS o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM last WHERE kind = 'o'
    """,
)
def orders_as_of_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read (operators/scd2.py as_of_seq): the orders
    state at a mid-stream seq, reconstructed from the SCD2 history by
    one interval filter — no window, no replay; the history's
    disjoint-interval invariant makes the temporal read map-only. The
    oracle reconstructs the same point independently (last event per
    key at-or-before the cutoff), so the gate pins history derivation
    AND the half-open [from, to) read semantics together."""
    from dtle_spark.operators.apply import dedupe_redelivered
    from dtle_spark.operators.scd2 import as_of_seq, scd2_history

    base = cdc_demo.orders_base(spark, sf_dir)
    changes = dedupe_redelivered(cdc_demo.orders_changes(spark, sf_dir))
    h = scd2_history(changes, ["o_orderkey"], base=base)
    return as_of_seq(h, _AS_OF_SEQ).select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents")
    )


@query(
    "orders_as_of_ts",
    f"""
    WITH ev AS (
      SELECT o_orderkey AS k, CAST(-1 AS BIGINT) AS seq, 'o' AS kind, o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+1, 'o', o_totalprice
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+2, 'o', o_totalprice * 2
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderkey*10+4, 'o', o_totalprice
      FROM orders WHERE o_orderkey % 17 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+3, 'c', NULL
      FROM orders WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey, o_orderkey*10+4, 'c', NULL
      FROM orders WHERE o_orderkey % 17 = 0
    ),
    last AS (
      SELECT * FROM (
        SELECT k, seq, kind, o_totalprice,
               row_number() OVER (PARTITION BY k ORDER BY seq DESC, kind DESC) AS rn
        FROM ev WHERE seq <= {_AS_OF_SEQ}
      ) WHERE rn = 1
    )
    SELECT k AS o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM last WHERE kind = 'o'
    """,
)
def orders_as_of_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME time travel (operators/scd2.py as_of_ts): "the
    orders table as of epoch+{_AS_OF_SEQ}s", read from the SCD2
    history's valid_from_ts/valid_to_ts intervals with the same
    half-open pinning as the seq read. The demo stream's event time
    is ts = epoch + seq seconds (cdc_demo.orders_changes_ts — strictly
    monotone in seq), so the DuckDB oracle reconstructs the identical
    point via the seq cutoff WITHOUT comparing raw timestamps across
    engines: a gate on the ts threading (events -> lead window ->
    intervals) and the boundary semantics, not on timestamp rendering.
    The un-timed snapshot seed reads as open-since-before-all-time
    (NULL valid_from_ts convention)."""
    from dtle_spark.operators.apply import dedupe_redelivered
    from dtle_spark.operators.scd2 import as_of_ts, scd2_history

    base = cdc_demo.orders_base(spark, sf_dir)
    changes = dedupe_redelivered(cdc_demo.orders_changes_ts(spark, sf_dir))
    h = scd2_history(changes, ["o_orderkey"], base=base)
    from datetime import datetime, timezone

    cutoff = datetime.fromtimestamp(_AS_OF_SEQ, tz=timezone.utc)
    return as_of_ts(h, cutoff).select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents")
    )


@query(
    "orders_with_customer_version",
    """
    WITH ev AS (
      SELECT c_custkey AS k, CAST(-1 AS BIGINT) AS seq, 'o' AS kind, c_acctbal
      FROM customer
      UNION ALL
      SELECT c_custkey, c_custkey*10+1, 'o', c_acctbal + 4000.0 FROM customer
      UNION ALL
      SELECT c_custkey, c_custkey*10+2, 'o', c_acctbal - 2000.0
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, c_custkey*10+3, 'c', NULL
      FROM customer WHERE c_custkey % 4 = 0
    ),
    v AS (
      SELECT k, seq, kind, c_acctbal,
             lead(seq) OVER (PARTITION BY k ORDER BY seq, kind) AS vto
      FROM ev
    ),
    ver AS (SELECT * FROM v WHERE kind = 'o'),
    f AS (
      SELECT o_orderkey, o_custkey,
             o_custkey*10 + (o_orderkey % 4) AS fact_s
      FROM orders
    )
    SELECT f.o_orderkey, f.o_custkey, f.fact_s,
           CAST(round(ver.c_acctbal * 100) AS BIGINT) AS cust_acctbal_cents,
           ver.seq AS ver_from_seq
    FROM f LEFT JOIN ver
      ON ver.k = f.o_custkey AND ver.seq <= f.fact_s
     AND (ver.vto IS NULL OR f.fact_s < ver.vto)
    """,
)
def orders_with_customer_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-ROW temporal join (operators/scd2.py temporal_join): every
    order enriched with the customer VERSION valid at the order's OWN
    event time — late facts meet the dim as it was then. The customer
    SCD2 history comes from a timed scripted stream (seed at -infinity,
    +4000 update at 10k+1, %3 re-insert at 10k+2, %4 delete at 10k+3);
    order event times land at per-customer offsets 0..3, so the fixture
    exercises the seed window, the inclusive-from boundary (offset
    exactly at the update's ts), the re-insert window, and the
    post-delete hole (NULL enrichment under left join). Spark joins on
    REAL timestamps (the operator's lane); the output emits the
    integer second instead, so the gate pins boundary semantics and
    version selection without cross-engine timestamp rendering (the
    orders_as_of_ts convention).
    At 100 TB: Catalyst extracts the fk equality as the hash-join key
    with interval containment as the residual — facts shuffle once on
    the fk (or the version-grain history broadcasts); the disjoint-
    interval invariant means the join never fans out."""
    from dtle_spark.operators.apply import dedupe_redelivered
    from dtle_spark.operators.scd2 import scd2_history, temporal_join

    c = load_table(spark, sf_dir, "customer")
    ch = dedupe_redelivered(cdc_demo.customer_changes_ts(spark, sf_dir))
    hist = scd2_history(ch, ["c_custkey"], base=c)
    facts = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_custkey") * 10 + F.col("o_orderkey") % 4).alias("fact_s"),
    ).withColumn("fact_ts", F.timestamp_seconds(F.col("fact_s")))
    out = temporal_join(
        facts, hist, {"o_custkey": "c_custkey"}, "fact_ts",
        {"CAST(round(row.c_acctbal * 100) AS BIGINT)": "cust_acctbal_cents",
         "valid_from_seq": "ver_from_seq"},
    )
    return out.select(
        "o_orderkey", "o_custkey", "fact_s",
        "cust_acctbal_cents", "ver_from_seq",
    )


@query("update_pair_filter", cdc_demo.CUSTOMER_FILTER_ORACLE)
def update_pair_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 update-pair Where semantics (binlog_reader.go:1927-1983):
    before/after evaluated independently; updates degrade to pure
    insert/delete when one image fails; both-fail rows drop."""
    changes = cdc_demo.customer_changes(spark, sf_dir)
    filtered = apply_where_to_changes(changes, cdc_demo.CUSTOMER_WHERE)
    return filtered.select(
        F.coalesce(F.col("after.c_custkey"), F.col("before.c_custkey")).alias("c_custkey"),
        "seq",
        "op",
    )


# ---------------------------------------------------------------------------
# Training-data pipeline surface: dedup + text analysis
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text hash-groupBy. At 100 TB: group on
    the 128-bit digest, not the text — the shuffle carries 16 bytes + ids
    per row instead of documents."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", tx.doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "token_stats",
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    SELECT doc_id,
      len(toks) AS n_tokens,
      CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS n_token_chars,
      CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        / nullif(len(toks), 0) AS stop_ratio
    FROM t
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + stopword ratio (functions/textstats.py) — pure
    codegen expressions, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    return d.select(
        "doc_id",
        tx.token_count(toks).alias("n_tokens"),
        tx.char_count_tokens(toks).alias("n_token_chars"),
        tx.stopword_ratio(toks).alias("stop_ratio"),
    )


@query(
    "lang_id",
    """
    WITH t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    h AS (SELECT doc_id, lang,
      len(list_filter(toks, x -> x IN ('the','and','of','to','is'))) AS h_en,
      len(list_filter(toks, x -> x IN ('der','die','und','das','ist'))) AS h_de,
      len(list_filter(toks, x -> x IN ('le','la','et','les','est'))) AS h_fr,
      len(list_filter(toks, x -> x IN ('el','que','de','los','es'))) AS h_es
      FROM t)
    SELECT doc_id, lang,
      CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
           WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
           WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
           WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
           ELSE 'es' END AS lang_guess
    FROM h
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID via stopword-profile hit counts
    (functions/textstats.py: fixed argmax precedence on ties)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", tx.lang_guess(tx.tokens(F.col("text"))).alias("lang_guess"))


# ONE copy of the must-stay-bit-identical quality formula: the
# quality_score gate AND canonical_docs' per-cluster ranking both hash
# against it — duplicating it would let an edit desynchronize them.
_QUALITY_EXPR_DUCK = """
      0.4 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
      + 0.3 * (1.0 - coalesce(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / nullif(len(toks), 0), 0.0))
      + 0.3 * coalesce(CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / nullif(length(text), 0), 0.0)
"""


@query(
    "quality_score",
    f"""
    WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents)
    SELECT doc_id, {_QUALITY_EXPR_DUCK} AS quality
    FROM t
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/charclass quality heuristic with a fixed double-op
    order (see functions/textstats.quality_score)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.quality_score(F.col("text")).alias("quality"))


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _definition_hash(name: str) -> str:
    """md5 of (spark_fn source + oracle text) — the query's definition
    fingerprint. Captures edits to the query body and to generated
    oracle SQL (whose text re-expands on import); edits buried inside
    library modules the body calls are covered separately by
    :func:`_dependency_hash` (r10 lesson: apply.py/dq.py changed under
    six green queries and nothing flagged them for re-gating)."""
    import hashlib

    pair = REGISTRY[name]
    src = _query_source(name)
    return hashlib.md5((src + (pair.oracle or "")).encode()).hexdigest()


def _query_source(name: str) -> str:
    import inspect

    try:
        return inspect.getsource(REGISTRY[name].spark_fn)
    except (OSError, TypeError):  # pragma: no cover - REPL-defined fn
        return name


_MODULE_HASH_CACHE: dict[str, tuple[float, str, frozenset]] = {}


def _module_info(modname: str) -> tuple[str, frozenset]:
    """(content md5, direct dtle_spark imports) of one module's source
    file, cached by mtime."""
    import hashlib
    import importlib.util
    import os
    import re

    try:
        spec = importlib.util.find_spec(modname)
        path = spec.origin if spec else None
    except (ImportError, ValueError):
        path = None
    if not path or not os.path.exists(path):
        return "", frozenset()
    mtime = os.path.getmtime(path)
    hit = _MODULE_HASH_CACHE.get(modname)
    if hit and hit[0] == mtime:
        return hit[1], hit[2]
    with open(path, "rb") as f:
        data = f.read()
    h = hashlib.md5(data).hexdigest()
    imports = frozenset(
        re.findall(
            rb"(?:^|\n)\s*(?:from|import)\s+(dtle_spark[\w.]*)", data
        )
    )
    imports = frozenset(m.decode() for m in imports)
    _MODULE_HASH_CACHE[modname] = (mtime, h, imports)
    return h, imports


# deps fingerprint algorithm version, stored per entry. Algo 1 (r11)
# hashed whole transitive MODULES — but tableio/session change almost
# every round, so one common-module edit re-stamped the entire registry
# (r11: 139/140 stamped current) and the 50-query driver window could
# never chase genuinely-changed definitions. Algo 2 fingerprints the
# OBJECTS the query actually rides on (functions/classes/constants,
# closed transitively over what each one's own source references), so
# adding write_clustered to tableio no longer re-stamps a query that
# only calls load_table, and adding query 141 re-stamps nothing.
_DEPS_ALGO = 2

_OBJ_INFO_CACHE: dict[tuple[str, str], tuple[str, dict]] = {}


def _stable_repr(v, depth: int = 0) -> str:
    """repr that is stable across processes AND runtime states:
    frozensets ordered (PYTHONHASH randomization must never move a
    fingerprint), address-bearing default reprs reduced to the type
    name, and MUTABLE containers (dict/list/set) reduced to a type tag
    — a module-global dict is usually a runtime cache (the cdc_demo
    lesson: running entry() populated one and re-stamped its queries),
    and fingerprinting its contents would make the stamp depend on
    what happened to execute first. Depth-capped: a fingerprint needs
    sensitivity, not a faithful deep dump."""
    if depth > 6:
        return f"<deep:{type(v).__name__}>"
    if isinstance(v, frozenset):
        return "{" + ",".join(sorted(_stable_repr(x, depth + 1) for x in v)) + "}"
    if isinstance(v, tuple):
        return "[" + ",".join(_stable_repr(x, depth + 1) for x in v) + "]"
    if isinstance(v, (dict, list, set)):
        return f"<mutable:{type(v).__name__}>"
    r = repr(v)
    if " at 0x" in r:
        return f"<{type(v).__module__}.{type(v).__name__}>"
    return r


def _local_pkg_imports(src: str) -> tuple[dict, dict]:
    """(alias -> object, const components) for ``from dtle_spark...
    import x [as y]`` and ``import dtle_spark... [as z]`` statements
    appearing IN a source body (queries import operators inside the
    def; operator functions import sibling modules inside theirs).
    Imported plain CONSTANTS are returned as ready components keyed to
    their defining module — the alias namespace can't recover that."""
    import importlib
    import re

    out: dict = {}
    consts: dict = {}
    for m, names in re.findall(
        r"from\s+(dtle_spark[\w.]*)\s+import\s+(\([^)]*\)|[^\n]+)", src
    ):
        try:
            mod = importlib.import_module(m)
        except ImportError:  # pragma: no cover - stale source reference
            continue
        for piece in names.strip("()").split(","):
            parts = piece.split()
            if not parts:
                continue
            orig = parts[0]
            alias = parts[2] if len(parts) == 3 and parts[1] == "as" else orig
            v = getattr(mod, orig, None)
            if v is None:
                # a submodule import (``from pkg import submod``): the
                # package attr exists only once the submodule has been
                # imported SOMEWHERE — import it explicitly so the
                # fingerprint never depends on ambient import order
                try:
                    v = importlib.import_module(f"{m}.{orig}")
                except ImportError:
                    continue
            out[alias] = v
            import inspect as _i

            if not (_i.isfunction(v) or _i.isclass(v) or _i.ismodule(v)) \
                    and not callable(v):
                consts[(m, f"<const:{orig}>")] = v
    for m, alias in re.findall(
        r"(?:^|\n)\s*import\s+(dtle_spark[\w.]*)(?:\s+as\s+(\w+))?", src
    ):
        try:
            mod = importlib.import_module(m)
        except ImportError:  # pragma: no cover
            continue
        out[alias or m.split(".", 1)[0]] = mod
    return out, consts


def _referenced_objects(src: str, ns: dict, ns_module: str) -> dict:
    """{(module, qualname): object} for every dtle_spark object the
    source references: direct names resolving in ``ns`` (functions,
    classes, and — when scanning a package module's own namespace —
    plain constants), plus ``alias.attr`` accesses through package
    module aliases (module-level imports in ``ns`` or imports inside
    the body). Over-approximation (names also match inside strings/
    comments) is fine: the set only decides re-gate PRIORITY."""
    import inspect
    import re

    eff = dict(ns)
    local, out = _local_pkg_imports(src)
    eff.update(local)
    names = set(re.findall(r"[A-Za-z_]\w*", src))
    for n in sorted(names & set(eff)):
        v = eff[n]
        if inspect.ismodule(v):
            continue  # reached through attr accesses below
        m = getattr(v, "__module__", "") or ""
        if (inspect.isfunction(v) or inspect.isclass(v)):
            if m.startswith("dtle_spark"):
                out[(m, getattr(v, "__qualname__", n))] = v
        elif not callable(v) and ns_module.startswith("dtle_spark") \
                and n in ns and not n.startswith("__"):
            out[(ns_module, f"<const:{n}>")] = v
    for alias, attr in set(re.findall(r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)", src)):
        mod = eff.get(alias)
        if not (inspect.ismodule(mod)
                and getattr(mod, "__name__", "").startswith("dtle_spark")):
            continue
        v = getattr(mod, attr, None)
        if v is None:
            # package-attr submodule access: resolve deterministically
            # (see _local_pkg_imports) — never via ambient import state
            if hasattr(mod, "__path__"):
                import importlib

                try:
                    v = importlib.import_module(f"{mod.__name__}.{attr}")
                except ImportError:
                    continue
            else:
                continue
        if inspect.isfunction(v) or inspect.isclass(v):
            vm = getattr(v, "__module__", "") or mod.__name__
            if vm.startswith("dtle_spark"):
                out[(vm, getattr(v, "__qualname__", attr))] = v
        elif inspect.ismodule(v):
            if getattr(v, "__name__", "").startswith("dtle_spark"):
                out[(v.__name__, "<module>")] = v
        elif not callable(v):
            out[(mod.__name__, f"<const:{attr}>")] = v
    return out


def _obj_info(key: tuple[str, str], obj) -> tuple[str, dict]:
    """(own-source fingerprint, referenced dtle_spark objects) for one
    object — NO recursive hashing (the traversal collects a flat
    reachable set, so reference cycles need no special casing)."""
    import hashlib
    import inspect
    import sys

    hit = _OBJ_INFO_CACHE.get(key)
    if hit is not None:
        return hit
    if inspect.ismodule(obj):
        info = (_module_info(key[0])[0], {})
    elif inspect.isfunction(obj) or inspect.isclass(obj):
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):  # pragma: no cover - builtin/REPL
            src = f"{key[0]}.{key[1]}"
            info = (hashlib.md5(src.encode()).hexdigest(), {})
            _OBJ_INFO_CACHE[key] = info
            return info
        # import the defining module explicitly: sys.modules.get would
        # make the scan namespace depend on ambient import order
        try:
            import importlib

            ns = importlib.import_module(key[0]).__dict__
        except ImportError:  # pragma: no cover - dynamic module
            ns = getattr(sys.modules.get(key[0]), "__dict__", {})
        info = (
            hashlib.md5(src.encode()).hexdigest(),
            _referenced_objects(src, ns, key[0]),
        )
    else:
        info = (hashlib.md5(_stable_repr(obj).encode()).hexdigest(), {})
    _OBJ_INFO_CACHE[key] = info
    return info


def _dep_components(name: str) -> dict[str, str]:
    """{'module.qualname': fingerprint} for every dtle_spark object the
    query's body transitively rides on — the query's own def and the
    registry module as a whole are deliberately NOT components (the
    def is _definition_hash's job; a whole-module component would
    re-stamp all 140 queries on any edit to any one of them)."""
    fn = REGISTRY[name].spark_fn
    src = _query_source(name)
    work = sorted(
        _referenced_objects(
            src, getattr(fn, "__globals__", {}), __name__
        ).items()
    )
    self_key = (getattr(fn, "__module__", __name__), fn.__qualname__)
    seen: set[tuple[str, str]] = {self_key}
    comps: dict[str, str] = {}

    def _is_registry_infra(key: tuple[str, str]) -> bool:
        # the registry's own machinery is every query's neighbor, not a
        # dependency: the @query decorator, module consts — notably the
        # REGISTRY dict, whose stable-repr would embed ALL definitions
        # (fingerprinting it re-creates exactly the re-stamp-everything
        # regression this algo kills) — and the module itself. Helper
        # functions AND sibling query defs a body actually calls
        # (hybrid_rrf -> bm25_topk etc.) stay components: a callee
        # rewrite must re-stamp its riders.
        return key[0] == __name__ and (
            key[1].startswith("<const:")
            or key[1] in {"query", "QueryPair", "<module>"}
        )

    while work:
        key, obj = work.pop()
        if key in seen or _is_registry_infra(key):
            continue
        seen.add(key)
        fp, refs = _obj_info(key, obj)
        comps[f"{key[0]}.{key[1]}"] = fp
        work.extend(sorted(refs.items()))
    return comps


def _dependency_hash(name: str) -> str:
    """md5 over the per-OBJECT fingerprints of everything the query
    transitively references inside the package (:func:`_dep_components`
    — algo 2) — changes when code the query actually rides on changes,
    and ONLY then, so the rotation can front-load "dependency changed
    since last green" without a common-module edit invalidating the
    whole registry."""
    import hashlib

    parts = [f"{k}:{v}" for k, v in sorted(_dep_components(name).items())]
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def _green_history() -> tuple[dict[str, int], dict[str, int]]:
    """(green-count, last-green-round) per query from the accumulated
    CORRECTNESS_r*.json files at the repo root."""
    import glob
    import json
    import os
    import re

    greens: dict[str, int] = {}
    last_green_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") and row.get("rows_match"):
                greens[name] = greens.get(name, 0) + 1
                last_green_round[name] = max(last_green_round.get(name, 0), rnd)
    return greens, last_green_round


def _stored_hashes() -> dict[str, dict]:
    """QUERY_HASHES.json: {name: {"hash": .., "round": N}} — the
    definition fingerprint as of round N (regenerated by
    write_query_hashes at each round's end, before the driver runs)."""
    import json
    import os

    try:
        with open(os.path.join(_repo_root(), "QUERY_HASHES.json")) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def write_query_hashes(
    round_no: int, force_stale: list[str] | None = None
) -> dict[str, dict]:
    """Regenerate QUERY_HASHES.json: entries whose definition AND
    dependency hashes are unchanged keep their stored round (the round
    the definition dates from); changed or new entries are stamped
    with ``round_no``. Run at the END of each round, after all query
    edits — the driver then checks exactly the stamped definitions.

    ``deps`` is the per-OBJECT transitive fingerprint
    (:func:`_dependency_hash`, ``algo`` 2): an edit to an operator
    function a query actually rides bumps it, stamping the query with
    the current round and front-loading it in the next driver window —
    the r10 failure mode (apply.py/dq.py changed under six green
    queries, nothing re-gated them) — while an edit to something the
    query does NOT ride (a new tableio writer, a sibling query's def)
    moves nothing (the r11 failure mode: whole-module fingerprints
    re-stamped 139/140 entries every round, so the 50-query window
    could never chase genuinely-changed definitions). A stored entry
    WITHOUT the current ``algo`` marker (pre-r11 format, or r11's
    module-level deps) is backfilled in place, keeping its round: the
    migration can't know when deps last changed under the new
    granularity, so it doesn't pretend to.

    ``force_stale`` stamps the named queries with ``round_no`` even
    when both hashes match — the manual lever for "I know this
    definition's behavior moved under it" (used once in r11 for the
    six queries whose operators changed in r10 before deps tracking
    existed).

    Bootstrap (entry missing entirely, e.g. the file was deleted or a
    query predates the mechanism): stamp with the query's LAST GREEN
    round, not ``round_no`` — stamping current would mark every
    definition "changed since its green" at once and collapse the
    rotation to plain definition order, the exact regression the sort
    key exists to prevent. A query changed before its file entry was
    lost is still caught by the hash mismatch on the next edit; the
    conservative cost is one un-front-loaded window."""
    import json
    import os

    stored = _stored_hashes()
    _, last_green = _green_history()
    forced = set(force_stale or [])
    out: dict[str, dict] = {}
    for name in REGISTRY:
        h = _definition_hash(name)
        d = _dependency_hash(name)
        entry = {"hash": h, "deps": d, "algo": _DEPS_ALGO}
        prev = stored.get(name)
        if name in forced:
            out[name] = {**entry, "round": round_no}
        elif prev is None:
            out[name] = {**entry, "round": last_green.get(name, 0)}
        elif prev.get("hash") == h and (
            prev.get("algo") != _DEPS_ALGO or prev.get("deps") == d
        ):
            rnd = prev.get("round", 0)
            if prev.get("algo") != _DEPS_ALGO:
                # algo transition: the stored round may be POLLUTED by
                # the old granularity (r11's module-level deps stamped
                # 139/140 entries current at once). With the definition
                # hash unchanged, the last green is the honest anchor;
                # entries known to have genuinely moved under their
                # deps are force_stale's job for the one transition
                # round (the r11 precedent). Never-green entries keep
                # the stored round — there is no green to anchor to.
                lg = last_green.get(name, 0)
                rnd = lg if lg > 0 else rnd
            # Bootstrap-era entries carry round 0 from before their
            # first green; once the unchanged definition HAS a green,
            # promote the stamp to that round so the file's "round the
            # definition dates from" semantics hold (a round-0 stamp
            # would otherwise outlive the green it predates)
            if rnd == 0 and last_green.get(name, 0) > 0:
                rnd = last_green[name]
            out[name] = {**entry, "round": rnd}
        else:
            out[name] = {**entry, "round": round_no}
    with open(os.path.join(_repo_root(), "QUERY_HASHES.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    return out


def _registry_order() -> list[str]:
    """Order the registry so the driver's 50-query correctness cap
    rotates through every entry. Sort key, in priority order:

    1. the round of each query's MOST RECENT green row, ascending —
       never-checked queries (round 0) lead, then whatever has gone
       longest without a driver check; the freshest greens rotate to
       the back. (r5 lesson: a boolean "in latest round" split left
       r1-era greens buried mid-list behind once-checked r4 entries.)
       A query whose DEFINITION OR DEPENDENCIES changed after its
       last green (its QUERY_HASHES.json definition or deps
       fingerprint mismatches, or is stamped with a later round than
       the green) is treated as NEVER CHECKED — the old green proves
       nothing about the new behavior, so it must lead the next
       window rather than rely on cohort tie-breaks (r7 lesson:
       ann_topk_pq was rewritten behind its r6 green; r10 lesson:
       apply.py/dq.py changed under six green queries unnoticed).
    2. fewest historical green rows (tie-break within a round cohort).
    3. definition order.

    Rule 1's ascending last-green sort IS the oldest-green-fill rule:
    after the changed cohort, remaining window slots go to whatever
    has been green-stale longest, so no in-sync query's green age can
    exceed ~(registry/window) rounds while newer greens keep rotating
    to the back.

    Reads the accumulated CORRECTNESS_r*.json files and
    QUERY_HASHES.json at the repo root; falls back to plain definition
    order when none exist."""
    names = list(REGISTRY.keys())
    greens, last_green_round = _green_history()
    stored = _stored_hashes()

    def eff(n: str) -> tuple[int, int]:
        lg = last_green_round.get(n, 0)
        entry = stored.get(n)
        if stored and (
            entry is None
            or entry.get("hash") != _definition_hash(n)
            # deps compare only within the current algo: a pre-algo-2
            # stored fingerprint would mismatch EVERY entry at once
            # (whole-registry front-load, the regression the sort key
            # exists to prevent); the migration backfills it instead
            or (entry.get("algo") == _DEPS_ALGO
                and entry.get("deps") != _dependency_hash(n))
            or entry.get("round", 0) > lg
        ):
            # definition/deps newer than last green: lead the window.
            # Within this cohort, NEVER-GREEN queries outrank
            # once-green ones (r11 lesson: an edit to a module every
            # query depends on — tableio — stamps the WHOLE registry
            # changed at once; plain definition order would then push
            # the round's genuinely new queries past the driver's
            # 50-query cap while it re-checks decade-stable TPC-H
            # shapes first)
            return 0, greens.get(n, 0)
        return lg, greens.get(n, 0)

    idx = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (*eff(n), idx[n]))


def queries() -> dict[str, SparkQuery]:
    return {name: REGISTRY[name].spark_fn for name in _registry_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _registry_order()
        if REGISTRY[name].oracle is not None
    }


# ---------------------------------------------------------------------------
# Dedup + similarity surface (functions/dedup.py, functions/similarity.py).
# The DuckDB oracles are generated from the same constants so both engines
# compute the identical md5-lane / sign-bucket formulas.
# ---------------------------------------------------------------------------

from dtle_spark.functions import dedup as dd  # noqa: E402
from dtle_spark.functions import similarity as sim  # noqa: E402


def _duck_toks(text_col: str = "text") -> str:
    return f"regexp_extract_all(lower({text_col}), '{dd.TOKEN_PATTERN}')"


def _duck_shingles(text_col: str = "text", n: int = dd.SHINGLE_N) -> str:
    t = _duck_toks(text_col)
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({t}) - {n} + 1, 1)),"
        f" i -> array_to_string(list_slice({t}, i, i + {n} - 1), ' ')))"
    )


def _duck_minhash_sql() -> str:
    lanes = ", ".join(
        f"CAST(list_min(list_transform(generate_series(1, len(hx)),"
        f" k -> ({a} * hx[k] + {b} * hy[k]) % {dd._LANE_MOD})) AS VARCHAR)"
        for a, b in dd.LANE_CONSTANTS
    )
    bands = " UNION ALL ".join(
        f"(SELECT doc_id, {b} AS band_idx,"
        f" md5(array_to_string(list_slice(sig, {b * dd.ROWS_PER_BAND + 1},"
        f" {b * dd.ROWS_PER_BAND + dd.ROWS_PER_BAND}), '|')) AS band_digest FROM sigs)"
        for b in range(dd.BANDS)
    )
    inter = "len(list_intersect(a.hx, b.hx))"
    px = dd.hex_window_sql("m", 1, "duckdb")
    py = dd.hex_window_sql("m", 11, "duckdb")
    return f"""
    WITH docs AS (SELECT doc_id, {_duck_shingles()} AS sh FROM documents),
    digests AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS mh FROM docs),
    hashed AS (SELECT doc_id,
        list_transform(mh, m -> {px}) AS hx,
        list_transform(mh, m -> {py}) AS hy
      FROM digests),
    sigs AS (SELECT doc_id, [{lanes}] AS sig FROM hashed),
    buckets AS ({bands}),
    capped AS (
      SELECT doc_id, band_idx, band_digest FROM (
        SELECT *, count(*) OVER (PARTITION BY band_idx, band_digest) AS bn
        FROM buckets
      ) WHERE bn <= {dd.MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
      FROM capped a JOIN capped b
        ON a.band_idx = b.band_idx AND a.band_digest = b.band_digest
       AND a.doc_id < b.doc_id
    )
    SELECT id_1, id_2,
           CAST({inter} AS DOUBLE) / (len(a.hx) + len(b.hx) - {inter}) AS jaccard
    FROM cand JOIN hashed a ON cand.id_1 = a.doc_id JOIN hashed b ON cand.id_2 = b.doc_id
    WHERE CAST({inter} AS DOUBLE) / (len(a.hx) + len(b.hx) - {inter}) >= 0.5
    """


def _duck_simhash_sql(text_col: str = "text") -> str:
    """Two-stage SimHash: token-hash array CTE, then 60 bit-count passes."""
    t = _duck_toks(text_col)
    h15 = dd.hex_window_sql("m", 1, "duckdb", width=15)
    th = f"list_transform(list_transform({t}, x -> md5(x)), m -> {h15})"
    bits = []
    for b in range(dd.SIMHASH_BITS):
        cnt = f"len(list_filter(th, h -> (h // {1 << b}) % 2 = 1))"
        bits.append(f"(CASE WHEN 2 * {cnt} > len(th) THEN {1 << b} ELSE 0 END)")
    sig = "CAST(" + " + ".join(bits) + " AS BIGINT)"
    return (
        f"SELECT doc_id, {sig} AS simhash FROM "
        f"(SELECT doc_id, {th} AS th FROM documents)"
    )


def _duck_simhash_windows() -> str:
    width = dd.SIMHASH_BITS // dd.SIMHASH_CHUNKS
    return " UNION ALL ".join(
        f"SELECT doc_id, simhash, {h} AS h,"
        f" (simhash // {1 << (width * h)}) % {1 << width} AS v FROM s"
        for h in range(dd.SIMHASH_CHUNKS)
    )


def _duck_dot(a: str, b: str) -> str:
    prods = (
        f"list_transform(generate_series(1, len({a})),"
        f" k -> CAST({a}[k] AS DOUBLE) * CAST({b}[k] AS DOUBLE))"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {prods}), (acc, x) -> acc + x)"
    )


def _duck_cosine(a: str, b: str) -> str:
    return f"({_duck_dot(a, b)}) / (sqrt({_duck_dot(a, a)}) * sqrt({_duck_dot(b, b)}))"


def _duck_sign_bucket(vec: str, planes: int = 8) -> str:
    bits = ", ".join(
        f"(CASE WHEN CAST({vec}[{k}] AS DOUBLE) >= 0 THEN '1' ELSE '0' END)"
        for k in range(1, planes + 1)
    )
    return f"concat({bits})"


@query("dedup_minhash_lsh", _duck_minhash_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard-verified at 0.5
    (functions/dedup.py: 24 md5 lanes, 12 bands x 2 rows, hot-bucket
    cap at 64)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5)


@query("dedup_simhash", _duck_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash signatures (integer-exact, engine-portable)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.simhash_signatures(d, "doc_id", "text")


@query(
    "dedup_simhash_pairs",
    f"""
    WITH s AS ({_duck_simhash_sql()}),
    halves AS (
      {_duck_simhash_windows()}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2,
             a.simhash AS sh_1, b.simhash AS sh_2
      FROM halves a JOIN halves b ON a.h = b.h AND a.v = b.v AND a.doc_id < b.doc_id
    )
    SELECT id_1, id_2, bit_count(xor(sh_1, sh_2)) AS distance
    FROM cand WHERE bit_count(xor(sh_1, sh_2)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs (hamming <= 3 of 60 bits) via 6x10-bit chunk
    pigeonhole bucketing — exact for d <= 5, no O(n^2) cross join."""
    d = load_table(spark, sf_dir, "documents")
    return dd.simhash_near_pairs(d, "doc_id", "text", max_distance=3)


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH t0 AS (SELECT doc_id, source AS block, {_duck_shingles()} AS sh FROM documents),
    t AS (SELECT doc_id, block,
          list_transform(list_transform(sh, s -> md5(s)),
                         m -> {dd.hex_window_sql('m', 1, 'duckdb')}) AS hs
          FROM t0)
    SELECT a.block, a.doc_id AS id_1, b.doc_id AS id_2,
      CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
        / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) AS jaccard
    FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
        / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact blocked n-gram Jaccard within `source` blocks — the exact
    counterpart of MinHash (quadratic per block; LSH is the scale path)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(d, "doc_id", "text", "source", threshold=0.3)


_ANN_BRUTE_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding AS n_vec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_duck_cosine('q_vec', 'n_vec')} AS cosine
  FROM c, q WHERE query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
SELECT query_id, neighbor_id, rnk, cosine FROM r WHERE rnk <= 10
"""


@query("ann_topk_bruteforce", _ANN_BRUTE_ORACLE)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the query set (vec_id % 50 = 0) —
    broadcast queries, stream corpus, fold-based deterministic dot
    products (functions/similarity.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    out = sim.brute_force_topk(e, q, k=10)
    return out.withColumnRenamed("rank", "rnk")


_ANN_FILTERED_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding AS n_vec FROM embeddings WHERE label < 3),
scored AS (
  SELECT query_id, neighbor_id, {_duck_cosine('q_vec', 'n_vec')} AS cosine
  FROM c, q WHERE query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
SELECT query_id, neighbor_id, rnk, cosine FROM r WHERE rnk <= 10
"""


@query("ann_topk_filtered", _ANN_FILTERED_ORACLE)
def ann_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED (hybrid) search, exact lane: top-10 among corpus rows
    satisfying a metadata predicate (label < 3, ~30% selectivity).
    The predicate is pushed into the corpus scan before the broadcast
    score stage. The persisted-index lane (ivf_pq_topk_indexed
    where=...) over carry_cols-attributed indexes is pinned equal to
    the inline tier over the pre-filtered corpus in pytest."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    out = sim.brute_force_topk(e.filter(F.col("label") < 3), q, k=10)
    return out.withColumnRenamed("rank", "rnk")


_RP_NEIGHBOR_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
    list_transform(list_transform({_duck_toks()}, x -> md5(x)),
                   m -> {{hx}}) AS th
  FROM documents
),
e AS (
  SELECT doc_id,
    list_transform(range(0, {{bits}}), b ->
      CAST(2 * len(list_filter(th, h -> (h // CAST(pow(2, b) AS BIGINT)) % 2 = 1))
           - len(th) AS BIGINT)) AS embedding
  FROM t
),
nz AS (SELECT doc_id, embedding FROM e
       WHERE list_sum(list_transform(embedding, x -> x * x)) > 0),
q AS (SELECT doc_id AS query_id, embedding AS q_vec FROM nz WHERE doc_id % 97 = 0),
c AS (SELECT doc_id AS neighbor_id, embedding AS n_vec FROM nz WHERE doc_id % 97 <> 0),
scored AS (
  SELECT query_id, neighbor_id, {_duck_cosine('q_vec', 'n_vec')} AS cosine
  FROM c, q
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
SELECT query_id, neighbor_id, rnk, cosine FROM r WHERE rnk <= 5
"""


@query(
    "rp_embed_neighbors",
    _RP_NEIGHBOR_ORACLE.format(
        hx=dd.hex_window_sql("m", 1, "duckdb", width=15), bits=dd.SIMHASH_BITS
    ),
)
def rp_embed_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-to-text nearest neighbors END TO END without an external
    model: rp_text_embedding (the oracle-gated feature-hashing lane,
    dedup.py) -> exact cosine top-5 of each held-out doc (doc_id % 97
    = 0, the decontaminate convention) against the rest. Zero-norm
    docs (empty after tokenization) are excluded on both sides —
    cosine is undefined there and cross-engine inf/NULL semantics
    differ. Cosine folds over the integer-count vectors cast to
    double, bit-identical across engines. The same embeddings feed the
    IVF-PQ index (dim 60, m=6) — composition pinned in pytest."""
    d = load_table(spark, sf_dir, "documents")
    e = dd.rp_text_embedding(d, "doc_id", "text").select(
        "doc_id", F.col("emb").alias("embedding")
    )
    # checkpoint BEFORE the zero-norm filter: predicate pushdown would
    # substitute the embed fold into the filter and sink it below the
    # spread() repartition, serializing the whole O(dims x tokens)
    # fold onto the one-split fixture scan (measured 25 s -> 1 s); the
    # barrier also keeps the pair join from recomputing the embeddings
    e = e.localCheckpoint(eager=False)
    nz = e.filter(
        F.expr("aggregate(embedding, 0L, (acc, x) -> acc + x * x)") > 0
    )
    q = nz.filter(F.col("doc_id") % 97 == 0)
    c = nz.filter(F.col("doc_id") % 97 != 0)
    out = sim.brute_force_topk(c, q, id_col="doc_id", k=5)
    return out.withColumnRenamed("rank", "rnk")


from dtle_spark.functions import retrieval as rt  # noqa: E402

_BM25_TERMS = ["vector", "hash", "stream", "merge"]


def _duck_rbm25_core(terms: list[str]) -> str:
    """The oracle's half of the RBM25 arithmetic — same pivoted-column
    shape and left-to-right term sum as retrieval._score_expr."""
    score = " + ".join(
        f"(CASE WHEN tf_{i} IS NULL THEN CAST(0 AS DOUBLE) ELSE"
        f" ((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f"  / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * (1.2 + 1.0))"
        f" / (CAST(tf_{i} AS DOUBLE)"
        f"    + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)"
        f"             * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)))"
        f" END)"
        for i in range(len(terms))
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    dfs = ", ".join(
        f"CAST(count(DISTINCT CASE WHEN term = '{t}' THEN id END) AS BIGINT)"
        f" AS df_{i}"
        for i, t in enumerate(terms)
    )
    piv = ", ".join(
        f"max(CASE WHEN term = '{t}' THEN tf END) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    return f"""
t AS (SELECT doc_id AS id, {_duck_toks()} AS toks FROM documents),
lens AS (SELECT id, CAST(len(toks) AS BIGINT) AS dl FROM t),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, SUM(dl) AS sum_dl FROM lens),
p AS (SELECT id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT id, unnest(toks) AS term FROM t) u
      WHERE term IN ({in_list}) GROUP BY id, term),
d AS (SELECT {dfs} FROM p),
piv AS (SELECT id, {piv} FROM p GROUP BY id),
s AS (SELECT piv.id AS id, {score} AS score
      FROM piv JOIN lens USING (id) CROSS JOIN g CROSS JOIN d)
"""


@query(
    "bm25_topk",
    f"""
    WITH {_duck_rbm25_core(_BM25_TERMS)},
    r AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rnk, score
          FROM s)
    SELECT id, rnk, score FROM r WHERE rnk <= 10
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval: top-10 documents for a 4-term query under
    RBM25 (rational-idf BM25 — functions/retrieval.py; ln is not
    cross-engine hash-safe, the textstats N/df precedent). Pivoted
    per-term columns + a fixed-order term sum keep the float
    arithmetic identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    out = rt.bm25_topk(d, _BM25_TERMS, k=10)
    return out.withColumnRenamed("rank", "rnk")


_HYBRID_ORACLE = f"""
WITH {_duck_rbm25_core(_BM25_TERMS)},
b AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rnk FROM s
      QUALIFY rnk <= 20),
th AS (
  SELECT doc_id,
    list_transform(list_transform({_duck_toks()}, x -> md5(x)),
                   m -> {{hx}}) AS th
  FROM documents
),
emb AS (
  SELECT doc_id,
    list_transform(range(0, {{bits}}), bb ->
      CAST(2 * len(list_filter(th, h -> (h // CAST(pow(2, bb) AS BIGINT)) % 2 = 1))
           - len(th) AS BIGINT)) AS embedding
  FROM th
),
nz AS (SELECT doc_id, embedding FROM emb
       WHERE list_sum(list_transform(embedding, x -> x * x)) > 0),
qv AS (SELECT embedding AS q_vec FROM nz WHERE doc_id = 97),
vs AS (SELECT doc_id AS id, {_duck_cosine('q_vec', 'embedding')} AS cosine
       FROM nz CROSS JOIN qv WHERE doc_id <> 97),
v AS (SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rnk FROM vs
      QUALIFY rnk <= 20),
f AS (SELECT COALESCE(b.id, v.id) AS id,
        coalesce(1.0 / (60 + CAST(b.rnk AS DOUBLE)), CAST(0 AS DOUBLE))
      + coalesce(1.0 / (60 + CAST(v.rnk AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
      FROM b FULL JOIN v ON b.id = v.id),
r AS (SELECT id, row_number() OVER (ORDER BY rrf DESC, id) AS rnk, rrf FROM f)
SELECT id, rnk, rrf FROM r WHERE rnk <= 10
"""


@query(
    "hybrid_rrf",
    _HYBRID_ORACLE.format(
        hx=dd.hex_window_sql("m", 1, "duckdb", width=15), bits=dd.SIMHASH_BITS
    ),
)
def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval end to end: fuse the lexical ranking (RBM25
    top-20 for the 4-term query) with the vector ranking (cosine
    top-20 against doc 97's rp embedding) by reciprocal-rank fusion
    (Cormack et al. 2009), 1/(60+rank), absent entries 0. The whole
    lexical+vector+fusion pipeline is restated in one oracle."""
    d = load_table(spark, sf_dir, "documents")
    # ONE tokenize pass for both retrieval halves (r16, guide §2.4):
    # the lexical stage (lens + postings) and the vector stage (rp
    # embedding) all read this pinned token table — previously each
    # stage re-ran the scan + regexp over the corpus (3x per query)
    from dtle_spark.util import spread

    toks = spread(d).select(
        F.col("doc_id").alias("id"),
        F.expr(
            f"regexp_extract_all(lower(text), '{dd.TOKEN_PATTERN}', 0)"
        ).alias("toks"),
    ).localCheckpoint(eager=False)
    bm = rt.bm25_topk(d, _BM25_TERMS, k=20, toks=toks).select("id", "rank")
    e = dd.rp_text_embedding(
        d, "doc_id", "text",
        toks=toks.select(F.col("id").alias("doc_id"), "toks"),
    ).select("doc_id", F.col("emb").alias("embedding"))
    e = e.localCheckpoint(eager=False)  # same pushdown barrier as rp_embed_neighbors
    nz = e.filter(
        F.expr("aggregate(embedding, 0L, (acc, x) -> acc + x * x)") > 0
    )
    vec = sim.brute_force_topk(
        nz.filter(F.col("doc_id") != 97),
        nz.filter(F.col("doc_id") == 97),
        id_col="doc_id", k=20,
    ).select(F.col("neighbor_id").alias("id"), "rank")
    out = rt.rrf_fuse([bm, vec], k0=60, k=10)
    return out.withColumnRenamed("rank", "rnk")


_ANN_LSH_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding, {_duck_sign_bucket('embedding')} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS q_vec, bucket FROM v WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding AS n_vec, bucket FROM v),
scored AS (
  SELECT query_id, c.bucket, neighbor_id, {_duck_cosine('q_vec', 'n_vec')} AS cosine
  FROM c JOIN q ON c.bucket = q.bucket AND query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
SELECT query_id, bucket, neighbor_id, rnk, cosine FROM r WHERE rnk <= 5
"""


@query("ann_topk_lsh", _ANN_LSH_ORACLE)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed approximate top-5: queries probe only their
    own bucket — the equi-join scale path for ANN at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    out = sim.lsh_bucket_topk(e, q, k=5)
    return out.withColumnRenamed("rank", "rnk")


def _duck_flip_probes(planes: int = 8) -> str:
    """Probe list: own bucket + each one-bit-flipped variant."""
    flips = ", ".join(
        f"substr(bucket, 1, {i - 1}) ||"
        f" (CASE WHEN substr(bucket, {i}, 1) = '1' THEN '0' ELSE '1' END) ||"
        f" substr(bucket, {i + 1}, {planes - i})"
        for i in range(1, planes + 1)
    )
    return f"[bucket, {flips}]"


_ANN_MULTIPROBE_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding, {_duck_sign_bucket('embedding')} AS bucket FROM embeddings),
q0 AS (SELECT vec_id AS query_id, embedding AS q_vec,
              sqrt({_duck_dot('embedding', 'embedding')}) AS qn, bucket
       FROM v WHERE vec_id % 50 = 0),
q AS (SELECT query_id, q_vec, qn, unnest({_duck_flip_probes()}) AS bucket FROM q0),
c AS (SELECT vec_id AS neighbor_id, embedding AS n_vec,
             sqrt({_duck_dot('embedding', 'embedding')}) AS cn, bucket
      FROM v),
scored AS (
  SELECT query_id, neighbor_id, ({_duck_dot('q_vec', 'n_vec')}) / (qn * cn) AS cosine
  FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
SELECT query_id, neighbor_id, rnk, cosine FROM r WHERE rnk <= 5
"""


@query("ann_topk_lsh_multiprobe", _ANN_MULTIPROBE_ORACLE)
def ann_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-5: queries probe their bucket plus all
    hamming-1 neighbors (similarity.lsh_multiprobe_topk) — recall
    recovery over hard bucket boundaries at (planes+1)x QUERY-side cost
    only; the corpus join stays equi on the bucket key. A pytest gate
    proves recall strictly improves on single-bucket LSH."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    out = sim.lsh_multiprobe_topk(e, q, k=5)
    return out.withColumnRenamed("rank", "rnk")


def _duck_ivf_assign_score() -> str:
    """Mirror of ivf_topk's cell-assignment score: dot / precomputed
    centroid norm (the norm is computed once per centroid by the same
    sqrt-of-fold both engines use — identical doubles)."""
    return f"({_duck_dot('embedding', 'c.c_vec')}) / c.c_norm"


_ANN_IVF_ORACLE = f"""
WITH cent AS (SELECT vec_id AS cent_id, embedding AS c_vec,
                     sqrt({_duck_dot('embedding', 'embedding')}) AS c_norm
              FROM embeddings WHERE vec_id % 25 = 1),
cents AS (SELECT list({{'cent_id': cent_id, 'c_vec': c_vec, 'c_norm': c_norm}} ORDER BY cent_id) AS cents FROM cent),
assigned AS (
  SELECT vec_id AS neighbor_id, embedding AS n_vec,
         list_max(list_transform(cents.cents,
           c -> {{'cos': {_duck_ivf_assign_score()}, 'cell': c.cent_id}})).cell AS cell
  FROM embeddings, cents
),
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id % 50 = 0),
qs AS (SELECT query_id, q_vec, cent_id, {_duck_cosine('q_vec', 'c_vec')} AS c_cos FROM q, cent),
probes AS (
  SELECT query_id, q_vec, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c_cos DESC, cent_id) AS r FROM qs
  ) WHERE r <= 8
),
hits AS (
  SELECT query_id, p.cell AS cell, neighbor_id, {_duck_cosine('q_vec', 'n_vec')} AS cosine
  FROM assigned a JOIN probes p ON a.cell = p.cell AND query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM hits)
SELECT query_id, cell, neighbor_id, rnk, cosine FROM r WHERE rnk <= 5
"""


@query("ann_topk_ivf", _ANN_IVF_ORACLE)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-5: broadcast centroid table, map-only
    cell assignment (array_max fold — no corpus shuffle), queries probe
    their 8 nearest cells (functions/similarity.py ivf_topk; the
    fixture embeddings are isotropic-random, so recall ~= probed
    fraction — nprobe tunes the recall/cost point)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    out = sim.ivf_topk(e, q, k=5, nprobe=8, centroid_stride=25)
    return out.withColumnRenamed("rank", "rnk")


def _duck_train_where() -> str:
    """DuckDB restatement of similarity.md5_train_sample: the
    deterministic 25% md5-draw both engines agree on byte-for-byte
    (md5 of the decimal id string; same leading-nibble set).

    DENSITY ASSUMPTION (shared with the Spark lane): every vec_id %
    ksub residue class must keep at least one member under the draw —
    Spark fails loudly via _require_dense_codebook, but the PQ oracles
    would silently build a gapped cbe0 whose positional
    luts[s*ksub+code+1] / cb.cb[...] indexing mis-scores. Verified on
    all three fixtures (sf0.001/0.01/0.1: 16/16 residues populated);
    at any realistic corpus size a 25% draw leaving a mod-16 class
    empty is (3/4)^(N/16) — negligible beyond toy N."""
    nibbles = ", ".join(f"'{c}'" for c in sim.TRAIN_SAMPLE_HEX)
    return f"substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) IN ({nibbles})"


def _duck_ivf_trained_oracle(k: int = 16, nprobe: int = 4, dim: int = 64) -> str:
    """Oracle for the TRAINED-centroid IVF search: the centroid table
    is one integer-exact Lloyd step from the fixed cell = vec_id % k
    partition OVER THE md5_train_sample DRAW (mirrors
    similarity.ivf_exact_mean_centroids on the sample — scaled-int
    component sums make the mean order-free, so it hash-gates; the
    double-mean train_centroids deliberately does not). Training on
    the sample while assigning/searching the full corpus is the same
    production shape the PQ tiers use (r7); Lloyd only needs a
    representative subset."""
    sums = ", ".join(
        f"CAST(SUM(CAST(round(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS s{i}"
        for i in range(dim)
    )
    comps = ", ".join(f"CAST(s{i} AS DOUBLE) / 1000000.0 / n" for i in range(dim))
    return f"""
WITH centsum AS (
  SELECT vec_id % {k} AS cent_id, COUNT(*) AS n, {sums}
  FROM embeddings WHERE {_duck_train_where()} GROUP BY cent_id),
cent0 AS (SELECT cent_id, [{comps}] AS c_vec FROM centsum),
cent AS (SELECT cent_id, c_vec, sqrt({_duck_dot('c_vec', 'c_vec')}) AS c_norm FROM cent0),
cents AS (SELECT list({{'cent_id': cent_id, 'c_vec': c_vec, 'c_norm': c_norm}} ORDER BY cent_id) AS cents FROM cent),
assigned AS (
  SELECT vec_id AS neighbor_id, embedding AS n_vec,
         list_max(list_transform(cents.cents,
           c -> {{'cos': {_duck_ivf_assign_score()}, 'cell': c.cent_id}})).cell AS cell
  FROM embeddings, cents
),
q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id % 50 = 0),
qs AS (SELECT query_id, q_vec, cent_id, {_duck_cosine('q_vec', 'c_vec')} AS c_cos FROM q, cent),
probes AS (
  SELECT query_id, q_vec, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c_cos DESC, cent_id) AS r FROM qs
  ) WHERE r <= {nprobe}
),
hits AS (
  SELECT query_id, p.cell AS cell, neighbor_id, {_duck_cosine('q_vec', 'n_vec')} AS cosine
  FROM assigned a JOIN probes p ON a.cell = p.cell AND query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM hits)
SELECT query_id, cell, neighbor_id, rnk, cosine FROM r WHERE rnk <= 5
"""


@query("ann_topk_ivf_trained", _duck_ivf_trained_oracle())
def ann_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search against a TRAINED centroid table (one integer-exact
    Lloyd step — similarity.ivf_exact_mean_centroids) instead of the
    sampled init: the plan is identical, only the centroid input
    changes. The train runs on the deterministic 25% md5_train_sample
    draw (r8, mirroring the PQ tiers' r7 production shape — Lloyd only
    needs a representative subset; assignment and search still stream
    the full corpus). A pytest recall gate proves the trained path's
    quality against brute force (tests/test_custom_ops.py); the
    double-mean trainer train_centroids backs the same seam on a
    cluster."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    # materialize the (tiny) trained centroid table once: ivf_topk
    # consumes it in three places, and each lazy reuse would re-run the
    # 64-sum training aggregation over the sample
    cent = sim.ivf_exact_mean_centroids(
        sim.md5_train_sample(e), k=16
    ).localCheckpoint(eager=False)
    out = sim.ivf_topk(e, q, k=5, nprobe=4, centroids=cent)
    return out.withColumnRenamed("rank", "rnk")


def _duck_cluster_reps_oracle(k: int = 16, n: int = 5, dim: int = 64) -> str:
    """Oracle for cluster_representatives: the same integer-exact
    trained centroids as ann_topk_ivf_trained, the same argmax
    assignment keeping the winning dot/c_norm score, then TRUE cosine
    (divide by the vector's own norm, 0.0 for a zero vector — never an
    engine-ordered NULL) and a per-cell top-n window."""
    sums = ", ".join(
        f"CAST(SUM(CAST(round(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS s{i}"
        for i in range(dim)
    )
    comps = ", ".join(f"CAST(s{i} AS DOUBLE) / 1000000.0 / n" for i in range(dim))
    return f"""
WITH centsum AS (
  SELECT vec_id % {k} AS cent_id, COUNT(*) AS n, {sums}
  FROM embeddings WHERE {_duck_train_where()} GROUP BY cent_id),
cent0 AS (SELECT cent_id, [{comps}] AS c_vec FROM centsum),
cent AS (SELECT cent_id, c_vec, sqrt({_duck_dot('c_vec', 'c_vec')}) AS c_norm FROM cent0),
cents AS (SELECT list({{'cent_id': cent_id, 'c_vec': c_vec, 'c_norm': c_norm}} ORDER BY cent_id) AS cents FROM cent),
assigned AS (
  SELECT vec_id,
         sqrt({_duck_dot('embedding', 'embedding')}) AS vn,
         list_max(list_transform(cents.cents,
           c -> {{'cos': {_duck_ivf_assign_score()}, 'cell': c.cent_id}})) AS b
  FROM embeddings, cents
),
scored AS (
  SELECT b.cell AS cell, vec_id,
         CASE WHEN vn = 0 THEN 0.0 ELSE b.cos / vn END AS centrality
  FROM assigned
),
r AS (SELECT *, row_number() OVER (
        PARTITION BY cell ORDER BY centrality DESC, vec_id) AS rank
      FROM scored)
SELECT cell, vec_id, rank, centrality FROM r WHERE rank <= {n}
ORDER BY cell, rank
"""


@query("cluster_representatives", _duck_cluster_reps_oracle())
def cluster_representatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced coreset selection (similarity.py
    cluster_representatives): embeddings clustered by the integer-exact
    trained centroids (the ann_topk_ivf_trained model), each cell
    contributing its n=5 most central members by TRUE cosine — the
    corpus-curation move behind per-topic inspection sets and
    cluster-proportional subsetting, where every topic is represented
    regardless of its size. At 100 TB: one broadcast centroid table, a
    map-only argmax over the corpus, a per-cell top-n window (k cells
    bound the skew) — no pairwise anything."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = sim.ivf_exact_mean_centroids(
        sim.md5_train_sample(e), k=16
    ).localCheckpoint(eager=False)
    return sim.cluster_representatives(e, cent, n=5).orderBy("cell", "rank")


_ANN_TRUNCATED_ORACLE = f"""
WITH tr0 AS (SELECT vec_id, list_slice(embedding, 1, 32) AS t FROM embeddings),
tr AS (
  SELECT vec_id,
    CASE WHEN {_duck_dot('t', 't')} = 0 THEN t
    ELSE list_transform(t, x -> CAST(CAST(x AS DOUBLE)
      / sqrt({_duck_dot('t', 't')}) AS FLOAT)) END AS embedding
  FROM tr0
),
q AS (SELECT vec_id AS query_id, embedding AS q_vec,
             sqrt({_duck_dot('embedding', 'embedding')}) AS qn
      FROM tr WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, embedding AS n_vec,
             sqrt({_duck_dot('embedding', 'embedding')}) AS cn
      FROM tr),
scored AS (
  SELECT query_id, neighbor_id, ({_duck_dot('q_vec', 'n_vec')}) / (qn * cn) AS cosine
  FROM c, q WHERE query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
SELECT query_id, neighbor_id, rnk, cosine FROM r WHERE rnk <= 10
"""


@query("ann_topk_truncated", _ANN_TRUNCATED_ORACLE)
def ann_topk_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-tier search: exhaustive top-10 over 32-dim truncated
    renormalized embeddings (similarity.truncate_normalize) — half the
    fold cost per pair; recall vs full-dim gated in pytest. Same
    broadcast-queries plan as brute force."""
    e = load_table(spark, sf_dir, "embeddings")
    tr = sim.truncate_normalize(e, 32)
    q = tr.filter(F.col("vec_id") % 50 == 0)
    out = sim.brute_force_topk(tr, q, k=10)
    return out.withColumnRenamed("rank", "rnk")


_ANN_QUANTIZED_ORACLE = """
WITH sc AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
  FROM embeddings
),
qz0 AS (
  SELECT vec_id,
    CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS INTEGER))
    ELSE list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) / s * 127 + 0.5) AS INTEGER)) END AS qvec
  FROM sc
),
qz AS (
  SELECT vec_id, qvec,
    sqrt(CAST(CAST(list_sum(list_transform(qvec, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS DOUBLE)) AS qn
  FROM qz0
),
q AS (SELECT vec_id AS query_id, qvec AS qv, qn AS qqn FROM qz WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, qvec AS cv, qn AS cqn FROM qz),
scored AS (
  SELECT query_id, neighbor_id,
    CAST(CAST(list_sum(list_transform(list_zip(qv, cv), p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT) AS DOUBLE)
      / (qqn * cqn) AS qcos
  FROM c, q WHERE query_id <> neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS rnk
      FROM scored)
SELECT query_id, neighbor_id, rnk, qcos FROM r WHERE rnk <= 10
"""


def _duck_pq_exprs(m: int, ksub: int, dim: int) -> dict:
    """Shared expression fragments for the PQ-family oracles
    (_duck_pq_oracle, _duck_ivf_pq_oracle), factored ONCE so the two
    gates cannot drift — a fix applied to one restatement necessarily
    reaches the other. Every fold restates the Spark operation order.
    The LUT fold reads the query vector via the ``q_vec`` alias (both
    oracles alias it before building LUTs)."""
    d = dim // m

    def fold(prods: str) -> str:
        return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {prods}),"
                f" (acc, x) -> acc + x)")

    return {
        "d": d,
        "sums": ", ".join(
            f"CAST(SUM(CAST(round(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS s{i}"
            for i in range(dim)
        ),
        "comps": ", ".join(f"CAST(s{i} AS DOUBLE) / 1000000.0 / n" for i in range(dim)),
        "sub_sums": ", ".join(
            f"CAST(SUM(CAST(round(CAST(sv[{i + 1}] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS s{i}"
            for i in range(d)
        ),
        "sub_comps": ", ".join(f"CAST(s{i} AS DOUBLE) / 1000000.0 / n" for i in range(d)),
        "l2_sv": fold(
            f"list_transform(generate_series(1, {d}), i ->"
            f" (CAST(sv[i] AS DOUBLE) - c.cvec[i]) * (CAST(sv[i] AS DOUBLE) - c.cvec[i]))"
        ),
        "l2_emb": fold(
            f"list_transform(generate_series(1, {d}), i ->"
            f" (CAST(embedding[s * {d} + i] AS DOUBLE) - c.cvec[i])"
            f" * (CAST(embedding[s * {d} + i] AS DOUBLE) - c.cvec[i]))"
        ),
        "cnorm2": fold(
            f"list_transform(generate_series(1, {d}), i -> cvec[i] * cvec[i])"
        ),
        "lut_emb": fold(
            f"list_transform(generate_series(1, {d}), i ->"
            f" CAST(embedding[c.sub * {d} + i] AS DOUBLE) * c.cvec[i])"
        ),
        "lut_qvec": fold(
            f"list_transform(generate_series(1, {d}), i ->"
            f" CAST(q_vec[c.sub * {d} + i] AS DOUBLE) * c.cvec[i])"
        ),
        "adc_sum": fold(
            f"list_transform(generate_series(0, {m - 1}), s ->"
            f" luts[s * {ksub} + codes[s + 1] + 1])"
        ),
        "rnorm_sum": fold(
            f"list_transform(generate_series(0, {m - 1}), s ->"
            f" cb.cb[s * {ksub} + codes[s + 1] + 1].cnorm2)"
        ),
    }


def _duck_pq_train_encode_ctes(m: int, ksub: int, dim: int, steps: int,
                               train_where: str, e: dict,
                               between: str = "") -> str:
    """The codebook-training + corpus-encode CTE chain (centsum ->
    cent0 [-> between] -> cbe0/subs -> refine steps -> cbf/cbl ->
    enc0/enc) shared VERBATIM by both PQ oracles. ``train_where``
    restricts only the TRAINING CTEs (centsum, subs) — encode always
    scans every vector. ``between`` inserts extra CTEs after cent0
    (the IVF oracle's centroid/cents tables, which slice the same
    means — exactly how the Spark lane reuses them via
    pq_codebook(means=))."""
    d = e["d"]
    # the refinement steps unroll into CTE layers
    refine = ""
    for t in range(1, steps + 1):
        refine += f"""
cbl{t - 1} AS (SELECT list({{'sub': sub, 'code': code, 'cvec': cvec}} ORDER BY sub, code) AS cb FROM cbe{t - 1}),
asg{t} AS (
  SELECT sub,
    list_min(list_transform(list_filter(cb.cb, c -> c.sub = sub),
      c -> {{'dist': {e["l2_sv"]}, 'code': c.code}})).code AS code,
    sv
  FROM subs, cbl{t - 1} cb
),
msum{t} AS (SELECT sub, code, COUNT(*) AS n, {e["sub_sums"]} FROM asg{t} GROUP BY sub, code),
mref{t} AS (SELECT sub, code, [{e["sub_comps"]}] AS cvec FROM msum{t}),
cbe{t} AS (
  SELECT p.sub AS sub, p.code AS code, COALESCE(r.cvec, p.cvec) AS cvec
  FROM cbe{t - 1} p LEFT JOIN mref{t} r ON p.sub = r.sub AND p.code = r.code
),"""
    return f"""WITH centsum AS (
  SELECT vec_id % {ksub} AS cent_id, COUNT(*) AS n, {e["sums"]}
  FROM embeddings {train_where} GROUP BY cent_id),
cent0 AS (SELECT cent_id, [{e["comps"]}] AS c_vec FROM centsum),{between}
cbe0 AS (
  SELECT g.s AS sub, CAST(cent_id AS INTEGER) AS code,
         list_slice(c_vec, g.s * {d} + 1, g.s * {d} + {d}) AS cvec
  FROM cent0, generate_series(0, {m - 1}) g(s)
),
subs AS (
  SELECT g.s AS sub, list_slice(embedding, g.s * {d} + 1, g.s * {d} + {d}) AS sv
  FROM embeddings, generate_series(0, {m - 1}) g(s) {train_where}
),{refine}
cbf AS (SELECT sub, code, cvec, {e["cnorm2"]} AS cnorm2 FROM cbe{steps}),
cbl AS (SELECT list({{'sub': sub, 'code': code, 'cvec': cvec, 'cnorm2': cnorm2}} ORDER BY sub, code) AS cb FROM cbf),
enc0 AS (
  SELECT vec_id AS id,
    list_transform(generate_series(0, {m - 1}), s ->
      list_min(list_transform(list_filter(cb.cb, c -> c.sub = s),
        c -> {{'dist': {e["l2_emb"]}, 'code': c.code}})).code) AS codes
  FROM embeddings, cbl cb
),
enc AS (
  SELECT id, codes, sqrt({e["rnorm_sum"]}) AS rnorm
  FROM enc0, cbl cb
),"""


def _duck_pq_oracle(m: int = 16, ksub: int = 16, dim: int = 64,
                    steps: int = 2, rerank: int = 100, k: int = 10,
                    sampled_train: bool = False) -> str:
    """Oracle for the PQ tier (similarity.pq_codebook/pq_refine/
    pq_encode/pq_topk): every stage is restated with the SAME
    sequential fold order — integer-scaled means (order-free), argmin
    L2 with struct-min tie-break, LUT sums in sub-space order, exact
    rerank cosine — so the doubles are bit-identical.
    ``sampled_train`` restricts the codebook-fitting CTEs (centsum,
    subs) to the md5_train_sample draw — encode/ADC/rerank still scan
    every vector, mirroring the train-on-sample production shape."""
    e = _duck_pq_exprs(m, ksub, dim)
    train_where = f"WHERE {_duck_train_where()}" if sampled_train else ""
    ctes = _duck_pq_train_encode_ctes(m, ksub, dim, steps, train_where, e)
    return f"""
{ctes}
q AS (
  SELECT vec_id AS query_id, embedding AS q_vec,
    sqrt({_duck_dot('embedding', 'embedding')}) AS qnorm,
    list_transform(cb.cb, c -> {e["lut_qvec"]}) AS luts
  FROM (SELECT vec_id, embedding, embedding AS q_vec FROM embeddings WHERE vec_id % 50 = 0), cbl cb
),
adc AS (
  SELECT query_id, id AS neighbor_id, ({e["adc_sum"]}) / (qnorm * rnorm) AS qcos
  FROM enc, q WHERE query_id <> id
),
cand AS (SELECT query_id, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS r
  FROM adc) WHERE r <= {rerank}),
ex AS (
  SELECT cand.query_id, cand.neighbor_id,
    ({_duck_dot('q.q_vec', 'e2.embedding')})
      / (q.qnorm * sqrt({_duck_dot('e2.embedding', 'e2.embedding')})) AS cosine
  FROM cand JOIN q USING (query_id) JOIN embeddings e2 ON e2.vec_id = cand.neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM ex)
SELECT query_id, neighbor_id, rnk, cosine FROM r WHERE rnk <= {k}
"""


@query("ann_topk_pq", _duck_pq_oracle(sampled_train=True))
def ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization tier (similarity.pq_*): the corpus
    compresses to 16 4-dim codebook codes per vector (codebook = one
    integer-exact Lloyd init + 2 deterministic refinement steps,
    FITTED ON the deterministic 25% md5_train_sample draw — the
    production train-on-sample shape; encode and ADC still scan every
    vector), ADC scoring against per-query LUTs selects a top-100
    candidate pool, and exact cosine reranks the pool to the final
    top-10 — FAISS's PQ-with-refine ladder rung between int8 SQ and
    IVF cells (Jégou et al., TPAMI 2011). Recall@10 vs brute force
    gates at 0.9 in pytest; corpus-wide scoring touches only the
    16-byte codes.

    Cost note: this row RE-TRAINS AND RE-ENCODES the corpus per run by
    contract — it oracle-gates the composed train/encode/ADC math and
    prices the one-time build (hence its deliberate O(N) bench cost
    and ~1.0 scale exponent). The shippable serving cost is the probe
    of a persisted cell-partitioned index (similarity.
    ivf_pq_topk_indexed, pytest-pinned indexed == inline in
    tests/test_custom_ops.py::TestIvfPqPersistedIndex and measured
    flat in the streamed maintainer, SCALE_MAINTAINER.json); it has no
    registry row because the bench contract forbids intermediates
    cached across invocations, which is precisely what a persisted
    index is."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    tr = sim.md5_train_sample(e)
    cb = sim.pq_refine(
        tr, sim.pq_codebook(tr, m=16, ksub=16), steps=2, m=16, ksub=16
    )  # refine's final step is already checkpoint-pinned
    out = sim.pq_topk(e, q, k=10, m=16, ksub=16, codebook=cb, rerank=100)
    return out.withColumnRenamed("rank", "rnk")


def _duck_ivf_pq_oracle(n_cells: int = 16, nprobe: int = 4, m: int = 8,
                        ksub: int = 16, dim: int = 64, steps: int = 2,
                        rerank: int = 100, k: int = 10) -> str:
    """Oracle for the composed IVF x PQ tier (similarity.ivf_pq_topk):
    BOTH trains run on the md5_train_sample draw — the integer-exact
    Lloyd step gives the centroid table AND (sliced) the PQ codebook
    init (with n_cells == ksub they are literally the same aggregation,
    exactly as pq_codebook reuses ivf_exact_mean_centroids); two
    deterministic refine steps, then cell-assign + encode every vector,
    probe nprobe cells per query, ADC over probed cells only, exact
    rerank of the top-`rerank` pool. The training/encode CTE chain and
    every fold are the SHARED builders (_duck_pq_exprs /
    _duck_pq_train_encode_ctes), so this oracle and ann_topk_pq's
    cannot drift."""
    assert n_cells == ksub, "shared centsum CTE assumes n_cells == ksub"
    e = _duck_pq_exprs(m, ksub, dim)
    between = f"""
cent AS (SELECT cent_id, c_vec, sqrt({_duck_dot('c_vec', 'c_vec')}) AS c_norm FROM cent0),
cents AS (SELECT list({{'cent_id': cent_id, 'c_vec': c_vec, 'c_norm': c_norm}} ORDER BY cent_id) AS cents FROM cent),"""
    ctes = _duck_pq_train_encode_ctes(
        m, ksub, dim, steps, f"WHERE {_duck_train_where()}", e, between=between
    )
    return f"""
{ctes}
assigned AS (
  SELECT vec_id AS id,
         list_max(list_transform(cents.cents,
           c -> {{'cos': {_duck_ivf_assign_score()}, 'cell': c.cent_id}})).cell AS cell
  FROM embeddings, cents
),
celled AS (SELECT enc.id, assigned.cell, enc.codes, enc.rnorm FROM enc JOIN assigned USING (id)),
q AS (SELECT vec_id AS query_id, embedding AS q_vec,
             sqrt({_duck_dot('embedding', 'embedding')}) AS qnorm
      FROM embeddings WHERE vec_id % 50 = 0),
qs AS (SELECT query_id, q_vec, qnorm, cent_id, {_duck_cosine('q_vec', 'c_vec')} AS c_cos FROM q, cent),
probes AS (
  SELECT query_id, q_vec, qnorm, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c_cos DESC, cent_id) AS r FROM qs
  ) WHERE r <= {nprobe}
),
probes_l AS (
  SELECT query_id, qnorm, cell, list_transform(cb.cb, c -> {e["lut_qvec"]}) AS luts
  FROM probes, cbl cb
),
adc AS (
  SELECT query_id, p.cell AS cell, id AS neighbor_id,
         ({e["adc_sum"]}) / (qnorm * rnorm) AS qcos
  FROM celled c JOIN probes_l p ON c.cell = p.cell AND query_id <> id
),
cand AS (SELECT query_id, cell, neighbor_id FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id) AS r
  FROM adc) WHERE r <= {rerank}),
ex AS (
  SELECT cand.query_id, cand.cell, cand.neighbor_id,
    ({_duck_dot('q.q_vec', 'e2.embedding')})
      / (q.qnorm * sqrt({_duck_dot('e2.embedding', 'e2.embedding')})) AS cosine
  FROM cand JOIN q USING (query_id) JOIN embeddings e2 ON e2.vec_id = cand.neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM ex)
SELECT query_id, cell, neighbor_id, rnk, cosine FROM r WHERE rnk <= {k}
"""


@query("ann_topk_ivf_pq", _duck_ivf_pq_oracle())
def ann_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed 100 TB vector rung (similarity.ivf_pq_topk): IVF
    cells bound WHICH rows score, PQ codes bound WHAT scoring touches.
    Both trains (centroid table AND codebook) fit on the deterministic
    25% md5_train_sample draw and are passed in via the reuse params
    (centroids= / codebook=) — the persisted-index production shape:
    train once, reuse across ingests and searches. Queries probe their
    4 best of 16 cells, ADC scores only probed cells' 8-byte codes,
    exact cosine reranks the top-100 pool to the final top-10. Recall
    floor vs brute force gated in pytest (tests/test_custom_ops.py).

    Cost note: the INLINE tier re-encodes the corpus per run by
    contract (it oracle-gates the composed math; the 30x sweep's one
    ~linear step is exactly this inline encode). The shippable serving
    cost is the persisted-index probe (similarity.ivf_pq_topk_indexed
    — same results, pytest-pinned indexed == inline); it has no
    registry row because the bench contract forbids intermediates
    cached across invocations — see ann_topk_pq's cost note."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    tr = sim.md5_train_sample(e)
    cent = sim.ivf_exact_mean_centroids(tr, k=16).localCheckpoint(eager=False)
    # n_cells == ksub: the pinned centroid table doubles as the
    # codebook init (means=), so the 64-sum training agg runs ONCE
    cb = sim.pq_refine(
        tr, sim.pq_codebook(tr, m=8, ksub=16, means=cent),
        steps=2, m=8, ksub=16,
    )  # refine's final step is already checkpoint-pinned
    out = sim.ivf_pq_topk(
        e, q, k=10, nprobe=4, n_cells=16, m=8, ksub=16,
        centroids=cent, codebook=cb, rerank=100,
    )
    return out.withColumnRenamed("rank", "rnk")


@query("ann_topk_quantized", _ANN_QUANTIZED_ORACLE)
def ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive top-10 over the int8-quantized corpus (SQ8 tier:
    similarity.quantize_int8 + quantized_topk). The pair score is an
    exact integer fold / precomputed norms — at 100 TB the 4-byte
    quantized vectors are the resident search set (4x smaller shuffle
    and cache footprint than fp32); a pytest gate bounds the recall
    loss vs exact brute force."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    out = sim.quantized_topk(e, q, k=10)
    return out.withColumnRenamed("rank", "rnk")


# ---------------------------------------------------------------------------
# Kafka/Debezium envelope sink (sinks/debezium.py) + multimodal plumbing
# (functions/multimodal.py)
# ---------------------------------------------------------------------------

from dtle_spark.functions import multimodal as mm  # noqa: E402


@query(
    "video_frame_sample",
    """
    SELECT doc_id, 'mjpn' AS format,
           CAST(1 + doc_id % 5 AS INT) AS n_frames,
           CAST(g.idx AS INT) AS frame_idx,
           CAST(1 + (doc_id * 31 + g.idx) % 64 AS INT) AS width,
           CAST(1 + (doc_id * 17 + g.idx * 3) % 64 AS INT) AS height
    FROM documents, generate_series(0, 4, 2) g(idx)
    WHERE g.idx < 1 + doc_id % 5
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling differential: synthesize a REAL container
    (MJPN: length-prefixed real PNG frames, dims/frame-count =
    f(doc_id)) per doc in one mapInPandas stage, then walk the
    container, sample every 2nd frame, and read each sampled frame's
    dims from its PNG header in another. The oracle recomputes
    everything from the formulas, so a hash match proves
    mux -> container walk -> stride sample -> frame header parse is
    the identity through genuine bytes — the video plumbing tier with
    no codec library (compressed video stays the loud ffmpeg seam)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = mm.synthesize_video_media(d)
    return mm.extract_video_frame_features(media, stride=2)


@query(
    "image_header_roundtrip",
    """
    SELECT doc_id, 'png' AS format,
           CAST(1 + doc_id % 64 AS INT) AS width,
           CAST(1 + (doc_id * 7) % 64 AS INT) AS height
    FROM documents
    """,
)
def image_header_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec differential: synthesize a REAL PNG per doc (stdlib
    encoder, dims = f(doc_id)) in one mapInPandas stage, then parse the
    binary headers back with the pure-stdlib container parser
    (functions/multimodal.py parse_image_header) in another. The oracle
    recomputes dims directly from the formula, so a hash match proves
    generate->parse is the identity through genuine PNG bytes — the
    multimodal metadata tier with no codec library."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = mm.synthesize_png_media(d)
    return mm.extract_image_features(media).select(
        "doc_id", "format", "width", "height"
    )
from dtle_spark.sinks import debezium as dz  # noqa: E402


def _duck_orders_row_json(key: str, price: str) -> str:
    """DuckDB mirror of the envelope's encoded after/before image."""
    days = "(CAST(o_orderdate AS DATE) - DATE '1970-01-01')"
    return (
        "'{\"o_orderkey\":' || " + key + " || "
        "',\"price_cents\":' || CAST(round((" + price + ") * 100) AS BIGINT) || "
        "',\"orderdate_days\":' || " + days + " || "
        "',\"status\":\"' || o_orderstatus || '\"}'"
    )


def _duck_envelope(before_json: str, after_json: str, op: str, seq: str, gno: str) -> str:
    src = (
        "'{\"name\":\"dtle_spark\",\"db\":\"db1\",\"table\":\"orders\","
        "\"snapshot\":false,\"server_id\":\"" + cdc_demo.SID_A + "\",\"gno\":' || "
        + gno
        + " || '}'"
    )
    return (
        "'{\"before\":' || " + before_json + " || ',\"after\":' || " + after_json
        + " || ',\"source\":' || " + src + " || ',\"op\":\"" + op + "\",\"ts_ms\":' || "
        + seq + " || '}'"
    )


def _duck_debezium_sql() -> str:
    key_json = "'{\"o_orderkey\":' || o_orderkey || '}'"
    key_json_moved = "'{\"o_orderkey\":' || (o_orderkey + 10000000) || '}'"
    row = _duck_orders_row_json("o_orderkey", "o_totalprice")
    row2 = _duck_orders_row_json("o_orderkey", "o_totalprice * 2")
    row_moved = _duck_orders_row_json("(o_orderkey + 10000000)", "o_totalprice")
    null_json = "'null'"
    ins_env = _duck_envelope(null_json, row, "c", "o_orderkey*10+1", "o_orderkey")
    upd_env = _duck_envelope(row, row2, "u", "o_orderkey*10+2", "o_orderkey")
    mov_env = _duck_envelope(row, row_moved, "u", "o_orderkey*10+4", "o_orderkey")
    del_env = _duck_envelope(row, null_json, "d", "o_orderkey*10+3", "o_orderkey")
    parts = []
    # inserts (twice for keys %10=0: the sink does NOT dedupe re-delivery)
    for flt in ["o_orderkey % 5 = 0", "o_orderkey % 10 = 0"]:
        parts.append(
            f"SELECT 'dtle.db1.orders' AS topic, {key_json} AS key, "
            f"{ins_env} AS value FROM orders WHERE {flt}"
        )
    parts.append(
        f"SELECT 'dtle.db1.orders', {key_json}, {upd_env} "
        f"FROM orders WHERE o_orderkey % 7 = 0"
    )
    parts.append(
        f"SELECT 'dtle.db1.orders', {key_json_moved}, {mov_env} "
        f"FROM orders WHERE o_orderkey % 17 = 0"
    )
    parts.append(
        f"SELECT 'dtle.db1.orders', {key_json}, {del_env} "
        f"FROM orders WHERE o_orderkey % 11 = 0"
    )
    # delete tombstone: same key, null value (log-compaction purge,
    # reference kafka3.go:1021-1036)
    parts.append(
        f"SELECT 'dtle.db1.orders', {key_json}, CAST(NULL AS VARCHAR) "
        f"FROM orders WHERE o_orderkey % 11 = 0"
    )
    return " UNION ALL ".join(parts)


@query("debezium_envelope", _duck_debezium_sql())
def debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/K3: Debezium-style (topic, key, value) frames for the demo
    change stream — epoch-days dates, scaled-int money, explicit nulls
    (sinks/debezium.py; reference kafka2.go:135-331, kafka3.go:867-1063)."""
    changes = cdc_demo.orders_changes(spark, sf_dir)
    fields = [
        ("o_orderkey", lambda w: F.col(f"{w}.o_orderkey")),
        ("price_cents", lambda w: F.round(F.col(f"{w}.o_totalprice") * 100).cast("long")),
        ("orderdate_days", lambda w: dz.encode_date_epoch_days(F.col(f"{w}.o_orderdate"))),
        ("status", lambda w: F.col(f"{w}.o_orderstatus")),
    ]
    return dz.envelope(changes, ["o_orderkey"], fields, topic_prefix="dtle")


@query(
    "multimodal_features",
    """
    SELECT doc_id,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS checksum,
      CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS INTEGER) AS width,
      CAST((strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the real mapInPandas
    plumbing (Arrow batches, declared schema); the decode itself is the
    documented deterministic stub (functions/multimodal.py)."""
    d = load_table(spark, sf_dir, "documents")
    return mm.extract_features(mm.attach_fake_payload(d))


# ---------------------------------------------------------------------------
# Analytics surface, batch 2: multi-join, set ops, grouping sets, pivot,
# existential joins — the groupBy/join algebra SURVEY §2.6 notes the
# reference lacks entirely.
# ---------------------------------------------------------------------------


@query(
    "q5_region_revenue",
    """
    SELECT r_name,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
      COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN supplier ON s_nationkey = n_nationkey
    JOIN lineitem ON l_suppkey = s_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: a 5-table star join. region/nation/supplier are
    tiny -> broadcast chain; the only shuffle joins lineitem⋈orders on
    the orderkey. At 100 TB: orders and lineitem co-bucketed on orderkey
    would kill that shuffle too (bucketBy in the lake layout)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))))
                .cast("double") / F.lit(10000.0)
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q6_revenue_delta",
    """
    SELECT
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS forecast_revenue,
      COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — entirely pushdown + one-stage
    partial agg; the canonical 'did the filters reach the scan' check."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice")) * _cents(F.col("l_discount")))
                .cast("double") / F.lit(10000.0)
            ).alias("forecast_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "set_ops_customers",
    """
    WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
    big_buyers AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000),
    all_cust AS (SELECT c_custkey AS k FROM customer)
    SELECT 'never_ordered' AS cohort, k FROM (SELECT k FROM all_cust EXCEPT SELECT k FROM buyers)
    UNION ALL
    SELECT 'small_only', k FROM (SELECT k FROM buyers EXCEPT SELECT k FROM big_buyers)
    UNION ALL
    SELECT 'big', k FROM (SELECT k FROM buyers INTERSECT SELECT k FROM big_buyers)
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra (EXCEPT/INTERSECT/UNION) — customer cohorts."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load_table(spark, sf_dir, "orders")
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    big = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("k")).distinct()
    never = c.exceptAll(buyers).distinct().select(F.lit("never_ordered").alias("cohort"), "k")
    small = buyers.exceptAll(big).distinct().select(F.lit("small_only").alias("cohort"), "k")
    bigc = buyers.intersect(big).select(F.lit("big").alias("cohort"), "k")
    return never.unionByName(small).unionByName(bigc)


@query(
    "rollup_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
      COUNT(*) AS n,
      CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP lattice (status, priority) -> one-pass multi-level agg."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(_cents(F.col("o_totalprice"))).cast("double") / F.lit(100.0)).alias("total"),
    )


@query(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a fixed column set (portable as conditional counts)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@query(
    "exists_semi_anti",
    """
    SELECT
      (SELECT COUNT(*) FROM part p WHERE EXISTS
        (SELECT 1 FROM lineitem WHERE l_partkey = p.p_partkey AND l_quantity > 45)) AS parts_with_bulk,
      (SELECT COUNT(*) FROM part p WHERE NOT EXISTS
        (SELECT 1 FROM lineitem WHERE l_partkey = p.p_partkey)) AS parts_never_sold
    """,
)
def exists_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS semantics in ONE declarative plan: lineitem
    pre-aggregates to per-part flags (one shuffle on partkey), then a
    single left join + conditional counts — no driver-side actions, no
    double scan."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    flags = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.max((F.col("l_quantity") > 45).cast("int")).alias("has_bulk")
    )
    joined = p.join(flags, p.p_partkey == F.col("k"), "left")
    return joined.agg(
        F.sum(F.coalesce(F.col("has_bulk"), F.lit(0))).alias("parts_with_bulk"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("parts_never_sold"),
    )


# ---------------------------------------------------------------------------
# Custom operators Spark lacks natively: as-of join, range join,
# iterative connected-components dedup clustering
# ---------------------------------------------------------------------------

from dtle_spark.functions.graph import connected_components_auto as connected_components  # noqa: E402
from dtle_spark.operators.asof import asof_join_backward, range_join_bucketed  # noqa: E402


@query(
    "asof_click_attribution",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           c.event_id AS r_event_id, epoch_us(c.ts) AS r_ts_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase attributed to the
    user's latest click at-or-before it — the union-window composition;
    oracle is DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = asof_join_backward(p, c, key="user_id", ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("r_event_id"),
        F.unix_micros("r_ts").alias("r_ts_us"),
    )


@query(
    "range_join_value_tiers",
    """
    WITH tiers(tier, lo, hi) AS (VALUES
      ('micro', 0.0, 25.0), ('small', 25.0, 75.0),
      ('mid', 75.0, 150.0), ('large', 150.0, 400.0))
    SELECT tier, COUNT(*) AS n,
      CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
    FROM events JOIN tiers ON value >= lo AND value < hi
    GROUP BY tier
    """,
)
def range_join_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/asof.py): interval membership as a
    bucket-equi join + residual filter instead of a nested loop."""
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("micro", 0.0, 25.0), ("small", 25.0, 75.0), ("mid", 75.0, 150.0), ("large", 150.0, 400.0)],
        "tier string, lo double, hi double",
    )
    joined = range_join_bucketed(ev, tiers, "value")
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias("total_value"),
    )


@query(
    "skew_salted_join_spend",
    """
    WITH spend AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT s.spend_cents // 100000 AS spend_band,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN spend s ON e.user_id = s.user_id
    GROUP BY spend_band
    """,
)
def skew_salted_join_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skewjoin.py): the full event stream
    (big, hot users concentrate traffic) joined to per-user purchase
    totals (dimension-sized) on a deterministically salted key, then
    rolled up into spend bands. The oracle is the PLAIN join — the
    salt must be invisible in the result; what it buys is that at
    100 TB a single hot user's events spread over n_salts reducers
    instead of one straggler (AQE skew-split only reaches sort-merge
    shuffles; the salt works under any strategy, including when the
    small side broadcasts)."""
    from dtle_spark.operators.skewjoin import salted_join

    ev = load_table(spark, sf_dir, "events")
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(_cents(F.col("value"))).alias("spend_cents"))
    )
    joined = salted_join(ev, spend, on="user_id", n_salts=8)
    return joined.groupBy(
        F.expr("spend_cents DIV 100000").alias("spend_band")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _duck_cc_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_duck_minhash_sql()}),
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a
    )
    SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    """


def _duck_split_sql(num: int = 1, denom: int = 10) -> str:
    """Oracle for the leakage-safe split: CC transitive closure (the
    dedup_clusters oracle) -> unit = cluster min-id (or own id) ->
    the corpus md5 40-bit integer draw on the UNIT."""
    from dtle_spark.functions.corpus import hash_uniform_expr

    draw = hash_uniform_expr("unit_id", "duckdb")
    return f"""
    WITH RECURSIVE pairs AS ({_duck_minhash_sql()}),
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a
    ),
    comp AS (SELECT node, MIN(r) AS unit FROM reach GROUP BY node),
    u AS (
      SELECT d.doc_id, CAST(COALESCE(c.unit, d.doc_id) AS BIGINT) AS unit_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, unit_id,
      CASE WHEN ({draw}) * {denom} < {num} * {1 << 40} THEN 'val'
           ELSE 'train' END AS split
    FROM u
    """


@query("leakage_safe_split", _duck_split_sql())
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split whose unit is the near-dup CLUSTER: members of
    a duplicate cluster draw from the cluster representative, so
    near-duplicates never straddle the split (the eval-contamination
    mode per-document hash splits miss — Lee et al. 2022). Composes
    two oracle-gated stages: CC over LSH pairs + the corpus integer
    draw (functions/corpus.leakage_safe_split)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5)
    clusters = connected_components(pairs).localCheckpoint(eager=False)
    return cp.leakage_safe_split(d, clusters)


def _duck_canonical_sql() -> str:
    """Oracle for canonical-doc selection: CC transitive closure ->
    unit = cluster (or own id) -> highest quality_score wins the unit
    (ties to the lowest doc_id). Reuses the quality_score oracle's
    exact double-op order so the scores hash-gate."""
    return f"""
    WITH RECURSIVE pairs AS ({_duck_minhash_sql()}),
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a
    ),
    comp AS (SELECT node, MIN(r) AS unit FROM reach GROUP BY node),
    q AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks, text
      FROM documents
    ),
    scored AS (
      SELECT doc_id, {_QUALITY_EXPR_DUCK} AS quality FROM q
    ),
    u AS (
      SELECT s.doc_id, CAST(COALESCE(c.unit, s.doc_id) AS BIGINT) AS cluster_id,
             s.quality
      FROM scored s LEFT JOIN comp c ON s.doc_id = c.node
    )
    SELECT doc_id, cluster_id, quality,
           (row_number() OVER (PARTITION BY cluster_id
                               ORDER BY quality DESC, doc_id) = 1) AS is_canonical
    FROM u
    """


@query("canonical_docs", _duck_canonical_sql())
def canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: within each near-dup
    cluster, the highest quality_score doc is the keeper (ties to the
    lowest id; singletons keep themselves) — dedup pipelines retain
    the canonical and drop the rest, so WHICH member survives is a
    quality decision, not an arbitrary one (min-id or first-seen keeps
    whatever crawled first)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5)
    clusters = connected_components(pairs).localCheckpoint(eager=False)
    c = clusters.select(
        F.col("node").alias("doc_id"), F.col("component").alias("__unit")
    )
    scored = d.select(
        "doc_id", tx.quality_score(F.col("text")).alias("quality")
    ).join(c, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("__unit"), F.col("doc_id")).cast("long")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return scored.select(
        "doc_id", "cluster_id", "quality",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )


def _duck_unigram_cte() -> str:
    """Shared CTE block for the unigram-LM oracles (unigram_commonness
    and perplexity_buckets hash against the SAME token/frequency/bits
    pipeline — one copy so they cannot drift)."""
    return f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest({_duck_toks()}) AS term FROM documents
    ),
    freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    bits AS (SELECT term, CAST(length(to_base(cnt, 2)) - 1 AS BIGINT) AS bits FROM freq),
    d AS (
      SELECT id, COUNT(*) AS n_tokens, CAST(SUM(bits) AS BIGINT) AS info_bits
      FROM tok JOIN bits USING (term) GROUP BY id
    )"""


@query(
    "perplexity_buckets",
    f"""{_duck_unigram_cte()},
    u AS (
      SELECT doc_id AS id,
             CASE WHEN COALESCE(d.n_tokens, 0) = 0 THEN 0.0
                  ELSE CAST(d.info_bits AS DOUBLE) / d.n_tokens END AS mean_bits
      FROM documents LEFT JOIN d ON documents.doc_id = d.id
    ),
    t AS (
      SELECT id, mean_bits,
             CAST(ntile(3) OVER (ORDER BY mean_bits DESC, id) AS BIGINT) AS bucket
      FROM u
    )
    SELECT id, mean_bits, bucket,
           CASE WHEN bucket = 1 THEN 'head'
                WHEN bucket = 2 THEN 'middle'
                ELSE 'tail' END AS band
    FROM t
    """,
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail partition over the integer-exact
    unigram-LM commonness score (Wenzek et al. 2020) — pipelines
    sample the bands at different rates rather than hard-filtering
    (functions/textstats.perplexity_buckets; thresholds-from-a-sample
    is the map-only 100 TB tier, noted there)."""
    d = load_table(spark, sf_dir, "documents")
    return tx.perplexity_buckets(d, "doc_id", "text")


def _duck_ppl_sampled_oracle(buckets: int = 3) -> str:
    """Oracle for the sampled-threshold perplexity lane
    (textstats.perplexity_buckets_sampled): same unigram CTE block as
    the ntile lane, thresholds = quantile_cont over the deterministic
    25% md5 draw (Spark's exact `percentile` and DuckDB's quantile_cont
    share the sort-and-interpolate definition; the FRACTION literals
    are generated from the same Python expression `1 - i/buckets` so
    both engines receive bit-identical probe points — NB `1 - 1/3` and
    `2/3` differ by one ULP in binary), then map-only banding by
    strict-< threshold counts. Bucket outputs are ULP-robust: an
    interpolated threshold lies strictly between two distinct adjacent
    scores, and exact-rank thresholds equal a score exactly in both
    engines."""
    from dtle_spark.functions.textstats import BAND_SAMPLE_HEX

    nibbles = ", ".join(f"'{c}'" for c in BAND_SAMPLE_HEX)
    qs = ", ".join(
        f"quantile_cont(mean_bits, CAST({1 - i / buckets} AS DOUBLE))"
        for i in range(1, buckets)
    )
    cases = " + ".join(
        f"(CASE WHEN mean_bits < ts[{i}] THEN 1 ELSE 0 END)"
        for i in range(1, buckets)
    )
    return f"""{_duck_unigram_cte()},
    u AS (
      SELECT doc_id AS id,
             CASE WHEN COALESCE(d.n_tokens, 0) = 0 THEN 0.0
                  ELSE CAST(d.info_bits AS DOUBLE) / d.n_tokens END AS mean_bits
      FROM documents LEFT JOIN d ON documents.doc_id = d.id
    ),
    th AS (
      SELECT [{qs}] AS ts FROM u
      WHERE substring(md5(CAST(id AS VARCHAR)), 1, 1) IN ({nibbles})
    ),
    b AS (
      SELECT id, mean_bits, CAST(1 + {cases} AS BIGINT) AS bucket
      FROM u, th
    )
    SELECT id, mean_bits, bucket,
           CASE WHEN bucket = 1 THEN 'head'
                WHEN bucket = 2 THEN 'middle'
                ELSE 'tail' END AS band
    FROM b
    """


@query("perplexity_bands_sampled", _duck_ppl_sampled_oracle())
def perplexity_bands_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB lane of perplexity_buckets, oracle-gated end-to-end:
    thresholds fitted ONCE via exact percentile over the deterministic
    25% md5 sample of the scores (CCNet fits its bands on a reference
    sample the same way), then banding is pure Column arithmetic — no
    global single-partition sort anywhere (the ntile lane's scale
    ceiling). Map-only banding plan pinned in pytest
    (tests/test_custom_ops.py TestPerplexityBandsSampled)."""
    d = load_table(spark, sf_dir, "documents")
    return tx.perplexity_buckets_sampled(d, "doc_id", "text")


@query("dedup_clusters", _duck_cc_sql())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative operator: connected components over the verified
    near-dup pairs -> duplicate groups with a canonical representative
    (functions/graph.py min-label propagation; oracle = DuckDB
    recursive-CTE transitive closure)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5)
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# Training-data surface, batch 2: embedding near-dup, BPE-ish token
# counting, winnowing fingerprints; plus a correlated-subquery shape
# ---------------------------------------------------------------------------


@query(
    "embedding_neardup",
    f"""
    WITH v0 AS (SELECT vec_id, embedding, {_duck_sign_bucket('embedding')} AS bucket FROM embeddings),
    v AS (
      SELECT vec_id, embedding, bucket FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bn FROM v0
      ) WHERE bn <= 256
    ),
    p AS (
      SELECT a.bucket, a.vec_id AS id_1, b.vec_id AS id_2,
             {_duck_cosine('a.embedding', 'b.embedding')} AS cosine
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT bucket, id_1, id_2, cosine FROM p WHERE cosine >= 0.3
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within sign-LSH buckets
    (functions/similarity.neardup_pairs)."""
    e2 = load_table(spark, sf_dir, "embeddings")
    return sim.neardup_pairs(e2, threshold=0.3)


_SEMANTIC_DEDUP_ORACLE = f"""
    WITH RECURSIVE v0 AS (
      SELECT vec_id, embedding, {_duck_sign_bucket('embedding')} AS bucket FROM embeddings
    ),
    v AS (
      SELECT vec_id, embedding, bucket FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bn FROM v0
      ) WHERE bn <= 256
    ),
    pairs AS (
      SELECT a.vec_id AS id_1, b.vec_id AS id_2
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {_duck_cosine('a.embedding', 'b.embedding')} >= 0.3
    ),
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a
    ),
    losers AS (
      SELECT node FROM (SELECT node, MIN(r) AS comp FROM reach GROUP BY node)
      WHERE node <> comp
    )
    SELECT vec_id, label FROM embeddings
    WHERE vec_id NOT IN (SELECT node FROM losers)
    """


@query("semantic_dedup", _SEMANTIC_DEDUP_ORACLE)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector-space sibling of dedup_materialize: embedding-cosine
    near-dup pairs (sign-LSH buckets) -> connected components -> drop
    every non-canonical cluster member, keep min vec_id. The semantic-
    dedup pass a corpus runs AFTER text dedup (catches paraphrases and
    re-encodings text fingerprints miss). Same scale economics: bucket-
    mate candidate generation, edge set orders smaller than the corpus,
    size-aware CC rounds."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = sim.neardup_pairs(e, threshold=0.3).select("id_1", "id_2")
    losers = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("vec_id"))
    )
    # No forced broadcast: the loser set is O(duplicate docs) — at a 30-50%
    # dup rate over 100 TB that is billions of ids, far past any driver's
    # broadcast budget. AQE still broadcasts when the set is actually small.
    return e.join(losers, "vec_id", "left_anti").select("vec_id", "label")


@query(
    "token_count_bpe",
    """
    SELECT doc_id,
      len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_pieces,
      len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words
    FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-ish pre-tokenizer vs plain words
    (functions/textstats.bpe_piece_count) — the LLM-budget estimator."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.bpe_piece_count(F.col("text")).alias("n_pieces"),
        tx.token_count(tx.tokens(F.col("text"))).alias("n_words"),
    )


def _duck_winnow_sql() -> str:
    n, w = dd.SHINGLE_N, dd.WINNOW_WINDOW
    t = _duck_toks()
    sh = (
        f"list_transform(generate_series(1, greatest(len({t}) - {n} + 1, 1)),"
        f" i -> array_to_string(list_slice({t}, i, i + {n} - 1), ' '))"
    )
    px = dd.hex_window_sql("m", 1, "duckdb")
    return f"""
    WITH s AS (SELECT doc_id, {sh} AS sh FROM documents),
    h AS (SELECT doc_id, list_transform(list_transform(sh, s -> md5(s)), m -> {px}) AS hx FROM s),
    fps AS (SELECT doc_id,
      list_distinct(list_transform(generate_series(1, greatest(len(hx) - {w} + 1, 1)),
                    j -> list_min(list_slice(hx, j, j + {w} - 1)))) AS fp_set
      FROM h)
    SELECT doc_id, unnest(fp_set) AS fp FROM fps
    """


@query("winnowing_fingerprints", _duck_winnow_sql())
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (MOSS scheme) — sublinear
    document fingerprint sets for corpus overlap detection
    (functions/dedup.winnowing_fingerprints)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.winnowing_fingerprints(d, "doc_id", "text")


@query(
    "price_above_brand_avg",
    """
    WITH stats AS (
      SELECT p_partkey, p_brand, p_retailprice,
        CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) OVER (PARTITION BY p_brand) AS DOUBLE)
          / 100.0 / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
      FROM part)
    SELECT p_partkey, p_brand, p_retailprice, brand_avg
    FROM stats WHERE p_retailprice > brand_avg
    """,
)
def price_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape (price > group average) as one
    window pass — no re-scan per row, the decorrelated plan Catalyst
    would produce for the subquery form."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    brand_avg = (
        F.sum(_cents(F.col("p_retailprice"))).over(w).cast("double")
        / F.lit(100.0)
        / F.count(F.lit(1)).over(w)
    )
    return (
        p.withColumn("brand_avg", brand_avg)
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice", "brand_avg")
    )


# ---------------------------------------------------------------------------
# Analytics batch 3: existential agg (Q4), conditional counts over a
# join (Q12), ratio metric (Q14) — adapted to the fixture columns
# ---------------------------------------------------------------------------


@query(
    "q4_priority_with_bulk",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery -> left-semi join, then agg."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_priority_split",
    """
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional integer counts over a fact-dim join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@query(
    "q14_promo_share",
    """
    WITH j AS (
      SELECT p_type,
        CAST(round(l_extendedprice * 100) AS BIGINT)
          * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    )
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE)
           / CAST(SUM(rev) AS DOUBLE) AS promo_share,
           COUNT(*) AS n
    FROM j
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of two exact integer sums (each converts
    to double deterministically, one division) — the ratio-metric
    pattern under the determinism rules."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", rev.alias("rev")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(0))
    return j.agg(
        (F.lit(100.0) * promo.cast("double") / F.sum("rev").cast("double")).alias("promo_share"),
        F.count(F.lit(1)).alias("n"),
    )


from dtle_spark.operators.filters import statement_class_filter  # noqa: E402


@query(
    "statement_class_filter",
    """
    WITH cu AS (SELECT c_custkey FROM customer)
    SELECT c_custkey, c_custkey*10+1 AS seq, 'u' AS op FROM cu
    UNION ALL SELECT c_custkey, c_custkey*10+2, 'i' FROM cu WHERE c_custkey % 3 = 0
    """,
)
def statement_class_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 SqlFilter: NoDMLDelete drops the delete class from the demo
    stream (binlog_reader.go:110-178 statement-class policy)."""
    changes = cdc_demo.customer_changes(spark, sf_dir)
    filtered = statement_class_filter(changes, no_dml_delete=True)
    return filtered.select(
        F.coalesce(F.col("after.c_custkey"), F.col("before.c_custkey")).alias("c_custkey"),
        "seq",
        "op",
    )


@query(
    "user_value_trend",
    """
    SELECT user_id, event_id,
      CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS moving_sum_7,
      lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_event,
      ntile(4) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: 7-row moving sum (exact cents), lag,
    ntile — one shuffle on user_id serves all three frames."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tsu"), "value"
    )
    order = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    w7 = order.rowsBetween(-6, 0)
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(_cents(F.col("value"))).over(w7).cast("double") / F.lit(100.0)).alias("moving_sum_7"),
        F.lag("event_id", 1).over(order).alias("prev_event"),
        F.ntile(4).over(order).alias("quartile"),
    )


@query(
    "dedup_materialize",
    f"""
    WITH RECURSIVE pairs AS ({_duck_minhash_sql()}),
    edges AS (
      SELECT id_1 AS a, id_2 AS b FROM pairs
      UNION SELECT id_2, id_1 FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT re.node, e.b FROM reach re JOIN edges e ON re.r = e.a
    ),
    clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    losers AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
)
def dedup_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline end-product: the deduplicated corpus — drop every
    non-canonical member of each near-dup cluster (keep min doc_id),
    via one anti-join. This is the operation a 100 TB training-data
    run actually ships."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5)
    losers = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    # No forced broadcast of the loser set (O(duplicate docs) — billions of
    # ids at 100 TB with a typical dup rate). Shuffle anti-join scales; AQE
    # still picks broadcast when the set really is small.
    return d.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Analytics batch 4: the remaining classic decorrelation shapes (Q2,
# Q13, Q17, Q18, Q22) adapted to the fixture schema. Money math is
# integer-cents; avg comparisons are integer cross-multiplies (never a
# float divide inside a predicate) per the determinism rules.
# ---------------------------------------------------------------------------


@query(
    "q2_best_supplier_per_nation",
    """
    WITH mx AS (SELECT s_nationkey, max(s_acctbal) AS best FROM supplier GROUP BY s_nationkey)
    SELECT r_name, n_name, s_name, s_acctbal
    FROM supplier JOIN mx ON supplier.s_nationkey = mx.s_nationkey AND s_acctbal = best
    JOIN nation ON n_nationkey = supplier.s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    """,
)
def q2_best_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated max subquery decorrelated into a
    grouped max re-joined on (key, max) — ties return every witness,
    exactly the correlated-subquery semantics. Dim chain broadcast
    (max of doubles is order-independent — safe to compare exactly)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    mx = (
        s.groupBy("s_nationkey")
        .agg(F.max("s_acctbal").alias("best"))
        .withColumnRenamed("s_nationkey", "nk")
    )
    return (
        s.join(F.broadcast(mx), (s.s_nationkey == F.col("nk")) & (s.s_acctbal == F.col("best")))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", "s_name", "s_acctbal")
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-level filter, per-key
    count (zeros preserved), then the distribution of counts — two
    aggregations, the second over tiny cardinality."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    # pre-aggregate orders per custkey BEFORE the outer join (partial
    # agg runs map-side): the join then moves one row per customer
    # instead of one per order — result-identical, and the shuffle
    # shrinks from |orders| to |distinct custkeys|
    ocnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__n"))
    per = c.join(ocnt, c.c_custkey == ocnt.o_custkey, "left").select(
        F.coalesce(F.col("__n"), F.lit(0)).alias("c_count")
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey, COUNT(*) AS cnt,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS sq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 700.0
             AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey JOIN pa USING (l_partkey)
    WHERE p_brand = 'Brand#23'
      AND 5 * CAST(round(l_quantity) AS BIGINT) * cnt < sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part avg-quantity threshold. The correlated
    avg decorrelates into a grouped (count, sum) joined back; the
    `qty < 0.2 * avg` predicate becomes the integer cross-multiply
    5*qty*cnt < sum — no float division inside a predicate. One double
    conversion at the very end."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    qty = F.round(F.col("l_quantity")).cast("long")
    # brand-filter lineitem BEFORE the per-part aggregate: the grouped
    # (cnt, sum) is only consumed joined back to the brand's rows, so
    # restricting it first is result-identical but shuffles ~brand
    # share of lineitem instead of all of it (the decisive difference
    # at 100 TB). The oracle keeps the unrestricted form — same rows.
    jf = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    pa = jf.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(qty).alias("sq")
    )
    j = jf.join(pa, "l_partkey").filter(5 * qty * F.col("cnt") < F.col("sq"))
    return j.agg(
        (F.sum(_cents(F.col("l_extendedprice"))).cast("double") / F.lit(700.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 300
    )
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery on a grouped HAVING -> the group
    result joins the fact directly (semi-join made total: the grouped
    side IS the filter). Quantity sums stay integer-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "q22_idle_rich_customers",
    """
    WITH t AS (
      SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    ),
    urgent AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
    FROM customer, t
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s
      AND c_custkey NOT IN (SELECT o_custkey FROM urgent)
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery average threshold (integer
    cross-multiply: cents*n > sum_cents) + NOT IN anti-join, grouped
    totals kept in cents. The scalar (sum, count) broadcast-crosses
    into the scan — no shuffle on the big side before the filter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    t = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_cents(F.col("c_acctbal"))).alias("s"), F.count(F.lit(1)).alias("n")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .filter(_cents(F.col("c_acctbal")) * F.col("n") > F.col("s"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_cents(F.col("c_acctbal"))).alias("totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus assembly (functions/corpus.py): deterministic stratified
# sampling and sequence packing — the steps that turn the cleaned pool
# into training input.
# ---------------------------------------------------------------------------

from dtle_spark.functions import corpus as cp  # noqa: E402

# language mixing weights: integers only (num, denom)
_MIX_RATES = {"en": (3, 4), "de": (1, 2), "fr": (1, 2), "ja": (1, 4)}


@query(
    "stratified_sample",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {cp.stratified_sample_sql(_MIX_RATES, default_rate=(1, 10))}
    """,
)
def stratified_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (mixing weights): keep
    iff hash40(doc_id)*denom < num*2^40 — integer cross-multiply, no
    floats, map-only, and stable under corpus growth (same doc always
    draws the same uniform)."""
    d = load_table(spark, sf_dir, "documents")
    return cp.stratified_sample(d, _MIX_RATES, default_rate=(1, 10)).select(
        "doc_id", "lang", "source"
    )


@query(
    "pack_sequences",
    """
    WITH t AS (
      SELECT source AS part, doc_id AS id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT *, CAST(coalesce(SUM(n_tokens) OVER (
        PARTITION BY part ORDER BY id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM t
    )
    SELECT part, id, n_tokens, cum // 2048 AS bin, cum % 2048 AS bin_offset FROM c
    """,
)
def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 2048-token bins, windowed
    per source (parallel across sources; shard-local packing is the
    single-giant-source extension — functions/corpus.py)."""
    d = load_table(spark, sf_dir, "documents")
    return cp.pack_sequences(d, budget=2048)


# target mix shares of the ORIGINAL corpus total; src3's implied rate
# exceeds 1 (its pool is ~5% of total), exercising the keep-all branch
# (threshold > 2^40) without a clamp
_SOURCE_TARGETS = {
    "src0": (1, 50),
    "src1": (1, 25),
    "src2": (3, 50),
    "src3": (1, 10),
    "src4": (2, 25),
}


@query(
    "source_mixing",
    f"""
    WITH mixed AS ({cp.source_mixing_sql(_SOURCE_TARGETS)})
    SELECT doc_id, source FROM mixed
    """,
)
def source_mixing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-style source re-weighting: downsample each source to
    a target share of the corpus with integer-exact thresholds
    (functions/corpus.py source_mixing — DECIMAL(38,0) threshold math,
    int64 draw compare, map-only apply)."""
    d = load_table(spark, sf_dir, "documents")
    return cp.source_mixing(d, _SOURCE_TARGETS).select("doc_id", "source")


# pseudo-lines for the fixture corpus (whose documents are single-line
# word streams): 2-token chunks joined by newline — built identically
# in both engines, then the REAL line-level operator runs on top
_PSEUDO_LINES_DUCK = """
    WITH t0 AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
    p AS (
      SELECT doc_id, CASE WHEN len(toks) = 0 THEN '' ELSE
        array_to_string(list_transform(range(1, (len(toks)+1)//2 + 1),
          i -> array_to_string(list_slice(toks, i*2-1, i*2), ' ')), chr(10)) END AS text
      FROM t0
    )
"""


@query(
    "boilerplate_strip",
    f"""
    {_PSEUDO_LINES_DUCK},
    parts AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM p),
    lines AS (
      SELECT doc_id, unnest(range(1, len(parts)+1)) AS pos, unnest(parts) AS line
      FROM parts
    ),
    fps AS (SELECT doc_id, pos, line, md5(line) AS fp FROM lines),
    boiler AS (
      SELECT fp FROM (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM fps GROUP BY fp)
      WHERE nd >= 5
    ),
    kept AS (SELECT * FROM fps WHERE fp NOT IN (SELECT fp FROM boiler)),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id AS id, CAST(len(string_split(b.text, chr(10))) AS INT) AS n_lines,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           md5(COALESCE(r.clean_text, '')) AS clean_fp
    FROM p b LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def boilerplate_strip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level boilerplate removal (functions/corpus.py
    strip_boilerplate): lines occurring in >= 5 distinct docs are
    stripped everywhere; surviving lines rejoin in original order. The
    fixture docs are single-line, so both engines first derive the same
    2-token pseudo-lines; the operator itself is delimiter-generic."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks"),
    )
    pseudo = t.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(toks) = 0 THEN '' ELSE"
            " concat_ws(char(10), transform(sequence(1, (size(toks)+1) DIV 2),"
            " i -> concat_ws(' ', slice(toks, i*2-1, 2)))) END"
        ).alias("text"),
    )
    out = cp.strip_boilerplate(pseudo, min_docs=5, id_col="doc_id")
    return out.select(
        "id", "n_lines",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.md5("clean_text").alias("clean_fp"),
    )


@query(
    "corpus_stats",
    """
    WITH t AS (
      SELECT lang, source,
        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS nt,
        CAST(length(text) AS BIGINT) AS nc
      FROM documents
    )
    SELECT lang, source,
      COUNT(*) AS n_docs,
      CAST(SUM(nt) AS BIGINT) AS n_tokens,
      CAST(SUM(nc) AS BIGINT) AS n_chars,
      CAST(CAST(SUM(nt) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_tokens,
      MIN(nt) AS min_tokens,
      MAX(nt) AS max_tokens
    FROM t GROUP BY lang, source
    """,
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus report card: per (lang, source) doc/token/char
    rollup — the summary a 100 TB pipeline emits after every stage.
    Map-side partial agg into |langs x sources| groups; exact integer
    sums, single-division mean. Counts matches with ``regexp_count``
    instead of materializing the token ARRAY per row just to size it —
    same result (pinned vs the DuckDB len(regexp_extract_all) oracle),
    one less per-row allocation. (r6 micro-look: the r5 bench's
    0.41->0.63 s corpus_stats delta did not reproduce — steady-state
    0.35-0.39 s for both variants at sf0.1; the outlier was codegen
    warm-up on the first sample.)"""
    d = load_table(spark, sf_dir, "documents")
    nt = F.regexp_count(F.lower(F.col("text")), F.lit(tx.TOKEN_PATTERN)).cast("long")
    return (
        d.select("lang", "source", nt.alias("nt"), F.length("text").cast("long").alias("nc"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("nc").alias("n_chars"),
            (F.sum("nt").cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
            F.min("nt").alias("min_tokens"),
            F.max("nt").alias("max_tokens"),
        )
    )


_TFIDF_STOP_IN = ", ".join(f"'{s}'" for s in tx.STOPWORDS)


@query(
    "keyword_extract",
    f"""
    WITH toks AS (
      SELECT doc_id AS id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ),
    filt AS (SELECT * FROM toks WHERE term NOT IN ({_TFIDF_STOP_IN})),
    tf AS (SELECT id, term, COUNT(*) AS tf FROM filt GROUP BY id, term),
    df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    scored AS (
      SELECT id, tf.term, tf, df, CAST(tf * n AS DOUBLE) / df AS score
      FROM tf JOIN df_t ON tf.term = df_t.term, n
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS rnk
          FROM scored)
    SELECT id, term, tf, df, score, rnk FROM r WHERE rnk <= 3
    """,
)
def keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 keywords by rational tf-idf (tf * N / df — exact
    integer ratio as one IEEE division, so ranking is engine-portable;
    functions/textstats.py tfidf_topk documents the 3-shuffle scale
    shape and the always-broadcastable vocabulary table)."""
    d = load_table(spark, sf_dir, "documents")
    return tx.tfidf_topk(d, k=3)


@query(
    "vocab_coverage",
    """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ),
    freq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
    ranked AS (
      SELECT term, cnt,
        row_number() OVER (ORDER BY cnt DESC, term) AS rnk,
        CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM freq
    )
    SELECT rnk, term, cnt, CAST(cum AS DOUBLE) / total AS coverage
    FROM ranked, tot WHERE rnk <= 100
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training diagnostic: corpus token frequencies, rank,
    and cumulative coverage share for the top-100 vocabulary. The
    global window is over the VOCABULARY (bounded), not the corpus —
    the corpus-sized work is one combiner-friendly groupBy."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = freq.agg(F.sum("cnt").cast("long").alias("total"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    return (
        freq.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .filter(F.col("rnk") <= 100)
        .crossJoin(F.broadcast(total))
        .select(
            "rnk", "term", "cnt",
            F.expr("CAST(cum AS DOUBLE) / total").alias("coverage"),
        )
    )


from dtle_spark.functions import sketches as sk  # noqa: E402


@query(
    "kmv_distinct_sketch",
    f"""
    WITH est AS ({sk.kmv_distinct_sql('l_partkey', 'lineitem', k=256)}),
    t AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS true_distinct FROM lineitem)
    SELECT est.*, t.true_distinct FROM est, t
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch of lineitem.l_partkey (k=256) next to
    the exact count — the deterministic, mergeable cardinality
    estimator (functions/sketches.py: shared md5-40-bit uniform makes
    the sketch itself engine-portable and therefore oracle-gatable,
    unlike approx_count_distinct's engine-internal HLL)."""
    li = load_table(spark, sf_dir, "lineitem")
    # one scan: both the sketch and the exact count read the same
    # distinct-key pass (lazily checkpointed), instead of each paying a
    # full lineitem scan
    d = li.select("l_partkey").distinct().localCheckpoint(eager=False)
    est = sk.kmv_distinct(d, "l_partkey", k=256)
    true = d.agg(F.count_distinct("l_partkey").cast("long").alias("true_distinct"))
    return est.crossJoin(F.broadcast(true))


@query(
    "gopher_rules",
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(CAST(list_sum(list_transform(toks, s -> length(s))) AS BIGINT) AS DOUBLE)
          / nullif(CAST(len(toks) AS BIGINT), 0) AS mean_word_len,
        CAST(len(list_filter(toks, s -> regexp_matches(s, '[a-z]'))) AS DOUBLE)
          / nullif(CAST(len(toks) AS BIGINT), 0) AS alpha_ratio,
        CAST(len(list_filter(toks, s -> s IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS stop_hits
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_ratio, stop_hits,
      n_words BETWEEN 50 AND 100000 AS words_ok,
      mean_word_len BETWEEN 3.0 AND 10.0 AS mean_len_ok,
      alpha_ratio > 0.8 AS alpha_ok,
      stop_hits >= 2 AS stop_ok,
      COALESCE(n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
               AND alpha_ratio > 0.8 AND stop_hits >= 2, FALSE) AS keep
    FROM m
    """,
)
def gopher_rules_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule battery (functions/textstats.py
    gopher_flags): word-count bounds, mean-word-length bounds,
    alpha-word ratio, stopword presence — pure Column exprs, exact
    integer counts, single-division ratios."""
    d = load_table(spark, sf_dir, "documents")
    flags = tx.gopher_flags(F.col("text"))
    return d.select(
        "doc_id",
        flags["n_words"].cast("long").alias("n_words"),
        flags["mean_word_len"].alias("mean_word_len"),
        flags["alpha_ratio"].alias("alpha_ratio"),
        flags["stop_hits"].cast("long").alias("stop_hits"),
        flags["words_ok"].alias("words_ok"),
        flags["mean_len_ok"].alias("mean_len_ok"),
        flags["alpha_ok"].alias("alpha_ok"),
        flags["stop_ok"].alias("stop_ok"),
        flags["keep"].alias("keep"),
    )


# ---------------------------------------------------------------------------
# Analytics batch 5: exact discrete percentiles (manual window
# construction — engine-built-in quantile functions interpolate
# differently across engines, so both sides compute the SAME
# row_number/count method) and CUBE totals.
# ---------------------------------------------------------------------------


@query(
    "order_value_percentiles",
    """
    WITH v AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT pri, cents,
             row_number() OVER (PARTITION BY pri ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY pri) AS n
      FROM v
    )
    SELECT pri,
           MIN(CASE WHEN rn * 100 >= 50 * n THEN cents END) AS p50_cents,
           MIN(CASE WHEN rn * 100 >= 90 * n THEN cents END) AS p90_cents,
           MIN(CASE WHEN rn * 100 >= 99 * n THEN cents END) AS p99_cents,
           MAX(cents) AS max_cents
    FROM r GROUP BY pri
    """,
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99) of order value per
    priority: rank-threshold as an integer cross-multiply
    (rn*100 >= p*n) over integer cents — no interpolation, no floats,
    so both engines agree bit-for-bit. Ties in `cents` make equal-rank
    rows interchangeable: the selected VALUE is unique even though
    row_number order among ties is not."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("pri"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    w = Window.partitionBy("pri").orderBy("cents")
    r = v.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("pri"))
    )

    def pick(p: int):
        return F.min(F.when(F.col("rn") * 100 >= p * F.col("n"), F.col("cents")))

    return r.groupBy("pri").agg(
        pick(50).alias("p50_cents"),
        pick(90).alias("p90_cents"),
        pick(99).alias("p99_cents"),
        F.max("cents").alias("max_cents"),
    )


@query(
    "cube_order_totals",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping-set combinations
    in one pass (partial-aggregable — one shuffle of group keys, not
    four scans). NULL markers coalesce to 'ALL' (fixture columns are
    never null, so the marker is unambiguous)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total_cents",
        )
    )


# ---------------------------------------------------------------------------
# Analytics batch 6: event-sequence shapes — conversion funnel (ordered
# min-timestamp chaining) and weekly cohort retention (all-integer
# week arithmetic).
# ---------------------------------------------------------------------------


_FUNNEL_WINDOW_US = 86400 * 1000000  # 1-day conversion window per stage


@query(
    "funnel_view_click_purchase",
    f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    v AS (SELECT user_id, min(t) AS tv FROM e WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(t) AS tc FROM e JOIN v ON e.user_id = v.user_id
          WHERE event_type = 'click' AND t > tv AND t <= tv + {_FUNNEL_WINDOW_US}
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(t) AS tp FROM e JOIN c ON e.user_id = c.user_id
          WHERE event_type = 'purchase' AND t > tc AND t <= tc + {_FUNNEL_WINDOW_US}
          GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS viewed,
           (SELECT count(*) FROM c) AS clicked_after_view,
           (SELECT count(*) FROM p) AS purchased_after_click
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: each stage
    is min-timestamp-after-previous-stage within a 1-day conversion
    window (strict event ordering, not mere co-occurrence). Timestamps
    compare as epoch-micros longs. Three user_id-keyed aggregations —
    one shuffle key throughout, so the exchanges stack on the same
    partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("t")
    )
    win = _FUNNEL_WINDOW_US
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("t").alias("tv"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("t") > F.col("tv")) & (F.col("t") <= F.col("tv") + win))
        .groupBy("user_id")
        .agg(F.min("t").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("t") > F.col("tc")) & (F.col("t") <= F.col("tc") + win))
        .groupBy("user_id")
        .agg(F.min("t").alias("tp"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )


_WEEK_US = 7 * 86400 * 1000000


@query(
    "cohort_weekly_retention",
    f"""
    WITH e AS (SELECT user_id, epoch_us(ts) // {_WEEK_US} AS wk FROM events),
    f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
    j AS (SELECT DISTINCT e.user_id, cohort, wk - cohort AS k
          FROM e JOIN f ON e.user_id = f.user_id)
    SELECT cohort, k, count(*) AS n_users
    FROM j WHERE k <= 3 GROUP BY cohort, k
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = epoch-week of a user's first
    event; n_users = distinct users active k weeks later (k 0..3).
    Entirely integer week arithmetic — no date-function dialect drift."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) DIV {_WEEK_US}").alias("wk")
    )
    f = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    j = (
        ev.join(f, "user_id")
        .select("user_id", "cohort", (F.col("wk") - F.col("cohort")).alias("k"))
        .distinct()
    )
    return (
        j.filter(F.col("k") <= 3)
        .groupBy("cohort", "k")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "json_props_stats",
    """
    WITH e AS (SELECT event_type,
                      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events)
    SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
           MIN(k) AS min_k, MAX(k) AS max_k,
           COUNT(DISTINCT k) AS distinct_k
    FROM e GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON path into the `props` payload
    column (Spark get_json_object / DuckDB json_extract_string — both
    produce the string form, cast to BIGINT so every aggregate is
    integer-exact). The extraction is a per-row expression — scan-bound,
    pushes nothing but prunes to the two needed columns."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("distinct_k"),
    )


_DAY_US = 86400 * 1000000


@query(
    "moving_revenue_7d",
    f"""
    WITH d AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM events WHERE event_type = 'purchase' GROUP BY day
    )
    SELECT day, rev_cents,
           CAST(SUM(rev_cents) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rev_7d_cents
    FROM d
    """,
)
def moving_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame moving aggregate: daily purchase revenue and its
    trailing-7-day sum. The frame is a VALUE range over integer day
    keys (gap days genuinely absent from the window), not a row count
    — the window family ROWS frames cannot express. Scale: the
    per-day pre-aggregation shrinks the window input to one row per
    day; the global-order window then runs on ~hundreds of rows, so
    the unpartitioned sort is a non-issue (partition by month/year if
    day cardinality ever grows)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    d = ev.groupBy(
        F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day")
    ).agg(F.sum(_cents(F.col("value"))).alias("rev_cents"))
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return d.select(
        "day", "rev_cents", F.sum("rev_cents").over(w).alias("rev_7d_cents")
    )


@query(
    "gapfill_daily_revenue",
    f"""
    WITH rev AS (
      SELECT n_name, epoch_us(o_orderdate) // {_DAY_US} AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY n_name, day
    ),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM rev),
    spine AS (
      SELECT k.n_name, gs.day
      FROM (SELECT DISTINCT n_name FROM rev) k
      CROSS JOIN (SELECT UNNEST(generate_series(lo, hi)) AS day FROM b) gs
    ),
    f AS (
      SELECT s.n_name, s.day, r.rev_cents
      FROM spine s LEFT JOIN rev r USING (n_name, day)
    )
    SELECT n_name, day, rev_cents,
      COALESCE(rev_cents, 0) AS rev_cents_zf,
      last_value(rev_cents IGNORE NULLS) OVER wprev AS rev_cents_locf,
      CASE
        WHEN rev_cents IS NOT NULL THEN CAST(rev_cents AS DOUBLE)
        WHEN (last_value(rev_cents IGNORE NULLS) OVER wprev) IS NOT NULL
         AND (first_value(rev_cents IGNORE NULLS) OVER wnext) IS NOT NULL
        THEN CAST(last_value(rev_cents IGNORE NULLS) OVER wprev AS DOUBLE)
             + (CAST(first_value(rev_cents IGNORE NULLS) OVER wnext AS DOUBLE)
                - CAST(last_value(rev_cents IGNORE NULLS) OVER wprev AS DOUBLE))
               * CAST(day - (last_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER wprev) AS DOUBLE)
               / CAST((first_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER wnext)
                      - (last_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER wprev) AS DOUBLE)
      END AS rev_cents_interp
    FROM f
    WINDOW
      wprev AS (PARTITION BY n_name ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wnext AS (PARTITION BY n_name ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    """,
)
def gapfill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar resample + gap-fill (operators/timeseries.py): daily
    1995 revenue per nation landed on the dense union calendar with
    zero-fill, LOCF, and linear-interpolation columns in one pass —
    the time-series surface the reference engine lacks (SURVEY §2.6
    family). The spine is generated map-side from a broadcast one-row
    bound; the fill windows run per nation over at most |days| rows,
    so nothing here is proportional to raw order volume except the
    initial partial-aggregable groupBy. The interpolation is integer-
    fed IEEE arithmetic in a pinned op order, bit-identical across
    engines (see gapfill's docstring)."""
    from dtle_spark.operators.timeseries import gapfill

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            F.expr(f"unix_micros(o_orderdate) DIV {_DAY_US}").alias("day"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("rev_cents"))
    )
    return gapfill(rev, key_col="n_name", tick_col="day", val_col="rev_cents")


@query(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retail_cents', CAST(round(p_retailprice * 100) AS BIGINT) FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): per-part metrics as (key, metric, val)
    rows via stack() — one generator expression per input row, no
    shuffle; the oracle's UNION ALL is the same relation."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS BIGINT),"
            " 'retail_cents', CAST(round(p_retailprice * 100) AS BIGINT))"
        ).alias("metric", "val"),
    )


@query(
    "fuzzy_part_name_pairs",
    """
    WITH t AS (SELECT p_partkey, p_name,
                      split_part(p_name, ' ', 2) AS noun FROM part
               WHERE p_partkey % 5 = 0)
    SELECT a.p_partkey AS id_1, b.p_partkey AS id_2,
           a.p_name AS name_1, b.p_name AS name_2,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM t a JOIN t b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 1
      AND levenshtein(a.p_name, b.p_name) <= 1 AND a.p_name <> b.p_name
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: candidate pairs share a blocking key
    (the name's noun) so the quadratic edit-distance compare runs only
    within blocks — the record-linkage plan shape (block -> compare ->
    threshold). A length-gap prefilter (|len diff| <= max dist, sound
    because edit distance >= length difference) skips the DP for most
    pairs; levenshtein is the classic integer DP in both engines.
    Scoped to a fifth of the catalog: the synthetic name vocabulary is
    so small that most same-noun names sit within one edit — the full
    cross product is result-degenerate, not a plan problem."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 5 == 0)
        .select("p_partkey", "p_name", F.expr("split_part(p_name, ' ', 2)").alias("noun"))
    )
    # ~20 distinct nouns = ~20 join partitions -> the quadratic compare
    # would pile onto a few tasks; salt the left by id and replicate the
    # right across salts (same fix as ngram_jaccard_pairs)
    salts = 16
    a = p.select(
        F.col("p_partkey").alias("id_1"),
        F.col("p_name").alias("name_1"),
        "noun",
        (F.col("p_partkey") % salts).alias("salt"),
    )
    b = p.select(
        F.col("p_partkey").alias("id_2"),
        F.col("p_name").alias("name_2"),
        "noun",
        F.explode(F.expr(f"sequence(0, {salts - 1})")).alias("salt"),
    )
    return (
        a.join(b, ["noun", "salt"])
        .filter(
            (F.col("id_1") < F.col("id_2"))
            & (F.abs(F.length("name_1") - F.length("name_2")) <= 1)
        )
        .withColumn("dist", F.levenshtein("name_1", "name_2"))
        .filter((F.col("dist") <= 1) & (F.col("name_1") != F.col("name_2")))
        .select("id_1", "id_2", "name_1", "name_2", "dist")
    )


# ---------------------------------------------------------------------------
# Analytics batch 6: the remaining TPC-H shapes expressible on the
# fixture schema (no partsupp / receipt-commit dates in the fixtures,
# so q9/q16/q21 keep the SHAPE — multi-way profit expression, NOT-IN
# count-distinct, double-EXISTS correlation — on available columns;
# docstrings note each substitution). All money stays integer
# (cents or cents*(100-disc) = 1e-4 dollar units) until one final
# division; every SUM output is CAST to BIGINT (HUGEINT hash trap).
# ---------------------------------------------------------------------------

_REV_E4 = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _rev_e4_col() -> F.Column:
    return _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))


@query(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(CAST(SUM({_REV_E4}) AS BIGINT) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
            AND n2.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8'))
        OR (n1.n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8')
            AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional trade volume between two 4-nation
    blocs by ship year — a 6-way join where BOTH nation dims broadcast
    (25 rows) and the symmetric bloc predicate prunes early. (Blocs
    rather than the classic single pair so the sf0.001 fixture still
    produces rows.) Revenue exact in 1e-4 dollar units, one final
    division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    bloc_a = ["NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    bloc_b = ["NATION_5", "NATION_6", "NATION_7", "NATION_8"]
    pair = (
        (F.col("supp_nation").isin(bloc_a) & F.col("cust_nation").isin(bloc_b))
        | (F.col("supp_nation").isin(bloc_b) & F.col("cust_nation").isin(bloc_a))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.sum(_rev_e4_col()).cast("double") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q8_market_share",
    f"""
    WITH v AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_REV_E4} AS vol, n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(vol) AS BIGINT) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n
    FROM v GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's volume for one
    part type, by order year. The share is a single double division of
    two exact integers — the only float op. 8-way join; region/nation
    dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    v = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_e4_col().alias("vol"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(F.lit(0))
    return v.groupBy("o_year").agg(
        (F.sum(nat).cast("double") / F.sum("vol").cast("double")).alias("mkt_share"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q9_profit_by_nation_year",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({_REV_E4}
                    - CAST(round(p_retailprice * 100) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT) * 100) AS BIGINT)
             AS profit_e4,
           COUNT(*) AS n
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus cost*qty) per supplier
    nation per year, part-name filtered. The fixtures carry no
    partsupp, so p_retailprice stands in for ps_supplycost — the
    expression shape (two-scale integer arithmetic folded into one
    exact SUM) is what the query exercises. Profit kept in 1e-4
    dollar units (cents*100)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev_e4_col() - _cents(F.col("p_retailprice")) * F.round(
        F.col("l_quantity")
    ).cast("long") * 100
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"),
                amount.alias("amt"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amt").alias("profit_e4"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV_E4}) AS BIGINT) AS rev_e4,
           COUNT(*) AS n
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY rev_e4 DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    half-year window. The LIMIT is deterministic: exact-integer revenue
    ordered with the unique custkey tiebreak picks the identical set in
    both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_e4_col()).alias("rev_e4"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("rev_e4").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({_REV_E4}) AS BIGINT) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — a scalar-subquery max over a derived aggregate. Equality
    against an exact integer keeps ties deterministic (floating revenue
    would make 'the max set' engine-dependent)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_e4_col()).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type,
    size) with a NOT-IN exclusion subquery. No partsupp in the
    fixtures, so lineitem plays supplier-of-part and negative-balance
    suppliers stand in for the complaints list — the NOT-IN anti-join +
    COUNT(DISTINCT) is the exercised machinery."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_REV_E4}) AS BIGINT) AS revenue_e4, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides —
    the classic disjunctive-predicate planning test (Catalyst pushes
    the common p/l column constraints below the join and evaluates the
    residual OR post-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev_e4_col()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q21_sole_blamed_supplier",
    """
    WITH flagged AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F' AND l_returnflag = 'R'
    ),
    others AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged b
    JOIN supplier ON s_suppkey = b.l_suppkey
    WHERE EXISTS (SELECT 1 FROM others o
                  WHERE o.l_orderkey = b.l_orderkey AND o.l_suppkey <> b.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged b2
                      WHERE b2.l_orderkey = b.l_orderkey AND b2.l_suppkey <> b.l_suppkey)
    GROUP BY s_name
    """,
)
def q21_sole_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-supplier count of finalized orders where
    the supplier is the ONLY one with returned lines but other
    suppliers participated — correlated EXISTS + NOT EXISTS, both as
    self-joins of the same derived table (semi + anti join on a
    composite inequality condition). Return flags stand in for the
    fixtures' missing receipt/commit dates; the correlation machinery
    is identical."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    flagged = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        # both correlation branches (EXISTS probe + NOT EXISTS anti)
        # read this narrow pair set; pin it so the fact scan + join +
        # distinct run once per invocation instead of twice
        .localCheckpoint(eager=False)
    )
    others = li.select("l_orderkey", "l_suppkey").distinct()
    b = flagged.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
    o2 = others.select(F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk"))
    b2 = flagged.select(F.col("l_orderkey").alias("b_ok"), F.col("l_suppkey").alias("b_sk"))
    exists_other = b.join(
        o2, (F.col("ok") == F.col("o_ok")) & (F.col("sk") != F.col("o_sk")), "left_semi"
    )
    sole = exists_other.join(
        b2, (F.col("ok") == F.col("b_ok")) & (F.col("sk") != F.col("b_sk")), "left_anti"
    )
    return (
        sole.join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# dirty-text constructor shared by both engines: wraps each doc's
# prefix in the punctuation the normalizer must fix (same literal
# codepoints on both sides — the differential then proves the
# normalizer itself, the fixture text being ASCII-clean)
_DIRTY_PREFIX = "“"
_DIRTY_SUFFIX = "” —​tail‘q’"


@query(
    "normalize_text",
    f"""
    WITH dirty AS (
      SELECT doc_id, '{_DIRTY_PREFIX}' || substr(text, 1, 40) || '{_DIRTY_SUFFIX}' AS d
      FROM documents
    )
    SELECT doc_id,
      md5(trim(regexp_replace(
        regexp_replace(
          translate(d, '{tx.NORM_FROM}', '""''''-- '),
          '{tx.ZERO_WIDTH_CLASS}', '', 'g'),
        '\\s+', ' ', 'g'))) AS norm_fp,
      CAST(length(trim(regexp_replace(
        regexp_replace(
          translate(d, '{tx.NORM_FROM}', '""''''-- '),
          '{tx.ZERO_WIDTH_CLASS}', '', 'g'),
        '\\s+', ' ', 'g'))) AS INT) AS norm_len
    FROM dirty
    """,
)
def normalize_text_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization differential: both engines build the SAME
    dirty string (smart quotes, NBSP, em-dash, zero-width around each
    doc prefix), normalize it (functions/textstats.normalize_text),
    and compare fingerprints — proving the translate/strip/collapse
    pipeline is engine-identical on codepoints the fixture lacks."""
    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit(_DIRTY_PREFIX), F.substring("text", 1, 40), F.lit(_DIRTY_SUFFIX)
    )
    norm = tx.normalize_text(dirty)
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        F.length(norm).cast("int").alias("norm_len"),
    )


@query(
    "pipeline_keep",
    f"""
    WITH fps AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    keeper AS (SELECT fp, MIN(doc_id) AS keeper_id FROM fps GROUP BY fp),
    canon AS (SELECT doc_id, doc_id = keeper_id AS is_canonical
              FROM fps JOIN keeper USING (fp)),
    t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(CAST(list_sum(list_transform(toks, s -> length(s))) AS BIGINT) AS DOUBLE)
          / nullif(CAST(len(toks) AS BIGINT), 0) AS mwl,
        CAST(len(list_filter(toks, s -> regexp_matches(s, '[a-z]'))) AS DOUBLE)
          / nullif(CAST(len(toks) AS BIGINT), 0) AS ar,
        CAST(len(list_filter(toks, s -> s IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS sh,
        CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
             ELSE list_transform(range(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS g3
      FROM t
    ),
    flags AS (
      SELECT doc_id,
        COALESCE(n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
                 AND ar > 0.8 AND sh >= 2, FALSE) AS gopher_ok,
        (CASE WHEN len(g3) = 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) END) <= 0.4 AS rep_ok
      FROM m
    ),
    pii AS (
      SELECT doc_id,
        len(regexp_extract_all(text, '{tx.EMAIL_PATTERN}'))
        + len(regexp_extract_all(text, '{tx.IPV4_PATTERN}'))
        + len(regexp_extract_all(text, '{tx.PHONE_PATTERN}')) = 0 AS pii_ok
      FROM documents
    )
    SELECT c.doc_id, is_canonical, gopher_ok, rep_ok, pii_ok,
      (is_canonical AND gopher_ok AND rep_ok AND pii_ok) AS keep,
      CASE WHEN NOT is_canonical THEN 'duplicate'
           WHEN NOT gopher_ok THEN 'gopher'
           WHEN NOT rep_ok THEN 'repetition'
           WHEN NOT pii_ok THEN 'pii'
           ELSE 'keep' END AS reason
    FROM canon c JOIN flags USING (doc_id) JOIN pii USING (doc_id)
    """,
)
def pipeline_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled hygiene pipeline: one keep/drop decision per doc
    with a reason code, composing exact-dedup canonicality, the Gopher
    rule battery, the 3-gram repetition bound (<= 0.4), and PII
    cleanliness — the end-to-end decision a corpus run materializes.
    Scale: one fingerprint groupBy (16-byte digests) is the only
    corpus-sized shuffle; every other signal is a map-side expression,
    and the three signal frames join back on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    fps = d.select("doc_id", tx.doc_fingerprint(F.col("text")).alias("fp"))
    keeper = fps.groupBy("fp").agg(F.min("doc_id").alias("keeper_id"))
    canon = fps.join(keeper, "fp").select(
        "doc_id", (F.col("doc_id") == F.col("keeper_id")).alias("is_canonical")
    )
    flags = tx.gopher_flags(F.col("text"))
    toks = d.select("doc_id", flags["keep"].alias("gopher_ok"), tx.tokens(F.col("text")).alias("toks"))
    grams = toks.select(
        "doc_id", "gopher_ok", tx.word_ngrams_sql("toks", 3).alias("g3")
    ).select(
        "doc_id", "gopher_ok", (tx.dup_ratio(F.col("g3")) <= 0.4).alias("rep_ok")
    )
    n_emails, n_ips, n_phones = tx.pii_counts(F.col("text"))
    pii = d.select("doc_id", ((n_emails + n_ips + n_phones) == 0).alias("pii_ok"))
    out = canon.join(grams, "doc_id").join(pii, "doc_id")
    keep = (
        F.col("is_canonical") & F.col("gopher_ok") & F.col("rep_ok") & F.col("pii_ok")
    )
    reason = (
        F.when(~F.col("is_canonical"), F.lit("duplicate"))
        .when(~F.col("gopher_ok"), F.lit("gopher"))
        .when(~F.col("rep_ok"), F.lit("repetition"))
        .when(~F.col("pii_ok"), F.lit("pii"))
        .otherwise(F.lit("keep"))
    )
    return out.select(
        "doc_id", "is_canonical", "gopher_ok", "rep_ok", "pii_ok",
        keep.alias("keep"), reason.alias("reason"),
    )


def _duck_incremental_dedup_sql(threshold: float = 0.5) -> str:
    """Side-tagged variant of the minhash chain: history (doc_id even)
    is the index, incoming (odd) is probed against it — candidates are
    ONLY incoming x history, verified by hashed-shingle jaccard."""
    lanes = ", ".join(
        f"CAST(list_min(list_transform(generate_series(1, len(hx)),"
        f" k -> ({a} * hx[k] + {b} * hy[k]) % {dd._LANE_MOD})) AS VARCHAR)"
        for a, b in dd.LANE_CONSTANTS
    )
    bands = " UNION ALL ".join(
        f"(SELECT doc_id, side, {b} AS band_idx,"
        f" md5(array_to_string(list_slice(sig, {b * dd.ROWS_PER_BAND + 1},"
        f" {b * dd.ROWS_PER_BAND + dd.ROWS_PER_BAND}), '|')) AS band_digest FROM sigs)"
        for b in range(dd.BANDS)
    )
    inter = "len(list_intersect(a.hx, b.hx))"
    px = dd.hex_window_sql("m", 1, "duckdb")
    py = dd.hex_window_sql("m", 11, "duckdb")
    return f"""
    WITH docs AS (SELECT doc_id, doc_id % 2 AS side, {_duck_shingles()} AS sh FROM documents),
    digests AS (SELECT doc_id, side, list_transform(sh, s -> md5(s)) AS mh FROM docs),
    hashed AS (SELECT doc_id, side,
        list_transform(mh, m -> {px}) AS hx,
        list_transform(mh, m -> {py}) AS hy
      FROM digests),
    sigs AS (SELECT doc_id, side, [{lanes}] AS sig FROM hashed),
    buckets AS ({bands}),
    cand AS (
      SELECT DISTINCT i.doc_id AS inc_id, h.doc_id AS hist_id
      FROM buckets i JOIN buckets h
        ON i.band_idx = h.band_idx AND i.band_digest = h.band_digest
       AND i.side = 1 AND h.side = 0
    ),
    near_dup AS (
      SELECT DISTINCT inc_id AS doc_id
      FROM cand JOIN hashed b ON cand.inc_id = b.doc_id
                JOIN hashed a ON cand.hist_id = a.doc_id
      WHERE CAST({inter} AS DOUBLE) / (len(a.hx) + len(b.hx) - {inter}) >= {threshold}
    ),
    fps AS (SELECT doc_id, doc_id % 2 AS side,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents),
    exact_dup AS (
      SELECT doc_id FROM fps
      WHERE side = 1 AND fp IN (SELECT fp FROM fps WHERE side = 0)
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id % 2 = 1
      AND doc_id NOT IN (SELECT doc_id FROM near_dup)
      AND doc_id NOT IN (SELECT doc_id FROM exact_dup)
    """


@query("incremental_dedup", _duck_incremental_dedup_sql())
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: incoming docs (odd ids) probed against the
    historical corpus index (even ids) — exact fingerprint membership
    plus LSH band lookup verified at jaccard 0.5; survivors keep their
    original columns (functions/dedup.py incremental_neardup_filter
    documents the precomputed-index economics: the 100 TB history is
    fingerprinted ONCE, an increment touches only index lookups)."""
    d = load_table(spark, sf_dir, "documents")
    history = d.filter(F.col("doc_id") % 2 == 0)
    incoming = d.filter(F.col("doc_id") % 2 == 1)
    out = dd.incremental_neardup_filter(history, incoming, threshold=0.5)
    return out.select("doc_id", "lang", "source")


@query(
    "q11_important_parts",
    """
    WITH v AS (
      SELECT l_partkey,
        CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS value_cq
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_12'
      GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(value_cq) AS BIGINT) AS total FROM v)
    SELECT l_partkey, CAST(value_cq AS DOUBLE) / 100.0 AS part_value
    FROM v, tot
    WHERE value_cq * 1000 > total
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp absent -> lineitem value stands in):
    per-part supplied value within ONE nation, keeping parts whose
    value exceeds 1/1000 of that nation's total — the group-vs-global-
    aggregate HAVING that defines Q11, as an integer cross-multiply
    (value * 1000 > total: no float threshold). Scale: the global total
    is one scalar broadcast back over the per-part aggregate; both aggs
    share the nation-filtered scan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                _cents(F.col("l_extendedprice")) * F.round("l_quantity").cast("long")
            ).alias("value_cq")
        )
    )
    tot = v.agg(F.sum("value_cq").cast("long").alias("total"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cq") * 1000 > F.col("total"))
        .select(
            "l_partkey",
            (F.col("value_cq").cast("double") / 100.0).alias("part_value"),
        )
    )


@query(
    "q20_excess_suppliers",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
        CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey, l_partkey
    ),
    part_tot AS (
      SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS pqty
      FROM shipped GROUP BY l_partkey
    ),
    qual AS (
      SELECT DISTINCT l_suppkey
      FROM shipped JOIN part_tot USING (l_partkey)
      WHERE qty * 2 > pqty
    )
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp absent -> shipped-quantity share
    stands in for availability): suppliers who shipped more than half
    of any 'red%' part's 1996 volume — the nested semi-join chain
    (part name filter -> grouped quantity threshold -> supplier IN)
    that defines Q20, thresholded by integer cross-multiply."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("qty"))
    )
    part_tot = shipped.groupBy("l_partkey").agg(F.sum("qty").cast("long").alias("pqty"))
    qual = (
        shipped.join(part_tot, "l_partkey")
        .filter(F.col("qty") * 2 > F.col("pqty"))
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        qual, s.s_suppkey == qual.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")


# ---------------------------------------------------------------------------
# Training-data surface, batch 3: corpus hygiene — PII scrubbing,
# intra-doc repetition (Gopher signal), eval-set decontamination
# ---------------------------------------------------------------------------


@query(
    "pii_scrub",
    f"""
    SELECT doc_id,
      len(regexp_extract_all(text, '{tx.EMAIL_PATTERN}')) AS n_emails,
      len(regexp_extract_all(text, '{tx.IPV4_PATTERN}')) AS n_ips,
      len(regexp_extract_all(text, '{tx.PHONE_PATTERN}')) AS n_phones,
      md5(regexp_replace(regexp_replace(regexp_replace(text,
            '{tx.EMAIL_PATTERN}', '<EMAIL>', 'g'),
            '{tx.IPV4_PATTERN}', '<IP>', 'g'),
            '{tx.PHONE_PATTERN}', '<PHONE>', 'g')) AS scrubbed_fp
    FROM documents
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene pass: count + redact emails/IPv4s/phones with typed
    placeholders (functions/textstats.pii_scrub). Map-only codegen
    expressions — at 100 TB this is a zero-shuffle full-corpus rewrite;
    the md5 of the scrubbed text keeps the oracle compare small. Note
    the DuckDB pattern strings are backslash-literal while Spark gets
    them through the Python API — same regex either way."""
    d = load_table(spark, sf_dir, "documents")
    n_emails, n_ips, n_phones = tx.pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        F.md5(tx.pii_scrub(F.col("text"))).alias("scrubbed_fp"),
    )


@query(
    "repetition_ratio",
    """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
               FROM documents),
    g AS (SELECT doc_id,
      CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
           ELSE list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS g3
      FROM t)
    SELECT doc_id, len(g3) AS n_3grams,
      CASE WHEN len(g3) = 0 THEN 0.0
           ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) END AS dup_ratio
    FROM g
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: fraction of duplicate word 3-grams
    (the Gopher repetition-filter signal, functions/textstats.dup_ratio).
    Pure array expressions, no shuffle; the gram array materializes at
    ONE select boundary so downstream size/distinct reads don't
    re-tokenize, and double division has one fixed operand order so
    both engines compute the identical IEEE value."""
    d = load_table(spark, sf_dir, "documents")
    # tokenize at its OWN boundary: the gram lambda then slices an
    # attribute (O(1)/element) instead of re-running the regex per gram
    toks = d.select("doc_id", tx.tokens(F.col("text")).alias("toks"))
    grams = toks.select("doc_id", tx.word_ngrams_sql("toks", 3).alias("g3"))
    return grams.select(
        "doc_id",
        F.size("g3").alias("n_3grams"),
        tx.dup_ratio(F.col("g3")).alias("dup_ratio"),
    )


@query(
    "decontaminate",
    f"""
    WITH allfp AS ({_duck_winnow_sql()}),
    bench AS (SELECT DISTINCT fp FROM allfp WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, fp FROM allfp WHERE doc_id % 97 <> 0)
    SELECT corpus.doc_id AS doc_id, COUNT(DISTINCT corpus.fp) AS shared_fps
    FROM corpus JOIN bench USING (fp)
    GROUP BY corpus.doc_id
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: winnowing-fingerprint overlap between
    the corpus and a benchmark set (docs with doc_id % 97 == 0 standing
    in for the eval suite). Any shared fingerprint means a shared
    >= k+w-1 token span (the MOSS guarantee), i.e. real contamination,
    not chance. Scale shape: the benchmark fingerprint set is tiny and
    BROADCAST — candidate generation is a map-side hash probe per
    corpus fingerprint, zero shuffle until the per-doc count."""
    d = load_table(spark, sf_dir, "documents")
    fps = dd.winnowing_fingerprints(d, "doc_id", "text")
    bench = (
        fps.filter(F.col("doc_id") % 97 == 0).select("fp").distinct()
    )
    corpus = fps.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "fp")
        .groupBy("doc_id")
        .agg(F.countDistinct("fp").alias("shared_fps"))
    )


# ---------------------------------------------------------------------------
# Training-data surface, batch 5 (round 4): substring-level dedup
# signal, asymmetric containment, integer-exact unigram LM quality
# ---------------------------------------------------------------------------


@query(
    "duplicated_spans",
    f"""
    WITH t AS (SELECT doc_id, {_duck_toks()} AS toks FROM documents),
    w AS (
      SELECT doc_id, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS fp
      FROM t, unnest(range(1, greatest(len(toks) - 8 + 1, 0) + 1)) AS u(i)
    ),
    c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY fp) AS cnt FROM w),
    d AS (
      SELECT doc_id, COUNT(*) AS nw,
             SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS nd
      FROM c GROUP BY doc_id
    )
    SELECT t.doc_id AS id,
           CAST(COALESCE(d.nw, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(d.nd, 0) AS BIGINT) AS n_dup,
           CASE WHEN COALESCE(d.nw, 0) = 0 THEN 0.0
                ELSE CAST(d.nd AS DOUBLE) / d.nw END AS dup_frac
    FROM t LEFT JOIN d USING (doc_id)
    """,
)
def duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup signal (Lee et al. ExactSubstr): fraction
    of each doc's exact 8-token windows that occur more than once in
    the corpus (functions/dedup.py duplicated_span_stats — shuffles
    keyed on window fingerprint then doc id, never a pair join)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.duplicated_span_stats(d, "doc_id", "text", k=8)


@query(
    "containment_pairs",
    f"""
    WITH t0 AS (SELECT doc_id, source AS block, {_duck_shingles()} AS sh FROM documents),
    t AS (SELECT doc_id, block,
          list_transform(list_transform(sh, s -> md5(s)),
                         m -> {dd.hex_window_sql('m', 1, 'duckdb')}) AS hs
          FROM t0)
    SELECT a.block, a.doc_id AS id_1, b.doc_id AS id_2,
      CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
        / least(len(a.hs), len(b.hs)) AS containment
    FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
        / least(len(a.hs), len(b.hs)) >= 0.5
    """,
)
def containment_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup screen: n-gram CONTAINMENT |A∩B|/min(|A|,|B|)
    within source blocks — catches a short doc quoted wholesale inside
    a long one, which Jaccard under-scores (functions/dedup.py
    containment_pairs; same salted block join as the Jaccard sibling)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.containment_pairs(d, "doc_id", "text", "source", threshold=0.5)


@query(
    "unigram_commonness",
    f"""{_duck_unigram_cte()}
    SELECT doc_id AS id,
           CAST(COALESCE(d.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(d.info_bits, 0) AS BIGINT) AS info_bits,
           CASE WHEN COALESCE(d.n_tokens, 0) = 0 THEN 0.0
                ELSE CAST(d.info_bits AS DOUBLE) / d.n_tokens END AS mean_bits
    FROM documents LEFT JOIN d ON documents.doc_id = d.id
    """,
)
def unigram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact unigram LM quality proxy: per-doc mean of
    floor(log2(corpus term frequency)) — the cheap stand-in for a KenLM
    perplexity gate, portable because the "log" is binary-string length
    (functions/textstats.py unigram_commonness; vocabulary join is the
    only non-doc-keyed shuffle and broadcasts when the vocab fits)."""
    d = load_table(spark, sf_dir, "documents")
    return tx.unigram_commonness(d, "doc_id", "text")


@query(
    "corpus_shuffle",
    f"""
    WITH d AS (
      SELECT doc_id AS id, {cp.hash_uniform_expr('doc_id', 'duckdb')} AS u
      FROM documents
    )
    SELECT id, CAST(u % 16 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY u % 16 ORDER BY u, id) AS BIGINT) AS pos
    FROM d
    """,
)
def corpus_shuffle_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle (functions/corpus.py
    corpus_shuffle): md5-draw shard + in-shard rank — a reproducible
    RNG-free permutation; one shard-keyed exchange + shard-local sort,
    never a global sort."""
    d = load_table(spark, sf_dir, "documents")
    return cp.corpus_shuffle(d, "doc_id", shards=16)


@query(
    "span_dedup_materialize",
    f"""
    WITH t AS (SELECT doc_id AS id, {_duck_toks()} AS toks FROM documents),
    w AS (
      SELECT id, i AS pos, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS fp
      FROM t, unnest(range(1, greatest(len(toks) - 8 + 1, 0) + 1)) AS u(i)
    ),
    c AS (SELECT id, pos, COUNT(*) OVER (PARTITION BY fp) AS cnt FROM w),
    cov AS (
      SELECT DISTINCT s.id, s.pos + j AS p
      FROM (SELECT id, pos FROM c WHERE cnt >= 2) s, unnest(range(0, 8)) AS v(j)
    ),
    tok AS (
      SELECT id, j AS p, toks[j] AS tok
      FROM t, unnest(range(1, len(toks) + 1)) AS v(j)
    ),
    kept AS (
      SELECT tok.id, tok.p, tok.tok FROM tok
      LEFT JOIN cov ON tok.id = cov.id AND tok.p = cov.p
      WHERE cov.id IS NULL
    ),
    r AS (
      SELECT id, COUNT(*) AS n_kept, string_agg(tok, ' ' ORDER BY p) AS clean_text
      FROM kept GROUP BY id
    )
    SELECT t.id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           md5(COALESCE(r.clean_text, '')) AS clean_fp
    FROM t LEFT JOIN r USING (id)
    """,
)
def span_dedup_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr dedup TRANSFORM: every token covered by a
    corpus-duplicated 8-token window is dropped and the survivors
    reassembled in order (functions/dedup.py remove_duplicated_spans).
    Hash of the rebuilt text proves both engines removed exactly the
    same spans."""
    d = load_table(spark, sf_dir, "documents")
    out = dd.remove_duplicated_spans(d, "doc_id", "text", k=8)
    return out.select(
        "id", "n_tokens", "n_kept", F.md5("clean_text").alias("clean_fp")
    )


# ---------------------------------------------------------------------------
# Round-4 session-3 additions: DSIR importance weighting and GROUPING
# SETS coverage.
# ---------------------------------------------------------------------------


@query(
    "dsir_proxy",
    f"""
    WITH tok AS (
      SELECT doc_id AS id, lang = 'en' AS is_tgt, unnest({_duck_toks()}) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term,
        COUNT(*) AS cnt_r,
        COUNT(*) FILTER (WHERE is_tgt) AS cnt_t
      FROM tok GROUP BY term
    ),
    w AS (
      SELECT term,
        CAST((length(to_base(cnt_t + 1, 2)) - 1)
           - (length(to_base(cnt_r + 1, 2)) - 1) AS BIGINT) AS w
      FROM vocab
    ),
    d AS (
      SELECT id, COUNT(*) AS n_tokens, CAST(SUM(w) AS BIGINT) AS dsir_bits
      FROM tok JOIN w USING (term) GROUP BY id
    )
    SELECT doc_id AS id,
           CAST(COALESCE(d.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(d.dsir_bits, 0) AS BIGINT) AS dsir_bits,
           CASE WHEN COALESCE(d.n_tokens, 0) = 0 THEN 0.0
                ELSE CAST(d.dsir_bits AS DOUBLE) / d.n_tokens END AS mean_dsir
    FROM documents LEFT JOIN d ON documents.doc_id = d.id
    """,
)
def dsir_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (functions/textstats.dsir_importance):
    score every document by its hashed-unigram log-likelihood ratio
    against a target distribution (here lang='en' stands in for the
    curated in-domain set), the selection signal behind importance
    resampling of raw corpora. Integer bit arithmetic end to end — the
    normalizer constant cancels for ranking."""
    d = load_table(spark, sf_dir, "documents")
    return tx.dsir_importance(d, F.col("lang") == "en", "doc_id", "text")


@query(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id disambiguation — the third
    multi-granularity aggregate shape next to rollup/cube (both
    engines' gid is the same left-to-right bit vector, 1 = rolled up).
    One pass over orders; Catalyst expands the sets map-side before the
    single exchange."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / F.lit(100.0)).alias(
                "total_price"
            ),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "gid",
            "n",
            "total_price",
        )
    )


@query(
    "range_frame_user_spend",
    """
    WITH p AS (
      SELECT user_id, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS tsu,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id, tsu,
      CAST(SUM(cents) OVER (
        PARTITION BY user_id ORDER BY tsu
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS spend_1h_cents
    FROM p
    """,
)
def range_frame_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval window frame (RANGE BETWEEN INTERVAL): per-user
    trailing-1-hour spend at every purchase — the time-based sibling of
    the ROWS frames elsewhere (user_value_trend). RANGE frames include
    timestamp peers, so the result is deterministic under ties. One
    exchange on user_id; the frame scan is per-partition."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tsu"),
        _cents(F.col("value")).alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsu")
        .rangeBetween(-3_600_000_000, 0)
    )
    return p.select(
        "user_id",
        "event_id",
        "tsu",
        F.sum("cents").over(w).cast("long").alias("spend_1h_cents"),
    )


_KMV_DAILY_K = 64


def _kmv_daily_users_oracle() -> str:
    h = sk.hash40_expr("user_id", "duckdb")
    est = (
        f"CASE WHEN got_k < {_KMV_DAILY_K} THEN CAST(got_k AS DOUBLE)"
        f" ELSE CAST({(_KMV_DAILY_K - 1) * (1 << 40)} AS DOUBLE) / kth_min END"
    )
    return f"""
    WITH h AS (
      SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, {h} AS hv
      FROM events
    ),
    ranked AS (
      SELECT day, hv, row_number() OVER (PARTITION BY day ORDER BY hv) AS rk FROM h
    ),
    kept AS (SELECT day, hv FROM ranked WHERE rk <= {_KMV_DAILY_K}),
    daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS got_k, MAX(hv) AS kth_min
      FROM kept GROUP BY day
    ),
    merged_kept AS (
      SELECT hv FROM (SELECT DISTINCT hv FROM kept ORDER BY hv LIMIT {_KMV_DAILY_K})
    ),
    merged AS (
      SELECT CAST(-1 AS BIGINT) AS day, CAST(COUNT(*) AS BIGINT) AS got_k,
             MAX(hv) AS kth_min
      FROM merged_kept
    )
    SELECT day, got_k, kth_min, {est} AS kmv_estimate FROM daily
    UNION ALL
    SELECT day, got_k, kth_min, {est} AS kmv_estimate FROM merged
    """


@query("kmv_daily_users", _kmv_daily_users_oracle())
def kmv_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED mergeable sketches: per-day distinct-user KMV states
    (k smallest md5-uniform hashes per day) plus the MERGED total-period
    estimate computed from the daily states alone (day = -1 row) —
    sketch once per ingest day, merge for any horizon, never re-scan
    history (functions/sketches.py kmv_minima/kmv_merge economics, here
    as one oracle-gated plan). Deterministic: the shared md5 uniform
    makes sketch state and estimates bit-identical across engines."""
    from pyspark.sql import Window

    k = _KMV_DAILY_K
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
            F.expr(sk.hash40_expr("user_id", "spark")).alias("hv"),
        )
        .distinct()
    )
    rk = Window.partitionBy("day").orderBy("hv")
    kept = (
        h.withColumn("rk", F.row_number().over(rk)).filter(F.col("rk") <= k).drop("rk")
    ).localCheckpoint(eager=False)
    est = (
        f"CASE WHEN got_k < {k} THEN CAST(got_k AS DOUBLE)"
        f" ELSE CAST({(k - 1) * (1 << 40)} AS DOUBLE) / kth_min END"
    )
    daily = kept.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("got_k"), F.max("hv").alias("kth_min")
    )
    merged = (
        kept.select("hv")
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(
            F.lit(-1).cast("long").alias("day"),
            F.count(F.lit(1)).cast("long").alias("got_k"),
            F.max("hv").alias("kth_min"),
        )
    )
    return daily.unionByName(merged).select(
        "day", "got_k", "kth_min", F.expr(est).alias("kmv_estimate")
    )


@query(
    "text_rp_embedding",
    f"""
    WITH t AS (
      SELECT doc_id,
        list_transform(list_transform({_duck_toks()}, x -> md5(x)),
                       m -> {dd.hex_window_sql('m', 1, 'duckdb', width=15)}) AS th
      FROM documents
    ),
    e AS (
      SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens,
        list_transform(range(0, {dd.SIMHASH_BITS}), b ->
          CAST(2 * len(list_filter(th, h -> (h // CAST(pow(2, b) AS BIGINT)) % 2 = 1))
               - len(th) AS BIGINT)) AS emb
      FROM t
    )
    SELECT doc_id, n_tokens,
           emb[1] AS d0, emb[2] AS d1, emb[3] AS d2, emb[4] AS d3,
           md5(array_to_string(emb, ',')) AS emb_fp
    FROM e
    """,
)
def text_rp_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free text embeddings by feature hashing (functions/dedup.py
    rp_text_embedding): the SimHash accumulator without the sign
    threshold — 60 exact-integer dimensions per doc whose cosine tracks
    token overlap, bridging the text corpus into the vector operators
    (ANN tiers, semantic dedup) with no model dependency. The oracle
    hashes the full vector (emb_fp) and spot-checks four dimensions."""
    d = load_table(spark, sf_dir, "documents")
    e = dd.rp_text_embedding(d, "doc_id", "text")
    return e.select(
        "doc_id",
        "n_tokens",
        F.expr("emb[0]").alias("d0"),
        F.expr("emb[1]").alias("d1"),
        F.expr("emb[2]").alias("d2"),
        F.expr("emb[3]").alias("d3"),
        F.md5(F.expr("concat_ws(',', transform(emb, x -> CAST(x AS STRING)))")).alias(
            "emb_fp"
        ),
    )


def _duck_index_stats_sql() -> str:
    lanes = ", ".join(
        f"CAST(list_min(list_transform(generate_series(1, len(hx)),"
        f" k -> ({a} * hx[k] + {b} * hy[k]) % {dd._LANE_MOD})) AS VARCHAR)"
        for a, b in dd.LANE_CONSTANTS
    )
    bands = " UNION ALL ".join(
        f"(SELECT doc_id, {b} AS band_idx,"
        f" md5(array_to_string(list_slice(sig, {b * dd.ROWS_PER_BAND + 1},"
        f" {b * dd.ROWS_PER_BAND + dd.ROWS_PER_BAND}), '|')) AS band_digest FROM sigs)"
        for b in range(dd.BANDS)
    )
    px = dd.hex_window_sql("m", 1, "duckdb")
    py = dd.hex_window_sql("m", 11, "duckdb")
    return f"""
    WITH docs AS (SELECT doc_id, {_duck_shingles()} AS sh FROM documents),
    digests AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS mh FROM docs),
    hashed AS (SELECT doc_id,
        list_transform(mh, m -> {px}) AS hx,
        list_transform(mh, m -> {py}) AS hy
      FROM digests),
    sigs AS (SELECT doc_id, [{lanes}] AS sig FROM hashed),
    buckets AS ({bands}),
    sizes AS (
      SELECT band_idx, band_digest, COUNT(*) AS bucket_n
      FROM buckets GROUP BY band_idx, band_digest
    )
    SELECT CAST(band_idx AS INT) AS band_idx, bucket_n,
           COUNT(*) AS n_buckets,
           CAST(SUM((bucket_n * (bucket_n - 1)) // 2) AS BIGINT) AS candidate_pairs
    FROM sizes GROUP BY band_idx, bucket_n
    """


@query("dedup_index_stats", _duck_index_stats_sql())
def dedup_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH index observability: the band-bucket size histogram plus the
    candidate-pair mass each (band, size) class would generate — the
    skew signal that motivates the hot-bucket cap (a boilerplate
    bucket of size k contributes k(k-1)/2 candidates; operators watch
    this to pick MAX_BUCKET before a stuck-straggler task does it for
    them). One explode + two combiner-friendly aggregations; never
    touches pair space."""
    d = load_table(spark, sf_dir, "documents")
    sizes = (
        dd.minhash_buckets(d, "doc_id", "text")
        .groupBy("band_idx", "band_digest")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
    )
    return sizes.groupBy("band_idx", "bucket_n").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr("bucket_n * (bucket_n - 1) DIV 2")).cast("long").alias(
            "candidate_pairs"
        ),
    )


@query(
    "set_ops_multiset",
    """
    WITH a AS (SELECT l_suppkey AS k FROM lineitem),
    b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
    ea AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
    ia AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    SELECT 'except_all' AS op, k, COUNT(*) AS n FROM ea GROUP BY k
    UNION ALL
    SELECT 'intersect_all', k, COUNT(*) AS n FROM ia GROUP BY k
    """,
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set algebra (EXCEPT ALL / INTERSECT ALL) — bag
    semantics preserve duplicate counts, the variant the
    distinct-based cohorts query (set_ops_customers) does not
    exercise. Catalyst lowers both to a single aggregate-join on the
    key (no row-number trick needed)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    ea = a.exceptAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "k", "n"
    )
    ia = a.intersectAll(b).groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "k", "n"
    )
    return ea.unionByName(ia)


@query(
    "string_agg_region_nations",
    """
    SELECT r_name AS region,
           COUNT(*) AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def string_agg_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG ... WITHIN GROUP, new in
    Spark 4): deterministic because the ORDER BY key is total — the
    digest/report shape analytics users reach for constantly. Both
    dims broadcast; one tiny exchange on the group key."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
        )
    )


@query(
    "median_quantity_by_flag",
    """
    SELECT l_returnflag AS flag, COUNT(*) AS n,
           median(l_quantity) AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def median_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped MEDIAN (Spark 4 median == DuckDB median: middle
    element, or the single IEEE mean of the two middles — identical
    operands, identical op, so cross-engine exact on this integral
    column). The exact-percentile sibling of the approx sketches."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.median("l_quantity").alias("med_qty"),
    )


# ---------------------------------------------------------------------------
# Round-5 training-prep additions: temperature mixing, chunking,
# length-bucketed batching.
# ---------------------------------------------------------------------------


@query("temperature_mixing", cp.temperature_mixing_sql(k2=4))
def temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style tau=0.5 source rebalancing: keep each doc of
    source s with p = min(1, sqrt(4/n_s)) — big sources shrink toward
    sqrt(n_s), small ones survive whole. The sqrt never touches a
    float: the draw condition squares into U^2 * n_s < k2 * 2^80
    (DECIMAL(38,0) vs DuckDB HUGEINT — both exact). Map-only after a
    tiny broadcast source-count join (functions/corpus.py)."""
    d = load_table(spark, sf_dir, "documents")
    return cp.temperature_mixing(d, k2=4).select("doc_id", "source")


def _duck_chunks_sql(window: int = 64, stride: int = 48) -> str:
    t = _duck_toks()
    return f"""
    WITH d AS (SELECT doc_id, {t} AS toks FROM documents),
    s AS (
      SELECT doc_id, toks, len(toks) AS n, unnest(generate_series(0, len(toks) - 1, {stride})) AS start_tok
      FROM d WHERE len(toks) > 0
    )
    SELECT doc_id,
           start_tok // {stride} AS chunk_idx,
           start_tok,
           least({window}, n - start_tok) AS n_tok,
           array_to_string(list_slice(toks, start_tok + 1, start_tok + least({window}, n - start_tok)), ' ') AS chunk_text
    FROM s
    """


@query("chunk_documents", _duck_chunks_sql())
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document chunking for pretraining: 64-token windows
    advancing by 48 (16 tokens of overlap carry context across
    boundaries). Map-only — sequence + posexplode inside the row, no
    keyed shuffle; 100 TB in, chunks out (functions/corpus.py)."""
    d = load_table(spark, sf_dir, "documents")
    return cp.chunk_documents(d, window=64, stride=48)


def _duck_length_buckets_sql(
    bucket_width: int = 32, max_bucket: int = 8, batch_size: int = 16
) -> str:
    t = _duck_toks()
    u = cp.hash_uniform_expr("doc_id", "duckdb")
    return f"""
    WITH d AS (
      SELECT doc_id, len({t}) AS n_tok, {u} AS u FROM documents
    ),
    b AS (
      SELECT doc_id, n_tok, least(n_tok // {bucket_width}, {max_bucket}) AS bucket, u
      FROM d
    )
    SELECT doc_id, n_tok, bucket,
           (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY u, doc_id) - 1) // {batch_size} AS batch_idx
    FROM b
    """


@query("length_buckets", _duck_length_buckets_sql())
def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batch assignment (padding-efficiency step):
    bucket by token count, deterministic md5-shuffle order within the
    bucket, batch_idx = seq DIV batch_size. One exchange keyed on
    bucket + shard-local sort (functions/corpus.py)."""
    d = load_table(spark, sf_dir, "documents")
    return cp.length_buckets(d)


@query(
    "activity_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    grp AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
      FROM days
    ),
    runs AS (SELECT user_id, g, COUNT(*) AS run_len FROM grp GROUP BY user_id, g)
    SELECT user_id,
           CAST(MAX(run_len) AS BIGINT) AS longest_streak,
           CAST(SUM(run_len) AS BIGINT) AS n_active_days
    FROM runs GROUP BY user_id
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active DAYS per
    user (day - row_number() constant within a run — the classic
    formulation). All-integer day arithmetic (epoch-microsecond DIV),
    one user-keyed exchange serves the window and both rollups."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("g", F.col("day") - F.row_number().over(w))
    runs = grp.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").cast("long").alias("longest_streak"),
        F.sum("run_len").cast("long").alias("n_active_days"),
    )


@query(
    "customer_spend_distribution",
    """
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, total_cents,
           percent_rank() OVER (ORDER BY total_cents, o_custkey) AS pct_rank,
           cume_dist() OVER (ORDER BY total_cents, o_custkey) AS cume
    FROM spend
    """,
)
def customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) over
    integer-cents customer spend. The ORDER BY key is total (cents,
    custkey), so ranks are deterministic; both functions are single
    IEEE divisions of exact integers — engine-identical. One global
    sort (inherent to unpartitioned ranking); at scale partition by a
    spend bucket first."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("total_cents")
    )
    w = Window.orderBy("total_cents", "o_custkey")
    return spend.select(
        "o_custkey", "total_cents",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "packing_efficiency",
    """
    WITH t AS (
      SELECT source AS part, doc_id AS id,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT *, CAST(coalesce(SUM(n_tokens) OVER (
        PARTITION BY part ORDER BY id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
      FROM t
    ),
    p AS (SELECT part, id, n_tokens, cum // 2048 AS bin FROM c)
    SELECT part,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
           CAST(SUM(n_tokens) AS DOUBLE) / ((MAX(bin) + 1) * 2048) AS fill_ratio
    FROM p GROUP BY part
    """,
)
def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing observability: per source, bins used and fill ratio of
    the 2048-token packed layout — the number a pipeline owner watches
    to size the packing budget (fill near 1.0 = negligible padding).
    One IEEE division of exact integers; same window as pack_sequences,
    one part-keyed exchange."""
    d = load_table(spark, sf_dir, "documents")
    pack = cp.pack_sequences(d, budget=2048)
    return pack.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.max("bin") + 1).cast("long").alias("n_bins"),
        (
            F.sum("n_tokens").cast("double")
            / ((F.max("bin") + 1) * 2048)
        ).alias("fill_ratio"),
    )


@query(
    "contamination_report",
    f"""
    WITH allfp AS ({_duck_winnow_sql()}),
    bench AS (SELECT DISTINCT doc_id, fp FROM allfp WHERE doc_id % 97 = 0),
    corpus AS (SELECT DISTINCT doc_id, fp FROM allfp WHERE doc_id % 97 <> 0)
    SELECT bench.doc_id AS bench_doc_id,
           CAST(COUNT(DISTINCT corpus.doc_id) AS BIGINT) AS leaking_docs,
           CAST(COUNT(DISTINCT corpus.fp) AS BIGINT) AS shared_fps
    FROM bench JOIN corpus USING (fp)
    GROUP BY bench.doc_id
    """,
)
def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval-suite owner's view of decontaminate: per BENCHMARK doc,
    how many corpus docs share a winnowing fingerprint with it and how
    many distinct fingerprints leak — which eval items are compromised
    and how badly. Same broadcast-probe economics (the benchmark side
    is tiny)."""
    d = load_table(spark, sf_dir, "documents")
    fps = dd.winnowing_fingerprints(d, "doc_id", "text")
    bench = fps.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_doc_id"), "fp"
    ).distinct()
    corpus = fps.filter(F.col("doc_id") % 97 != 0).select("doc_id", "fp").distinct()
    return (
        corpus.join(F.broadcast(bench), "fp")
        .groupBy("bench_doc_id")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("leaking_docs"),
            F.countDistinct("fp").cast("long").alias("shared_fps"),
        )
    )


@query(
    "heavy_hitters_cms",
    f"""
    {sk.cms_topk_sql('user_id', 'events', top_n=20, depth=4, width=512)}
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters under Count-Min (functions/sketches.py cms_*,
    Cormode-Muthukrishnan 2005): the 20 most active users by exact
    count, each with its CMS point estimate (4 x 512 counters). The
    sketch is the scale artifact — bounded additive state a 100 TB
    event stream folds into map-side (partial counters per partition,
    mergeable across days via cms_merge); the exact top-20 here is the
    small-SF truth the estimate is gated against (est >= exact always;
    over by at most eps*N). Deterministic md5 buckets make the sketch
    itself hash-comparable, the same trick as the KMV family."""
    ev = load_table(spark, sf_dir, "events")
    sketch = sk.cms_sketch(ev, "user_id", depth=4, width=512)
    top = (
        ev.groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "key")
        .limit(20)
        .localCheckpoint(eager=False)  # consumed twice: probe keys + output join
    )
    est = sk.cms_estimate(sketch, top, "key", depth=4, width=512)
    return top.join(est, "key")


@query(
    "kmv_distinct_by_priority",
    sk.kmv_distinct_grouped_sql("o_orderpriority", "o_custkey", "orders", k=64),
)
def kmv_distinct_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP distinct-count sketch (functions/sketches.py
    kmv_distinct_grouped): distinct customers per order priority from
    k=64 per-group hash minima — the per-source dashboard query
    (distinct users per day, keys per table) at bounded state. k=64
    keeps every priority in the ESTIMATING regime at both gate scales
    (got_k = k), so the gate pins the estimator arithmetic, not the
    exact-count fallback. The window that folds the minima runs over
    distinct (grp, 8-byte hash) pairs, never source rows; per-batch
    states merge via kmv_merge_grouped without re-scanning."""
    o = load_table(spark, sf_dir, "orders")
    return sk.kmv_distinct_grouped(o, "o_orderpriority", "o_custkey", k=64)


@query(
    "heavy_hitters_cms_by_type",
    sk.cms_topk_grouped_sql("event_type", "user_id", "events",
                            top_n=5, depth=4, width=512),
)
def heavy_hitters_cms_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP heavy hitters under Count-Min (functions/sketches.py
    cms_sketch_grouped): each event type's 5 most active users with
    their per-group CMS estimates — 4 x 512 additive counters PER
    GROUP, map-side partial-aggregated, mergeable across days via
    cms_merge_grouped. The grouped probe join broadcasts the sketch
    (|groups| * depth * width rows — dashboard-sized). est >= exact
    always, within eps*N_group per group."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sketch = sk.cms_sketch_grouped(ev, "event_type", "user_id",
                                   depth=4, width=512)
    w = Window.partitionBy("grp").orderBy(F.desc("exact_cnt"), "key")
    top = (
        ev.groupBy(
            F.col("event_type").alias("grp"), F.col("user_id").alias("key")
        )
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 5)
        .drop("__rn")
        .localCheckpoint(eager=False)  # consumed twice: probe keys + output join
    )
    est = sk.cms_estimate_grouped(sketch, top, depth=4, width=512)
    return top.join(est, ["grp", "key"])


def _dq_drift_oracle() -> str:
    """DuckDB mirror of dq_drift_orders: the same sketch cells on each
    side, TV distance as the identical integer cross-multiplication
    (DECIMAL(18) cells, totals as direct COUNTs), and the KMV ratio as
    the same exact integer rational the Spark side emits (per-side
    estimate = got_k/1 exact regime, (k-1)*2^40/kth_min estimating) —
    every row is (name, BIGINT num, BIGINT denom, derived double) —
    BIGINT emission because DECIMAL(38,0) was the one output shape the
    two engines' hash canonicalizations disagreed on (r11: int128 vs
    java BigDecimal; values bit-identical by repr, hash red), and every
    emitted integer here is engineered < 2^53."""
    e, sub = sk._loghist_bucket_sql("x", 16, "duckdb")
    cms_rows_b = " UNION ALL ".join(
        f"SELECT {r} AS row, {sk.cms_bucket_sql('o_orderpriority', r, 512, 'duckdb')} AS bucket"
        f" FROM orders WHERE o_orderkey % 2 = 0"
        for r in range(4)
    )
    cms_rows_c = " UNION ALL ".join(
        f"SELECT {r} AS row, {sk.cms_bucket_sql('o_orderstatus', r, 512, 'duckdb')} AS bucket"
        f" FROM orders WHERE o_orderkey % 2 = 1"
        for r in range(4)
    )
    kmv_b = sk.kmv_distinct_sql(
        "o_custkey", "(SELECT * FROM orders WHERE o_orderkey % 2 = 0)", k=256
    )
    kmv_c = sk.kmv_distinct_sql(
        "o_custkey", "(SELECT * FROM orders WHERE o_orderkey % 3 = 0)", k=256
    )
    return f"""
    WITH bl_v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
      FROM orders WHERE o_orderkey % 2 = 0
        AND CAST(round(o_totalprice * 100) AS BIGINT) > 0
    ),
    cu_v AS (
      SELECT CAST(round(o_totalprice * 300) AS BIGINT) AS x
      FROM orders WHERE o_orderkey % 2 = 1
        AND CAST(round(o_totalprice * 300) AS BIGINT) > 0
    ),
    bl_lh AS (SELECT e, sub, COUNT(*) AS cnt
              FROM (SELECT {e} AS e, {sub} AS sub FROM bl_v) GROUP BY 1, 2),
    cu_lh AS (SELECT e, sub, COUNT(*) AS cnt
              FROM (SELECT {e} AS e, {sub} AS sub FROM cu_v) GROUP BY 1, 2),
    lh_j AS (
      SELECT CAST(COALESCE(b.cnt, 0) AS DECIMAL(18,0)) AS b_cnt,
             CAST(COALESCE(c.cnt, 0) AS DECIMAL(18,0)) AS c_cnt
      FROM bl_lh b FULL OUTER JOIN cu_lh c
        ON b.e = c.e AND b.sub = c.sub
    ),
    lh_tot AS (
      SELECT CAST((SELECT COUNT(*) FROM bl_v) AS DECIMAL(18,0)) AS n_b,
             CAST((SELECT COUNT(*) FROM cu_v) AS DECIMAL(18,0)) AS n_c
    ),
    lh AS (
      SELECT 'drift:loghist_tv' AS check_name,
             CAST(SUM(ABS(b_cnt * n_c - c_cnt * n_b)) AS DECIMAL(38,0)) AS drift_num,
             CAST(2 * n_b * n_c AS DECIMAL(38,0)) AS drift_denom
      FROM lh_j, lh_tot GROUP BY n_b, n_c
    ),
    bl_cms AS (SELECT row, bucket, COUNT(*) AS cnt
               FROM ({cms_rows_b}) GROUP BY 1, 2),
    cu_cms AS (SELECT row, bucket, COUNT(*) AS cnt
               FROM ({cms_rows_c}) GROUP BY 1, 2),
    cms_j AS (
      SELECT CAST(COALESCE(b.cnt, 0) AS DECIMAL(18,0)) AS b_cnt,
             CAST(COALESCE(c.cnt, 0) AS DECIMAL(18,0)) AS c_cnt
      FROM bl_cms b FULL OUTER JOIN cu_cms c
        ON b.row = c.row AND b.bucket = c.bucket
    ),
    cms_tot AS (
      SELECT CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0)
                  AS DECIMAL(18,0)) AS n_b,
             CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 1)
                  AS DECIMAL(18,0)) AS n_c
    ),
    cms AS (
      SELECT 'drift:cms_tv' AS check_name,
             CAST(SUM(ABS(b_cnt * n_c - c_cnt * n_b)) AS DECIMAL(38,0)) AS drift_num,
             CAST(2 * 4 * n_b * n_c AS DECIMAL(38,0)) AS drift_denom
      FROM cms_j, cms_tot GROUP BY n_b, n_c
    ),
    kmv AS (
      -- the ratio as an exact integer rational; when BOTH sides are
      -- in the estimating regime the shared 2^40 factor cancels so
      -- every emitted integer stays < 2^53 (float64-exact)
      SELECT 'drift:kmv_ratio' AS check_name,
             CAST(CASE
               WHEN c.got_k >= c.k AND b.got_k >= b.k
                 THEN (c.k - 1) * b.kth_min
               ELSE (CASE WHEN c.got_k < c.k THEN c.got_k
                          ELSE (c.k - 1) * {1 << 40} END)
                    * (CASE WHEN b.got_k < b.k THEN 1
                            ELSE b.kth_min END)
             END AS DECIMAL(38,0)) AS drift_num,
             CAST(CASE
               WHEN c.got_k >= c.k AND b.got_k >= b.k
                 THEN (b.k - 1) * c.kth_min
               ELSE (CASE WHEN c.got_k < c.k THEN 1
                          ELSE c.kth_min END)
                    * (CASE WHEN b.got_k < b.k THEN b.got_k
                            ELSE (b.k - 1) * {1 << 40} END)
             END AS DECIMAL(38,0)) AS drift_denom
      FROM ({kmv_b}) b, ({kmv_c}) c
    )
    SELECT check_name,
           CAST(drift_num AS BIGINT) AS drift_num,
           CAST(drift_denom AS BIGINT) AS drift_denom,
           CAST(drift_num AS DOUBLE) / CAST(drift_denom AS DOUBLE) AS stat
    FROM lh
    UNION ALL
    SELECT check_name,
           CAST(drift_num AS BIGINT) AS drift_num,
           CAST(drift_denom AS BIGINT) AS drift_denom,
           CAST(drift_num AS DOUBLE) / CAST(drift_denom AS DOUBLE) AS stat
    FROM cms
    UNION ALL
    SELECT check_name,
           CAST(drift_num AS BIGINT) AS drift_num,
           CAST(drift_denom AS BIGINT) AS drift_denom,
           CAST(drift_num AS DOUBLE) / CAST(drift_denom AS DOUBLE) AS stat
    FROM kmv
    ORDER BY check_name
    """


@query("dq_drift_orders", _dq_drift_oracle())
def dq_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift gate (functions/dq.py dq_drift_report — the
    profiler -> DQ bridge): two fixture-derived sketch profiles
    (baseline = even order keys, current = odd keys with prices x3
    and a different CMS key column, plus a larger KMV population)
    compared as KMV cardinality ratio + total-variation distances of
    the loghist/CMS histograms. ALL three stats are EXACT integer
    rationals (cross-multiplied counts for TV; the cross-product of
    the two KMV estimator rationals for the ratio — engine- and
    order-independent), which is what makes a drift METRIC
    hash-gatable at all; the convenience double is one division of
    those integers, and no gated column is ever NULL (r10's red row
    traced to NULL-decimal canonicalization in the hash path).
    drift_num/drift_denom emit as BIGINT under a loud 2^53 guard —
    r11's red rows isolated DECIMAL(38,0) output as the one shape the
    two engines' hash canonicalizations disagree on (int128 vs java
    BigDecimal) even with bit-identical values.
    At 100 TB the comparison runs over bounded sketch cells — the
    gate a pipeline runs against a blessed baseline before promoting
    an increment (StreamProfileJob.drift_vs)."""
    from dtle_spark.functions.dq import dq_drift_report

    o = load_table(spark, sf_dir, "orders")
    even = o.filter("o_orderkey % 2 = 0")
    odd = o.filter("o_orderkey % 2 = 1")
    third = o.filter("o_orderkey % 3 = 0")
    # fused cms+loghist cell build (r16): one scan + one aggregation
    # per side instead of two of each (sketches.drift_cells — same
    # cells, same counts; the TV rows come out bit-identical)
    baseline = {
        "kmv": sk.kmv_distinct(even, "o_custkey", k=256),
        "cells": sk.drift_cells(
            even, "o_orderpriority",
            "CAST(round(o_totalprice * 100) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    current = {
        "kmv": sk.kmv_distinct(third, "o_custkey", k=256),
        "cells": sk.drift_cells(
            odd, "o_orderstatus",
            "CAST(round(o_totalprice * 300) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    return dq_drift_report(baseline, current, depth=4)


def _dq_drift_grouped_oracle() -> str:
    """DuckDB mirror of dq_drift_by_priority: per-group sketch cells
    on each side, presence flags from a full-outer over the group
    sets, the per-group KMV ratio as the same exact integer rational
    (with the both-estimating 2^40 cancellation), per-group TV as the
    identical integer cross-multiplication with per-group totals."""
    u40 = 1 << 40
    e, sub = sk._loghist_bucket_sql("x", 16, "duckdb")
    kb = sk.kmv_distinct_grouped_sql(
        "o_orderpriority", "o_custkey", "bl", k=64
    )
    kc = sk.kmv_distinct_grouped_sql(
        "o_orderpriority", "o_custkey", "cu", k=64
    )
    cms_cells = lambda t: " UNION ALL ".join(  # noqa: E731
        f"SELECT o_orderpriority AS grp, {r} AS row,"
        f" {sk.cms_bucket_sql('o_orderstatus', r, 512, 'duckdb')} AS bucket"
        f" FROM {t}"
        for r in range(4)
    )
    rat = (
        "CASE WHEN c.got_k >= c.k AND b.got_k >= b.k"
        "  THEN (c.k - 1) * b.kth_min"
        f" ELSE (CASE WHEN c.got_k < c.k THEN c.got_k"
        f"            ELSE (c.k - 1) * {u40} END)"
        "      * (CASE WHEN b.got_k < b.k THEN 1 ELSE b.kth_min END) END"
    )
    rat_d = (
        "CASE WHEN c.got_k >= c.k AND b.got_k >= b.k"
        "  THEN (b.k - 1) * c.kth_min"
        f" ELSE (CASE WHEN c.got_k < c.k THEN 1 ELSE c.kth_min END)"
        f"      * (CASE WHEN b.got_k < b.k THEN b.got_k"
        f"              ELSE (b.k - 1) * {u40} END) END"
    )
    return f"""
    WITH bl AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
    cu AS (SELECT * FROM orders
           WHERE o_orderkey % 2 = 1 AND o_orderpriority <> '1-URGENT'),
    kb AS ({kb}),
    kc AS ({kc}),
    pres AS (
      SELECT 'drift:presence' AS check_name,
             COALESCE(b.grp, c.grp) AS grp,
             CAST(CASE WHEN b.grp IS NOT NULL THEN 1 ELSE 0 END
                  AS DECIMAL(38,0)) AS drift_num,
             CAST(CASE WHEN c.grp IS NOT NULL THEN 1 ELSE 0 END
                  AS DECIMAL(38,0)) AS drift_denom,
             CAST((CASE WHEN b.grp IS NOT NULL THEN 1 ELSE 0 END)
                  - (CASE WHEN c.grp IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) AS stat
      FROM kb b FULL OUTER JOIN kc c ON b.grp = c.grp
    ),
    ratio AS (
      SELECT 'drift:kmv_ratio' AS check_name, c.grp,
             CAST({rat} AS DECIMAL(38,0)) AS drift_num,
             CAST({rat_d} AS DECIMAL(38,0)) AS drift_denom,
             CAST(CAST({rat} AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST({rat_d} AS DECIMAL(38,0)) AS DOUBLE) AS stat
      FROM kc c JOIN kb b ON c.grp = b.grp
    ),
    bl_v AS (SELECT o_orderpriority AS grp,
                    CAST(round(o_totalprice * 100) AS BIGINT) AS x
             FROM bl WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
    cu_v AS (SELECT o_orderpriority AS grp,
                    CAST(round(o_totalprice * 300) AS BIGINT) AS x
             FROM cu WHERE CAST(round(o_totalprice * 300) AS BIGINT) > 0),
    bl_lh AS (SELECT grp, e, sub, COUNT(*) AS cnt
              FROM (SELECT grp, {e} AS e, {sub} AS sub FROM bl_v)
              GROUP BY 1, 2, 3),
    cu_lh AS (SELECT grp, e, sub, COUNT(*) AS cnt
              FROM (SELECT grp, {e} AS e, {sub} AS sub FROM cu_v)
              GROUP BY 1, 2, 3),
    lh_tot AS (
      SELECT b.grp, b.n_b, c.n_c FROM
        (SELECT grp, CAST(COUNT(*) AS DECIMAL(18,0)) AS n_b
         FROM bl_v GROUP BY grp) b
        JOIN
        (SELECT grp, CAST(COUNT(*) AS DECIMAL(18,0)) AS n_c
         FROM cu_v GROUP BY grp) c
        ON b.grp = c.grp
    ),
    lh_j AS (
      SELECT COALESCE(b.grp, c.grp) AS grp,
             CAST(COALESCE(b.cnt, 0) AS DECIMAL(18,0)) AS b_cnt,
             CAST(COALESCE(c.cnt, 0) AS DECIMAL(18,0)) AS c_cnt
      FROM bl_lh b FULL OUTER JOIN cu_lh c
        ON b.grp = c.grp AND b.e = c.e AND b.sub = c.sub
    ),
    lh AS (
      SELECT 'drift:loghist_tv' AS check_name, t.grp,
             CAST(SUM(ABS(b_cnt * n_c - c_cnt * n_b))
                  AS DECIMAL(38,0)) AS drift_num,
             CAST(2 * n_b * n_c AS DECIMAL(38,0)) AS drift_denom,
             CAST(CAST(SUM(ABS(b_cnt * n_c - c_cnt * n_b))
                       AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(2 * n_b * n_c AS DECIMAL(38,0)) AS DOUBLE) AS stat
      FROM lh_j j JOIN lh_tot t ON j.grp = t.grp
      GROUP BY t.grp, n_b, n_c
    ),
    bl_cms AS (SELECT grp, row, bucket, COUNT(*) AS cnt
               FROM ({cms_cells("bl")}) GROUP BY 1, 2, 3),
    cu_cms AS (SELECT grp, row, bucket, COUNT(*) AS cnt
               FROM ({cms_cells("cu")}) GROUP BY 1, 2, 3),
    cms_tot AS (
      SELECT b.grp, b.n_b, c.n_c FROM
        (SELECT o_orderpriority AS grp,
                CAST(COUNT(*) AS DECIMAL(18,0)) AS n_b
         FROM bl GROUP BY 1) b
        JOIN
        (SELECT o_orderpriority AS grp,
                CAST(COUNT(*) AS DECIMAL(18,0)) AS n_c
         FROM cu GROUP BY 1) c
        ON b.grp = c.grp
    ),
    cms_j AS (
      SELECT COALESCE(b.grp, c.grp) AS grp,
             CAST(COALESCE(b.cnt, 0) AS DECIMAL(18,0)) AS b_cnt,
             CAST(COALESCE(c.cnt, 0) AS DECIMAL(18,0)) AS c_cnt
      FROM bl_cms b FULL OUTER JOIN cu_cms c
        ON b.grp = c.grp AND b.row = c.row AND b.bucket = c.bucket
    ),
    cms AS (
      SELECT 'drift:cms_tv' AS check_name, t.grp,
             CAST(SUM(ABS(b_cnt * n_c - c_cnt * n_b))
                  AS DECIMAL(38,0)) AS drift_num,
             CAST(2 * 4 * n_b * n_c AS DECIMAL(38,0)) AS drift_denom,
             CAST(CAST(SUM(ABS(b_cnt * n_c - c_cnt * n_b))
                       AS DECIMAL(38,0)) AS DOUBLE)
             / CAST(CAST(2 * 4 * n_b * n_c AS DECIMAL(38,0)) AS DOUBLE)
               AS stat
      FROM cms_j j JOIN cms_tot t ON j.grp = t.grp
      GROUP BY t.grp, n_b, n_c
    )
    SELECT check_name, grp,
           CAST(drift_num AS BIGINT) AS drift_num,
           CAST(drift_denom AS BIGINT) AS drift_denom, stat
    FROM (SELECT * FROM pres
          UNION ALL SELECT * FROM ratio
          UNION ALL SELECT * FROM lh
          UNION ALL SELECT * FROM cms)
    ORDER BY check_name, grp
    """


@query("dq_drift_by_priority", _dq_drift_grouped_oracle())
def dq_drift_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP drift gate (functions/dq.py dq_drift_report_grouped)
    — the 100 TB failure mode the global gate misses: drift localized
    to one source/priority/day that whole-corpus sketches average
    away. Two fixture profiles over orders grouped by order priority
    (baseline = even keys; current = odd keys with one priority
    REMOVED, prices x3, and a different key population): per-group
    presence flags (+1.0 = vanished group — fires here), per-group
    KMV cardinality ratios, and per-group loghist/CMS TV distances.
    Every drift_num/drift_denom is an exact integer rational (same
    contract as dq_drift_orders), groups join null-safely, and the
    whole report costs |groups| x bounded sketch cells — at fleet
    scale this is the per-table promotion gate run from persisted
    grouped sketch states (kmv/cms/loghist_merge_grouped), never a
    rescan."""
    from dtle_spark.functions.dq import dq_drift_report_grouped

    o = load_table(spark, sf_dir, "orders")
    bl = o.filter("o_orderkey % 2 = 0")
    cu = o.filter(
        "o_orderkey % 2 = 1 AND o_orderpriority <> '1-URGENT'"
    )
    # fused per-group cms+loghist cell build (r16): one scan + one
    # aggregation per side instead of two of each
    baseline = {
        "kmv": sk.kmv_distinct_grouped(bl, "o_orderpriority", "o_custkey", k=64),
        "cells": sk.drift_cells_grouped(
            bl, "o_orderpriority", "o_orderstatus",
            "CAST(round(o_totalprice * 100) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    current = {
        "kmv": sk.kmv_distinct_grouped(cu, "o_orderpriority", "o_custkey", k=64),
        "cells": sk.drift_cells_grouped(
            cu, "o_orderpriority", "o_orderstatus",
            "CAST(round(o_totalprice * 300) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    return dq_drift_report_grouped(baseline, current, depth=4)


def _dq_drift_gate_grouped_oracle() -> str:
    """DuckDB mirror of dq_drift_gate_by_priority: the grouped drift
    report (the dq_drift_by_priority oracle verbatim) judged by the
    same CASE ladder — including the presence rung, whose stat is
    num - denom (not a ratio) and whose deviation is |stat| like the
    TV checks. Thresholds CAST to DOUBLE (decimal literals are the
    hash-divergent type class)."""
    dev = ("CASE WHEN check_name = 'drift:kmv_ratio'"
           " THEN ABS(stat - 1.0) ELSE ABS(stat) END")
    thr = ("CAST(CASE check_name"
           " WHEN 'drift:presence' THEN 0.5"
           " WHEN 'drift:kmv_ratio' THEN 0.5"
           " WHEN 'drift:loghist_tv' THEN 0.5"
           " WHEN 'drift:cms_tv' THEN 0.5"
           " END AS DOUBLE)")
    return f"""
    SELECT check_name, grp, drift_num, drift_denom, stat,
           {dev} AS deviation,
           {thr} AS threshold,
           ({dev}) <= ({thr}) AS passed
    FROM ({_dq_drift_grouped_oracle()})
    ORDER BY check_name, grp
    """


@query("dq_drift_gate_by_priority", _dq_drift_gate_grouped_oracle())
def dq_drift_gate_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The promotion judgment over the GROUPED drift report
    (functions/dq.py judge_drift on dq_drift_report_grouped) — gating
    the judgment's presence branch cross-engine: presence stat is
    num - denom (+1 = group vanished, -1 = appeared), deviation |stat|
    like the TV checks, so the removed '1-URGENT' group FAILS its
    presence row while stable groups pass; the per-group loghist TV
    (prices x3) fails everywhere, the per-group cms TV and kmv ratios
    pass. One policy judges |groups| x checks rows in one plan — the
    per-source promotion decision at fleet scale, over bounded sketch
    cells."""
    from dtle_spark.functions.dq import dq_drift_report_grouped, judge_drift

    o = load_table(spark, sf_dir, "orders")
    bl = o.filter("o_orderkey % 2 = 0")
    cu = o.filter(
        "o_orderkey % 2 = 1 AND o_orderpriority <> '1-URGENT'"
    )
    # fused per-group cms+loghist cell build (r16) — see
    # dq_drift_by_priority
    baseline = {
        "kmv": sk.kmv_distinct_grouped(bl, "o_orderpriority", "o_custkey", k=64),
        "cells": sk.drift_cells_grouped(
            bl, "o_orderpriority", "o_orderstatus",
            "CAST(round(o_totalprice * 100) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    current = {
        "kmv": sk.kmv_distinct_grouped(cu, "o_orderpriority", "o_custkey", k=64),
        "cells": sk.drift_cells_grouped(
            cu, "o_orderpriority", "o_orderstatus",
            "CAST(round(o_totalprice * 300) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    rep = dq_drift_report_grouped(baseline, current, depth=4)
    return judge_drift(rep, {
        "drift:presence": 0.5,
        "drift:kmv_ratio": 0.5,
        "drift:loghist_tv": 0.5,
        "drift:cms_tv": 0.5,
    }).orderBy("check_name", "grp")


def _dq_drift_keys_oracle() -> str:
    """DuckDB mirror of dq_drift_keys_events: the same md5-bucket CMS
    cells per side, the same min-fold probe estimates over the top-10
    user watchlist, side totals as direct COUNTs (the Spark side folds
    sum(cnt) DIV depth — identical integers), and the per-key share
    drift as the same exact cross-multiplied rational. Cells cast to
    DECIMAL(18,0) before multiplying so products fit DECIMAL(38,0)."""
    def cells(pred: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {r} AS row, "
            f"{sk.cms_bucket_sql('user_id', r, 512, 'duckdb')} AS bucket"
            f" FROM events WHERE {pred}"
            for r in range(4)
        )

    probe_rows = " UNION ALL ".join(
        f"SELECT key, {r} AS row, "
        f"{sk.cms_bucket_sql('key', r, 512, 'duckdb')} AS bucket FROM top"
        for r in range(4)
    )
    return f"""
    WITH b_sketch AS (
      SELECT row, bucket, COUNT(*) AS cnt
      FROM ({cells('event_id % 2 = 0')}) GROUP BY row, bucket
    ),
    c_sketch AS (
      SELECT row, bucket, COUNT(*) AS cnt
      FROM ({cells('event_id % 3 = 0')}) GROUP BY row, bucket
    ),
    top AS (
      SELECT user_id AS key, COUNT(*) AS cnt FROM events
      GROUP BY 1 ORDER BY cnt DESC, key LIMIT 10
    ),
    b_est AS (
      SELECT p.key, MIN(COALESCE(s.cnt, 0)) AS b_est
      FROM ({probe_rows}) p
      LEFT JOIN b_sketch s USING (row, bucket) GROUP BY p.key
    ),
    c_est AS (
      SELECT p.key, MIN(COALESCE(s.cnt, 0)) AS c_est
      FROM ({probe_rows}) p
      LEFT JOIN c_sketch s USING (row, bucket) GROUP BY p.key
    ),
    tot AS (
      SELECT CAST((SELECT COUNT(*) FROM events WHERE event_id % 2 = 0)
                  AS DECIMAL(18,0)) AS n_b,
             CAST((SELECT COUNT(*) FROM events WHERE event_id % 3 = 0)
                  AS DECIMAL(18,0)) AS n_c
    )
    SELECT b.key, b.b_est, c.c_est,
           CAST(ABS(CAST(b.b_est AS DECIMAL(18,0)) * n_c
                    - CAST(c.c_est AS DECIMAL(18,0)) * n_b)
                AS BIGINT) AS drift_num,
           CAST(n_b * n_c AS BIGINT) AS drift_denom,
           CAST(CAST(ABS(CAST(b.b_est AS DECIMAL(18,0)) * n_c
                         - CAST(c.c_est AS DECIMAL(18,0)) * n_b)
                     AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(CAST(n_b * n_c AS DECIMAL(38,0)) AS DOUBLE) AS stat
    FROM b_est b JOIN c_est c USING (key), tot
    ORDER BY key
    """


@query("dq_drift_keys_events", _dq_drift_keys_oracle())
def dq_drift_keys_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-KEY drift attribution (functions/dq.py dq_drift_keys) — the
    third rung of the drift ladder: the global gate says THAT the
    distribution moved, the grouped gate says WHICH SOURCE, this says
    WHICH KEYS. Two fixture CMS profiles of events.user_id (baseline =
    even event ids, current = every-third ids — overlapping but
    different populations) probed with the exact top-10 user watchlist;
    each key's frequency-SHARE change |est_b/n_b - est_c/n_c| is
    emitted as the exact integer rational |est_b*n_c - est_c*n_b| /
    (n_b*n_c) — non-NULL BIGINTs under the 2^53 loud guard (the r11
    DECIMAL(38,0) hash-canonicalization lesson), one derived double.
    At 100 TB both sketches are persisted bounded state (depth*width
    counters, additive-mergeable) and the probe set is dashboard-sized,
    so attribution never rescans either corpus."""
    from dtle_spark.functions.dq import dq_drift_keys

    ev = load_table(spark, sf_dir, "events")
    base = sk.cms_sketch(
        ev.filter("event_id % 2 = 0"), "user_id", depth=4, width=512
    )
    cur = sk.cms_sketch(
        ev.filter("event_id % 3 = 0"), "user_id", depth=4, width=512
    )
    probes = (
        ev.groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "key")
        .limit(10)
        .select("key")
    )
    return dq_drift_keys(base, cur, probes)


def _dq_drift_gate_oracle() -> str:
    """DuckDB mirror of dq_drift_gate_orders: the drift report (the
    dq_drift_orders oracle verbatim) judged by the same CASE ladder —
    deviation |stat-1| for the kmv ratio / |stat| otherwise, named
    per-check thresholds, passed = deviation <= threshold. Deviation
    is derived from the SAME stat double by the same IEEE ops, so the
    two engines agree bit-for-bit."""
    return f"""
    SELECT check_name, drift_num, drift_denom, stat,
           CASE WHEN check_name = 'drift:kmv_ratio'
                THEN ABS(stat - 1.0) ELSE ABS(stat) END AS deviation,
           CAST(CASE check_name
                WHEN 'drift:kmv_ratio' THEN 0.5
                WHEN 'drift:loghist_tv' THEN 0.5
                WHEN 'drift:cms_tv' THEN 1.0
           END AS DOUBLE) AS threshold,
           (CASE WHEN check_name = 'drift:kmv_ratio'
                 THEN ABS(stat - 1.0) ELSE ABS(stat) END)
           <= (CASE check_name
                    WHEN 'drift:kmv_ratio' THEN 0.5
                    WHEN 'drift:loghist_tv' THEN 0.5
                    WHEN 'drift:cms_tv' THEN 1.0
               END) AS passed
    FROM ({_dq_drift_oracle()})
    ORDER BY check_name
    """


@query("dq_drift_gate_orders", _dq_drift_gate_oracle())
def dq_drift_gate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift gate's promotion JUDGMENT (functions/dq.py
    judge_drift — the fourth rung of the drift ladder: report ->
    decision): the dq_drift_orders fixture report judged against an
    explicit per-check policy, appending deviation (|stat-1| for the
    cardinality ratio, |stat| for the TV distances), the named
    threshold, and passed. Thresholds chosen so the fixture yields a
    MIX (the heavy loghist shift fails at 0.5; cms passes exactly at
    its 1.0 boundary; the kmv ratio passes) — gating the judgment
    logic itself, not just the report. At 100 TB this is
    StreamProfileJob.gate_and_promote's decision plan over bounded
    sketch cells; an emitted check with no named threshold raises at
    execution instead of silently passing."""
    from dtle_spark.functions.dq import dq_drift_report, judge_drift

    o = load_table(spark, sf_dir, "orders")
    even = o.filter("o_orderkey % 2 = 0")
    odd = o.filter("o_orderkey % 2 = 1")
    third = o.filter("o_orderkey % 3 = 0")
    # fused cms+loghist cell build (r16) — see dq_drift_orders
    baseline = {
        "kmv": sk.kmv_distinct(even, "o_custkey", k=256),
        "cells": sk.drift_cells(
            even, "o_orderpriority",
            "CAST(round(o_totalprice * 100) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    current = {
        "kmv": sk.kmv_distinct(third, "o_custkey", k=256),
        "cells": sk.drift_cells(
            odd, "o_orderstatus",
            "CAST(round(o_totalprice * 300) AS BIGINT)",
            depth=4, width=512,
        ),
    }
    rep = dq_drift_report(baseline, current, depth=4)
    return judge_drift(rep, {
        "drift:kmv_ratio": 0.5,
        "drift:loghist_tv": 0.5,
        "drift:cms_tv": 1.0,
    }).orderBy("check_name")


@query(
    "weighted_sample_docs",
    f"""
    {cp.priority_sample_sql('documents', 200, weight_sql='n_chars',
                            cols='doc_id, lang, source')}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sample by priority sampling
    (functions/corpus.py priority_sample, Duffield-Lund-Thorup 2007):
    200 docs drawn with probability ~ n_chars, each carrying the
    max(w, tau) threshold estimator so any subset's total character
    mass is unbiasedly estimable from the sample alone — the standard
    way to audit a 100 TB corpus's composition without scanning it.
    Selection key is one IEEE division of two exact integers
    ((hash40+1)/w), so the sampled SET and emitted doubles are
    bit-identical across engines; plan is map + TakeOrderedAndProject
    (no global sort)."""
    d = load_table(spark, sf_dir, "documents")
    return cp.priority_sample(d, 200, weight_sql="n_chars").select(
        "doc_id", "lang", "source", "w", "est_weight"
    )


_LOGHIST_QS = [(1, 2), (9, 10), (99, 100)]


def _grouped_loghist_oracle() -> str:
    e, sub = sk._loghist_bucket_sql("x", 16, "duckdb")
    mid = sk._loghist_mid_sql(16, "duckdb")
    picks = " UNION ALL ".join(
        f"""SELECT grp, '{num}/{denom}' AS q, {mid} AS est FROM (
          SELECT grp, e, sub,
                 row_number() OVER (PARTITION BY grp ORDER BY e, sub) AS rn
          FROM c WHERE cum * {denom} >= {num} * n) WHERE rn = 1"""
        for num, denom in [(1, 2), (9, 10)]
    )
    return f"""
    WITH v AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS x
      FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
    ),
    b AS (SELECT grp, {e} AS e, {sub} AS sub FROM v),
    sk AS (SELECT grp, e, sub, COUNT(*) AS cnt FROM b GROUP BY 1, 2, 3),
    c AS (
      SELECT grp, e, sub, cnt,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY e, sub
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY grp) AS n
      FROM c0
    )
    {picks}
    """.replace("FROM c0", "FROM sk")


@query("quantile_sketch_by_priority", _grouped_loghist_oracle())
def quantile_sketch_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP quantile sketch (functions/sketches.py
    loghist_sketch_grouped): p50/p90 order value per priority from
    one keyed log-histogram fold — <= 63*16 additive cells per group,
    partial-aggregable map-side, quantile extraction over the sketch
    cells partitioned by group (never the data). The grouped form is
    what a per-source/per-day latency or size dashboard runs at
    100 TB: one pass, bounded state per key, horizon merges by cell
    addition."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select("o_orderpriority", _cents(F.col("o_totalprice")).alias("cents"))
    sketch = sk.loghist_sketch_grouped(v, "o_orderpriority", "cents")
    return sk.loghist_quantiles_grouped(sketch, [(1, 2), (9, 10)])


@query(
    "quantile_sketch_prices",
    f"""
    WITH est AS (
      {sk.loghist_quantiles_sql(
          'cents',
          '(SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents'
          ' FROM orders)',
          _LOGHIST_QS,
      )}
    ),
    g AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             COUNT(*) AS c
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT cents,
             SUM(c) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(c) OVER () AS n
      FROM g
    ),
    exact AS (
      SELECT '1/2' AS q,
             MIN(CASE WHEN cum * 2 >= n THEN cents END) AS exact_cents FROM r
      UNION ALL
      SELECT '9/10',
             MIN(CASE WHEN cum * 10 >= 9 * n THEN cents END) FROM r
      UNION ALL
      SELECT '99/100',
             MIN(CASE WHEN cum * 100 >= 99 * n THEN cents END) FROM r
    )
    SELECT est.q, est.est, exact.exact_cents
    FROM est JOIN exact USING (q)
    """,
)
def quantile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantiles from the log-histogram sketch
    (functions/sketches.py loghist_*, DDSketch-shaped) next to the
    exact discrete percentiles. The SKETCH is the production lane: at
    100 TB the bucket fold is map-only with <= 63*16 cells of additive
    state and the quantile extraction runs over the sketch, not the
    data; the exact lane here (cum-count over grouped cents) is the
    small-SF truth the estimate is gated against — relative error is
    bounded by 1/32 per the bucket width, asserted in pytest. Every
    boundary is integer/power-of-two arithmetic, no libm, so both
    engines agree bit-for-bit."""
    from pyspark.sql import Window

    v = load_table(spark, sf_dir, "orders").select(
        _cents(F.col("o_totalprice")).alias("cents")
    )
    est = sk.loghist_quantiles(sk.loghist_sketch(v, "cents"), _LOGHIST_QS)
    g = v.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    r = g.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy())
    )
    exact = r.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * denom >= num * F.col("n"), F.col("cents")
                )
            ).alias(f"p_{num}_{denom}")
            for num, denom in _LOGHIST_QS
        ]
    ).selectExpr(
        "stack(3, "
        + ", ".join(
            f"'{num}/{denom}', p_{num}_{denom}" for num, denom in _LOGHIST_QS
        )
        + ") AS (q, exact_cents)"
    )
    return est.join(exact, "q")
