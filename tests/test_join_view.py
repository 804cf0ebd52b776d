"""Join-view incremental maintenance (operators/join_view.py). The
invariant everywhere: the maintained denormalized view equals the full
recompute ``join_view_of(apply_changes(L, ΔL), R_new)`` — also
oracle-gated end to end by the cdc_join_view_orders registry query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dtle_spark.model import change_schema
from dtle_spark.operators.apply import apply_changes
from dtle_spark.operators.join_view import join_view_of, maintain_join_view

FACT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("cust", T.LongType()),
        T.StructField("amount", T.LongType()),
    ]
)
DIM_COLS = {"name": "cust_name", "tier": "cust_tier"}
SID = "33333333-3333-3333-3333-333333333333"


def _chg(spark, rows):
    return spark.createDataFrame(rows, change_schema(FACT))


def _c(op, before, after, seq):
    return (SID, seq, seq, 0, op, None, "db1", "t", before, after, None)


def _dim(spark, rows):
    return spark.createDataFrame(rows, "cid long, name string, tier string")


def _view(df):
    return sorted(map(tuple, df.collect()))


class TestJoinView:
    def test_full_recompute_is_left_join(self, spark):
        facts = spark.createDataFrame(
            [(1, 10, 100), (2, 20, 200), (3, None, 300), (4, 99, 400)], FACT
        )
        dim = _dim(spark, [(10, "alice", "gold"), (20, "bob", "base")])
        v = join_view_of(facts, dim, "cust", "cid", DIM_COLS)
        assert v.columns == ["id", "cust", "amount", "cust_name", "cust_tier"]
        got = _view(v)
        # NULL fk and dangling fk both survive with NULL dim columns
        assert got == [
            (1, 10, 100, "alice", "gold"),
            (2, 20, 200, "bob", "base"),
            (3, None, 300, None, None),
            (4, 99, 400, None, None),
        ]

    def test_colliding_right_cols_fail_loud(self, spark):
        facts = spark.createDataFrame([(1, 10, 100)], FACT)
        dim = _dim(spark, [(10, "alice", "gold")])
        with pytest.raises(ValueError, match="collide"):
            join_view_of(facts, dim, "cust", "cid", {"name": "amount"})

    def test_reserved_working_names_fail_loud(self, spark):
        """The plumbing's internal aliases (__rpk join key, __k carve
        struct) are rejected up front: a fact or dim view column
        literally named one of them would make the join condition
        ambiguous or be silently dropped with the working column."""
        dim = _dim(spark, [(10, "alice", "gold")])
        facts_rpk = spark.createDataFrame(
            [(1, 10, 100)], "id long, cust long, __rpk long"
        )
        with pytest.raises(ValueError, match="reserved"):
            join_view_of(facts_rpk, dim, "cust", "cid", DIM_COLS)
        facts = spark.createDataFrame([(1, 10, 100)], FACT)
        with pytest.raises(ValueError, match="reserved"):
            join_view_of(facts, dim, "cust", "cid", {"name": "__rpk"})
        with pytest.raises(ValueError, match="reserved"):
            join_view_of(facts, dim, "cust", "cid", {"name": "__k"})

    def test_maintain_covers_every_change_shape(self, spark):
        """One batch exercising: fact insert (matching and dangling fk),
        update (fk retarget), delete, PK move, redelivered duplicate;
        dim update, delete (rows go NULL), and insert that back-fills a
        previously dangling fk. NULL-fk rows stay untouched."""
        facts = spark.createDataFrame(
            [(1, 10, 100), (2, 20, 200), (3, None, 300), (4, 99, 400)], FACT
        )
        dim0 = _dim(spark, [(10, "alice", "gold"), (20, "bob", "base")])
        view0 = join_view_of(facts, dim0, "cust", "cid", DIM_COLS)

        chg = _chg(spark, [
            _c("i", None, (5, 10, 500), 1),          # insert, fk matches
            _c("i", None, (6, 77, 600), 2),          # insert, dangling fk
            _c("u", (2, 20, 200), (2, 30, 200), 3),  # fk retarget 20->30
            _c("d", (1, 10, 100), None, 4),          # delete
            _c("u", (4, 99, 400), (7, 99, 400), 5),  # PK move 4->7
            _c("i", None, (5, 10, 500), 1),          # redelivered dup
        ])
        # dim batch already applied: 10 renamed, 20 deleted, 30+99 added
        dim1 = _dim(spark, [
            (10, "alicia", "gold"), (30, "carol", "vip"), (99, "zed", "base"),
        ])
        touched = spark.createDataFrame(
            [(10,), (20,), (30,), (99,)], "cid long"
        )

        got = maintain_join_view(
            view0, chg, ["id"], "cust", dim1, "cid", DIM_COLS, touched
        )
        expect = join_view_of(
            apply_changes(facts, chg, ["id"]), dim1, "cust", "cid", DIM_COLS
        )
        assert _view(got) == _view(expect)
        by_id = {r[0]: tuple(r) for r in got.collect()}
        assert by_id[2] == (2, 30, 200, "carol", "vip")     # retarget
        assert by_id[7] == (7, 99, 400, "zed", "base")      # PK move + backfill
        assert by_id[3] == (3, None, 300, None, None)       # NULL fk untouched
        assert 1 not in by_id and 4 not in by_id
        assert by_id[6] == (6, 77, 600, None, None)         # dangling stays NULL

    def test_dim_quiet_batch_skips_refresh(self, spark):
        """right_touched=None: only the fact lane runs; dim columns of
        untouched rows are byte-identical to the prior view."""
        facts = spark.createDataFrame([(1, 10, 100), (2, 20, 200)], FACT)
        dim = _dim(spark, [(10, "alice", "gold"), (20, "bob", "base")])
        view0 = join_view_of(facts, dim, "cust", "cid", DIM_COLS)
        chg = _chg(spark, [_c("u", (1, 10, 100), (1, 10, 150), 1)])
        got = maintain_join_view(view0, chg, ["id"], "cust", dim, "cid", DIM_COLS)
        assert _view(got) == _view(
            join_view_of(apply_changes(facts, chg, ["id"]), dim, "cust", "cid", DIM_COLS)
        )

    def test_random_streams_match_full_recompute(self, spark):
        """Seeded random fact streams + dim mutations applied
        batch-by-batch: after every batch the maintained view equals
        the full recompute over (applied facts, new dim)."""
        import random

        rng = random.Random(20260815)
        alive = {k: (k, rng.choice([10, 20, 30, None]), k * 7)
                 for k in range(1, 8)}
        dim = {10: (10, "a", "t1"), 20: (20, "b", "t2"), 30: (30, "c", "t3")}
        facts = spark.createDataFrame(list(alive.values()), FACT)
        dim_df = _dim(spark, list(dim.values()))
        view = join_view_of(facts, dim_df, "cust", "cid", DIM_COLS)
        target = facts
        for batch_no in range(4):
            events = []
            for seq in range(1, 7):
                roll, live = rng.random(), sorted(alive)
                s = batch_no * 10 + seq
                if not live or roll < 0.3:
                    k = rng.randint(1, 30)
                    if k in alive:
                        continue
                    alive[k] = (k, rng.choice([10, 20, 30, 40, None]), s)
                    events.append(_c("i", None, alive[k], s))
                elif roll < 0.55:
                    k = rng.choice(live)
                    events.append(_c("d", alive.pop(k), None, s))
                else:
                    k = rng.choice(live)
                    old = alive[k]
                    alive[k] = (k, rng.choice([10, 20, 30, 40, None]), old[2] + s)
                    events.append(_c("u", old, alive[k], s))
            # mutate the dim: rename one, toggle 40's existence
            touched_keys = set()
            if rng.random() < 0.7:
                pick = rng.choice(sorted(dim))
                dim[pick] = (pick, dim[pick][1] + "x", dim[pick][2])
                touched_keys.add(pick)
            if rng.random() < 0.5:
                if 40 in dim:
                    del dim[40]
                else:
                    dim[40] = (40, "d", "t4")
                touched_keys.add(40)
            if not events:
                continue
            chg = _chg(spark, events)
            dim_df = _dim(spark, list(dim.values()))
            touched = (
                spark.createDataFrame([(k,) for k in sorted(touched_keys)], "cid long")
                if touched_keys else None
            )
            target = apply_changes(target, chg, ["id"]).localCheckpoint()
            view = maintain_join_view(
                view, chg, ["id"], "cust", dim_df, "cid", DIM_COLS, touched
            ).localCheckpoint()
            assert _view(view) == _view(
                join_view_of(target, dim_df, "cust", "cid", DIM_COLS)
            ), f"batch {batch_no}"

    def test_star_view_two_dims_match_recompute(self, spark):
        """The star generalization: a fact with two fks, both dims
        moving in the same step — a fact row referencing two moved
        dims gets both rewrites; per-dim collision checks fire."""
        from dtle_spark.operators.join_view import (
            DimSpec, maintain_star_view, star_view_of,
        )

        star = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("cust", T.LongType()),
            T.StructField("prod", T.LongType()),
            T.StructField("qty", T.LongType()),
        ])
        facts = spark.createDataFrame(
            [(1, 10, 7, 5), (2, 20, 8, 6), (3, None, 7, 7), (4, 10, None, 8)],
            star,
        )
        cust0 = _dim(spark, [(10, "alice", "gold"), (20, "bob", "base")])
        prod0 = spark.createDataFrame(
            [(7, "widget"), (8, "gadget")], "pid long, pname string"
        )
        specs = [
            DimSpec("cust", "cid", DIM_COLS),
            DimSpec("prod", "pid", {"pname": "prod_name"}),
        ]
        view0 = star_view_of(facts, [(cust0, specs[0]), (prod0, specs[1])])
        assert view0.columns == [
            "id", "cust", "prod", "qty", "cust_name", "cust_tier", "prod_name",
        ]

        with pytest.raises(ValueError, match="collide"):
            star_view_of(facts, [
                (cust0, specs[0]),
                (prod0, DimSpec("prod", "pid", {"pname": "cust_name"})),
            ])

        chg = spark.createDataFrame(
            [(SID, 1, 1, 0, "i", None, "db1", "t",
              None, (5, 20, 8, 9), None)],
            change_schema(star),
        )
        cust1 = _dim(spark, [(10, "alicia", "gold"), (20, "bob", "vip")])
        prod1 = spark.createDataFrame(
            [(7, "widget-x"), (8, "gadget")], "pid long, pname string"
        )
        got = maintain_star_view(view0, chg, ["id"], [
            (cust1, specs[0],
             spark.createDataFrame([(10,), (20,)], "cid long")),
            (prod1, specs[1], spark.createDataFrame([(7,)], "pid long")),
        ])
        expect = star_view_of(
            apply_changes(facts, chg, ["id"]),
            [(cust1, specs[0]), (prod1, specs[1])],
        )
        assert _view(got) == _view(expect)
        by_id = {r[0]: tuple(r) for r in got.collect()}
        # row 1 references BOTH moved dims -> both rewrites landed
        assert by_id[1] == (1, 10, 7, 5, "alicia", "gold", "widget-x")
        assert by_id[2] == (2, 20, 8, 6, "bob", "vip", "gadget")
        assert by_id[5] == (5, 20, 8, 9, "bob", "vip", "gadget")
        assert by_id[3][4:] == (None, None, "widget-x")  # NULL cust fk
        assert by_id[4][4:] == ("alicia", "gold", None)  # NULL prod fk

    def test_maintenance_never_sort_merge_joins(self, spark):
        """Every join in the maintenance plan must be broadcast-side
        (the view mass never shuffles) — the property that makes the
        operator an O(Δ) maintenance step at 100 TB."""
        facts = spark.createDataFrame(
            [(i, i % 3 * 10 or None, i) for i in range(1, 200)], FACT
        )
        dim = _dim(spark, [(10, "a", "t"), (20, "b", "t")])
        view0 = join_view_of(facts, dim, "cust", "cid", DIM_COLS).localCheckpoint()
        chg = _chg(spark, [_c("u", (1, 10, 1), (1, 20, 1), 1)])
        touched = spark.createDataFrame([(20,)], "cid long")
        out = maintain_join_view(
            view0, chg, ["id"], "cust", dim, "cid", DIM_COLS, touched
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
