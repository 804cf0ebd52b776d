"""Unit tests for operator semantics (golden-style, mirroring the
reference's table-driven tests — SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dtle_spark.model import change_schema
from dtle_spark.operators.apply import apply_changes, apply_changes_no_pk
from dtle_spark.operators.filters import apply_where_to_changes, origin_filter
from dtle_spark.operators.projection import column_map
from dtle_spark.sources.snapshot import keyset_predicate, snapshot_chunk, snapshot_offset

ROW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _chg(spark, rows):
    return spark.createDataFrame(rows, change_schema(ROW))


def _r(id, name, amount):
    return {"id": id, "name": name, "amount": amount}


def _base(sid="s1", gno=1, seq=1, op="i", before=None, after=None):
    return {
        "sid": sid, "gno": gno, "seq": seq, "lc": 0, "op": op, "ts": None,
        "schema_name": "db1", "table_name": "t", "before": before,
        "after": after, "query": None,
    }


class TestUpdatePairFilter:
    """F3 golden cases (binlog_reader.go:1927-1983): the four
    before/after Where outcomes of an update."""

    WHERE = "amount > 100.0"

    def run(self, spark, before_amt, after_amt):
        changes = _chg(
            spark,
            [_base(op="u", before=_r(1, "a", before_amt), after=_r(1, "a", after_amt))],
        )
        out = apply_where_to_changes(changes, self.WHERE).collect()
        return out

    def test_both_pass_stays_update(self, spark):
        out = self.run(spark, 150.0, 200.0)
        assert len(out) == 1 and out[0]["op"] == "u"
        assert out[0]["before"] is not None and out[0]["after"] is not None

    def test_after_only_degrades_to_insert(self, spark):
        out = self.run(spark, 50.0, 200.0)
        assert len(out) == 1 and out[0]["op"] == "i"
        assert out[0]["before"] is None and out[0]["after"]["amount"] == 200.0

    def test_before_only_degrades_to_delete(self, spark):
        out = self.run(spark, 150.0, 50.0)
        assert len(out) == 1 and out[0]["op"] == "d"
        assert out[0]["after"] is None and out[0]["before"]["amount"] == 150.0

    def test_both_fail_drops(self, spark):
        assert self.run(spark, 50.0, 60.0) == []

    def test_insert_delete_single_image(self, spark):
        changes = _chg(
            spark,
            [
                _base(seq=1, op="i", after=_r(1, "a", 150.0)),
                _base(seq=2, op="i", after=_r(2, "b", 50.0)),
                _base(seq=3, op="d", before=_r(3, "c", 150.0)),
                _base(seq=4, op="d", before=_r(4, "d", 50.0)),
            ],
        )
        out = apply_where_to_changes(changes, self.WHERE).collect()
        assert sorted((r["op"], (r["after"] or r["before"])["id"]) for r in out) == [
            ("d", 3),
            ("i", 1),
        ]


class TestApplyChanges:
    def test_pk_move_and_redelivery(self, spark):
        target = spark.createDataFrame([Row(**_r(1, "a", 1.0)), Row(**_r(2, "b", 2.0))], ROW)
        changes = _chg(
            spark,
            [
                # PK-changing update 1 -> 10
                _base(gno=1, seq=10, op="u", before=_r(1, "a", 1.0), after=_r(10, "a", 1.5)),
                # redelivered twice: applies once
                _base(gno=2, seq=20, op="i", after=_r(3, "c", 3.0)),
                _base(gno=2, seq=20, op="i", after=_r(3, "c", 3.0)),
                # delete then re-insert same key: latest seq wins
                _base(gno=3, seq=30, op="d", before=_r(2, "b", 2.0)),
                _base(gno=4, seq=40, op="i", after=_r(2, "b2", 2.5)),
            ],
        )
        out = {r["id"]: r for r in apply_changes(target, changes, ["id"]).collect()}
        assert set(out) == {10, 3, 2}
        assert out[10]["amount"] == 1.5
        assert out[2]["name"] == "b2"

    def test_delete_missing_row_is_ignorable(self, spark):
        """A12: deleting a non-existent key is a no-op, not an error."""
        target = spark.createDataFrame([Row(**_r(1, "a", 1.0))], ROW)
        changes = _chg(spark, [_base(op="d", before=_r(99, "x", 0.0))])
        out = apply_changes(target, changes, ["id"]).collect()
        assert len(out) == 1 and out[0]["id"] == 1

    def test_malformed_null_after_update_dropped_whole(self, spark):
        """An update missing its after-image is malformed input and
        contributes NOTHING — in particular it must not fire the
        PK-move delete leg (null after makes key_changed trivially
        true), which would silently delete the before key while the
        scd2/rollup maintainers (which require both images) never see
        the row: the family-wide drop-whole convention."""
        target = spark.createDataFrame([Row(**_r(1, "a", 1.0))], ROW)
        changes = _chg(
            spark, [_base(op="u", before=_r(1, "a", 1.0), after=None)]
        )
        out = apply_changes(target, changes, ["id"]).collect()
        assert len(out) == 1 and out[0]["id"] == 1 and out[0]["amount"] == 1.0


class TestApplyNoPk:
    def test_delete_removes_exactly_one_duplicate(self, spark):
        """A2 no-PK: full-row matched delete takes one copy (the
        reference's DELETE ... LIMIT 1, sql/builder.go:152-155)."""
        target = spark.createDataFrame(
            [Row(**_r(1, "dup", 5.0))] * 3 + [Row(**_r(2, "x", 1.0))], ROW
        )
        changes = _chg(spark, [_base(op="d", before=_r(1, "dup", 5.0))])
        out = apply_changes_no_pk(target, changes).collect()
        assert sorted(r["id"] for r in out) == [1, 1, 2]

    def test_update_moves_one_copy(self, spark):
        target = spark.createDataFrame([Row(**_r(1, "dup", 5.0))] * 2, ROW)
        changes = _chg(
            spark, [_base(op="u", before=_r(1, "dup", 5.0), after=_r(1, "dup", 6.0))]
        )
        out = sorted(r["amount"] for r in apply_changes_no_pk(target, changes).collect())
        assert out == [5.0, 6.0]

    def test_null_fields_match_like_reference(self, spark):
        """NULL must match NULL in the full-row comparison (the
        reference emits `col IS NULL`, sql/builder.go:107-112): a
        delete of a NULL-bearing row removes it; an update of one
        replaces rather than duplicates."""
        target = spark.createDataFrame(
            [Row(**_r(1, None, None)), Row(**_r(2, "x", 1.0)), Row(**_r(3, None, 7.0))],
            ROW,
        )
        changes = _chg(
            spark,
            [
                _base(gno=1, seq=10, op="d", before=_r(1, None, None)),
                _base(gno=2, seq=20, op="u", before=_r(3, None, 7.0), after=_r(3, "y", 7.0)),
            ],
        )
        out = sorted(
            (r["id"], r["name"]) for r in apply_changes_no_pk(target, changes).collect()
        )
        assert out == [(2, "x"), (3, "y")]

    def test_null_vs_empty_string_stay_distinct(self, spark):
        """The NULL sentinel must not collide with real values: deleting
        the ('' , 0.0) row must not take the (NULL, NULL) row."""
        target = spark.createDataFrame(
            [Row(**_r(1, None, None)), Row(**_r(1, "", 0.0))], ROW
        )
        changes = _chg(spark, [_base(op="d", before=_r(1, "", 0.0))])
        out = apply_changes_no_pk(target, changes).collect()
        assert len(out) == 1 and out[0]["name"] is None and out[0]["amount"] is None


class TestSnapshot:
    def test_keyset_predicate_pushdown(self, spark):
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        chunk = snapshot_chunk(o, ["o_custkey", "o_orderkey"], [50, 300], 100)
        plan = chunk._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "o_custkey" in plan

    def test_chunks_are_disjoint_and_ordered(self, spark):
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        c1 = snapshot_chunk(o, ["o_custkey", "o_orderkey"], None, 500).collect()
        last = [c1[-1]["o_custkey"], c1[-1]["o_orderkey"]]
        c2 = snapshot_chunk(o, ["o_custkey", "o_orderkey"], last, 500).collect()
        keys1 = {(r["o_custkey"], r["o_orderkey"]) for r in c1}
        keys2 = {(r["o_custkey"], r["o_orderkey"]) for r in c2}
        assert len(keys1) == 500 and len(keys2) == 500 and not (keys1 & keys2)
        assert max(keys1) < min(keys2)

    def test_offset_mode_partitions_table(self, spark):
        sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
        n = sup.count()
        parts = []
        i = 0
        while True:
            rows = snapshot_offset(sup, 40, i).collect()
            if not rows:
                break
            parts.extend(rows)
            i += 1
        assert len(parts) == n

    def test_origin_filter(self, spark):
        changes = _chg(
            spark,
            [_base(sid="s1", op="i", after=_r(1, "a", 1.0)),
             _base(sid="s2", op="i", after=_r(2, "b", 2.0))],
        )
        out = origin_filter(changes, "s1").collect()
        assert [r["sid"] for r in out] == ["s2"]

    def test_column_map_length_mismatch(self, spark):
        df = spark.createDataFrame([Row(a=1, b=2)])
        with pytest.raises(ValueError):
            column_map(df, ["a", "b"], ["x"])


class TestNoPkRedelivery:
    def test_duplicate_delivery_not_double_counted(self, spark):
        """A10 on the counting path: verbatim re-delivered inserts apply
        once (the keyed path is window-insensitive; counting is not)."""
        target = spark.createDataFrame([Row(**_r(1, "a", 1.0))], ROW)
        changes = _chg(
            spark,
            [
                _base(gno=1, seq=10, op="i", after=_r(2, "b", 2.0)),
                _base(gno=1, seq=10, op="i", after=_r(2, "b", 2.0)),  # redelivered
            ],
        )
        out = apply_changes_no_pk(target, changes).collect()
        assert sorted(r["id"] for r in out) == [1, 2]


class TestVersionedMerge:
    """Out-of-order delivery semantics (merge_into_versioned): last
    write wins BY SEQ regardless of arrival order; tombstones stop
    late stale changes from resurrecting deleted rows."""

    def _versioned(self, spark, rows):
        from dtle_spark.operators.apply import with_version_columns

        return with_version_columns(spark.createDataFrame(rows, ROW))

    def _merge(self, spark, cur, batch_rows, keys=["id"]):
        from dtle_spark.operators.apply import latest_image_per_key, merge_into_versioned

        net = latest_image_per_key(_chg(spark, batch_rows), keys)
        return merge_into_versioned(cur, net, keys)

    def test_stale_update_after_newer_one_is_ignored(self, spark):
        cur = self._versioned(spark, [Row(**_r(1, "a", 1.0))])
        # newer change arrives first (seq 20), stale one later (seq 10)
        cur = self._merge(spark, cur, [_base(seq=20, op="u", before=_r(1, "a", 1.0), after=_r(1, "new", 2.0))])
        cur = self._merge(spark, cur, [_base(seq=10, op="u", before=_r(1, "a", 1.0), after=_r(1, "stale", 1.5))])
        rows = cur.filter("NOT __deleted").collect()
        assert len(rows) == 1 and rows[0]["name"] == "new"

    def test_drift_stored_schema_wins(self, spark):
        """Schema drift: the STORED columns are authoritative. A
        replayed image carrying a pre-rename column name merges without
        writing a spurious column (its values lose by seq anyway), and
        an image MISSING a stored column null-fills it when it wins."""
        from pyspark.sql import functions as F

        from dtle_spark.operators.apply import merge_into_versioned

        cur = spark.createDataFrame(
            [(1, 10, 5, False)],
            "id long, b long, __seq long, __deleted boolean",
        )
        net = spark.createDataFrame(
            [(1, "u", 5)], "id long, __action string, seq long"
        ).withColumn("row", F.expr("named_struct('id', id, 'a', 99L)"))
        out = merge_into_versioned(cur, net, ["id"])
        assert out.columns == ["id", "b", "__seq", "__deleted"]
        r = out.collect()[0]
        assert (r["b"], r["__seq"], r["__deleted"]) == (10, 5, False)
        net2 = spark.createDataFrame(
            [(2, "i", 9)], "id long, __action string, seq long"
        ).withColumn("row", F.expr("named_struct('id', id)"))
        got = {r["id"]: r["b"] for r in merge_into_versioned(out, net2, ["id"]).collect()}
        assert got == {1: 10, 2: None}

    def test_tombstone_blocks_late_resurrection(self, spark):
        cur = self._versioned(spark, [Row(**_r(1, "a", 1.0))])
        cur = self._merge(spark, cur, [_base(seq=30, op="d", before=_r(1, "a", 1.0))])
        # a pre-delete update arrives late: must NOT resurrect
        cur = self._merge(spark, cur, [_base(seq=20, op="u", before=_r(1, "a", 1.0), after=_r(1, "zombie", 9.9))])
        assert cur.filter("NOT __deleted").collect() == []
        # but a genuinely newer insert does revive the key
        cur = self._merge(spark, cur, [_base(seq=40, op="i", after=_r(1, "reborn", 3.0))])
        rows = cur.filter("NOT __deleted").collect()
        assert len(rows) == 1 and rows[0]["name"] == "reborn"

    def test_split_batch_any_order_converges(self, spark):
        from dtle_spark.operators.apply import apply_changes

        events = [
            _base(gno=1, seq=1, op="i", after=_r(5, "v1", 1.0)),
            _base(gno=2, seq=2, op="u", before=_r(5, "v1", 1.0), after=_r(5, "v2", 2.0)),
            _base(gno=3, seq=3, op="d", before=_r(5, "v2", 2.0)),
            _base(gno=4, seq=4, op="i", after=_r(5, "v3", 3.0)),
        ]
        expected = sorted(
            tuple(r) for r in apply_changes(
                spark.createDataFrame([], ROW), _chg(spark, events), ["id"]
            ).collect()
        )
        # representative permutations (forward, reverse, interleavings);
        # the full 24 were verified once — kept small for suite speed
        for perm in [(0, 1, 2, 3), (3, 2, 1, 0), (2, 0, 3, 1), (1, 3, 0, 2)]:
            cur = self._versioned(spark, [])
            for i in perm:
                cur = self._merge(spark, cur, [events[i]])
            got = sorted(
                tuple(r) for r in cur.filter("NOT __deleted").drop("__seq", "__deleted").collect()
            )
            assert got == expected, perm


class TestVersionedMergeConvergence:
    """Property: for ANY partition of a change stream into batches and
    ANY delivery order of those batches, the versioned merge converges
    to the in-order apply_changes result (seeded-random trials over
    multi-key streams with inserts/updates/deletes/PK-moves)."""

    def test_random_streams_converge(self, spark):
        import random

        from dtle_spark.operators.apply import (
            latest_image_per_key,
            merge_into_versioned,
            with_version_columns,
        )

        rng = random.Random(20260813)
        for trial in range(4):
            # random per-key op streams; PK moves via update before/after
            events, seq = [], 0
            alive = {}
            for _ in range(12):
                seq += 1
                k = rng.choice([1, 2, 3, 4])
                if k not in alive:
                    alive[k] = f"v{seq}"
                    events.append(_base(gno=seq, seq=seq, op="i", after=_r(k, alive[k], float(seq))))
                elif rng.random() < 0.3:
                    events.append(_base(gno=seq, seq=seq, op="d", before=_r(k, alive[k], 0.0)))
                    del alive[k]
                else:
                    old = alive[k]; alive[k] = f"v{seq}"
                    events.append(_base(gno=seq, seq=seq, op="u",
                                        before=_r(k, old, 0.0), after=_r(k, alive[k], float(seq))))
            expected = sorted(
                tuple(r) for r in apply_changes(
                    spark.createDataFrame([], ROW), _chg(spark, events), ["id"]
                ).collect()
            )
            # random batch partition + random delivery order
            batches, i = [], 0
            while i < len(events):
                j = i + rng.randint(1, 4)
                batches.append(events[i:j]); i = j
            rng.shuffle(batches)
            cur = with_version_columns(spark.createDataFrame([], ROW))
            for b in batches:
                net = latest_image_per_key(_chg(spark, b), ["id"])
                cur = merge_into_versioned(cur, net, ["id"])
            got = sorted(
                tuple(r) for r in cur.filter("NOT __deleted").drop("__seq", "__deleted").collect()
            )
            assert got == expected, f"trial {trial}"


def test_registry_fully_oracle_gated():
    """Every registry query ships a DuckDB oracle (the driver's strong
    rows+schema+hash gate) — a new entry without one should be a
    deliberate, visible decision, not an accident."""
    from dtle_spark.queries import REGISTRY

    missing = [n for n, p in REGISTRY.items() if p.oracle is None]
    assert missing == [], missing
    assert len(REGISTRY) >= 112


def test_registry_rotation_order(tmp_path, monkeypatch):
    """The driver checks the HEAD of queries(); the sort must send
    never-checked entries first, then oldest-last-green, with freshest
    greens last — pinned against synthetic CORRECTNESS files so a
    refactor cannot silently break window coverage."""
    import json

    import dtle_spark.queries as q

    names = list(q.REGISTRY.keys())
    a, b, c, d = names[0], names[1], names[2], names[3]
    # a: green long ago (r1); b: green recently (r5); c: green in both
    # (last r5); d: never green. Expected head order: d, a, then b/c.
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        a: {"hash_match": True, "rows_match": True},
        c: {"hash_match": True, "rows_match": True},
    }))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        b: {"hash_match": True, "rows_match": True},
        c: {"hash_match": True, "rows_match": True},
    }))
    # _registry_order globs CORRECTNESS files from the repo root;
    # redirect the glob to the synthetic dir
    import glob as _glob
    real_glob = _glob.glob

    def fake_glob(pattern):
        if "CORRECTNESS_r" in pattern:
            return sorted(str(p) for p in tmp_path.glob("CORRECTNESS_r*.json"))
        return real_glob(pattern)

    monkeypatch.setattr(_glob, "glob", fake_glob)
    # neutralize the definition-hash front-loading (tested separately):
    # an empty QUERY_HASHES.json disables it by design
    monkeypatch.setattr(q, "_stored_hashes", lambda: {})
    order = q._registry_order()
    pos = {n: i for i, n in enumerate(order)}
    assert pos[d] < pos[a] < pos[b]  # never < oldest-green < recent
    assert pos[d] < pos[a] < pos[c]
    # b and c were both last green in r5; c has MORE lifetime greens,
    # so b (fewer) sorts first within the cohort
    assert pos[b] < pos[c]


def test_registry_rotation_front_loads_changed_definitions(monkeypatch):
    """A query whose definition changed since its last green must lead
    the next window — whether the change shows as a hash mismatch or as
    a QUERY_HASHES.json round stamp newer than the green (the r7
    ann_topk_pq lesson: both its lanes were rewritten behind an r6
    green, and rotation only caught it by cohort luck)."""
    import dtle_spark.queries as q

    names = list(q.REGISTRY.keys())
    a, b, c = names[0], names[1], names[2]
    # everything green in r5; a's stored hash is stale, b's definition
    # is stamped r6 (edited after the r5 green), c is in sync
    monkeypatch.setattr(
        q, "_green_history",
        lambda: ({n: 1 for n in names}, {n: 5 for n in names}),
    )
    real = {n: {"hash": q._definition_hash(n), "round": 5} for n in names}
    real[a] = {"hash": "0" * 32, "round": 5}
    real[b] = {"hash": q._definition_hash(b), "round": 6}
    monkeypatch.setattr(q, "_stored_hashes", lambda: real)
    order = q._registry_order()
    pos = {n: i for i, n in enumerate(order)}
    assert pos[a] < pos[c] and pos[b] < pos[c]
    assert sorted([pos[a], pos[b]]) == [0, 1]


def test_write_query_hashes_round_trip(tmp_path, monkeypatch):
    """write_query_hashes: bootstrap stamps the LAST GREEN round (not
    the current one — stamping current would mark every definition
    'changed since its green' and collapse the rotation to definition
    order), keeps the stored round for unchanged definitions, and
    restamps changed ones with the current round."""
    import json

    import dtle_spark.queries as q

    monkeypatch.setattr(q, "_repo_root", lambda: str(tmp_path))
    names = list(q.REGISTRY.keys())
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        names[1]: {"hash_match": True, "rows_match": True},
    }))
    first = q.write_query_hashes(3)
    # bootstrap: last-green round for the green query, 0 for the rest
    assert first[names[1]]["round"] == 2
    assert all(first[n]["round"] == 0 for n in names if n != names[1])
    # the bootstrapped file must NOT front-load anything: rotation
    # still orders by green history alone
    order = q._registry_order()
    assert order.index(names[1]) > 0  # its green rotates it back
    # tamper one entry's hash to simulate an edit, then regen at r4
    stored = json.loads((tmp_path / "QUERY_HASHES.json").read_text())
    stored[names[0]]["hash"] = "f" * 32
    (tmp_path / "QUERY_HASHES.json").write_text(json.dumps(stored))
    second = q.write_query_hashes(4)
    assert second[names[0]]["round"] == 4  # changed: restamped
    assert second[names[1]]["round"] == 2  # kept
    assert second[names[0]]["hash"] == q._definition_hash(names[0])
    # bootstrap-era round-0 stamps PROMOTE to the green round once the
    # unchanged definition earns one ("round the definition dates
    # from" must not outlive the green it predates); never-green
    # entries keep 0
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        names[2]: {"hash_match": True, "rows_match": True},
    }))
    third = q.write_query_hashes(5)
    assert third[names[2]]["round"] == 3  # promoted from 0
    assert third[names[3]]["round"] == 0  # still never green


def test_rotation_front_loads_dependency_changes(monkeypatch):
    """The r10 failure mode: operator modules changed under six green
    queries and nothing re-gated them. A stored deps fingerprint that
    mismatches the current algo-2 object fingerprint must lead the
    window exactly like a body edit; entries from an OLDER deps algo
    (pre-r11 no-deps, or r11's module-level fingerprints) must not
    front-load even when their stored value mismatches — a format
    migration would otherwise invalidate the whole registry at once
    (the r11 lesson, just one level up)."""
    import dtle_spark.queries as q

    names = list(q.REGISTRY.keys())
    a, b, c = names[0], names[1], names[2]
    monkeypatch.setattr(
        q, "_green_history",
        lambda: ({n: 1 for n in names}, {n: 5 for n in names}),
    )
    real = {
        n: {"hash": q._definition_hash(n), "round": 5} for n in names
    }
    real[a] = {**real[a], "deps": "0" * 32, "algo": q._DEPS_ALGO}  # moved
    real[b] = {**real[b], "deps": q._dependency_hash(b),
               "algo": q._DEPS_ALGO}                               # in sync
    real[c] = {**real[c], "deps": "0" * 32}  # pre-algo-2: mismatch ignored
    monkeypatch.setattr(q, "_stored_hashes", lambda: real)
    order = q._registry_order()
    pos = {n: i for i, n in enumerate(order)}
    assert pos[a] == 0
    assert pos[b] > 0  # in-sync deps don't front-load
    assert pos[c] > 0  # old-algo deps don't front-load
    # no-deps entries (everything else) also stay back
    assert pos[names[3]] > 0


def test_dependency_hash_is_object_granular():
    """The r11 regression this algo exists to kill: a common-module
    edit must not re-stamp queries that don't ride the edited object.
    Components of a plain scan-shaped query include the objects it
    calls (load_table) but NOT unrelated functions in the same module
    (write_clustered lives in tableio next to load_table), NOT other
    query definitions, and NOT the registry module as a whole — so
    adding query N+1 or a new tableio writer re-stamps nothing."""
    import dtle_spark.queries as q

    name = next(iter(q.REGISTRY))
    comps = q._dep_components(name)
    assert any(k.endswith(".load_table") for k in comps), comps
    assert not any("write_clustered" in k for k in comps)
    assert "dtle_spark.queries.<module>" not in comps
    # deterministic across cache states (fresh process equivalence)
    h1 = q._dependency_hash(name)
    q._OBJ_INFO_CACHE.clear()
    assert q._dependency_hash(name) == h1
    # function-level sensitivity: the component set carries per-object
    # fingerprints, so a changed load_table source WOULD move the hash
    key = next(k for k in comps if k.endswith(".load_table"))
    assert len(comps[key]) == 32  # an md5 of the function's own source


def test_rotation_fills_oldest_green_first(monkeypatch):
    """Task: after the changed cohort, window slots fill oldest-last-
    green-first (rule 1's ascending sort) — with every stored hash in
    sync, the order is exactly ascending green age, so no query's
    green can silently outlive the rotation."""
    import dtle_spark.queries as q

    names = list(q.REGISTRY.keys())
    lg = {n: (i % 7) + 2 for i, n in enumerate(names)}
    monkeypatch.setattr(
        q, "_green_history", lambda: ({n: 1 for n in names}, dict(lg))
    )
    real = {
        n: {"hash": q._definition_hash(n),
            "deps": q._dependency_hash(n),
            "algo": q._DEPS_ALGO, "round": lg[n]}
        for n in names
    }
    monkeypatch.setattr(q, "_stored_hashes", lambda: real)
    order = q._registry_order()
    ages = [lg[n] for n in order]
    assert ages == sorted(ages)


def test_write_query_hashes_deps_and_force(tmp_path, monkeypatch):
    """deps lifecycle: a format migration (pre-r11 no-deps, or an
    older deps algo) backfills deps WITHOUT restamping (the migration
    can't know when deps last changed under the new granularity); a
    real same-algo deps mismatch restamps with the current round;
    force_stale restamps even a fully in-sync entry."""
    import json

    import dtle_spark.queries as q

    monkeypatch.setattr(q, "_repo_root", lambda: str(tmp_path))
    names = list(q.REGISTRY.keys())
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        n: {"hash_match": True, "rows_match": True} for n in names[:4]
    }))
    # pre-r11 format (hash + round) and r11 format (module-level deps,
    # no algo marker) — both migrate in place
    old = {
        n: {"hash": q._definition_hash(n), "round": 2} for n in names[:4]
    }
    old[names[3]] = {**old[names[3]], "deps": "a" * 32}  # r11 format
    (tmp_path / "QUERY_HASHES.json").write_text(json.dumps(old))
    out = q.write_query_hashes(11)
    assert out[names[0]]["round"] == 2  # migration: round kept
    assert out[names[0]]["deps"] == q._dependency_hash(names[0])
    assert out[names[0]]["algo"] == q._DEPS_ALGO
    assert out[names[3]]["round"] == 2  # r11-format deps: also kept
    # simulate an operator edit: tamper the stored deps, regen
    stored = json.loads((tmp_path / "QUERY_HASHES.json").read_text())
    stored[names[1]]["deps"] = "e" * 32
    (tmp_path / "QUERY_HASHES.json").write_text(json.dumps(stored))
    out2 = q.write_query_hashes(12)
    assert out2[names[1]]["round"] == 12  # deps changed: restamped
    assert out2[names[0]]["round"] == 2   # untouched: kept
    # force_stale: restamp an in-sync entry
    out3 = q.write_query_hashes(13, force_stale=[names[2]])
    assert out3[names[2]]["round"] == 13
    assert out3[names[0]]["round"] == 2


def test_query_hashes_file_is_current_at_round_close():
    """Close-of-round invariant (the artifact the judge audits): every
    registry query is stamped in QUERY_HASHES.json, and every stamp's
    definition AND dependency fingerprints match the code as it
    ships. A red run of this test means 'regenerate the file'
    (dtle_spark.queries.write_query_hashes) — the invariant it proves
    is that the driver gates exactly the definitions on disk."""
    import dtle_spark.queries as q

    # cold cache: earlier tests monkeypatch module members (e.g.
    # _repo_root), and _obj_info entries computed under a patched
    # namespace would misreport the on-disk code here
    q._OBJ_INFO_CACHE.clear()
    stored = q._stored_hashes()
    missing = [n for n in q.REGISTRY if n not in stored]
    assert not missing, f"unstamped queries: {missing}"
    stale = [
        n for n in q.REGISTRY
        if stored[n].get("hash") != q._definition_hash(n)
        or stored[n].get("algo") != q._DEPS_ALGO
        or stored[n].get("deps") != q._dependency_hash(n)
    ]
    assert not stale, (
        f"QUERY_HASHES.json is stale for {stale}: run "
        "write_query_hashes(<round>) after the last query edit"
    )


# ---------------------------------------------------------------------------
# Calendar resample + gap-fill (operators/timeseries.py)
# ---------------------------------------------------------------------------


class TestGapfill:
    def _obs(self, spark):
        return spark.createDataFrame(
            [("a", 10, 100), ("a", 13, 400), ("b", 11, 50)],
            "k string, t long, v long",
        )

    def test_spine_is_dense_union_calendar(self, spark):
        from dtle_spark.operators.timeseries import calendar_spine

        spine = calendar_spine(self._obs(spark), "k", "t")
        got = sorted((r["k"], r["t"]) for r in spine.collect())
        assert got == [(k, t) for k in "ab" for t in range(10, 14)]

    def test_fill_columns(self, spark):
        from dtle_spark.operators.timeseries import gapfill

        out = gapfill(self._obs(spark), "k", "t", "v")
        rows = {(r["k"], r["t"]): r for r in out.collect()}
        assert len(rows) == 8
        # observed cells pass through in every lane
        assert (rows[("a", 10)]["v"], rows[("a", 10)]["v_zf"],
                rows[("a", 10)]["v_locf"], rows[("a", 10)]["v_interp"]) == (
            100, 100, 100, 100.0)
        # interior gap: zero-fill 0, LOCF carries, interp is the line
        # 100 -> 400 over 3 steps
        assert rows[("a", 11)]["v"] is None
        assert rows[("a", 11)]["v_zf"] == 0
        assert rows[("a", 11)]["v_locf"] == 100
        assert rows[("a", 11)]["v_interp"] == 200.0
        assert rows[("a", 12)]["v_interp"] == 300.0
        # before the first observation: locf and interp are null
        assert rows[("b", 10)]["v_locf"] is None
        assert rows[("b", 10)]["v_interp"] is None
        assert rows[("b", 10)]["v_zf"] == 0
        # after the last observation: locf carries, interp is null
        assert rows[("b", 13)]["v_locf"] == 50
        assert rows[("b", 13)]["v_interp"] is None


# ---------------------------------------------------------------------------
# Salted skew join (operators/skewjoin.py)
# ---------------------------------------------------------------------------


class TestSaltedJoin:
    def _sides(self, spark):
        # key 1 is hot (60 of 63 rows), keys 2/3 normal, key 9 unmatched
        big = spark.createDataFrame(
            [(1, i) for i in range(60)] + [(2, 0), (3, 0), (9, 0)],
            "k long, payload long",
        )
        small = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, name string"
        )
        return big, small

    def test_inner_equals_plain_join(self, spark):
        from dtle_spark.operators.skewjoin import salted_join

        big, small = self._sides(spark)
        got = salted_join(big, small, "k", n_salts=4)
        want = big.join(small, "k")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        assert got.columns == want.columns

    def test_left_keeps_unmatched_once(self, spark):
        from dtle_spark.operators.skewjoin import salted_join

        big, small = self._sides(spark)
        got = salted_join(big, small, "k", n_salts=4, how="left")
        want = big.join(small, "k", "left")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_hot_key_spreads_over_salts(self, spark):
        from pyspark.sql import functions as F

        big, _ = self._sides(spark)
        salts = (
            big.filter(F.col("k") == 1)
            .select(F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(4)).alias("s"))
            .distinct()
            .count()
        )
        assert salts == 4  # the hot key's rows land in every salt bucket

    def test_rejects_right_full_and_salt_collision(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from dtle_spark.operators.skewjoin import salted_join

        big, small = self._sides(spark)
        with _pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, "k", how="full")
        with _pytest.raises(ValueError, match="already exists"):
            salted_join(big.withColumn("__salt", F.lit(1)), small, "k")


# ---------------------------------------------------------------------------
# Snapshot diff (operators/diff.py)
# ---------------------------------------------------------------------------


class TestSnapshotDiff:
    def test_classifies_and_skips_identical(self, spark):
        from dtle_spark.operators.diff import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
            "id long, name string, val double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0),          # identical -> absent
             (2, "b", 25.0),          # null -> value = update
             (3, None, 30.0),         # value -> null = update
             (5, "e", 50.0)],         # new key = insert; key 4 = delete
            "id long, name string, val double",
        )
        d = snapshot_diff(old, new, ["id"])
        got = {r["id"]: r["op"] for r in d.collect()}
        assert got == {2: "u", 3: "u", 4: "d", 5: "i"}
        rows = {r["id"]: r for r in d.collect()}
        assert rows[5]["before"] is None and rows[5]["after"]["val"] == 50.0
        assert rows[4]["after"] is None and rows[4]["before"]["val"] == 40.0
        assert rows[2]["before"]["val"] is None and rows[2]["after"]["val"] == 25.0

    def test_apply_roundtrip_closes(self, spark):
        """diff(base, apply(base, changes)) reapplied onto base gives
        the applied table — diffs are themselves valid change sets."""
        from dtle_spark.operators.apply import apply_changes
        from dtle_spark.operators.diff import snapshot_diff

        base = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, val double"
        )
        target = spark.createDataFrame(
            [(2, "b", 5.0), (3, "c", 3.0)], "id long, name string, val double"
        )
        d = snapshot_diff(base, target, ["id"])
        # feed the diff back through the apply machinery as a change batch
        chg = d.select(
            F.lit("s").alias("sid"), F.col("id").alias("gno"),
            F.lit(0).alias("seq").cast("long"), F.lit(0).cast("long").alias("lc"),
            "op", F.lit(None).cast("timestamp").alias("ts"),
            F.lit("db").alias("schema_name"), F.lit("t").alias("table_name"),
            "before", "after", F.lit(None).cast("string").alias("query"),
        )
        reapplied = apply_changes(base, chg, ["id"])
        assert sorted(map(tuple, reapplied.collect())) == sorted(
            map(tuple, target.collect())
        )

    def test_range_digests_triage(self, spark):
        """The chunked-compare pre-pass: equal ranges produce equal
        (n_rows, digest); a single changed row flags exactly its
        range, and the digest is order-free."""
        from dtle_spark.operators.diff import range_digests

        old = spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(40)],
            "id long, name string, val double",
        )
        changed = spark.createDataFrame(
            [(i, f"n{i}", float(i) if i != 25 else 99.0) for i in range(40)],
            "id long, name string, val double",
        )
        a = {r["rng"]: (r["n_rows"], r["digest"])
             for r in range_digests(old, "id", 10).collect()}
        b = {r["rng"]: (r["n_rows"], r["digest"])
             for r in range_digests(changed.orderBy(F.rand(7)), "id", 10).collect()}
        assert set(a) == set(b) == {0, 1, 2, 3}
        disagree = [rng for rng in a if a[rng] != b[rng]]
        assert disagree == [2]  # id 25 lives in range 2 only

    def test_triaged_diff_equals_full_diff(self, spark):
        """snapshot_diff_triaged ≡ snapshot_diff while actually
        pruning: localized drift (one update, one delete, one insert
        in a disjoint range) flags a strict subset of ranges, and the
        exact re-diff over only those ranges recovers the identical
        change set — including a key range present on one side only."""
        from dtle_spark.operators.diff import (
            disagreeing_ranges,
            snapshot_diff,
            snapshot_diff_triaged,
        )

        old = spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(100)],
            "id long, name string, val double",
        )
        new = spark.createDataFrame(
            [(i, f"n{i}", float(i) if i != 7 else -1.0)
             for i in range(100) if i != 55]
            + [(500, "new", 5.0)],  # a range that exists on one side only
            "id long, name string, val double",
        )
        flagged = sorted(
            r["rng"] for r in disagreeing_ranges(old, new, "id", 10).collect()
        )
        assert flagged == [0, 5, 50]  # update / delete / one-sided insert
        full = sorted(map(repr, snapshot_diff(old, new, ["id"]).collect()))
        triaged = sorted(map(repr, snapshot_diff_triaged(
            old, new, ["id"], range_width=10
        ).collect()))
        assert triaged == full
        assert len(full) == 3

    def test_triaged_diff_identical_sides_empty(self, spark):
        from dtle_spark.operators.diff import snapshot_diff_triaged

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(30)], "id long, val double"
        )
        assert snapshot_diff_triaged(df, df, ["id"], range_width=7).count() == 0

    def test_triaged_diff_null_range_routes_to_exact_differ(self, spark):
        """Keys that are NULL-castable (string PKs, NULL keys) all
        land in the NULL range. It must behave like any other range:
        clean when digests agree, exact-diffed when they disagree —
        a validation tool returning an empty diff on a miscast key
        column is a false 'replica clean'."""
        from dtle_spark.operators.diff import (
            disagreeing_ranges,
            snapshot_diff,
            snapshot_diff_triaged,
        )

        # string keys: every CAST(id AS BIGINT) is NULL
        old = spark.createDataFrame(
            [(f"k{i}", float(i)) for i in range(20)], "id string, val double"
        )
        new = spark.createDataFrame(
            [(f"k{i}", float(i) if i != 3 else -1.0) for i in range(20)],
            "id string, val double",
        )
        full = sorted(map(repr, snapshot_diff(old, new, ["id"]).collect()))
        triaged = sorted(map(repr, snapshot_diff_triaged(
            old, new, ["id"], range_width=10
        ).collect()))
        assert triaged == full and len(full) == 1

        # identical NULL-range content is proven clean (one paired
        # range row, not two forever-flagging one-sided rows)
        assert disagreeing_ranges(old, old, "id", 10).count() == 0

        # mixed: castable ranges prune normally, the NULL range joins in
        old2 = spark.createDataFrame(
            [(str(i), float(i)) for i in range(40)]
            + [("x1", 1.0), (None, 2.0)],
            "id string, val double",
        )
        new2 = spark.createDataFrame(
            [(str(i), float(i) if i != 25 else 9.0) for i in range(40)]
            + [("x1", 1.5), (None, 2.0)],
            "id string, val double",
        )
        flagged = {
            r["rng"] for r in disagreeing_ranges(old2, new2, "id", 10).collect()
        }
        assert flagged == {2, None}
        full2 = sorted(map(repr, snapshot_diff(old2, new2, ["id"]).collect()))
        triaged2 = sorted(map(repr, snapshot_diff_triaged(
            old2, new2, ["id"], range_width=10
        ).collect()))
        # x1 update + id-25 update + the NULL-key row's d/i pair (a
        # NULL PK never joins to itself — same convention as the full
        # differ, which the triage must reproduce, not shortcut)
        assert triaged2 == full2 and len(full2) == 4


# ---------------------------------------------------------------------------
# SCD2 history (operators/scd2.py)
# ---------------------------------------------------------------------------


class TestScd2History:
    def _hist(self, spark, changes, base=None):
        from dtle_spark.operators.scd2 import scd2_history

        chg = spark.createDataFrame(changes, change_schema(ROW))
        h = scd2_history(chg, ["id"], base=base)
        return {
            (r["id"], r["valid_from_seq"]): (
                r["valid_to_seq"], r["is_current"],
                r["row"]["amount"] if r["row"] else None,
            )
            for r in h.collect()
        }

    def test_versions_chain_and_close(self, spark):
        sid = "s"
        rows = [
            (sid, 1, 1, 0, "i", None, "d", "t", None, (1, "x", 10.0), None),
            (sid, 2, 2, 0, "u", None, "d", "t", (1, "x", 10.0), (1, "x", 20.0), None),
            (sid, 3, 3, 0, "d", None, "d", "t", (1, "x", 20.0), None, None),
            (sid, 4, 4, 0, "i", None, "d", "t", None, (1, "x", 30.0), None),  # re-insert
            (sid, 5, 5, 0, "i", None, "d", "t", None, (2, "y", 50.0), None),
        ]
        got = self._hist(spark, rows)
        assert got == {
            (1, 1): (2, False, 10.0),   # superseded by v2
            (1, 2): (3, False, 20.0),   # closed by the delete
            (1, 4): (None, True, 30.0),  # re-opened, current
            (2, 5): (None, True, 50.0),
        }

    def test_pk_move_closes_old_opens_new(self, spark):
        sid = "s"
        rows = [
            (sid, 1, 1, 0, "i", None, "d", "t", None, (1, "x", 10.0), None),
            (sid, 2, 2, 0, "u", None, "d", "t", (1, "x", 10.0), (9, "x", 10.0), None),
        ]
        got = self._hist(spark, rows)
        assert got == {
            (1, 1): (2, False, 10.0),    # closed by the move-away
            (9, 2): (None, True, 10.0),  # the new key's open
        }

    def test_base_seed_opens_at_base_seq(self, spark):
        base = spark.createDataFrame([(7, "b", 70.0)], ROW)
        rows = [
            ("s", 1, 1, 0, "u", None, "d", "t", (7, "b", 70.0), (7, "b", 75.0), None),
        ]
        got = self._hist(spark, rows, base=base)
        assert got == {
            (7, -1): (1, False, 70.0),
            (7, 1): (None, True, 75.0),
        }


# ---------------------------------------------------------------------------
# Data-quality checks (functions/dq.py)
# ---------------------------------------------------------------------------


class TestDqChecks:
    def test_all_kinds_count_violations(self, spark):
        from dtle_spark.functions.dq import dq_report

        df = spark.createDataFrame(
            [(1, "x", 10.0), (1, "y", -5.0), (2, None, 500.0), (3, "zz", None)],
            "id long, name string, val double",
        )
        rep = dq_report(df, [
            {"check": "not_null", "col": "name"},
            {"check": "unique", "cols": ["id"]},
            {"check": "accepted_values", "col": "name", "values": ["x", "y"]},
            {"check": "range", "col": "val", "lo": 0, "hi": 100},
            {"check": "expression", "name": "short_name",
             "sql": "length(name) <= 1"},
        ])
        got = {r["check_name"]: r["violations"] for r in rep.collect()}
        assert got == {
            "not_null:name": 1,
            "unique:id": 1,                    # id 1 twice
            "accepted_values:name": 2,         # None + 'zz'
            "range:val": 3,                    # -5, 500, NULL
            "expression:short_name": 2,        # 'zz' + NULL name
        }
        assert all(r["n_rows"] == 4 for r in rep.collect())

    def test_referential_orphans(self, spark):
        from dtle_spark.functions.dq import dq_referential

        child = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
        )
        parent = spark.createDataFrame([(10,), (20,)], "pk long")
        row = dq_referential(child, parent, "fk", "pk").collect()[0]
        # NULL fk is not an orphan (not_null is its own check)
        assert (row["check_name"], row["violations"], row["n_rows"]) == (
            "referential:fk->pk", 1, 4
        )

    def test_unknown_kind_and_empty_suite_raise(self, spark):
        from dtle_spark.functions.dq import dq_report

        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="unknown check"):
            dq_report(df, [{"check": "nope"}])
        with pytest.raises(ValueError, match="at least one"):
            dq_report(df, [])

    def test_empty_table_reports_zero_violations_not_null(self, spark):
        """SUM over zero rows is NULL; every check must still report
        violations = 0 on an empty (or fully-filtered) table so a
        ``violations == 0`` threshold policy evaluates correctly."""
        from dtle_spark.functions.dq import dq_report

        df = spark.createDataFrame([], "id long, name string, val double")
        rep = dq_report(df, [
            {"check": "not_null", "col": "name"},
            {"check": "unique", "cols": ["id"]},
            {"check": "accepted_values", "col": "name", "values": ["x"]},
            {"check": "range", "col": "val", "lo": 0},
            {"check": "expression", "name": "e", "sql": "val > 0"},
        ]).collect()
        assert len(rep) == 5
        for r in rep:
            assert r["violations"] == 0 and r["n_rows"] == 0, r

    def test_grouped_drift_localizes_shift(self, spark):
        """dq_drift_report_grouped catches drift confined to ONE group
        (the 100 TB failure mode a global comparison averages away):
        the shifted group fires loghist TV ~1 while the stable groups
        read ~0; a group present on one side only shows in presence
        (+1 vanished / -1 appeared) and in no ratio/TV row; a NULL
        group value pairs null-safely like any other group."""
        from dtle_spark.functions import sketches as sk
        from dtle_spark.functions.dq import dq_drift_report_grouped

        def tbl(rows):
            return spark.createDataFrame(rows, "grp string, k long, v long")

        base_rows = (
            [("a", i, 1000 + i % 50) for i in range(400)]
            + [("b", i, 1000 + i % 50) for i in range(400)]
            + [("gone", i, 1000 + i % 50) for i in range(100)]
            + [(None, i, 1000 + i % 50) for i in range(100)]
        )
        # group b's values jump an octave (x16); 'gone' vanishes,
        # 'new' appears; a and the NULL group are stable
        cur_rows = (
            [("a", i, 1000 + i % 50) for i in range(400, 800)]
            + [("b", i, (1000 + i % 50) * 16) for i in range(400)]
            + [("new", i, 1000 + i % 50) for i in range(100)]
            + [(None, i, 1000 + i % 50) for i in range(100, 200)]
        )

        def profile(df):
            return {
                "kmv": sk.kmv_distinct_grouped(df, "grp", "k", k=32),
                "loghist": sk.loghist_sketch_grouped(df, "grp", "v"),
            }

        rep = dq_drift_report_grouped(
            profile(tbl(base_rows)), profile(tbl(cur_rows))
        )
        got = {(r["check_name"], r["grp"]): r for r in rep.collect()}

        pres = {g: r["stat"] for (c, g), r in got.items()
                if c == "drift:presence"}
        assert pres == {"a": 0.0, "b": 0.0, None: 0.0,
                        "gone": 1.0, "new": -1.0}
        # TV fires ONLY for the shifted group
        assert got[("drift:loghist_tv", "b")]["stat"] > 0.9
        assert got[("drift:loghist_tv", "a")]["stat"] < 0.05
        assert got[("drift:loghist_tv", None)]["stat"] < 0.05
        # one-sided groups have no ratio/TV rows
        assert ("drift:kmv_ratio", "gone") not in got
        assert ("drift:loghist_tv", "new") not in got
        # exactness contract: non-NULL integer rationals everywhere,
        # stat = num/denom except presence (num - denom)
        for (c, g), r in got.items():
            assert r["drift_num"] is not None and r["drift_denom"] is not None
            if c == "drift:presence":
                assert float(r["drift_num"]) - float(r["drift_denom"]) == r["stat"]
            else:
                assert float(r["drift_num"]) / float(r["drift_denom"]) == r["stat"]

    def test_drift_keys_ranks_moved_keys(self, spark):
        """dq_drift_keys names WHICH keys moved once the global gate
        fires: per-probe-key share drift as the exact rational
        |est_b*n_c - est_c*n_b| / (n_b*n_c). With few distinct keys
        and width=512 the CMS estimates are collision-free, so every
        number is checkable by hand; a key absent from both sides
        drifts 0, one absent from one side ranks at the top."""
        from dtle_spark.functions import sketches as sk
        from dtle_spark.functions.dq import dq_drift_keys

        def tbl(counts):
            rows = [(k,) for k, n in counts.items() for _ in range(n)]
            return spark.createDataFrame(rows, "k string")

        base = sk.cms_sketch(
            tbl({"a": 100, "b": 50, "hot": 10}), "k", depth=4, width=512
        )
        cur = sk.cms_sketch(
            tbl({"a": 100, "b": 5, "new": 60}), "k", depth=4, width=512
        )
        probes = spark.createDataFrame(
            [("a",), ("b",), ("hot",), ("new",), ("ghost",)], "key string"
        )
        got = {r["key"]: r for r in
               dq_drift_keys(base, cur, probes).collect()}

        n_b, n_c = 160, 165
        exact = {"a": (100, 100), "b": (50, 5), "hot": (10, 0),
                 "new": (0, 60), "ghost": (0, 0)}
        assert set(got) == set(exact)
        for k, (eb, ec) in exact.items():
            r = got[k]
            assert (r["b_est"], r["c_est"]) == (eb, ec), k
            assert int(r["drift_num"]) == abs(eb * n_c - ec * n_b), k
            assert int(r["drift_denom"]) == n_b * n_c, k
            assert r["drift_num"] is not None
            assert r["stat"] == float(r["drift_num"]) / float(r["drift_denom"])
        assert got["ghost"]["stat"] == 0.0
        # the appeared/vanished keys out-rank the stable one
        assert got["new"]["stat"] > got["a"]["stat"]
        assert got["b"]["stat"] > got["a"]["stat"]

    def test_drift_emits_bigint_with_loud_overflow_guard(self, spark):
        """The r11 hash-gate lesson: DECIMAL(38,0) output was the one
        shape two engines' hash canonicalizations disagreed on, so the
        gated drift rationals emit BIGINT. The guard is LOUD: a value
        at/above 2^53 (no longer float64-exact) raises instead of
        silently emitting, and emit_decimal=True is the escape hatch
        that keeps decimal(38,0) for fleets beyond the bound."""
        from pyspark.sql import functions as F
        from dtle_spark.functions.dq import _GATE_MAX, _gate_int

        df = spark.createDataFrame(
            [(1,), (_GATE_MAX,)], "v long"
        ).select(F.col("v").cast("decimal(38,0)").alias("v"))
        small = df.filter("v = 1").select(_gate_int(F.col("v"), "x", False))
        assert small.dtypes == [("x", "bigint")]
        assert small.collect()[0]["x"] == 1
        with pytest.raises(Exception, match="2\\^53|emit_decimal"):
            df.select(_gate_int(F.col("v"), "x", False)).collect()
        # NULL is equally loud (the r10 NULL-decimal lesson)
        nul = spark.sql("SELECT CAST(NULL AS decimal(38,0)) AS v")
        with pytest.raises(Exception, match="NULL"):
            nul.select(_gate_int(F.col("v"), "x", False)).collect()
        # escape hatch: decimal shape preserved, no guard
        big = df.select(_gate_int(F.col("v"), "x", True))
        assert big.dtypes == [("x", "decimal(38,0)")]
        assert {int(r["x"]) for r in big.collect()} == {1, _GATE_MAX}

    def test_temporal_join_equals_per_ts_as_of(self, spark):
        """temporal_join == as_of_ts applied at each fact's own
        timestamp (the defining invariant), checked at every fact:
        seed window (NULL valid_from_ts), inclusive-from boundary,
        exclusive-to boundary, post-delete hole -> NULL, NULL fk ->
        NULL, NULL fact ts -> NULL, and inner-join drop of the
        unmatched rows."""
        from datetime import datetime, timezone

        from dtle_spark.operators.scd2 import (
            as_of_ts, scd2_history, temporal_join,
        )

        base = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], ROW)
        rows = [
            ("s", 1, 5, 0, "u", datetime(2026, 1, 5, tzinfo=timezone.utc),
             "d", "t", (1, "a", 10.0), (1, "a", 15.0), None),
            ("s", 2, 7, 0, "d", datetime(2026, 1, 7, tzinfo=timezone.utc),
             "d", "t", (2, "b", 20.0), None, None),
        ]
        chg = spark.createDataFrame(rows, change_schema(ROW))
        hist = scd2_history(chg, ["id"], base=base).localCheckpoint()

        def day(d):
            return datetime(2026, 1, d, tzinfo=timezone.utc)

        facts = spark.createDataFrame(
            [(100, 1, day(2)),   # seed window (before the update)
             (101, 1, day(5)),   # AT the update ts: inclusive-from
             (102, 2, day(6)),   # last instant before the delete
             (103, 2, day(7)),   # AT the delete ts: exclusive -> NULL
             (104, None, day(5)),   # NULL fk
             (105, 1, None),     # NULL fact ts
             (106, 9, day(5))],  # unknown key
            "fid long, fk long, fts timestamp",
        )
        got = {r["fid"]: r for r in temporal_join(
            facts, hist, {"fk": "id"}, "fts",
            {"row.amount": "dim_val", "valid_from_seq": "vfrom"},
        ).collect()}
        assert len(got) == 7
        assert (got[100]["dim_val"], got[100]["vfrom"]) == (10.0, -1)
        assert (got[101]["dim_val"], got[101]["vfrom"]) == (15.0, 5)
        assert (got[102]["dim_val"], got[102]["vfrom"]) == (20.0, -1)
        for fid in (103, 104, 105, 106):
            assert got[fid]["dim_val"] is None, fid
        # the defining invariant, at every timed fact
        for r in facts.filter("fk IS NOT NULL AND fts IS NOT NULL").collect():
            snap = {x["id"]: x["amount"]
                    for x in as_of_ts(hist, r["fts"]).collect()}
            assert got[r["fid"]]["dim_val"] == snap.get(r["fk"]), r["fid"]
        # inner drops the unmatched
        inner = temporal_join(
            facts, hist, {"fk": "id"}, "fts", {"row.amount": "dim_val"},
            how="inner",
        )
        assert {r["fid"] for r in inner.collect()} == {100, 101, 102}
        with pytest.raises(ValueError, match="collide"):
            temporal_join(facts, hist, {"fk": "id"}, "fts", {"row.amount": "fid"})

    def test_as_of_seq_reconstructs_past_states(self, spark):
        """as_of(history, s) == apply(base, changes with seq <= s) for
        every prefix — the temporal-read contract, checked at each
        event boundary of a stream with updates, deletes, re-inserts,
        and a PK move."""
        from dtle_spark.operators.apply import apply_changes
        from dtle_spark.operators.scd2 import as_of_seq, scd2_history

        base = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], ROW)
        sid = "s"
        rows = [
            (sid, 1, 1, 0, "u", None, "d", "t", (1, "a", 10.0), (1, "a", 15.0), None),
            (sid, 2, 2, 0, "d", None, "d", "t", (2, "b", 20.0), None, None),
            (sid, 3, 3, 0, "i", None, "d", "t", None, (2, "b", 22.0), None),
            (sid, 4, 4, 0, "u", None, "d", "t", (1, "a", 15.0), (9, "a", 15.0), None),
        ]
        chg = spark.createDataFrame(rows, change_schema(ROW))
        hist = scd2_history(chg, ["id"], base=base).localCheckpoint()
        for s in [-1, 0, 1, 2, 3, 4, 99]:
            got = sorted(map(tuple, as_of_seq(hist, s).collect()))
            want = sorted(map(tuple, apply_changes(
                base, chg.filter(F.col("seq") <= s), ["id"]
            ).collect()))
            assert got == want, f"seq {s}"

    def test_as_of_ts_reconstructs_past_states(self, spark):
        """The event-time read: with a timed stream (ts = epoch + seq
        seconds here), as_of_ts at each boundary instant — and just
        before/after it — equals the seq prefix apply; the un-timed
        snapshot seed reads as open-since-before-all-time."""
        from datetime import datetime, timezone

        from dtle_spark.operators.apply import apply_changes
        from dtle_spark.operators.scd2 import as_of_ts, scd2_history

        base = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], ROW)
        sid = "s"
        rows = [
            (sid, 1, 1, 0, "u", None, "d", "t", (1, "a", 10.0), (1, "a", 15.0), None),
            (sid, 2, 2, 0, "d", None, "d", "t", (2, "b", 20.0), None, None),
            (sid, 3, 3, 0, "i", None, "d", "t", None, (2, "b", 22.0), None),
            (sid, 4, 4, 0, "u", None, "d", "t", (1, "a", 15.0), (9, "a", 15.0), None),
        ]
        chg = spark.createDataFrame(rows, change_schema(ROW)).withColumn(
            "ts", F.timestamp_seconds(F.col("seq"))
        )
        hist = scd2_history(chg, ["id"], base=base).localCheckpoint()

        def t(sec: float) -> datetime:
            return datetime.fromtimestamp(sec, tz=timezone.utc)

        for s in [1, 2, 3, 4]:
            want = sorted(map(tuple, apply_changes(
                base, chg.filter(F.col("seq") <= s), ["id"]
            ).collect()))
            got_at = sorted(map(tuple, as_of_ts(hist, t(s)).collect()))
            assert got_at == want, f"at ts {s}"  # the event AT t is visible
            got_after = sorted(map(tuple, as_of_ts(hist, t(s + 0.5)).collect()))
            assert got_after == want, f"after ts {s}"
        # before every change: the seed alone (null valid_from_ts)
        got0 = sorted(map(tuple, as_of_ts(hist, t(0.5)).collect()))
        assert got0 == sorted(map(tuple, base.collect()))
