"""MySQL DML builder goldens, ported from the reference's own
builder_test.go (TestBuildDMLInsertQuery:31, SignedUnsigned:113,
TestBuildDMLDeleteQuery:216, DeleteSignedUnsigned:473,
TestBuildDMLUpdateQuery:579, UpdateSignedUnsigned:746)."""

from __future__ import annotations

import re

import pytest

from dtle_spark.sinks.mysql_dml import (
    Column,
    build_delete,
    build_insert,
    build_update,
    escape_name,
    escape_value,
    statements_for_changes,
)


def norm(q: str) -> str:
    """normalizeQuery (builder_test.go:24-29): strip backticks,
    collapse whitespace."""
    return re.sub(r"[ \t\n\r]+", " ", q.replace("`", "")).strip()


def cols(pks=(), unsigned=(), bits=8):
    return [
        Column(n, is_pk=(n in pks), is_unsigned=(n in unsigned), bits=bits)
        for n in ["id", "name", "rank", "position", "age"]
    ]


class TestInsert:
    def test_basic_replace_into(self):
        sql, args = build_insert(
            "mydb", "tbl", cols(pks=("position",)), [],
            [[3, "testName", "first", 17, 23]],
        )
        assert norm(sql) == norm("replace into mydb.tbl  values (?,?,?,?,?)")
        assert args == [3, "testName", "first", 17, 23]

    def test_signed_passthrough(self):
        _, args = build_insert(
            "mydb", "tbl", cols(pks=("position",)), [],
            [[3, "testname", "first", -1, 23]],
        )
        assert args == [3, "testname", "first", -1, 23]

    def test_unsigned_int8(self):
        _, args = build_insert(
            "mydb", "tbl", cols(pks=("position",), unsigned=("position",), bits=8),
            [], [[3, "testname", "first", -1, 23]],
        )
        assert args == [3, "testname", "first", 255, 23]

    def test_unsigned_int32(self):
        _, args = build_insert(
            "mydb", "tbl", cols(pks=("position",), unsigned=("position",), bits=32),
            [], [[3, "testname", "first", -1, 23]],
        )
        assert args == [3, "testname", "first", 4294967295, 23]

    def test_multirow_batches_placeholders(self):
        sql, args = build_insert(
            "mydb", "tbl", cols(), [],
            [[1, "a", "r", 1, 2], [2, "b", "r", 2, 3]],
        )
        assert norm(sql) == norm(
            "replace into mydb.tbl  values (?,?,?,?,?),(?,?,?,?,?)"
        )
        assert args == [1, "a", "r", 1, 2, 2, "b", "r", 2, 3]

    def test_timezone_placeholder(self):
        c = cols()
        c[4] = Column("age", tz_to="+08:00")
        sql, _ = build_insert("mydb", "tbl", c, [], [[1, "a", "r", 1, 2]])
        assert "convert_tz(?, '+08:00', '+00:00')" in sql


class TestDelete:
    ARGS = [3, "testname", "first", 17, 23]

    def test_single_pk(self):
        sql, uk_args, has_uk = build_delete(
            "mydb", "tbl", cols(pks=("position",)), [], self.ARGS
        )
        assert norm(sql) == norm(
            "delete from mydb.tbl where ((position = ?)) limit 1"
        )
        assert uk_args == [17] and has_uk

    def test_composite_pk(self):
        sql, uk_args, has_uk = build_delete(
            "mydb", "tbl", cols(pks=("name", "position")), [], self.ARGS
        )
        assert norm(sql) == norm(
            "delete from mydb.tbl where ((name = ?) and (position = ?)) limit 1"
        )
        assert uk_args == ["testname", 17] and has_uk

    def test_pk_order_follows_column_order(self):
        # builder_test.go case 3: columns ordered position,name,id,...
        columns = [
            Column("position", is_pk=True), Column("name", is_pk=True),
            Column("id"), Column("rank"), Column("age"),
        ]
        sql, uk_args, _ = build_delete("mydb", "tbl", columns, [], self.ARGS)
        assert norm(sql) == norm(
            "delete from mydb.tbl where ((position = ?) and (name = ?)) limit 1"
        )
        assert uk_args == [3, "testname"]

    def test_bad_args_count_raises(self):
        with pytest.raises(ValueError):
            build_delete("mydb", "tbl", cols(pks=("position",)), [], ["first", 17])

    def test_signed_pk_passthrough(self):
        columns = [
            Column("position", is_pk=True), Column("name"), Column("id"),
            Column("rank"), Column("age"),
        ]
        _, uk_args, _ = build_delete(
            "mydb", "tbl", columns, [], [-1, "testname", "first", 3, 23]
        )
        assert uk_args == [-1]

    def test_unsigned_pk_reencodes(self):
        columns = [
            Column("position", is_pk=True, is_unsigned=True, bits=8),
            Column("name"), Column("id"), Column("rank"), Column("age"),
        ]
        _, uk_args, _ = build_delete(
            "mydb", "tbl", columns, [], [-1, "testname", "first", 3, 23]
        )
        assert uk_args == [255]

    def test_no_pk_full_row_null_safe(self):
        # the no-PK delete-one: every column compared, nil -> `is NULL`,
        # limit 1 (A2's reference semantics, builder.go:107-129)
        sql, args, has_uk = build_delete(
            "mydb", "tbl", cols(), [], [3, None, "first", 17, 23]
        )
        assert norm(sql) == norm(
            "delete from mydb.tbl where ((id = ?) and (name is NULL) and "
            "(rank = ?) and (position = ?) and (age = ?)) limit 1"
        )
        assert args == [3, "first", 17, 23]
        assert not has_uk


class TestUpdate:
    VALUE = [3, "testname", "newval", 17, 23]
    WHERE = [3, "testname", "findme", 17, 56]

    def test_basic_pk_update(self):
        sql, shared, uk_args, has_uk = build_update(
            "mydb", "tbl", cols(pks=("position",)), [], self.VALUE, self.WHERE
        )
        assert norm(sql) == norm(
            "update mydb.tbl set id=?, name=?, rank=?, position=?, age=? "
            "where ((position = ?)) limit 1"
        )
        assert shared == [3, "testname", "newval", 17, 23]
        assert uk_args == [17] and has_uk

    def test_signed_passthrough(self):
        value = [3, "testname", "newval", -17, -2]
        where = [3, "testname", "findme", -3, 56]
        _, shared, uk_args, _ = build_update(
            "mydb", "tbl", cols(pks=("position",)), [], value, where
        )
        assert shared == [3, "testname", "newval", -17, -2]
        assert uk_args == [-3]

    def test_unsigned_reencodes(self):
        value = [3, "testname", "newval", -17, -2]
        where = [3, "testname", "findme", -3, 56]
        _, shared, uk_args, _ = build_update(
            "mydb", "tbl",
            cols(pks=("position",), unsigned=("position", "age"), bits=8),
            [], value, where,
        )
        assert shared == [3, "testname", "newval", 239, 254]
        assert uk_args == [253]

    def test_no_pk_full_row_where(self):
        sql, shared, args, has_uk = build_update(
            "mydb", "tbl", cols(), [], self.VALUE, self.WHERE
        )
        assert "((id = ?) and (name = ?) and (rank = ?) and (position = ?) and (age = ?))" in norm(sql)
        assert args == self.WHERE and not has_uk


class TestHelpers:
    def test_escape_name_doubles_backticks(self):
        assert escape_name("a`b") == "`a``b`"

    def test_escape_value_mysql_rules(self):
        assert escape_value("a'b\\c\n") == "a\\'b\\\\c\\n"

    def test_mediumint_mask(self):
        from dtle_spark.sinks.mysql_dml import convert_arg

        c = Column("m", is_unsigned=True, is_mediumint=True, bits=32)
        assert convert_arg(c, -1) == 0x00FFFFFF


class TestStatementsForChanges:
    def test_change_stream_to_statements(self):
        columns = cols(pks=("position",))
        changes = [
            {"op": "i", "after": [1, "a", "r", 10, 2]},
            {"op": "i", "after": [2, "b", "r", 11, 3]},
            {"op": "u", "before": [2, "b", "r", 11, 3], "after": [2, "b2", "r", 11, 3]},
            {"op": "d", "before": [1, "a", "r", 10, 2]},
        ]
        stmts = statements_for_changes("mydb", "tbl", columns, changes)
        assert len(stmts) == 3  # 2 contiguous inserts collapse into one REPLACE
        assert norm(stmts[0][0]).startswith("replace into mydb.tbl")
        assert stmts[0][1] == [1, "a", "r", 10, 2, 2, "b", "r", 11, 3]
        assert norm(stmts[1][0]).startswith("update mydb.tbl set")
        assert stmts[1][1] == [2, "b2", "r", 11, 3, 11]  # shared + uk
        assert norm(stmts[2][0]).startswith("delete from mydb.tbl")
        assert stmts[2][1] == [10]


class TestDdlDestinationShims:
    def test_rename_create_table_reference_golden(self):
        """base/utils_test.go:323-361: schema/table rename + ColumnMap
        column reorder, restore-normalized output — bit-for-bit."""
        from dtle_spark.sinks.mysql_dml import rename_create_table

        got = rename_create_table(
            "create table s.t (id int primary key, val int)",
            "s1", "t1", ["val", "id"],
        )
        assert got == "CREATE TABLE `s1`.`t1` (`val` INT,`id` INT PRIMARY KEY)"
        # table-level constraints keep their place after mapped columns
        got2 = rename_create_table(
            "create table s.t (id int, val int, primary key (id))",
            "s2", "t2", ["val", "id"],
        )
        assert got2 == "CREATE TABLE `s2`.`t2` (`val` INT,`id` INT,PRIMARY KEY (ID))"
        import pytest as _p

        with _p.raises(ValueError, match="ColumnMap"):
            rename_create_table("create table s.t (id int)", "s", "t", ["nope"])

    def test_mysql57_collation_workaround_goldens(self):
        """base/utils_test.go:362-392 goldens: every utf8mb4_0900_ai_ci
        occurrence (any case) becomes utf8mb4_general_ci; everything
        else byte-identical."""
        from dtle_spark.sinks.mysql_dml import mysql57_collation_workaround as w

        assert w(
            "CREATE DATABASE `a` /*!40100 DEFAULT CHARACTER SET utf8mb4 "
            "COLLATE utf8mb4_0900_ai_ci */ /*!80016 DEFAULT ENCRYPTION='N' */"
        ) == (
            "CREATE DATABASE `a` /*!40100 DEFAULT CHARACTER SET utf8mb4 "
            "COLLATE utf8mb4_general_ci */ /*!80016 DEFAULT ENCRYPTION='N' */"
        )
        assert w(
            "CREATE TABLE `a` (\n  `id` int(11) NOT NULL AUTO_INCREMENT,\n"
            "  `val1` varchar(64) DEFAULT NULL,\n  PRIMARY KEY (`id`)\n"
            ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_0900_ai_ci"
        ).endswith("COLLATE=utf8mb4_general_ci")
        assert w(
            "DEFAULT COLLATE = UTF8MB4_0900_AI_CI"
        ) == "DEFAULT COLLATE = utf8mb4_general_ci"
        assert w("no collation here") == "no collation here"

    def test_rename_preserves_string_literal_defaults(self):
        """ADVICE r4: normalization must not rewrite quoted literal
        spans — DEFAULT 'Hello' stays 'Hello' (the reference restores
        via AST and keeps literal case); keywords still uppercase."""
        from dtle_spark.sinks.mysql_dml import rename_create_table

        got = rename_create_table(
            "create table s.t (id int primary key, "
            "greet varchar(20) not null default 'Hello')",
            "s1", "t1",
        )
        assert got == (
            "CREATE TABLE `s1`.`t1` (`id` INT PRIMARY KEY,"
            "`greet` VARCHAR(20) NOT NULL DEFAULT 'Hello')"
        )

    def test_rename_keeps_table_options_tail(self):
        """ADVICE r4: the options tail (ENGINE/CHARSET/COMMENT) must be
        re-emitted, and a parenthesis or comma inside a quoted COMMENT
        must not corrupt the parse."""
        from dtle_spark.sinks.mysql_dml import rename_create_table

        got = rename_create_table(
            "create table s.t (id int, c int comment 'a,(b)', primary key (id)) "
            "ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COMMENT='x(y)'",
            "s1", "t1", ["c", "id"],
        )
        assert got == (
            "CREATE TABLE `s1`.`t1` (`c` INT COMMENT 'a,(b)',`id` INT,"
            "PRIMARY KEY (ID)) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COMMENT='x(y)'"
        )

    def test_rename_unbalanced_parens_raises(self):
        from dtle_spark.sinks.mysql_dml import rename_create_table
        import pytest as _p

        with _p.raises(ValueError, match="unbalanced"):
            rename_create_table("create table s.t (id int", "s", "t")
