"""Oracle LogMiner translation goldens (reference S8/S10): every case
ported verbatim from the reference driver's own tests —
log_miner_test.go TestParseDDLSQL (type relation corpus),
TestParseAlterTable, TestParseDropTable/DDLSQLDROP, TestParseDMLSQL,
and the buildFilterSchemaTable filter goldens. Pure-Python layer; no
Spark session needed."""

from __future__ import annotations

import pytest

from dtle_spark.sources.oracle_ddl import (
    build_filter_schema_table,
    parse_dml_sql,
    translate_oracle_ddl,
)

B = "DEFAULT CHARACTER SET = UTF8MB4"

CREATE_GOLDENS = [
    ("CREATE TABLE TEST.NUMBER_WILDCARD_COLUMNS(ID INT, C_NUMBER NUMBER(*));",
     "CREATE TABLE `TEST`.`NUMBER_WILDCARD_COLUMNS` (`ID` INT,`C_NUMBER` DOUBLE)"),
    ("CREATE TABLE TEST.BFILE_COLUMNS(ID INT, C_BFILE BFILE);",
     "CREATE TABLE `TEST`.`BFILE_COLUMNS` (`ID` INT,`C_BFILE` VARCHAR(255))"),
    ("CREATE TABLE TEST.BINARY_FLOAT_COLUMNS(ID INT, C_BINARY_FLOAT BINARY_FLOAT);",
     "CREATE TABLE `TEST`.`BINARY_FLOAT_COLUMNS` (`ID` INT,`C_BINARY_FLOAT` FLOAT)"),
    ("CREATE TABLE TEST.BINARY_DOUBLE_COLUMNS(ID INT, C_BINARY_DOUBLE BINARY_DOUBLE);",
     "CREATE TABLE `TEST`.`BINARY_DOUBLE_COLUMNS` (`ID` INT,`C_BINARY_DOUBLE` DOUBLE)"),
    ("CREATE TABLE TEST.BLOB_COLUMNS(ID INT, C_BLOB BLOB);",
     "CREATE TABLE `TEST`.`BLOB_COLUMNS` (`ID` INT,`C_BLOB` LONGBLOB)"),
    ("CREATE TABLE TEST.CHAR_255_COLUMNS(ID INT, C_CHAR CHAR(255));",
     "CREATE TABLE `TEST`.`CHAR_255_COLUMNS` (`ID` INT,`C_CHAR` CHAR(255))"),
    ("CREATE TABLE TEST.CHARACTER_255_COLUMNS(ID INT, C_CHARACTER CHARACTER(255));",
     "CREATE TABLE `TEST`.`CHARACTER_255_COLUMNS` (`ID` INT,`C_CHARACTER` CHAR(255))"),
    ("CREATE TABLE TEST.CHARACTER_256_COLUMNS(ID INT, C_CHARACTER CHARACTER(256));",
     "CREATE TABLE `TEST`.`CHARACTER_256_COLUMNS` (`ID` INT,`C_CHARACTER` VARCHAR(256))"),
    ("CREATE TABLE TEST.CLOB_COLUMNS(ID INT, C_CLOB CLOB);",
     "CREATE TABLE `TEST`.`CLOB_COLUMNS` (`ID` INT,`C_CLOB` LONGTEXT)"),
    ("CREATE TABLE TEST.DATE_COLUMNS(ID INT, C_DATE DATE);",
     "CREATE TABLE `TEST`.`DATE_COLUMNS` (`ID` INT,`C_DATE` DATETIME)"),
    ("CREATE TABLE TEST.DECIMAL_COLUMNS(ID INT, C_DECIMAL DECIMAL(11, 3));",
     "CREATE TABLE `TEST`.`DECIMAL_COLUMNS` (`ID` INT,`C_DECIMAL` DECIMAL(11,3))"),
    ("CREATE TABLE TEST.DEC_COLUMNS(ID INT, C_DEC DEC(11, 3));",
     "CREATE TABLE `TEST`.`DEC_COLUMNS` (`ID` INT,`C_DEC` DECIMAL(11,3))"),
    ("CREATE TABLE TEST.DOUBLE_PRECISION_COLUMNS(ID INT, C_DOUBLE_PRECISION DOUBLE PRECISION);",
     "CREATE TABLE `TEST`.`DOUBLE_PRECISION_COLUMNS` (`ID` INT,`C_DOUBLE_PRECISION` DOUBLE)"),
    ("CREATE TABLE TEST.FLOAT_COLUMNS(ID INT, C_FLOAT FLOAT(11));",
     "CREATE TABLE `TEST`.`FLOAT_COLUMNS` (`ID` INT,`C_FLOAT` DOUBLE)"),
    ("CREATE TABLE TEST.INTEGER_COLUMNS(ID INT, C_INTEGER INTEGER);",
     "CREATE TABLE `TEST`.`INTEGER_COLUMNS` (`ID` INT,`C_INTEGER` INT)"),
    ("CREATE TABLE TEST.INT_COLUMNS(ID INT, C_INT INT);",
     "CREATE TABLE `TEST`.`INT_COLUMNS` (`ID` INT,`C_INT` INT)"),
    ("CREATE TABLE TEST.INTERVAL_YEAR_COLUMNS(ID INT, C_INTERVAL_YEAR INTERVAL YEAR(3) TO MONTH);",
     "CREATE TABLE `TEST`.`INTERVAL_YEAR_COLUMNS` (`ID` INT,`C_INTERVAL_YEAR` VARCHAR(30))"),
    ("CREATE TABLE TEST.INTERVAL_DAY_COLUMNS(ID INT, C_INTERVAL_DAY INTERVAL DAY(3) TO SECOND(5));",
     "CREATE TABLE `TEST`.`INTERVAL_DAY_COLUMNS` (`ID` INT,`C_INTERVAL_DAY` VARCHAR(30))"),
    ("CREATE TABLE TEST.LONG_COLUMNS(ID INT, C_LONG LONG);",
     "CREATE TABLE `TEST`.`LONG_COLUMNS` (`ID` INT,`C_LONG` LONGTEXT)"),
    ("CREATE TABLE TEST.LONG_RAW_COLUMNS(ID INT, C_LONG_RAW LONG RAW);",
     "CREATE TABLE `TEST`.`LONG_RAW_COLUMNS` (`ID` INT,`C_LONG_RAW` LONGBLOB)"),
    ("CREATE TABLE TEST.NCHAR_255_COLUMNS(ID INT, C_NCHAR NCHAR(255));",
     "CREATE TABLE `TEST`.`NCHAR_255_COLUMNS` (`ID` INT,`C_NCHAR` CHAR(255))"),
    ("CREATE TABLE TEST.NCHAR_256_COLUMNS(ID INT, C_NCHAR NCHAR(256));",
     "CREATE TABLE `TEST`.`NCHAR_256_COLUMNS` (`ID` INT,`C_NCHAR` VARCHAR(256))"),
    ("CREATE TABLE TEST.NCHAR_VARYING_COLUMNS(ID INT, C_NCHAR_VARYING NCHAR VARYING(2000));",
     "CREATE TABLE `TEST`.`NCHAR_VARYING_COLUMNS` (`ID` INT,`C_NCHAR_VARYING` VARCHAR(2000))"),
    ("CREATE TABLE TEST.NCLOB_COLUMNS(ID INT, C_NCLOB NCLOB);",
     "CREATE TABLE `TEST`.`NCLOB_COLUMNS` (`ID` INT,`C_NCLOB` TEXT)"),
    ("CREATE TABLE TEST.NUMBER_2_COLUMNS(ID INT, C_NUMBER NUMBER(2));",
     "CREATE TABLE `TEST`.`NUMBER_2_COLUMNS` (`ID` INT,`C_NUMBER` TINYINT)"),
    ("CREATE TABLE TEST.NUMBER_4_COLUMNS(ID INT, C_NUMBER NUMBER(4, 0));",
     "CREATE TABLE `TEST`.`NUMBER_4_COLUMNS` (`ID` INT,`C_NUMBER` SMALLINT)"),
    ("CREATE TABLE TEST.NUMBER_8_COLUMNS(ID INT, C_NUMBER NUMBER(8));",
     "CREATE TABLE `TEST`.`NUMBER_8_COLUMNS` (`ID` INT,`C_NUMBER` INT)"),
    ("CREATE TABLE TEST.NUMBER_18_COLUMNS(ID INT, C_NUMBER NUMBER(18, 0));",
     "CREATE TABLE `TEST`.`NUMBER_18_COLUMNS` (`ID` INT,`C_NUMBER` BIGINT)"),
    ("CREATE TABLE TEST.NUMBER_38_COLUMNS(ID INT, C_NUMBER NUMBER(38));",
     "CREATE TABLE `TEST`.`NUMBER_38_COLUMNS` (`ID` INT,`C_NUMBER` DECIMAL(38))"),
    ("CREATE TABLE TEST.NUMBER_38_COLUMNS(ID INT, C_NUMBER NUMBER(38,31));",
     "CREATE TABLE `TEST`.`NUMBER_38_COLUMNS` (`ID` INT,`C_NUMBER` DECIMAL(38,30))"),
    ("CREATE TABLE TEST.NUMBER_8_2_COLUMNS(ID INT, C_NUMBER NUMBER(8, 2));",
     "CREATE TABLE `TEST`.`NUMBER_8_2_COLUMNS` (`ID` INT,`C_NUMBER` DECIMAL(8,2))"),
    ("CREATE TABLE TEST.NUMBER_COLUMNS(ID INT, C_NUMBER NUMBER);",
     "CREATE TABLE `TEST`.`NUMBER_COLUMNS` (`ID` INT,`C_NUMBER` DOUBLE)"),
    ("CREATE TABLE TEST.NUMERIC_COLUMNS(ID INT, C_NUMERIC NUMERIC(8, 2));",
     "CREATE TABLE `TEST`.`NUMERIC_COLUMNS` (`ID` INT,`C_NUMERIC` DECIMAL(8,2))"),
    ("CREATE TABLE TEST.NVARCHAR2_COLUMNS(ID INT, C_NVARCHAR2 NVARCHAR2(256));",
     "CREATE TABLE `TEST`.`NVARCHAR2_COLUMNS` (`ID` INT,`C_NVARCHAR2` VARCHAR(256))"),
    ("CREATE TABLE TEST.RAW_COLUMNS(ID INT, C_RAW RAW(256));",
     "CREATE TABLE `TEST`.`RAW_COLUMNS` (`ID` INT,`C_RAW` VARBINARY(256))"),
    ("CREATE TABLE TEST.REAL_COLUMNS(ID INT, C_REAL REAL);",
     "CREATE TABLE `TEST`.`REAL_COLUMNS` (`ID` INT,`C_REAL` DOUBLE)"),
    ("CREATE TABLE TEST.ROWID_COLUMNS(ID INT, C_ROWID ROWID);",
     "CREATE TABLE `TEST`.`ROWID_COLUMNS` (`ID` INT,`C_ROWID` CHAR(100))"),
    ("CREATE TABLE TEST.SMALLINT_COLUMNS(ID INT, C_SMALLINT SMALLINT);",
     "CREATE TABLE `TEST`.`SMALLINT_COLUMNS` (`ID` INT,`C_SMALLINT` DECIMAL(38))"),
    ("CREATE TABLE TEST.TIMESTAMP_COLUMNS(ID INT, C_TIMESTAMP TIMESTAMP(9));",
     "CREATE TABLE `TEST`.`TIMESTAMP_COLUMNS` (`ID` INT,`C_TIMESTAMP` DATETIME(6))"),
    ("CREATE TABLE TEST.TIMESTAMP_ZONE_COLUMNS(ID INT, C_TIMESTAMP_ZONE TIMESTAMP(9) WITH TIME ZONE);",
     "CREATE TABLE `TEST`.`TIMESTAMP_ZONE_COLUMNS` (`ID` INT,`C_TIMESTAMP_ZONE` DATETIME(6))"),
    ("CREATE TABLE TEST.UROWID_COLUMNS(ID INT, C_UROWID UROWID(256));",
     "CREATE TABLE `TEST`.`UROWID_COLUMNS` (`ID` INT,`C_UROWID` VARCHAR(256))"),
    ("CREATE TABLE TEST.VARCHAR_COLUMNS(ID INT, C_VARCHAR VARCHAR(256));",
     "CREATE TABLE `TEST`.`VARCHAR_COLUMNS` (`ID` INT,`C_VARCHAR` VARCHAR(256))"),
    ("CREATE TABLE TEST.VARCHAR2_COLUMNS(ID INT, C_VARCHAR2 VARCHAR2(256));",
     "CREATE TABLE `TEST`.`VARCHAR2_COLUMNS` (`ID` INT,`C_VARCHAR2` VARCHAR(256))"),
    ("CREATE TABLE TEST.XMLTYPE_COLUMNS(ID INT, C_XMLTYPE XMLTYPE);",
     "CREATE TABLE `TEST`.`XMLTYPE_COLUMNS` (`ID` INT,`C_XMLTYPE` LONGTEXT)"),
]


@pytest.mark.parametrize("sql,want", CREATE_GOLDENS,
                         ids=[s.split(".")[1].split("(")[0] for s, _ in CREATE_GOLDENS])
def test_create_table_type_goldens(sql, want):
    ev = translate_oracle_ddl(sql, "")
    assert ev.query == f"{want} {B}"
    assert ev.create_schema_if_not_exists


class TestAlterGoldens:
    """TestParseAlterTable (log_miner_test.go:561+), verbatim."""

    def test_add_column(self):
        ev = translate_oracle_ddl(
            "alter table TEST.ADDCOLUMN add (author_last_published date);")
        assert ev.query == ("ALTER TABLE `TEST`.`ADDCOLUMN` "
                            "ADD COLUMN (`AUTHOR_LAST_PUBLISHED` DATETIME)")

    def test_modify_column_multi(self):
        ev = translate_oracle_ddl(
            'ALTER TABLE test."MODIFYCOLUMN" MODIFY ( alter_new_name1 CHAR ( 13 ))'
            ' MODIFY ( alter_name2 VARCHAR ( 66 ))')
        assert ev.query == ("ALTER TABLE `TEST`.`MODIFYCOLUMN` "
                            "MODIFY COLUMN `ALTER_NEW_NAME1` CHAR(13), "
                            "MODIFY COLUMN `ALTER_NAME2` VARCHAR(66)")

    def test_drop_columns_paren_list(self):
        ev = translate_oracle_ddl("alter table TEST.DROPCOLUMN drop (COL1, COL2);")
        assert ev.query == ("ALTER TABLE `TEST`.`DROPCOLUMN` "
                            "DROP COLUMN `TEST`.`DROPCOLUMN`.`COL1`, "
                            "DROP COLUMN `TEST`.`DROPCOLUMN`.`COL2`")

    def test_drop_column_single(self):
        ev = translate_oracle_ddl("alter table TEST.DROPCOLUMN1 drop column COL1")
        assert ev.query == ("ALTER TABLE `TEST`.`DROPCOLUMN1` "
                            "DROP COLUMN `TEST`.`DROPCOLUMN1`.`COL1`")

    def test_rename_column(self):
        ev = translate_oracle_ddl(
            "alter table TEST.RENAMECOLUMN RENAME  COLUMN COL1 TO COLNEW1")
        assert ev.query == ("ALTER TABLE `TEST`.`RENAMECOLUMN` "
                            "RENAME COLUMN `TEST`.`RENAMECOLUMN`.`COL1` "
                            "TO `TEST`.`RENAMECOLUMN`.`COLNEW1`")


class TestDropGoldens:
    def test_drop_quoted_case_preserved(self):
        # quoted "persons" keeps case; bare test folds upper
        ev = translate_oracle_ddl('DROP TABLE test."persons";')
        assert ev.query == "DROP TABLE `TEST`.`persons`"

    def test_drop_plain(self):
        ev = translate_oracle_ddl("DROP TABLE TEST.DROPTABLE")
        assert ev.query == "DROP TABLE `TEST`.`DROPTABLE`"


class TestFilterGoldens:
    """buildFilterSchemaTable (log_miner_test.go:108-130), string-exact."""

    def test_do_only(self):
        out = build_filter_schema_table(
            [("db1", ["tb1", "tb2", "tb3", "tb-skip"])], [])
        assert out == (" AND( ( seg_owner = 'db1' AND "
                       "table_name in ('tb1','tb2','tb3','tb-skip')))")

    def test_do_and_ignore(self):
        out = build_filter_schema_table(
            [("db1", ["tb1", "tb2", "tb3", "tb-skip"]),
             ("db2", ["tb1"]), ("db3", ["tb1"])],
            [("db1", ["tb1"]), ("db2", ["tb-skip"]), ("db3", []), ("db4", ["tb1"])],
        )
        assert out == (
            " AND( ( seg_owner = 'db1' AND table_name in ('tb1','tb2','tb3','tb-skip'))"
            " OR ( seg_owner = 'db2' AND table_name in ('tb1'))"
            " OR ( seg_owner = 'db3' AND table_name in ('tb1')))"
            " AND ( seg_owner = 'db1' AND table_name not in ('tb1'))"
            " AND ( seg_owner = 'db2' AND table_name not in ('tb-skip'))"
            " AND ( seg_owner <> 'db3')"
            " AND ( seg_owner = 'db4' AND table_name not in ('tb1'))"
        )

    def test_empty(self):
        assert build_filter_schema_table([], []) == ""


COLS = ["COL1", "COL2"]

DML_GOLDENS = [
    # (sql, want_rows) from TestParseDMLSQL
    ('update "TEST"."TESTNULL" set "COL1" = NULL where "COL1" = \'T\'',
     [["T", None], [None, None]]),
    ('insert into "TEST"."BINARY_FLOAT1"("COL1","COL2") values (\'0\', \'1.17549E-38F\');',
     [["0", "1.17549E-38F"]]),
    ("insert into TEST.BINARY_FLOAT2(\"COL1\",\"COL2\") values ('1', '3.40282E+38F');",
     [["1", "3.40282E+38F"]]),
    ('insert into "TEST"."BINARY_FLOAT3"("COL1","COL2") values (\'2\', \'Inf\');',
     [["2", None]]),
    ('insert into "TEST"."BINARY_FLOAT4"("COL1","COL2") values (\'3\', \'-Inf\');',
     [["3", None]]),
    ('insert into "TEST"."BINARY_FLOAT5"("COL1","COL2") values (\'4\', \'Nan\');',
     [["4", None]]),
    # no-undo variant of BINARY_FLOAT6: SET merges over before, keeping
    # COL1 (see test_update_after_image_from_undo_where_binary_float6
    # for the with-undo reference golden)
    ('update "TEST"."BINARY_FLOAT6" set "COL2" = \'500\'  where "COL1" = \'3\' and "COL2" = \'NULL\';',
     [["3", None], ["3", "500"]]),
    ('delete from "TEST"."BINARY_FLOAT7" where "COL1" = \'4\' and "COL2" = \'Nan\';',
     [["4", None]]),
    ('insert into "TEST"."DATE_COLUMNS"("COL1","COL2") values (\'1\',NULL)',
     [["1", None]]),
    ("insert into \"TEST\".\"DATE_COLUMNS\"(\"COL1\",\"COL2\") values ('2',TO_DATE('-4712-01-01 00:00:00', 'SYYYY-MM-DD HH24:MI:SS'))",
     [["2", "-4712-01-01 00:00:00"]]),
    ("insert into \"TEST\".\"DATE_COLUMNS\"(\"COL1\",\"COL2\") values ('3',TO_DATE(' 9999-12-31 00:00:00', 'SYYYY-MM-DD HH24:MI:SS'))",
     [["3", " 9999-12-31 00:00:00"]]),
    ('insert into "TEST"."te\\shu"("COL1","COL2") values (\'5\',\'x\\x44\')',
     [["5", "x\\x44"]]),
    ('delete from "TEST"."te\\shu"  where "COL1" = \'4\' and "COL2" = \'\\\';',
     [["4", "\\"]]),
    ('delete from "TEST"."te\\shu" where "COL1" = \'5\' and "COL2" = \'"\';',
     [["5", '"']]),
    ('insert into "TEST"."CHAR_255_COLUMNS2"("COL1","COL2") values (\'16\',\'"\')',
     [["16", '"']]),
    ('insert into "TEST"."CHAR_255_COLUMNS3"("COL1","COL2") values (\'18\',\'\\\')',
     [["18", "\\"]]),
]


@pytest.mark.parametrize("sql,want", DML_GOLDENS,
                         ids=[f"dml{i}" for i in range(len(DML_GOLDENS))])
def test_dml_goldens(sql, want):
    ev = parse_dml_sql(sql, "", COLS)
    assert ev.rows == want


def test_dml_unistr_decodes_utf16():
    sql = ('insert into "TEST"."NCHAR_255_COLUMNS"("COL1","COL2") values '
           "('11',UNISTR('\\6570\\636E\\5E93sql'))")
    ev = parse_dml_sql(sql, "", COLS)
    assert ev.rows == [["11", "数据库sql"]]


def test_update_is_before_after_pair():
    # no undo logged: SET merges over the before image so untouched
    # columns (here COL1, the key) survive into the after row
    ev = parse_dml_sql(
        'update "TEST"."T" set "COL2" = \'9\' where "COL1" = \'1\' and "COL2" = \'8\'',
        "", COLS)
    assert ev.op == "u"
    assert ev.rows == [["1", "8"], ["1", "9"]]


def test_update_after_image_from_undo_where_testnull():
    # log_miner_test.go TESTNULL golden: after = undo statement's WHERE
    ev = parse_dml_sql(
        'update "TEST"."TESTNULL" set "COL1" = NULL where "COL1" = \'T\'',
        'update "TEST"."TESTNULL" set "COL1" = \'T\' where "COL1" IS NULL',
        COLS)
    assert ev.op == "u"
    assert ev.rows == [["T", None], [None, None]]


def test_update_after_image_from_undo_where_binary_float6():
    # log_miner_test.go BINARY_FLOAT6 golden: undo WHERE wins over SET
    # ('500'); the literal string 'NULL' maps to None per the reference
    ev = parse_dml_sql(
        'update "TEST"."BINARY_FLOAT6" set "COL2" = \'500\'  '
        "where \"COL1\" = '3' and \"COL2\" = 'NULL';",
        'update "TEST"."BINARY_FLOAT6" set "COL2" = NULL  '
        "where \"COL1\" = '3' and \"COL2\" = '50\\0';",
        COLS)
    assert ev.rows == [["3", None], ["3", "50\\0"]]


def test_update_set_joined_with_and():
    # LogMiner joins multiple SET assignments with ' and '
    # (log_miner.go:963): both assignments must parse, not corrupt into
    # one string value
    ev = parse_dml_sql(
        'update "TEST"."T" set "COL2" =\'500\' and "COL1" = \'ss\' '
        "where \"COL1\" = '1'",
        "", COLS)
    assert ev.rows == [["1", None], ["ss", "500"]]


class TestLogMinerRecordTranslator:
    """The per-tx cache (log_miner.go:745-780): COMMIT flushes,
    ROLLBACK drops, DDL bypasses; wire rows carry scn as seq and the
    commit scn as gno."""

    COLS = {("TEST", "T1"): ["COL1", "COL2"]}

    def _rec(self, code, scn, xid="x1", redo=None, **kw):
        return {"operation_code": code, "scn": scn, "xid": xid,
                "seg_owner": "TEST", "table_name": "T1",
                "sql_redo": redo, "sql_undo": "", **kw}

    def test_commit_flushes_with_commit_scn_as_gno(self):
        from dtle_spark.sources.oracle_ddl import LogMinerRecordTranslator

        tr = LogMinerRecordTranslator("ora1", dict(self.COLS))
        out = tr.feed_all([
            self._rec(6, 100),
            self._rec(1, 101, redo='insert into "TEST"."T1"("COL1","COL2") values (\'1\',\'a\')'),
            self._rec(3, 102, redo='update "TEST"."T1" set "COL2" = \'b\' where "COL1" = \'1\''),
            self._rec(7, 103),
        ])
        assert [r["op"] for r in out] == ["i", "u"]
        assert all(r["gno"] == 103 and r["sid"] == "ora1" for r in out)
        assert [r["seq"] for r in out] == [101, 102]
        import json
        assert json.loads(out[0]["after"]) == {"COL1": "1", "COL2": "a"}
        u = out[1]
        assert json.loads(u["before"]) == {"COL1": "1", "COL2": None}
        # no undo in the record: after keeps COL1 from the before image
        assert json.loads(u["after"]) == {"COL1": "1", "COL2": "b"}

    def test_rollback_discards_tx(self):
        from dtle_spark.sources.oracle_ddl import LogMinerRecordTranslator

        tr = LogMinerRecordTranslator("ora1", dict(self.COLS))
        out = tr.feed_all([
            self._rec(6, 100),
            self._rec(1, 101, redo='insert into "TEST"."T1"("COL1","COL2") values (\'1\',\'a\')'),
            self._rec(36, 102),  # rollback
            self._rec(6, 110, xid="x2"),
            self._rec(2, 111, xid="x2",
                      redo='delete from "TEST"."T1" where "COL1" = \'9\''),
            self._rec(7, 112, xid="x2"),
        ])
        assert len(out) == 1 and out[0]["op"] == "d" and out[0]["gno"] == 112

    def test_ddl_bypasses_tx_cache_and_registers_columns(self):
        from dtle_spark.sources.oracle_ddl import LogMinerRecordTranslator

        tr = LogMinerRecordTranslator("ora1", {})
        out = tr.feed_all([
            self._rec(5, 200, redo="CREATE TABLE TEST.NEWT(ID NUMBER(8), V VARCHAR2(10))"),
        ])
        assert len(out) == 1 and out[0]["op"] == "ddl"
        assert out[0]["query"].startswith("CREATE TABLE `TEST`.`NEWT`")
        # the CREATE registered the ordinal map for subsequent DML
        assert tr.columns[("TEST", "NEWT")] == ["ID", "V"]
        out2 = tr.feed_all([
            self._rec(6, 201),
            {"operation_code": 1, "scn": 202, "xid": "x1", "seg_owner": "TEST",
             "table_name": "NEWT", "sql_undo": "",
             "sql_redo": 'insert into "TEST"."NEWT"("ID","V") values (\'1\',\'x\')'},
            self._rec(7, 203),
        ])
        assert len(out2) == 1 and out2[0]["table_name"] == "NEWT"


def test_logminer_bridge_end_to_end(spark, tmp_path):
    """Canned LogMiner records -> OracleLogMinerBridge.publish ->
    ReplicationJob merge (the full S8->S10->apply path, socket faked)."""
    from pyspark.sql import types as T

    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.model import JobConfig, TableConfig
    from dtle_spark.sources.cdc_bridge import FileBridge, OracleLogMinerBridge
    from dtle_spark.streaming.pipeline import ParquetTableTarget, ReplicationJob

    bridge = FileBridge(str(tmp_path / "spool"))
    ora = OracleLogMinerBridge("ora1", {("TEST", "T1"): ["COL1", "COL2"]})
    recs = [
        {"operation_code": 6, "scn": 100, "xid": "x1", "seg_owner": "TEST",
         "table_name": "T1", "sql_redo": None, "sql_undo": ""},
        {"operation_code": 1, "scn": 101, "xid": "x1", "seg_owner": "TEST",
         "table_name": "T1", "sql_undo": "",
         "sql_redo": 'insert into "TEST"."T1"("COL1","COL2") values (\'1\',\'a\')'},
        {"operation_code": 1, "scn": 102, "xid": "x1", "seg_owner": "TEST",
         "table_name": "T1", "sql_undo": "",
         "sql_redo": 'insert into "TEST"."T1"("COL1","COL2") values (\'2\',\'b\')'},
        {"operation_code": 7, "scn": 103, "xid": "x1", "seg_owner": "TEST",
         "table_name": "T1", "sql_redo": None, "sql_undo": ""},
    ]
    ora.publish(spark, bridge, recs)

    row_t = T.StructType([
        T.StructField("COL1", T.StringType()),
        T.StructField("COL2", T.StringType()),
    ])
    cat = SchemaCatalog()
    cat.register("TEST", "T1", row_t, ["COL1"])
    cfg = TableConfig("TEST", "T1", unique_key=["COL1"])
    target = ParquetTableTarget(str(tmp_path / "tgt"))
    rj = ReplicationJob(
        spark, JobConfig("ora", [cfg]), str(tmp_path / "spool") + "/*",
        str(tmp_path / "tgt"), str(tmp_path / "ckpt"), cat,
    ).start()
    rj.process_available()
    rj.pause()
    rows = {r["COL1"]: r["COL2"] for r in target.read(spark, "TEST", "T1").collect()}
    assert rows == {"1": "a", "2": "b"}


def test_create_with_primary_key_constraint():
    ev = translate_oracle_ddl(
        "CREATE TABLE TEST.PKT(ID NUMBER(8), V VARCHAR2(10), "
        "CONSTRAINT PK_T PRIMARY KEY (ID))")
    assert ev.query == ("CREATE TABLE `TEST`.`PKT` (`ID` INT,`V` VARCHAR(10),"
                        "PRIMARY KEY(`ID`)) " + B)
    assert ev.columns == ["ID", "V"]
