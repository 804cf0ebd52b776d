"""Preflight inspection (inspect.go:89-180 analogue): every rejection
path fails at Job.create, never mid-stream."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.preflight import PreflightError, preflight
from dtle_spark.model import JobConfig, TableConfig


@pytest.fixture()
def catalog():
    cat = SchemaCatalog()
    cat.register(
        "db1",
        "orders",
        T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("status", T.StringType(), True),
            T.StructField("total", T.DoubleType(), True),
        ]),
        ["id"],
    )
    return cat


def ok_cfg(**kw):
    base = dict(schema_name="db1", table_name="orders", unique_key=["id"])
    base.update(kw)
    return TableConfig(**base)


def _problems(job, catalog, spark=None, **kw) -> list[str]:
    with pytest.raises(PreflightError) as ei:
        preflight(job, catalog, spark, **kw)
    return ei.value.problems


def test_valid_job_passes(catalog, spark):
    preflight(JobConfig("j", [ok_cfg(where="total > 10")]), catalog, spark)


def test_unregistered_table_rejected(catalog):
    probs = _problems(JobConfig("j", [ok_cfg(table_name="nope")]), catalog)
    assert "not registered" in probs[0]


def test_unique_key_must_exist(catalog):
    probs = _problems(JobConfig("j", [ok_cfg(unique_key=["ghost"])]), catalog)
    assert "unique_key column 'ghost'" in probs[0]


def test_float_key_rejected(catalog):
    # inspect.go:118-124: FLOAT unique keys are never used
    probs = _problems(JobConfig("j", [ok_cfg(unique_key=["total"])]), catalog)
    assert "not usable as a key" in probs[0]


def test_unique_key_checked_in_post_map_names(catalog):
    # key is expressed target-side; a key named for the POST-map name
    # passes, the pre-map name fails
    cfg = ok_cfg(column_map_from=["id", "status"], column_map_to=["id2", "st"],
                 unique_key=["id2"])
    preflight(JobConfig("j", [cfg]), catalog)
    cfg_bad = ok_cfg(column_map_from=["id", "status"], column_map_to=["id2", "st"],
                     unique_key=["id"])
    probs = _problems(JobConfig("j", [cfg_bad]), catalog)
    assert "not present after column map" in probs[0]


def test_column_map_from_must_resolve(catalog):
    probs = _problems(
        JobConfig("j", [ok_cfg(column_map_from=["id", "ghost"],
                               column_map_to=["a", "b"])]),
        catalog,
    )
    assert "column_map_from column 'ghost'" in probs[0]


def test_column_map_length_mismatch(catalog):
    probs = _problems(
        JobConfig("j", [ok_cfg(column_map_from=["id", "status"],
                               column_map_to=["only_one"])]),
        catalog,
    )
    assert any("column_map_to has 1 names" in p for p in probs)


def test_where_must_resolve_against_columns(catalog, spark):
    probs = _problems(
        JobConfig("j", [ok_cfg(where="ghost_col > 5")]), catalog, spark
    )
    assert "does not resolve" in probs[0]


def test_where_must_be_boolean(catalog, spark):
    probs = _problems(JobConfig("j", [ok_cfg(where="id + 1")]), catalog, spark)
    assert "does not resolve" in probs[0]


def test_duplicate_target_rejected(catalog):
    cat = catalog
    cat.register("db2", "orders2",
                 T.StructType([T.StructField("id", T.LongType(), False)]), ["id"])
    cfg2 = TableConfig("db2", "orders2", rename_schema="db1",
                       rename_table="orders", unique_key=["id"])
    probs = _problems(JobConfig("j", [ok_cfg(), cfg2]), catalog)
    assert any("already written by db1.orders" in p for p in probs)


def test_unreversible_column_map_flagged(catalog):
    cfg = ok_cfg(column_map_from=["id"], column_map_to=[], unique_key=[])
    probs = _problems(JobConfig("j", [cfg]), catalog, check_reversible=True)
    assert any("cannot be reversed" in p for p in probs)
    # and passes when reversibility is not requested
    preflight(JobConfig("j", [cfg]), catalog)


def test_all_problems_reported_at_once(catalog):
    probs = _problems(
        JobConfig("j", [ok_cfg(unique_key=["ghost", "total"]),
                        ok_cfg(table_name="nope")]),
        catalog,
    )
    assert len(probs) == 3  # ghost + float + unregistered


def test_manager_create_runs_preflight(catalog, spark, tmp_path):
    from dtle_spark.streaming.jobs import JobManager

    mgr = JobManager(spark)
    with pytest.raises(PreflightError):
        mgr.create(
            JobConfig("bad", [ok_cfg(unique_key=["ghost"])]),
            str(tmp_path / "src"), str(tmp_path / "tgt"),
            str(tmp_path / "ckpt"), catalog, start=False,
        )
    assert "bad" not in mgr.list()  # nothing half-registered


def test_no_stdlib_shadowing_from_package_cwd():
    """Regression: dtle_spark/ once contained ``inspect.py`` and ``io.py``;
    with the package directory as cwd, ``import dataclasses`` resolved the
    stdlib's ``import inspect`` to our module and crashed on circular
    import. The modules are now ``preflight.py`` / ``tableio.py``; this
    pins that importing the package (and dataclasses, json, io) from
    inside the package dir keeps working."""
    import os
    import subprocess
    import sys

    pkg_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "dtle_spark")
    repo_root = os.path.dirname(pkg_dir)
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import inspect, io, dataclasses, json; "
         "import dtle_spark.preflight, dtle_spark.tableio; "
         "assert hasattr(inspect, 'signature') and hasattr(io, 'BytesIO')"],
        cwd=pkg_dir, env=env, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
