"""Task metrics (TaskStatistics analogue) and the HTTP control surface
(api/handler/v2/job.go route mirror)."""

from __future__ import annotations

import json
import os
import urllib.request

import pytest
from pyspark.sql import functions as F

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.model import JobConfig, TableConfig
from dtle_spark.plans import cdc_demo
from dtle_spark.streaming.metrics import TaskMetrics
from dtle_spark.streaming.pipeline import ParquetTableTarget, ReplicationJob
from dtle_spark.streaming.wire import to_wire
from tests.conftest import SF_DIR


def _orders_catalog(changes) -> SchemaCatalog:
    cat = SchemaCatalog()
    cat.register("db1", "orders", changes.schema["after"].dataType, ["o_orderkey"])
    return cat


class TestTaskMetricsUnit:
    def test_observe_and_derive(self):
        m = TaskMetrics()
        m.observe_batch(
            [("db1", "t", "i", 10, 1000.0), ("db1", "t", "u", 5, 2000.0),
             ("db1", "t", "d", 2, None)],
            tx_count=4, seq_high={"sid-1": 17}, batch_seconds=2.0,
        )
        ts = m.table_stats["db1.t"]
        assert (ts.insert_count, ts.update_count, ts.del_count) == (10, 5, 2)
        assert m.exec_row_count == 17 and m.exec_tx_count == 4
        assert m.applied_seq == {"sid-1": 17}
        assert m.rows_per_second() == pytest.approx(8.5)
        # delay = wall - newest applied event ts (extractor.go:930-970)
        assert m.delay_seconds(now=2100.0) == pytest.approx(100.0)
        # counters ACCUMULATE across batches; seq watermark is max-kept
        m.observe_batch([("db1", "t", "i", 1, None)], 1, {"sid-1": 15}, 1.0)
        assert m.table_stats["db1.t"].insert_count == 11
        assert m.applied_seq == {"sid-1": 17}

    def test_ddl_counts_separately(self):
        m = TaskMetrics()
        m.observe_batch([("db1", "t", "ddl", 1, None)], 1, {}, 0.5)
        assert m.table_stats["db1.t"].ddl_count == 1
        assert m.exec_row_count == 0  # DDL is not a row


def test_streaming_metrics_advance_and_backlog_drains(spark, job_dirs_factory):
    dirs = job_dirs_factory()
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    os.makedirs(dirs["source"])
    first = changes.filter(F.col("seq") < 7000)
    second = changes.filter(F.col("seq") >= 7000)
    to_wire(first).coalesce(1).write.parquet(os.path.join(dirs["source"], "b0"))

    cfg = TableConfig("db1", "orders", unique_key=["o_orderkey"])
    target = ParquetTableTarget(dirs["target"])
    target.overwrite(base, "db1", "orders")
    rj = ReplicationJob(
        spark, JobConfig("m1", [cfg]), os.path.join(dirs["source"], "*"),
        dirs["target"], dirs["checkpoint"], _orders_catalog(changes), target=target,
    ).start()
    rj.process_available()

    stats = rj.stats()
    ts = stats["table_stats"]["db1.orders"]
    ops = {r["op"]: r["n"] for r in first.groupBy("op").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert ts["insert_count"] == ops.get("i", 0)
    assert ts["update_count"] == ops.get("u", 0)
    assert ts["del_count"] == ops.get("d", 0)
    assert stats["exec_tx_count"] == first.select("sid", "gno").distinct().count()
    assert stats["rows_per_second"] is not None and stats["rows_per_second"] > 0
    assert rj.backlog() == 0  # fully drained

    # new data while paused -> positive backlog; drains to 0 on resume
    rj.pause()
    to_wire(second).coalesce(1).write.parquet(os.path.join(dirs["source"], "b1"))
    assert rj.backlog() > 0
    rj.resume()
    rj.process_available()
    rj.pause()
    assert rj.backlog() == 0
    total_ops = {r["op"]: r["n"] for r in changes.groupBy("op").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert rj.stats()["table_stats"]["db1.orders"]["insert_count"] == total_ops["i"]


def test_snapshot_progress_visible_in_metrics(spark, tmp_path):
    from dtle_spark.sources.snapshot_job import run_snapshot

    base = cdc_demo.orders_base(spark, SF_DIR)
    cfgs = [
        TableConfig("db1", "o1", unique_key=["o_orderkey"]),
        TableConfig("db1", "o2", unique_key=["o_orderkey"]),
    ]
    target = ParquetTableTarget(str(tmp_path / "tgt"))
    metrics = TaskMetrics()
    seen_pcts: list[str] = []
    real_overwrite = target.overwrite

    def spying_overwrite(df, s, t):
        seen_pcts.append(metrics.progress_pct())
        real_overwrite(df, s, t)

    target.overwrite = spying_overwrite
    res = run_snapshot(
        spark, JobConfig("s1", cfgs),
        {"o1": base, "o2": base}, target, str(tmp_path / "nosrc"), metrics=metrics,
    )
    # during the dump: 0% before table 1, 50% before table 2
    assert seen_pcts == ["0.0", "50.0"]
    assert metrics.stage == "incremental"  # dump finished
    assert metrics.snapshot_done_rows == metrics.snapshot_total_rows
    assert res.row_counts == {"o1": base.count(), "o2": base.count()}


@pytest.fixture()
def job_dirs_factory(tmp_path):
    def make(sub=""):
        root = tmp_path / sub if sub else tmp_path
        return {
            "source": str(root / "changes"),
            "target": str(root / "target"),
            "checkpoint": str(root / "ckpt"),
        }

    return make


def _http(method: str, url: str, body: dict | None = None) -> tuple[int, dict]:
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_control_surface_lifecycle(spark, job_dirs_factory):
    """E2E over HTTP: create -> list -> metrics -> pause -> resume ->
    position -> reverse -> delete (api/handler/v2/job.go mirror)."""
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager

    dirs = job_dirs_factory("fwd")
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    os.makedirs(dirs["source"])
    to_wire(changes).coalesce(1).write.parquet(os.path.join(dirs["source"], "b0"))
    ParquetTableTarget(dirs["target"]).overwrite(base, "db1", "orders")

    manager = JobManager(spark)
    server = ControlServer(manager, _orders_catalog(changes)).start()
    url = f"http://127.0.0.1:{server.port}"
    try:
        code, _ = _http("POST", f"{url}/v2/jobs", {
            "name": "h1",
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "source_dir": os.path.join(dirs["source"], "*"),
            "target_root": dirs["target"],
            "checkpoint_dir": dirs["checkpoint"],
        })
        assert code == 201
        manager.get("h1").process_available()

        code, jobs = _http("GET", f"{url}/v2/jobs")
        assert code == 200 and jobs["h1"]["active"]

        code, m = _http("GET", f"{url}/v2/job/h1/metrics")
        assert code == 200
        assert m["table_stats"]["db1.orders"]["insert_count"] > 0

        code, _ = _http("POST", f"{url}/v2/job/h1/pause")
        assert code == 200
        assert not manager.get("h1").query

        code, pos = _http("GET", f"{url}/v2/job/h1/position")
        assert code == 200
        # applied-gtid interval set survives the pause (A10)
        assert pos["gtid_set"].startswith(cdc_demo.SID_A)

        code, _ = _http("POST", f"{url}/v2/job/h1/resume")
        assert code == 200
        manager.get("h1").process_available()
        _http("POST", f"{url}/v2/job/h1/pause")

        # time-travel audit surface: retained commit versions per table,
        # and the earliest retained version actually resolves
        code, vers = _http("GET", f"{url}/v2/job/h1/versions")
        assert code == 200 and vers["db1.orders"]
        v0 = vers["db1.orders"][0]
        past = manager.get("h1").target.read_at_version(spark, "db1", "orders", v0)
        assert past is not None and past.count() > 0

        # reverse workflow over HTTP (forward must be paused first)
        rdirs = job_dirs_factory("rev")
        os.makedirs(rdirs["source"], exist_ok=True)
        code, rv = _http("POST", f"{url}/v2/job/h1/reverse", {
            "source_dir": os.path.join(rdirs["source"], "*"),
            "target_root": rdirs["target"],
            "checkpoint_dir": rdirs["checkpoint"],
            "local_sid": cdc_demo.SID_A,
            "start": False,
        })
        assert code == 201 and rv["created"] == "reverse-h1"

        code, _ = _http("DELETE", f"{url}/v2/job/h1")
        assert code == 200
        code, _ = _http("GET", f"{url}/v2/job/h1")
        assert code == 404

        # unknown route is a clean 404, not a dead server
        code, _ = _http("GET", f"{url}/v2/nope")
        assert code == 404
    finally:
        server.stop()


def test_http_update_and_catalog_browse(spark, job_dirs_factory, duck):
    """Round-5 surface: POST /v2/job/<n>/update (pause -> preflight ->
    resume; invalid config 400s and keeps the old one), GET /v2/schemas
    browse routes, POST /v2/validation/connection."""
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager
    from tests.conftest import assert_matches_oracle

    dirs = job_dirs_factory("upd")
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    os.makedirs(dirs["source"])
    to_wire(changes.filter(F.col("seq") < 7000)).coalesce(1).write.parquet(
        os.path.join(dirs["source"], "b0"))
    ParquetTableTarget(dirs["target"]).overwrite(base, "db1", "orders")

    manager = JobManager(spark)
    server = ControlServer(manager, _orders_catalog(changes)).start()
    url = f"http://127.0.0.1:{server.port}"
    try:
        code, _ = _http("POST", f"{url}/v2/jobs", {
            "name": "u1",
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "source_dir": os.path.join(dirs["source"], "*"),
            "target_root": dirs["target"],
            "checkpoint_dir": dirs["checkpoint"],
        })
        assert code == 201
        manager.get("u1").process_available()

        # catalog browse
        code, d = _http("GET", f"{url}/v2/schemas")
        assert code == 200 and "db1" in d["schemas"]
        code, d = _http("GET", f"{url}/v2/schemas/db1/tables")
        assert code == 200 and d["tables"] == ["orders"]
        code, d = _http("GET", f"{url}/v2/schemas/db1/tables/orders/columns")
        assert code == 200
        byname = {c["name"]: c for c in d["columns"]}
        assert byname["o_orderkey"]["key"] is True
        assert byname["o_totalprice"]["type"] == "double"
        code, d = _http("GET", f"{url}/v2/schemas/db1/tables/nope/columns")
        assert code == 404

        # connection validation
        code, d = _http("POST", f"{url}/v2/validation/connection",
                        {"source_dir": os.path.join(dirs["source"], "*")})
        assert code == 200 and d["ok"]
        code, d = _http("POST", f"{url}/v2/validation/connection",
                        {"source_dir": "/no/such/dir/*"})
        assert code == 400 and not d["ok"]

        # invalid update: unknown table -> 400, old config kept, job resumed
        code, d = _http("POST", f"{url}/v2/job/u1/update", {
            "tables": [{"schema_name": "db1", "table_name": "ghost",
                        "unique_key": ["id"]}],
        })
        assert code == 400
        rj = manager.get("u1")
        assert rj.job.tables[0].table_name == "orders"
        assert rj.query is not None and rj.query.isActive

        # valid update: same table, narrower where — applied to the
        # NEXT micro-batch after the internal pause/resume
        code, d = _http("POST", f"{url}/v2/job/u1/update", {
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "trigger_seconds": 0.5,
        })
        assert code == 200 and d["updated"] == "u1"
        assert manager.get("u1").job.trigger_seconds == 0.5
        to_wire(changes.filter(F.col("seq") >= 7000)).coalesce(1).write.parquet(
            os.path.join(dirs["source"], "b1"))
        manager.get("u1").process_available()
        _http("POST", f"{url}/v2/job/u1/pause")
        final = ParquetTableTarget(dirs["target"]).read(spark, "db1", "orders")
        assert_matches_oracle(final, duck, cdc_demo.ORDERS_CDC_ORACLE)
    finally:
        server.stop()


def test_finish_job_stops_at_target_gtid(spark, job_dirs_factory, duck):
    """Graceful cutover (reference finish-job/targetGtid flow,
    applier.go:206-220): the job syncs until its applied set CONTAINS
    the target, then stops with job_status=target_gtid_finished; data
    arriving after the target is not applied."""
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager

    dirs = job_dirs_factory("fin")
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    os.makedirs(dirs["source"])
    first = changes.filter(F.col("seq") < 7000)
    to_wire(first).coalesce(1).write.parquet(os.path.join(dirs["source"], "b0"))
    ParquetTableTarget(dirs["target"]).overwrite(base, "db1", "orders")

    manager = JobManager(spark)
    server = ControlServer(manager, _orders_catalog(changes)).start()
    url = f"http://127.0.0.1:{server.port}"
    try:
        code, _ = _http("POST", f"{url}/v2/jobs", {
            "name": "f1",
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "source_dir": os.path.join(dirs["source"], "*"),
            "target_root": dirs["target"],
            "checkpoint_dir": dirs["checkpoint"],
        })
        assert code == 201
        rj = manager.get("f1")
        rj.process_available()

        # target = the source's current frontier (default)
        code, d = _http("POST", f"{url}/v2/job/f1/finish", {})
        assert code == 200 and d["finishing"] == "f1"
        assert rj.wait_finished(timeout=30)
        assert rj.stats()["job_status"] == "target_gtid_finished"
        assert not rj.stats()["active"]

        # post-target data must not apply (the job is done)
        n_before = ParquetTableTarget(dirs["target"]).read(spark, "db1", "orders").count()
        to_wire(changes.filter(F.col("seq") >= 7000)).coalesce(1).write.parquet(
            os.path.join(dirs["source"], "b1"))
        import time
        time.sleep(2)
        n_after = ParquetTableTarget(dirs["target"]).read(spark, "db1", "orders").count()
        assert n_after == n_before
    finally:
        server.stop()


def test_finish_waits_for_explicit_target(spark, job_dirs_factory):
    """An explicit target beyond the current position keeps the job
    running until the missing transactions arrive, THEN stops — the
    actual catch-up-and-cutover semantics."""
    from dtle_spark.streaming.jobs import JobManager
    from dtle_spark.sources.gtid import GtidSet

    dirs = job_dirs_factory("fin2")
    base = cdc_demo.orders_base(spark, SF_DIR)
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    os.makedirs(dirs["source"])
    first = changes.filter(F.col("seq") < 7000)
    second = changes.filter(F.col("seq") >= 7000)
    to_wire(first).coalesce(1).write.parquet(os.path.join(dirs["source"], "b0"))
    ParquetTableTarget(dirs["target"]).overwrite(base, "db1", "orders")

    manager = JobManager(spark)
    cfg = TableConfig("db1", "orders", unique_key=["o_orderkey"])
    rj = manager.create(
        JobConfig("f2", [cfg], trigger_seconds=0.5),
        os.path.join(dirs["source"], "*"), dirs["target"], dirs["checkpoint"],
        _orders_catalog(changes),
    )
    rj.process_available()

    # target = full stream's tx set (b1 not yet published)
    target = GtidSet()
    for r in changes.select("sid", "gno").distinct().collect():
        target.add(r["sid"], r["gno"])
    manager.finish("f2", target.to_str())
    import time
    time.sleep(2)
    assert rj.query is not None and rj.query.isActive  # still waiting
    assert not getattr(rj, "finished", False)

    to_wire(second).coalesce(1).write.parquet(os.path.join(dirs["source"], "b1"))
    rj.process_available()
    assert rj.wait_finished(timeout=30)
    assert rj.stats()["job_status"] == "target_gtid_finished"


def test_http_create_subscription_job(spark, job_dirs_factory):
    """POST /v2/jobs with type=subscription creates the Kafka-frames
    job type through the same create route (job.go:1222-1235)."""
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager

    dirs = job_dirs_factory("sub")
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    os.makedirs(dirs["source"])
    to_wire(changes.filter(F.col("seq") < 500)).coalesce(1).write.parquet(
        os.path.join(dirs["source"], "b0"))

    manager = JobManager(spark)
    server = ControlServer(manager, _orders_catalog(changes)).start()
    url = f"http://127.0.0.1:{server.port}"
    try:
        code, _ = _http("POST", f"{url}/v2/jobs", {
            "name": "s1", "type": "subscription",
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "source_dir": os.path.join(dirs["source"], "*"),
            "output_root": dirs["target"],
            "checkpoint_dir": dirs["checkpoint"],
        })
        assert code == 201
        manager.get("s1").process_available()
        code, d = _http("GET", f"{url}/v2/job/s1")
        assert code == 200 and d["job_type"] == "subscription" and d["frames"] > 0
        code, _ = _http("POST", f"{url}/v2/job/s1/pause")
        assert code == 200
    finally:
        server.stop()


def test_http_create_with_target_format(spark, job_dirs_factory):
    """The create body's target_format selector resolves through
    JobManager._resolve_target — an HTTP client can pick the
    parquet/bucketed/delta target without constructing objects."""
    from dtle_spark.sinks.table_sink import ParquetTableTarget as PTT
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager

    dirs = job_dirs_factory("tf")
    changes = cdc_demo.orders_changes(spark, SF_DIR)
    os.makedirs(dirs["source"])
    to_wire(changes.limit(20)).coalesce(1).write.parquet(
        os.path.join(dirs["source"], "b0"))

    manager = JobManager(spark)
    server = ControlServer(manager, _orders_catalog(changes)).start()
    url = f"http://127.0.0.1:{server.port}"
    try:
        code, _ = _http("POST", f"{url}/v2/jobs", {
            "name": "tf1",
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "source_dir": os.path.join(dirs["source"], "*"),
            "target_root": dirs["target"],
            "checkpoint_dir": dirs["checkpoint"],
            "target_format": "parquet",
            "start": False,
        })
        assert code == 201
        assert type(manager.get("tf1").target) is PTT
        # misconfigurations fail at create, not after data lands wrong
        code, body = _http("POST", f"{url}/v2/jobs", {
            "name": "tf2",
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "source_dir": os.path.join(dirs["source"], "*"),
            "target_root": dirs["target"],
            "checkpoint_dir": dirs["checkpoint"],
            "target_n_buckets": 64,  # without target_format
            "start": False,
        })
        assert code == 400 and "target_format" in body["error"]
        code, body = _http("POST", f"{url}/v2/jobs", {
            "name": "tf3", "type": "subscription",
            "tables": [{"schema_name": "db1", "table_name": "orders",
                        "unique_key": ["o_orderkey"]}],
            "source_dir": os.path.join(dirs["source"], "*"),
            "target_root": dirs["target"],
            "checkpoint_dir": dirs["checkpoint"],
            "target_format": "delta",
            "start": False,
        })
        assert code == 400 and "subscription" in body["error"]
    finally:
        server.stop()


def test_http_create_vector_jobs(spark, tmp_path):
    """POST /v2/jobs with type=vector_maintain / ann_serving creates
    the vector job types through the same route; the model is never in
    the body — it loads from the index generation's persisted copy, so
    create against an un-bootstrapped index is a clean 400. The
    per-job GET/position/pause/DELETE routes are type-agnostic."""
    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.functions import similarity as sim
    from dtle_spark.streaming.ann_serving import save_model
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    tr = sim.md5_train_sample(e)
    cent = sim.ivf_exact_mean_centroids(tr, k=16).localCheckpoint()
    cb = sim.pq_refine(
        tr, sim.pq_codebook(tr, m=8, ksub=16, means=cent), steps=2, m=8, ksub=16
    ).localCheckpoint()
    index_root = str(tmp_path / "index")
    vsrc, qsrc = str(tmp_path / "vecs"), str(tmp_path / "queries")
    os.makedirs(vsrc)
    os.makedirs(qsrc)
    e.coalesce(1).write.parquet(os.path.join(vsrc, "b0"))
    e.filter(F.col("vec_id") % 53 == 0).coalesce(1).write.parquet(
        os.path.join(qsrc, "q0")
    )

    manager = JobManager(spark)
    server = ControlServer(manager, SchemaCatalog()).start()
    url = f"http://127.0.0.1:{server.port}"
    maintain_body = {
        "name": "vm1", "type": "vector_maintain",
        "source_dir": os.path.join(vsrc, "*"),
        "index_root": index_root,
        "checkpoint_dir": str(tmp_path / "mck"),
    }
    try:
        # un-bootstrapped index -> clean 400, not a dead server
        code, err = _http("POST", f"{url}/v2/jobs", maintain_body)
        assert code == 400 and "model" in err["error"]

        save_model(index_root, cent, cb)  # offline bootstrap
        code, _ = _http("POST", f"{url}/v2/jobs", maintain_body)
        assert code == 201
        manager.get("vm1").process_available()

        code, _ = _http("POST", f"{url}/v2/jobs", {
            "name": "as1", "type": "ann_serving",
            "source_dir": os.path.join(qsrc, "*"),
            "index_root": index_root,
            "results_root": str(tmp_path / "results"),
            "checkpoint_dir": str(tmp_path / "sck"),
            "k": 10, "nprobe": 4,
        })
        assert code == 201
        manager.get("as1").process_available()

        code, d = _http("GET", f"{url}/v2/job/vm1")
        assert code == 200 and d["type"] == "vector_maintain"
        assert d["max_ingest_batch"] == 0
        code, pos = _http("GET", f"{url}/v2/job/as1/position")
        assert code == 200 and pos["__serve_batch"] == 0
        assert manager.get("as1").results().count() > 0

        code, _ = _http("POST", f"{url}/v2/job/vm1/pause")
        assert code == 200
        for name in ("as1", "vm1"):
            code, _ = _http("DELETE", f"{url}/v2/job/{name}")
            assert code == 200
        assert manager.list() == {}
    finally:
        server.stop()


def test_http_mutation_routes_serialize_on_writer_lease(spark, tmp_path):
    """E2E for the r13 writer lease on the HTTP mutation routes: the
    isActive guards refuse while the stream is ACTIVE, but a purge
    issued while a maintainer (or direct-call chore) is mid-manifest-
    swap must contend on the SAME writer lease — fail loud naming the
    holder, then succeed once the holder releases. Exercised for both
    mutating route families: corpus purge (documents table root) and
    vector purge (index_root)."""
    import threading

    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.functions import similarity as sim
    from dtle_spark.sinks.lease import writer_lease
    from dtle_spark.streaming.ann_serving import save_model
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager

    manager = JobManager(spark)
    server = ControlServer(manager, SchemaCatalog()).start()
    url = f"http://127.0.0.1:{server.port}"

    class _Holder:
        """A writer holding the store's lease from another thread —
        the maintainer-mid-critical-section stand-in."""

        def __init__(self, root):
            self.root = root
            self.held = threading.Event()
            self.release = threading.Event()
            self.t = threading.Thread(target=self._run)

        def _run(self):
            with writer_lease(self.root, "maintainer-swap"):
                self.held.set()
                self.release.wait(timeout=60)

        def __enter__(self):
            self.t.start()
            assert self.held.wait(timeout=60)
            return self

        def __exit__(self, *exc):
            self.release.set()
            self.t.join()

    try:
        # --- corpus family: purge_documents contends on the table root
        src = str(tmp_path / "csrc")
        os.makedirs(src)
        cj = manager.create_corpus_ingest(
            "cj", os.path.join(src, "*"), str(tmp_path / "ctgt"),
            str(tmp_path / "cck"), start=False,
        )
        cj.apply_batch(spark.createDataFrame(
            [(1, "a doc that will be taken down end to end", "en", "s0"),
             (2, "an unrelated survivor document about lease files",
              "en", "s0")],
            "doc_id long, text string, lang string, source string",
        ), 0)
        docs_root = cj.target.path("corpus", "documents")
        with _Holder(docs_root):
            code, d = _http("POST", f"{url}/v2/job/cj/purge", {"ids": [1]})
            assert code == 500 and "writer lease held" in d["error"]
            assert cj.corpus().count() == 2  # nothing half-purged
        code, d = _http("POST", f"{url}/v2/job/cj/purge", {"ids": [1]})
        assert code == 200 and d["purged"]["documents"] == 1
        assert {r["doc_id"] for r in cj.corpus().collect()} == {2}

        # --- vector family: purge (forced fold) contends on index_root
        e = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        tr = sim.md5_train_sample(e)
        cent = sim.ivf_exact_mean_centroids(tr, k=16).localCheckpoint()
        cb = sim.pq_refine(
            tr, sim.pq_codebook(tr, m=8, ksub=16, means=cent),
            steps=2, m=8, ksub=16,
        ).localCheckpoint()
        index_root = str(tmp_path / "index")
        save_model(index_root, cent, cb)
        vm = manager.create_vector_maintain(
            "vm", str(tmp_path / "vsrc-unused") + "/*", index_root,
            str(tmp_path / "vck"), start=False,
        )
        vm.apply_batch(e.limit(64).localCheckpoint(), 0)
        with _Holder(index_root):
            code, d = _http("POST", f"{url}/v2/job/vm/purge",
                            {"ids": [int(e.first()["vec_id"])]})
            assert code == 500 and "writer lease held" in d["error"]
        code, d = _http("POST", f"{url}/v2/job/vm/purge",
                        {"ids": [int(e.first()["vec_id"])]})
        assert code == 200
    finally:
        server.stop()
