"""Job manager: the reference's HTTP v2 control surface as a library
(reference §2.7 — api/handler/v2/job.go create/list/detail/pause/
resume/delete/position). Cluster state that dtle keeps in Consul
(``dtle/<job>/{Gtid, Config, ...}``, common/store.go:40-446) collapses
into streaming checkpoints + this registry; there is no transport tier
because Spark moves the data.
"""

from __future__ import annotations

import dataclasses
import json
import os

from dtle_spark.catalog import SchemaCatalog
from dtle_spark.model import JobConfig, TableConfig
from dtle_spark.streaming.pipeline import ReplicationJob


def job_config_to_dict(job: JobConfig) -> dict:
    return dataclasses.asdict(job)


def job_config_from_dict(d: dict) -> JobConfig:
    tables = [TableConfig(**t) for t in d.get("tables", [])]
    return JobConfig(**{**d, "tables": tables})


def _persistable_kwargs(kw: dict) -> dict:
    """Spec kwargs survive the round-trip to ``<spec_root>/<name>.json``
    or the create call fails HERE — a recovered job must run with the
    create-time configuration, never silently with defaults (the old
    scalar-only filter dropped lists/dicts without a word)."""
    for k, v in kw.items():
        try:
            json.dumps(v)
        except (TypeError, ValueError):
            raise ValueError(
                f"job kwarg {k!r} ({type(v).__name__}) is not "
                f"JSON-serializable; recover() could not reproduce it — "
                f"pass a serializable value"
            )
    return dict(kw)


def _target_spec(target) -> dict:
    """Serializable descriptor for a TableTarget instance — job specs
    persist the descriptor, recover() rebuilds the instance. Unknown
    target types (or non-default bucket functions) raise at create so
    a recovered job can never silently run a different target."""
    from dtle_spark.sinks.delta_target import DeltaTableTarget
    from dtle_spark.sinks.table_sink import (
        BucketedTableTarget,
        ParquetTableTarget,
        hash_bucket,
    )

    # exact type identity, not isinstance: a subclass may change
    # behavior the descriptor cannot express
    if type(target) is BucketedTableTarget:
        if target._bucket_fn is not hash_bucket:
            raise ValueError(
                "custom bucket_fn is not spec-serializable; create the "
                "job without spec_root or use the default hash routing"
            )
        return {"target_format": "bucketed", "target_n_buckets": target.n_buckets}
    if type(target) is DeltaTableTarget:
        return {"target_format": "delta"}
    if type(target) is ParquetTableTarget:
        return {"target_format": "parquet"}
    raise ValueError(
        f"target {type(target).__name__} has no serializable descriptor; "
        f"create the job without spec_root or add one to _target_spec"
    )


def _resolve_target(fmt: str, target_root: str, n_buckets: int = 32):
    from dtle_spark.sinks.delta_target import DeltaTableTarget
    from dtle_spark.sinks.table_sink import BucketedTableTarget, ParquetTableTarget

    if fmt == "bucketed":
        return BucketedTableTarget(target_root, n_buckets=n_buckets)
    if fmt == "parquet":
        return ParquetTableTarget(target_root)
    if fmt == "delta":
        return DeltaTableTarget(target_root)
    raise ValueError(f"unknown target_format {fmt!r}")


class JobManager:
    def __init__(self, spark, spec_root: str | None = None):
        """``spec_root``: when given, every created job persists its
        spec (config + dirs + catalog snapshot) as
        ``<spec_root>/<name>.json`` so :meth:`recover` on a FRESH
        manager restores and restarts all jobs from checkpoints — the
        agent-restart path the reference drives through
        driver.go:493+ StartTask/RecoverTask over Consul job state
        (common/store.go:40-446)."""
        self.spark = spark
        self.spec_root = spec_root
        self._jobs: dict[str, ReplicationJob] = {}

    def _spec_path(self, name: str) -> str | None:
        if self.spec_root is None:
            return None
        return os.path.join(self.spec_root, f"{name}.json")

    def create(
        self,
        job: JobConfig,
        source_dir: str,
        target_root: str,
        checkpoint_dir: str,
        catalog: SchemaCatalog,
        start: bool = True,
        **kw,
    ) -> ReplicationJob:
        if job.name in self._jobs:
            raise ValueError(f"job {job.name!r} already exists")
        # preflight: fail HERE, not mid-stream (inspect.go:89-180)
        from dtle_spark.preflight import preflight

        preflight(job, catalog, self.spark)
        # a serializable target descriptor (the recover() wire form)
        # resolves to the instance here; a passed instance round-trips
        # through its descriptor below
        fmt = kw.pop("target_format", None)
        n_buckets = kw.pop("target_n_buckets", None)
        if n_buckets is not None and fmt is None:
            raise ValueError(
                "target_n_buckets has no effect without target_format "
                "(it parameterizes the resolved target); pass "
                "target_format='bucketed' or drop target_n_buckets"
            )
        if fmt is not None and "target" not in kw:
            kw["target"] = _resolve_target(
                fmt, target_root, 32 if n_buckets is None else n_buckets
            )
        rj = ReplicationJob(
            self.spark, job, source_dir, target_root, checkpoint_dir, catalog, **kw
        )
        if self.spec_root is not None:
            spec_kw = {k: v for k, v in kw.items() if k != "target"}
            if kw.get("target") is not None:
                spec_kw.update(_target_spec(kw["target"]))
            self._persist_spec(job.name, {
                "job": job_config_to_dict(job),
                "source_dir": source_dir,
                "target_root": target_root,
                "checkpoint_dir": checkpoint_dir,
                "catalog": catalog.to_dict(),
                "kw": spec_kw,
            })
        self._jobs[job.name] = rj
        if start:
            rj.start()
        return rj

    def create_subscription(
        self,
        job: JobConfig,
        source_dir: str,
        output_root: str,
        checkpoint_dir: str,
        catalog: SchemaCatalog,
        start: bool = True,
        **kw,
    ):
        """The reference's third job type (subscription-to-Kafka,
        api/handler/v2/job.go:1222-1235): stream the change log as
        Debezium frames instead of applying it."""
        from dtle_spark.streaming.subscription import SubscriptionJob

        if job.name in self._jobs:
            raise ValueError(f"job {job.name!r} already exists")
        from dtle_spark.preflight import preflight

        preflight(job, catalog, self.spark)
        sj = SubscriptionJob(
            self.spark, job, source_dir, output_root, checkpoint_dir, catalog, **kw
        )
        self._persist_spec(job.name, {
            "type": "subscription",
            "job": job_config_to_dict(job),
            "source_dir": source_dir,
            "target_root": output_root,
            "checkpoint_dir": checkpoint_dir,
            "catalog": catalog.to_dict(),
            "kw": kw,
        })
        self._jobs[job.name] = sj
        if start:
            sj.start()
        return sj

    def create_vector_maintain(
        self,
        name: str,
        source_dir: str,
        index_root: str,
        checkpoint_dir: str,
        centroids=None,
        codebook=None,
        start: bool = True,
        wire_table: dict | None = None,
        **kw,
    ):
        """The vector-index maintain job (streaming/ann_serving.py) as
        a MANAGED job: same create/pause/resume/metrics/delete/recover
        control plane as replication and subscription jobs. The model
        tables are NOT part of the spec (DataFrames do not serialize) —
        they are persisted beside the index (save_model) at create and
        reloaded from the active generation on recover, so the spec
        stays a plain JSON descriptor.

        ``wire_table`` makes the job a CDC-WIRE bridge (the replicated
        embeddings table feeds the index): a plain-JSON descriptor
        resolved through wire_vector_hooks, so — unlike raw
        reader/transform callables — it persists in the spec and
        recover() rebuilds the bridge."""
        from dtle_spark.streaming.ann_serving import (
            VectorIndexMaintainJob,
            resolve_index_path,
            save_model,
            wire_vector_hooks,
        )

        if name in self._jobs:
            raise ValueError(f"job {name!r} already exists")
        if wire_table is not None:
            if "reader" in kw or "transform" in kw:
                raise ValueError(
                    "wire_table resolves its own reader/transform; pass "
                    "one or the other"
                )
            kw["reader"], kw["transform"] = wire_vector_hooks(
                source_dir, wire_table,
                max_files_per_trigger=kw.get("max_files_per_trigger", 1),
            )
            kw.setdefault("id_col", wire_table.get("id_col", "vec_id"))
            kw.setdefault("vec_col", wire_table.get("vec_col", "embedding"))
            kw.setdefault(
                "carry_cols", tuple(wire_table.get("carry_cols", ()))
            )
        vj = VectorIndexMaintainJob(
            self.spark, source_dir, index_root, checkpoint_dir,
            centroids, codebook, **kw,
        )
        # make the generation self-describing NOW, not at first batch:
        # recover() must be able to reload the model before any data.
        # Skip when already persisted (recover path / reindexed gen) —
        # rewriting identical tables races concurrent serving reads.
        gen = resolve_index_path(index_root)
        from dtle_spark.streaming.ann_serving import _MODEL_DIR

        if not os.path.isdir(os.path.join(gen, _MODEL_DIR)):
            save_model(gen, vj.centroids, vj.codebook)
        self._persist_spec(name, {
            "type": "vector_maintain",
            "source_dir": source_dir,
            "index_root": index_root,
            "checkpoint_dir": checkpoint_dir,
            "wire_table": wire_table,
            # the resolved hooks are NOT spec-persistable; wire_table
            # regenerates them on recover
            "kw": {k: v for k, v in kw.items()
                   if not (wire_table is not None
                           and k in ("reader", "transform"))},
        })
        self._jobs[name] = vj
        if start:
            vj.start()
        return vj

    def create_ann_serving(
        self,
        name: str,
        query_source_dir: str,
        index_root: str,
        results_root: str,
        checkpoint_dir: str,
        centroids=None,
        codebook=None,
        start: bool = True,
        **kw,
    ):
        """The ANN serving job as a MANAGED job (see
        create_vector_maintain). ``where`` filtered-search predicates
        must be SQL strings here (Columns do not serialize into the
        spec); the non-serializable ``vectors`` rerank callable is
        rejected by the spec round-trip check."""
        from dtle_spark.streaming.ann_serving import AnnServingJob

        if name in self._jobs:
            raise ValueError(f"job {name!r} already exists")
        where = kw.get("where")
        if where is not None and not isinstance(where, str):
            raise ValueError(
                "managed serving jobs take `where` as a SQL string "
                "(Column predicates cannot be persisted for recover())"
            )
        sj = AnnServingJob(
            self.spark, query_source_dir, index_root, results_root,
            checkpoint_dir, centroids, codebook, **kw,
        )
        self._persist_spec(name, {
            "type": "ann_serving",
            "source_dir": query_source_dir,
            "index_root": index_root,
            "results_root": results_root,
            "checkpoint_dir": checkpoint_dir,
            "kw": kw,
        })
        self._jobs[name] = sj
        if start:
            sj.start()
        return sj

    def create_stream_profile(
        self,
        name: str,
        source_dir: str,
        profile_root: str,
        checkpoint_dir: str,
        key_sql: str,
        value_sql: str,
        start: bool = True,
        **kw,
    ):
        """The sketch profiler (streaming/profile.py) as a MANAGED job:
        the spec is already plain JSON (key_sql/value_sql are SQL
        strings, sketch dims are ints — no model tables, no callables),
        so recover() rebuilds it verbatim and the stream resumes from
        its checkpoint against the same profile root (the
        _CHECKPOINT_ID stamp guarantees the pairing)."""
        from dtle_spark.streaming.profile import StreamProfileJob

        if name in self._jobs:
            raise ValueError(f"job {name!r} already exists")
        pj = StreamProfileJob(
            self.spark, source_dir, profile_root, checkpoint_dir,
            key_sql, value_sql, **kw,
        )
        self._persist_spec(name, {
            "type": "stream_profile",
            "source_dir": source_dir,
            "profile_root": profile_root,
            "checkpoint_dir": checkpoint_dir,
            "key_sql": key_sql,
            "value_sql": value_sql,
            "kw": kw,
        })
        self._jobs[name] = pj
        if start:
            pj.start()
        return pj

    def create_agg_maintain(
        self,
        name: str,
        source_dir: str,
        view_root: str,
        checkpoint_dir: str,
        group_sqls: dict,
        measure_sqls: dict,
        row_schema_ddl: str | None = None,
        start: bool = True,
        **kw,
    ):
        """Incremental rollup maintenance (streaming/agg_maintain.py)
        as the seventh managed job type. The spec is plain JSON
        (group/measure SQL-expression dicts, the row schema as a DDL
        string from which the change-record schema is rebuilt), so
        recover() reconstructs the job verbatim and the stream resumes
        against the same view root (_CHECKPOINT_ID pairing)."""
        from pyspark.sql import types as T

        from dtle_spark.model import change_schema
        from dtle_spark.streaming.agg_maintain import AggMaintainJob

        if name in self._jobs:
            raise ValueError(f"job {name!r} already exists")
        if (
            self.spec_root is not None
            and row_schema_ddl is None
            and "schema" in kw
            and "reader" not in kw
        ):
            # a raw StructType cannot round-trip through the JSON spec:
            # recover() would rebuild a job that fails at start()
            raise ValueError(
                "persistent managers need row_schema_ddl (a DDL string), "
                "not schema=: the spec must rebuild the stream schema on "
                "recover()"
            )
        if row_schema_ddl is not None:
            kw = {**kw, "schema": change_schema(T.StructType.fromDDL(row_schema_ddl))}
        aj = AggMaintainJob(
            self.spark, source_dir, view_root, checkpoint_dir,
            group_sqls, measure_sqls, **kw,
        )
        self._persist_spec(name, {
            "type": "agg_maintain",
            "source_dir": source_dir,
            "view_root": view_root,
            "checkpoint_dir": checkpoint_dir,
            "group_sqls": dict(group_sqls),
            "measure_sqls": dict(measure_sqls),
            "row_schema_ddl": row_schema_ddl,
            "kw": {k: v for k, v in kw.items() if k != "schema"},
        })
        self._jobs[name] = aj
        if start:
            aj.start()
        return aj

    def create_scd2_history(
        self,
        name: str,
        source_dir: str,
        history_root: str,
        checkpoint_dir: str,
        key_cols: list,
        row_schema_ddl: str | None = None,
        start: bool = True,
        **kw,
    ):
        """SCD2 history maintenance (streaming/history.py) as the
        eighth managed job type — same plain-JSON spec discipline as
        the rollup maintainer (key_cols list + row schema as DDL)."""
        from pyspark.sql import types as T

        from dtle_spark.model import change_schema
        from dtle_spark.streaming.history import Scd2HistoryJob

        if name in self._jobs:
            raise ValueError(f"job {name!r} already exists")
        if (
            self.spec_root is not None
            and row_schema_ddl is None
            and "schema" in kw
            and "reader" not in kw
        ):
            raise ValueError(
                "persistent managers need row_schema_ddl (a DDL string), "
                "not schema=: the spec must rebuild the stream schema on "
                "recover()"
            )
        if row_schema_ddl is not None:
            kw = {**kw, "schema": change_schema(T.StructType.fromDDL(row_schema_ddl))}
        hj = Scd2HistoryJob(
            self.spark, source_dir, history_root, checkpoint_dir,
            list(key_cols), **kw,
        )
        self._persist_spec(name, {
            "type": "scd2_history",
            "source_dir": source_dir,
            "history_root": history_root,
            "checkpoint_dir": checkpoint_dir,
            "key_cols": list(key_cols),
            "row_schema_ddl": row_schema_ddl,
            "kw": {k: v for k, v in kw.items() if k != "schema"},
        })
        self._jobs[name] = hj
        if start:
            hj.start()
        return hj

    def create_join_maintain(
        self,
        name: str,
        source_dir: str,
        dim_dir: str,
        view_root: str,
        checkpoint_dir: str,
        key_cols: list,
        fk: str,
        right_pk: str,
        right_cols: dict,
        row_schema_ddl: str | None = None,
        start: bool = True,
        **kw,
    ):
        """Materialized join-view maintenance (streaming/
        join_maintain.py) as the ninth managed job type — same
        plain-JSON spec discipline (key list, fk/pk names, the
        right-column map, the row schema as DDL), so recover()
        rebuilds the job verbatim and the stream resumes against the
        same view root (_CHECKPOINT_ID pairing). The dim side needs no
        spec entry beyond its table path: the job derives per-batch
        dim dirt from its own digest snapshots."""
        from pyspark.sql import types as T

        from dtle_spark.model import change_schema
        from dtle_spark.streaming.join_maintain import JoinViewMaintainJob

        if name in self._jobs:
            raise ValueError(f"job {name!r} already exists")
        if (
            self.spec_root is not None
            and row_schema_ddl is None
            and "schema" in kw
            and "reader" not in kw
        ):
            raise ValueError(
                "persistent managers need row_schema_ddl (a DDL string), "
                "not schema=: the spec must rebuild the stream schema on "
                "recover()"
            )
        if row_schema_ddl is not None:
            kw = {**kw, "schema": change_schema(T.StructType.fromDDL(row_schema_ddl))}
        jj = JoinViewMaintainJob(
            self.spark, source_dir, dim_dir, view_root, checkpoint_dir,
            list(key_cols), fk, right_pk, dict(right_cols), **kw,
        )
        self._persist_spec(name, {
            "type": "join_maintain",
            "source_dir": source_dir,
            "dim_dir": dim_dir,
            "view_root": view_root,
            "checkpoint_dir": checkpoint_dir,
            "key_cols": list(key_cols),
            "fk": fk,
            "right_pk": right_pk,
            "right_cols": dict(right_cols),
            "row_schema_ddl": row_schema_ddl,
            "kw": {k: v for k, v in kw.items() if k != "schema"},
        })
        self._jobs[name] = jj
        if start:
            jj.start()
        return jj

    def create_corpus_ingest(
        self,
        name: str,
        source_dir: str,
        target_root: str,
        checkpoint_dir: str,
        start: bool = True,
        **kw,
    ):
        """The streaming corpus builder (streaming/corpus_ingest.py) as
        the tenth managed job type. The spec is plain JSON end to end —
        schema is a DDL string, dedup threshold a float, the drift-gate
        config a {check: max_deviation} dict plus two SQL expressions —
        so recover() rebuilds the job verbatim and the stream resumes
        against the same target (manifest watermarks make replays
        no-ops)."""
        from dtle_spark.streaming.corpus_ingest import CorpusIngestJob

        if name in self._jobs:
            raise ValueError(f"job {name!r} already exists")
        cj = CorpusIngestJob(
            self.spark, source_dir, target_root, checkpoint_dir, **kw
        )
        self._persist_spec(name, {
            "type": "corpus_ingest",
            "source_dir": source_dir,
            "target_root": target_root,
            "checkpoint_dir": checkpoint_dir,
            "kw": kw,
        })
        self._jobs[name] = cj
        if start:
            cj.start()
        return cj

    def _persist_spec(self, name: str, spec: dict) -> None:
        """Atomic spec write. Kwarg serializability is validated HERE,
        after the spec_root check — a manager without persistence must
        accept non-serializable kwargs (e.g. a rerank `vectors`
        callable) since nothing needs to round-trip."""
        sp = self._spec_path(name)
        if sp is None:
            return
        if "kw" in spec:
            spec["kw"] = _persistable_kwargs(spec["kw"])
        os.makedirs(self.spec_root, exist_ok=True)
        tmp = sp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(spec, f)
        os.replace(tmp, sp)

    def recover(self, start: bool = True) -> list[str]:
        """Restore every persisted job spec into this (fresh) manager:
        catalog from the checkpoint's post-DDL snapshot when one exists
        (falling back to the create-time snapshot in the spec), stream
        resumed from its checkpoint, applied-gtid position from its
        interval file. Returns recovered job names."""
        if self.spec_root is None or not os.path.isdir(self.spec_root):
            return []
        out = []
        for fname in sorted(os.listdir(self.spec_root)):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(self.spec_root, fname)) as f:
                spec = json.load(f)
            if spec.get("type") == "stream_profile":
                pname = fname[: -len(".json")]
                if pname in self._jobs:
                    continue
                self.create_stream_profile(
                    pname, spec["source_dir"], spec["profile_root"],
                    spec["checkpoint_dir"], spec["key_sql"],
                    spec["value_sql"], start=start, **spec.get("kw", {}),
                )
                out.append(pname)
                continue
            if spec.get("type") == "agg_maintain":
                aname = fname[: -len(".json")]
                if aname in self._jobs:
                    continue
                self.create_agg_maintain(
                    aname, spec["source_dir"], spec["view_root"],
                    spec["checkpoint_dir"], spec["group_sqls"],
                    spec["measure_sqls"],
                    row_schema_ddl=spec.get("row_schema_ddl"),
                    start=start, **spec.get("kw", {}),
                )
                out.append(aname)
                continue
            if spec.get("type") == "scd2_history":
                hname = fname[: -len(".json")]
                if hname in self._jobs:
                    continue
                self.create_scd2_history(
                    hname, spec["source_dir"], spec["history_root"],
                    spec["checkpoint_dir"], spec["key_cols"],
                    row_schema_ddl=spec.get("row_schema_ddl"),
                    start=start, **spec.get("kw", {}),
                )
                out.append(hname)
                continue
            if spec.get("type") == "join_maintain":
                jname = fname[: -len(".json")]
                if jname in self._jobs:
                    continue
                self.create_join_maintain(
                    jname, spec["source_dir"], spec["dim_dir"],
                    spec["view_root"], spec["checkpoint_dir"],
                    spec["key_cols"], spec["fk"], spec["right_pk"],
                    spec["right_cols"],
                    row_schema_ddl=spec.get("row_schema_ddl"),
                    start=start, **spec.get("kw", {}),
                )
                out.append(jname)
                continue
            if spec.get("type") == "corpus_ingest":
                cname = fname[: -len(".json")]
                if cname in self._jobs:
                    continue
                self.create_corpus_ingest(
                    cname, spec["source_dir"], spec["target_root"],
                    spec["checkpoint_dir"], start=start,
                    **spec.get("kw", {}),
                )
                out.append(cname)
                continue
            if spec.get("type") in ("vector_maintain", "ann_serving"):
                vname = fname[: -len(".json")]
                if vname in self._jobs:
                    continue
                # model reloads from the index's active generation
                if spec["type"] == "vector_maintain":
                    self.create_vector_maintain(
                        vname, spec["source_dir"], spec["index_root"],
                        spec["checkpoint_dir"], start=start,
                        wire_table=spec.get("wire_table"),
                        **spec.get("kw", {}),
                    )
                else:
                    self.create_ann_serving(
                        vname, spec["source_dir"], spec["index_root"],
                        spec["results_root"], spec["checkpoint_dir"],
                        start=start, **spec.get("kw", {}),
                    )
                out.append(vname)
                continue
            job = job_config_from_dict(spec["job"])
            if job.name in self._jobs:
                continue
            ckpt_catalog = SchemaCatalog.load(
                os.path.join(spec["checkpoint_dir"], "catalog.json")
            )
            catalog = (
                ckpt_catalog
                if ckpt_catalog is not None
                else SchemaCatalog.from_dict(spec["catalog"])
            )
            creator = (
                self.create_subscription
                if spec.get("type") == "subscription"
                else self.create
            )
            creator(
                job,
                spec["source_dir"],
                spec["target_root"],
                spec["checkpoint_dir"],
                catalog,
                start=start,
                **spec.get("kw", {}),
            )
            out.append(job.name)
        return out

    def list(self) -> dict[str, dict]:
        return {name: rj.stats() for name, rj in self._jobs.items()}

    def get(self, name: str) -> ReplicationJob:
        return self._jobs[name]

    def pause(self, name: str) -> None:
        self._jobs[name].pause()

    def resume(self, name: str) -> None:
        self._jobs[name].resume()

    def position(self, name: str) -> dict:
        return self._jobs[name].position()

    def metrics(self, name: str) -> dict:
        """TaskStatistics analogue (reference common/models.go:69-88):
        lifecycle + per-table op counters, throughput, delay, applied
        position (streaming/metrics.TaskMetrics)."""
        return self._jobs[name].stats()

    def versions(self, name: str) -> dict:
        """Retained target-table commit versions (manifest time travel):
        the audit surface for "what did the table look like N batches
        ago" — read back via target.read_at_version."""
        return self._jobs[name].table_versions()

    def update(self, name: str, new_job: JobConfig) -> None:
        """Job update (reference: /v2/job/*/update →
        CreateOrUpdateMigrationJobV2, api/handler/v2/job.go:298-309):
        pause → preflight the NEW config → swap + re-persist spec →
        resume. A config that fails preflight leaves the job running
        its old config (resumed), and the error propagates (→ HTTP
        400)."""
        if new_job.name != name:
            raise ValueError(
                f"config name {new_job.name!r} does not match job {name!r}"
            )
        rj = self._jobs[name]
        was_active = rj.query is not None and rj.query.isActive
        if was_active:
            rj.pause()
        from dtle_spark.preflight import preflight

        try:
            preflight(new_job, rj.catalog, self.spark)
        except Exception:
            if was_active:
                rj.resume()
            raise
        rj.update_config(new_job)
        sp = self._spec_path(name)
        if sp is not None and os.path.exists(sp):
            with open(sp) as f:
                spec = json.load(f)
            spec["job"] = job_config_to_dict(new_job)
            self._persist_spec(name, spec)
        if was_active:
            rj.resume()

    def _catalogs(self, extra: SchemaCatalog | None = None):
        if extra is not None:
            yield extra
        for rj in self._jobs.values():
            yield rj.catalog

    def schemas(self, extra: SchemaCatalog | None = None) -> list[str]:
        """Catalog browse (reference /v2/database/schemas,
        api/handler/v2/database.go:43): union of every job's catalog
        plus the server's default one."""
        out = set()
        for cat in self._catalogs(extra):
            out |= set(cat.schemas)
            out |= {s for s, _ in cat.tables}
        return sorted(out)

    def tables(self, schema_name: str, extra: SchemaCatalog | None = None) -> list[str]:
        out = set()
        for cat in self._catalogs(extra):
            out |= {t for s, t in cat.tables if s == schema_name}
        return sorted(out)

    def columns(
        self, schema_name: str, table_name: str, extra: SchemaCatalog | None = None
    ) -> list[dict]:
        """Column browse (reference /v2/database/columns,
        api/handler/v2/database.go:184)."""
        for cat in self._catalogs(extra):
            meta = cat.get(schema_name, table_name)
            if meta is not None:
                return [
                    {
                        "name": f.name,
                        "type": f.dataType.simpleString(),
                        "nullable": f.nullable,
                        "key": f.name in meta.unique_key,
                    }
                    for f in meta.schema.fields
                ]
        raise KeyError(f"{schema_name}.{table_name}")

    def finish(self, name: str, target_gtid: str | None = None) -> None:
        """Graceful cutover: sync until the applied set contains the
        target GTID set, then stop (the reference's finish-job /
        targetGtid flow — see ReplicationJob.finish)."""
        self._jobs[name].finish(target_gtid)

    def delete(self, name: str) -> None:
        """Delete = stop + deregister + spec removal (checkpoint/target
        dirs are the caller's to clean, matching the reference's delete
        semantics)."""
        rj = self._jobs.pop(name)
        rj.pause()
        sp = self._spec_path(name)
        if sp is not None and os.path.exists(sp):
            os.remove(sp)

    def reverse(
        self,
        name: str,
        source_dir: str,
        target_root: str,
        checkpoint_dir: str,
        catalog: SchemaCatalog,
        local_sid: str | None = None,
        start: bool = True,
        **kw,
    ) -> ReplicationJob:
        """The reverse_start workflow (api/handler/v2/job.go
        /v2/job/reverse + reverse_start): derive "reverse-<name>" from
        a registered forward job — direction inverted per table
        (model.reverse_job_config), cycle prevention armed via
        local_sid — and start it consuming the reverse-direction wire
        stream. The forward job must be paused first (the reference
        sequences this with WaitOnJob: the reverse src waits on the
        forward job's completion)."""
        from dtle_spark.model import reverse_job_config
        from dtle_spark.streaming.subscription import SubscriptionJob

        fwd = self._jobs[name]
        if isinstance(fwd, SubscriptionJob):
            # the reference's reverse flow applies to migration/sync
            # jobs — a one-way Kafka subscription has no target to
            # replicate back from (job.go reverse validation)
            raise ValueError(f"subscription job {name!r} cannot be reversed")
        if fwd.query is not None and fwd.query.isActive:
            raise ValueError(f"pause forward job {name!r} before reversing")
        rev = reverse_job_config(fwd.job, local_sid=local_sid)
        return self.create(
            rev, source_dir, target_root, checkpoint_dir, catalog,
            start=start, **kw,
        )

    def reverse_start(
        self,
        name: str,
        source_dir: str,
        target_root: str,
        checkpoint_dir: str,
        catalog: SchemaCatalog,
        local_sid: str | None = None,
        start: bool = True,
        finish_timeout: float = 60.0,
        **kw,
    ) -> ReplicationJob:
        """The complete reverse_start orchestration (reference:
        /v2/job/reverse_start, api/handler/v2/job.go:1836 — signals the
        forward job to FINISH at its current position (:1861-1900), the
        applier stops at TargetGtidFinished, and the reverse job's
        WaitOnJob gate opens): finish the forward job at its source
        frontier, wait for target_gtid_finished, then derive and start
        ``reverse-<name>``."""
        fwd = self._jobs[name]
        if fwd.query is not None and fwd.query.isActive:
            fwd.finish()
            fwd.process_available()
            if not fwd.wait_finished(finish_timeout):
                raise RuntimeError(
                    f"forward job {name!r} did not reach its target gtid "
                    f"within {finish_timeout}s"
                )
        return self.reverse(
            name, source_dir, target_root, checkpoint_dir, catalog,
            local_sid=local_sid, start=start, **kw,
        )
