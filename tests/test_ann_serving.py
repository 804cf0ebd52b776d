"""Streaming vector serving (streaming/ann_serving.py): the online
IVF-PQ loop — index maintenance O(batch) against a frozen model,
query-stream serving off the persisted cell-partitioned index, both
replay-idempotent. Served results are pinned EQUAL to the inline
ivf_pq_topk tier (shared _ivf_pq_adc stage)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dtle_spark.functions import similarity as sim
from dtle_spark.streaming.ann_serving import (
    RESULTS_TABLE,
    SCHEMA_NAME,
    AnnServingJob,
    VectorIndexMaintainJob,
)

SF_DIR = "/root/testdata/sf0.001"
PQ = dict(k=10, nprobe=4, m=8, ksub=16, dim=64)


def _embeddings(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _model(e):
    """The frozen serving model: trained once on the deterministic 25%
    sample, exactly like the ann_topk_ivf_pq registry query."""
    tr = sim.md5_train_sample(e)
    cent = sim.ivf_exact_mean_centroids(tr, k=16).localCheckpoint()
    cb = sim.pq_refine(
        tr, sim.pq_codebook(tr, m=8, ksub=16, means=cent), steps=2, m=8, ksub=16
    )
    return cent, cb


def _topk_map(df):
    return {(r["query_id"], r["rank"]): r["neighbor_id"] for r in df.collect()}


def _inline(e, q, cent, cb, rerank=0):
    return sim.ivf_pq_topk(
        e, q, k=PQ["k"], nprobe=PQ["nprobe"], n_cells=16, m=PQ["m"],
        ksub=PQ["ksub"], centroids=cent, codebook=cb, rerank=rerank,
    )


def test_maintain_serve_freshness_replay(spark, tmp_path):
    """One end-to-end scenario: (1) two maintain micro-batches build the
    cell-partitioned index; (2) a served query batch matches the inline
    tier exactly; (3) vectors appended BETWEEN query batches are visible
    to the next batch with no coordination (freshness = re-planned
    partition tree); (4) replaying either side is a no-op."""
    e = _embeddings(spark)
    cent, cb = _model(e)

    vsrc = str(tmp_path / "vecs")
    os.makedirs(vsrc)
    half0 = e.filter(F.col("vec_id") % 2 == 0)
    half1 = e.filter(F.col("vec_id") % 2 == 1)
    half0.coalesce(1).write.parquet(os.path.join(vsrc, "b0"))
    half1.coalesce(1).write.parquet(os.path.join(vsrc, "b1"))

    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, os.path.join(vsrc, "*"), index_root, str(tmp_path / "mck"),
        cent, cb, m=PQ["m"], ksub=PQ["ksub"], dim=PQ["dim"],
    )
    mj.start()
    mj.process_available()
    # layout: one subtree per micro-batch, cell-partitioned inside
    assert sorted(
        d for d in os.listdir(index_root) if d.startswith("ingest_batch=")
    ) == ["ingest_batch=0", "ingest_batch=1"]
    assert any(
        d.startswith("cell=")
        for d in os.listdir(os.path.join(index_root, "ingest_batch=0"))
    )
    assert mj.index().count() == e.count()

    qsrc = str(tmp_path / "queries")
    os.makedirs(qsrc)
    q0 = e.filter(F.col("vec_id") % 37 == 0)
    q0.coalesce(1).write.parquet(os.path.join(qsrc, "q0"))

    sj = AnnServingJob(
        spark, os.path.join(qsrc, "*"), index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, **PQ,
    )
    sj.start()
    sj.process_available()
    got0 = _topk_map(sj.results())
    assert got0 == _topk_map(_inline(e, q0, cent, cb))
    assert len({qid for qid, _ in got0}) == q0.count()

    # freshness: new vectors (same embeddings, fresh ids) land via the
    # maintain job; the NEXT query batch sees them without any rebuild
    extra = e.filter(F.col("vec_id") % 5 == 2).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    extra.coalesce(1).write.parquet(os.path.join(vsrc, "b2"))
    mj.start()
    mj.process_available()
    full = e.unionByName(extra)
    assert mj.index().count() == full.count()

    q1 = e.filter(F.col("vec_id") % 41 == 3)
    q1.coalesce(1).write.parquet(os.path.join(qsrc, "q1"))
    sj.start()
    sj.process_available()
    res = sj.results()
    got1 = _topk_map(res.filter(F.col("__serve_batch") == 1))
    assert got1 == _topk_map(_inline(full, q1, cent, cb))
    # an identical-embedding twin ranks: new ids CAN surface as neighbors
    assert any(nid >= 100000 for nid in got1.values())

    # replay both sides: maintain overwrites its own subtree (same
    # content), serving skips at-or-below the committed watermark
    n_idx, n_res = mj.index().count(), res.count()
    mj.apply_batch(half0, 0)
    sj.apply_batch(q1, 1)
    sj.apply_batch(q0, 0)
    assert mj.index().count() == n_idx
    assert sj.results().count() == n_res
    wm = sj.target.seq_watermark(SCHEMA_NAME, RESULTS_TABLE)
    assert wm == {"__serve_batch": 1}


def test_serving_rerank_against_current_corpus(spark, tmp_path):
    """rerank > 0 re-scores the ADC pool with exact fp32 cosine; the
    corpus is passed as a CALLABLE so each batch reranks against the
    current table. Pinned equal to the inline rerank tier."""
    e = _embeddings(spark)
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    sim.ivf_pq_build_index(
        e, cent, cb, m=PQ["m"], ksub=PQ["ksub"], dim=PQ["dim"],
    ).write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(index_root, "ingest_batch=0")
    )

    qsrc = str(tmp_path / "queries")
    os.makedirs(qsrc)
    q = e.filter(F.col("vec_id") % 53 == 0)
    q.coalesce(1).write.parquet(os.path.join(qsrc, "q0"))

    sj = AnnServingJob(
        spark, os.path.join(qsrc, "*"), index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, rerank=50, vectors=lambda: e, **PQ,
    )
    sj.start()
    sj.process_available()
    assert _topk_map(sj.results()) == _topk_map(_inline(e, q, cent, cb, rerank=50))


def test_index_compaction_generation_swap(spark, tmp_path):
    """compact_index folds the per-batch subtrees into one subtree in a
    new generation and swaps the _CURRENT pointer atomically: served
    results are IDENTICAL before and after, replays of folded batches
    become no-ops (compaction watermark), new batches land in the new
    generation, and a second compaction stacks a further generation."""
    from dtle_spark.streaming.ann_serving import (
        _ingest_batches,
        compact_index,
        resolve_index_path,
    )

    e = _embeddings(spark)
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent, cb
    )
    parts = [e.filter(F.col("vec_id") % 4 == i) for i in range(4)]
    for i, p in enumerate(parts):
        mj.apply_batch(p, i)
    n0 = mj.index().count()
    assert n0 == e.count()

    q = e.filter(F.col("vec_id") % 53 == 0)
    sj = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, **PQ,
    )
    sj.apply_batch(q, 0)
    before = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 0).collect()
    }

    assert compact_index(spark, index_root, max_batches=8) == 0  # under cap
    folded = compact_index(spark, index_root, max_batches=2, gc_previous=True)
    assert folded == 4
    gen1 = resolve_index_path(index_root)
    assert os.path.basename(gen1) == "gen-1"
    assert _ingest_batches(gen1) == ["ingest_batch=3"]
    assert not _ingest_batches(index_root)  # old subtrees GC'd
    assert mj.index().count() == n0

    # identical service from the compacted generation
    sj.apply_batch(q, 1)
    after = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 1).collect()
    }
    assert after == before

    # a replayed pre-compaction batch is a no-op (watermark guard)
    mj.apply_batch(parts[0], 2)
    assert _ingest_batches(gen1) == ["ingest_batch=3"]
    assert mj.index().count() == n0

    # new batches land in the ACTIVE generation and a second compaction
    # stacks gen-2 on top
    extra = e.limit(100).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    mj.apply_batch(extra, 4)
    mj.apply_batch(
        extra.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"), 5
    )
    assert _ingest_batches(gen1) == [
        "ingest_batch=3", "ingest_batch=4", "ingest_batch=5"
    ]
    assert compact_index(spark, index_root, max_batches=2, gc_previous=True) == 3
    gen2 = resolve_index_path(index_root)
    assert os.path.basename(gen2) == "gen-2"
    assert not os.path.exists(gen1)
    assert mj.index().count() == n0 + 200


def test_purge_index_ids_hard_deletes(spark, tmp_path):
    """The vector-index takedown: purged ids vanish PHYSICALLY — gone
    from index() and from served results, the superseded generation is
    deleted from disk (no on-disk trace), no tombstone sidecar names
    them, the purge forces a fold even under the subtree-count
    trigger, and the stream keeps ingesting afterwards."""
    from dtle_spark.streaming.ann_serving import (
        _ingest_batches,
        purge_index_ids,
        resolve_index_path,
    )

    e = _embeddings(spark)
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent, cb
    )
    mj.apply_batch(e, 0)
    n0 = mj.index().count()
    doomed = [int(r["vec_id"]) for r in
              e.select("vec_id").limit(3).collect()]
    ids = spark.createDataFrame([(i,) for i in doomed], "vec_id long")

    gen0 = resolve_index_path(index_root)
    # one subtree: under any sane trigger — the purge must fold anyway
    assert purge_index_ids(spark, index_root, ids) == 1
    gen1 = resolve_index_path(index_root)
    assert gen1 != gen0 and not os.path.exists(os.path.join(gen0, "ingest_batch=0"))
    assert mj.index().count() == n0 - 3
    assert not {r["id"] for r in mj.index().collect()} & set(doomed)
    # no tombstone sidecar names them in the live generation
    assert not _ingest_batches(os.path.join(gen1, "_tombstones"))

    # served results exclude the purged ids
    q = e.filter(F.col("vec_id") % 53 == 0)
    sj = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, **PQ,
    )
    sj.apply_batch(q, 0)
    assert not {r["neighbor_id"] for r in sj.results().collect()} & set(doomed)

    # the stream keeps ingesting into the purged generation
    extra = e.limit(10).select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding"
    )
    mj.apply_batch(extra, 1)
    assert mj.index().count() == n0 - 3 + 10


def test_purge_route_over_http(spark, tmp_path):
    """The takedown as a control-plane action: POST /v2/job/<n>/purge
    on a vector maintain job — refused while the job is ACTIVE (the
    forced fold swaps the generation under the ingest path), executes
    once paused, and the purged ids vanish from the index."""
    import json
    import urllib.request

    from dtle_spark.catalog import SchemaCatalog
    from dtle_spark.streaming.http_api import ControlServer
    from dtle_spark.streaming.jobs import JobManager

    e = _embeddings(spark)
    cent, cb = _model(e)
    src = str(tmp_path / "src")
    os.makedirs(src)
    e.limit(200).coalesce(1).write.parquet(os.path.join(src, "b0"))
    mgr = JobManager(spark)
    mj = mgr.create_vector_maintain(
        "vm", os.path.join(src, "*"), str(tmp_path / "index"),
        str(tmp_path / "ck"), cent, cb, start=False,
    )
    mj.start()
    mj.process_available()
    n0 = mj.index().count()
    doomed = [int(r["id"]) for r in mj.index().select("id").limit(2).collect()]
    server = ControlServer(mgr, SchemaCatalog()).start()
    url = f"http://127.0.0.1:{server.port}"

    def _http(method, path, body=None):
        req = urllib.request.Request(
            url + path, method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as ex:
            return ex.code, json.loads(ex.read() or b"{}")

    try:
        # the guard reads job.query.isActive at REQUEST time; a real
        # restarted availableNow query can drain between any local
        # isActive check and the server's own read (observed flake under
        # host load), so pin the "mid-run maintainer" state with a stub
        # query object — the same technique the serve-guard assertion
        # below already uses
        class _ActiveQ:
            isActive = True

        real_q = mj.query
        mj.query = _ActiveQ()
        try:
            code, err = _http("POST", "/v2/job/vm/purge", {"ids": doomed})
            assert code == 400 and "PAUSED" in err["error"]
        finally:
            mj.query = real_q
        mgr.pause("vm")
        # an ACTIVE serving job probing the same index_root blocks the
        # purge: the forced fold gc's the superseded generation, which
        # would be deleted out from under a mid-batch probe. Stubbed
        # prober — the guard reads only (index_root, query.isActive).
        class _Prober:
            index_root = str(tmp_path / "index")

            class _Q:
                isActive = True

            query = _Q()

        mgr._jobs["serve-x"] = _Prober()
        code, err = _http("POST", "/v2/job/vm/purge", {"ids": doomed})
        assert code == 400 and "serve-x" in err["error"]
        del mgr._jobs["serve-x"]
        code, got = _http("POST", "/v2/job/vm/purge", {"ids": doomed})
        assert code == 200 and got["folded"] >= 1
        assert mj.index().count() == n0 - 2
        assert not {r["id"] for r in mj.index().collect()} & set(doomed)
    finally:
        server.stop()


def test_auto_compact_bounds_index_subtrees(spark, tmp_path):
    """auto_compact_batches on the vector maintainer: ingest subtrees
    self-bound over a long stream with zero manual compact_index()
    calls (gc_previous stays False — superseded generations are the
    separate VACUUM chore), and the served index equals the full
    corpus throughout."""
    from dtle_spark.streaming.ann_serving import (
        _ingest_batches,
        resolve_index_path,
    )

    e = _embeddings(spark)
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent, cb,
        auto_compact_batches=2,
    )
    for i in range(6):
        mj.apply_batch(e.filter(F.col("vec_id") % 6 == i), i)
        gen = resolve_index_path(index_root)
        assert len(_ingest_batches(gen)) <= 2, f"batch {i}"
    gen = resolve_index_path(index_root)
    assert os.path.basename(gen).startswith("gen-")
    assert mj.index().count() == e.count()
    # superseded generations were NOT gc'd (VACUUM is separate)
    assert any(
        d.startswith("ingest_batch=") or d.startswith("gen-")
        for d in os.listdir(index_root)
    )


def test_cdc_deletes_and_upserts(spark, tmp_path):
    """CDC-mode maintenance (op column): deletes leave service at the
    next probe, an upsert SUPERSEDES the id's older encoding (A3:
    update = delete(before)+replace(after)), delete+upsert of the same
    id in one batch resolves to the upsert, replay is a no-op,
    compaction applies tombstones physically and drops the sidecar, a
    pure-delete batch writes only tombstones yet still advances the
    compaction watermark, and a deleted id can be revived."""
    from dtle_spark.streaming.ann_serving import (
        _TOMBSTONES,
        _ingest_batches,
        compact_index,
        read_tombstones,
        resolve_index_path,
    )

    e = _embeddings(spark)
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent, cb
    )

    # batch 0: the whole corpus as upserts
    mj.apply_batch(e.withColumn("op", F.lit("upsert")), 0)
    n = e.count()
    assert read_tombstones(spark, index_root).count() == n
    assert mj.live_index().count() == n

    # batch 1: delete ids %7, upsert ids %11 with a CHANGED embedding
    # (ids %77 appear as BOTH ops in the batch -> the upsert wins)
    dels = e.filter(F.col("vec_id") % 7 == 0)
    ups = e.filter(F.col("vec_id") % 11 == 0).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    mj.apply_batch(
        dels.withColumn("op", F.lit("delete"))
        .unionByName(ups.withColumn("op", F.lit("upsert"))),
        1,
    )
    current = (
        e.filter((F.col("vec_id") % 7 != 0) & (F.col("vec_id") % 11 != 0))
        .unionByName(ups)
        .localCheckpoint()
    )
    assert mj.live_index().count() == current.count()
    # physically the dead versions are still there (merge-on-read)
    assert mj.index().count() == n + ups.count()

    q = e.filter(F.col("vec_id") % 53 == 0)
    sj = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, **PQ,
    )
    sj.apply_batch(q, 0)
    served0 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 0).collect()
    }
    assert served0 == _topk_map(_inline(current, q, cent, cb))

    # replayed CDC batch overwrites its own subtrees — nothing changes
    mj.apply_batch(
        dels.withColumn("op", F.lit("delete"))
        .unionByName(ups.withColumn("op", F.lit("upsert"))),
        1,
    )
    assert mj.live_index().count() == current.count()

    # compaction applies tombstones PHYSICALLY and drops the sidecar
    # (folded count spans index subtrees AND tombstone subtrees: 2 + 2)
    assert compact_index(spark, index_root, max_batches=1, gc_previous=True) == 4
    gen1 = resolve_index_path(index_root)
    assert read_tombstones(spark, gen1) is None
    assert mj.index().count() == current.count()
    sj.apply_batch(q, 1)
    served1 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 1).collect()
    }
    assert served1 == served0

    # pure-delete batch: tombstones only, no index subtree
    late_dels = current.limit(5).localCheckpoint()
    mj.apply_batch(late_dels.withColumn("op", F.lit("delete")), 2)
    assert not os.path.exists(os.path.join(gen1, "ingest_batch=2"))
    assert _ingest_batches(os.path.join(gen1, _TOMBSTONES)) == ["ingest_batch=2"]
    assert mj.live_index().count() == current.count() - 5
    sj.apply_batch(q, 2)
    served2 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 2).collect()
    }
    current2 = current.join(
        late_dels.select("vec_id"), "vec_id", "left_anti"
    ).localCheckpoint()
    assert served2 == _topk_map(_inline(current2, q, cent, cb))

    # the trailing pure-delete batch still advances the watermark: after
    # a second compaction its replay must stay a no-op (1 index + 1
    # tombstone subtree folded)
    assert compact_index(spark, index_root, max_batches=0, gc_previous=True) == 2
    gen2 = resolve_index_path(index_root)
    assert mj.index().count() == current2.count()
    mj.apply_batch(late_dels.withColumn("op", F.lit("delete")), 2)  # replay
    assert read_tombstones(spark, gen2) is None  # skipped via watermark
    assert mj.live_index().count() == current2.count()

    # revive: a deleted id re-ingested later is served again
    revived = late_dels.limit(1)
    mj.apply_batch(revived.withColumn("op", F.lit("upsert")), 3)
    assert mj.live_index().count() == current2.count() + 1
    sj.apply_batch(q, 3)
    served3 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 3).collect()
    }
    assert served3 == _topk_map(
        _inline(current2.unionByName(revived), q, cent, cb)
    )

    # a NULL op is a plain INSERT: the row must be indexed, not
    # tombstoned-without-replacement (the != 'delete' footgun)
    null_ops = e.limit(3).select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding",
        F.lit(None).cast("string").alias("op"),
    )
    mj.apply_batch(null_ops, 4)
    assert mj.live_index().count() == current2.count() + 1 + 3


def test_reindex_model_refresh(spark, tmp_path):
    """reindex() answers model drift: the corpus is re-encoded under a
    RETRAINED model into a fresh generation behind the same atomic
    pointer swap. Jobs holding the superseded model fail LOUDLY at
    their next batch (generation model stamp); new jobs built on the
    retrained model serve results equal to the inline tier under that
    model; replays of pre-reindex batches stay no-ops."""
    import pytest

    from dtle_spark.streaming.ann_serving import (
        read_tombstones,
        reindex,
        resolve_index_path,
    )

    e = _embeddings(spark)
    cent_a, cb_a = _model(e)

    index_root = str(tmp_path / "index")
    mj_a = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent_a, cb_a
    )
    halves = [e.filter(F.col("vec_id") % 2 == i) for i in range(2)]
    mj_a.apply_batch(halves[0], 0)
    mj_a.apply_batch(halves[1], 1)

    # model B: retrained on the FULL current corpus (drift answer)
    cent_b = sim.ivf_exact_mean_centroids(e, k=16).localCheckpoint()
    cb_b = sim.pq_refine(
        e, sim.pq_codebook(e, m=8, ksub=16, means=cent_b), steps=2, m=8, ksub=16
    )
    new_gen = reindex(spark, index_root, e, cent_b, cb_b, gc_previous=True)
    assert resolve_index_path(index_root) == new_gen
    assert read_tombstones(spark, new_gen) is None
    assert mj_a.index().count() == e.count()

    # the old-model jobs hit the stamp, loudly
    with pytest.raises(ValueError, match="model fingerprint mismatch"):
        mj_a.apply_batch(halves[0].limit(5), 2)
    sj_a = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "ra"),
        str(tmp_path / "sa"), cent_a, cb_a, **PQ,
    )
    q = e.filter(F.col("vec_id") % 53 == 0)
    with pytest.raises(ValueError, match="model fingerprint mismatch"):
        sj_a.apply_batch(q, 0)

    # a successor job must RESUME the original checkpoint — batch ids
    # from a fresh checkpoint restart at 0 and are meaningless against
    # the carried watermark, so that construction fails loudly
    mj_fresh = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mckb"), cent_b, cb_b
    )
    with pytest.raises(ValueError, match="checkpoint mismatch"):
        mj_fresh.apply_batch(halves[0], 0)

    # replay of a pre-reindex batch is a no-op for the successor job on
    # the SAME checkpoint (the carried watermark short-circuits it)
    mj_b = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent_b, cb_b
    )
    mj_b.apply_batch(halves[0], 1)
    assert mj_b.index().count() == e.count()

    # new-model ingest + serving == inline tier under model B
    extra = e.limit(50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    mj_b.apply_batch(extra, 2)
    full = e.unionByName(extra)
    assert mj_b.index().count() == full.count()
    sj_b = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "rb"),
        str(tmp_path / "sb"), cent_b, cb_b, **PQ,
    )
    sj_b.apply_batch(q, 0)
    assert _topk_map(sj_b.results()) == _topk_map(
        sim.ivf_pq_topk(
            full, q, k=PQ["k"], nprobe=PQ["nprobe"], n_cells=16, m=PQ["m"],
            ksub=PQ["ksub"], centroids=cent_b, codebook=cb_b,
        )
    )


def test_occupancy_drift_fires_needs_reindex(spark, tmp_path):
    """VERDICT r14 #1: the measured retrain rule (SCALE_RECALL.json —
    recall holds while occupancy stays near the model's build-time
    density; retrain when it drifts ~3x) is WIRED, not advisory. The
    maintainer records rows/cell per generation, raises needs_reindex
    when occupancy exceeds the configurable multiple of the build-time
    target, persists the target so restarts keep the signal, and a
    reindex() (which stamps the retrained generation with ITS corpus
    density) clears it."""
    from dtle_spark.streaming.ann_serving import (
        _read_occ_target,
        reindex,
        resolve_index_path,
    )

    e = _embeddings(spark)
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    ck = str(tmp_path / "mck")

    # no build-time target from any source: occupancy reports, but the
    # signal is None (unknown) — never a silent "healthy"
    b0 = e.filter(F.col("vec_id") % 4 == 0)
    mj0 = VectorIndexMaintainJob(spark, "unused", index_root, ck, cent, cb)
    mj0.apply_batch(b0, 0)
    occ0 = mj0.occupancy()
    assert occ0["needs_reindex"] is None
    assert occ0["occupancy_target"] is None
    assert occ0["live_rows"] == b0.count()
    assert occ0["n_cells"] == 16

    # declare the build-time density (training draw = b0): ratio ~1.0
    target = b0.count() / 16
    mj1 = VectorIndexMaintainJob(
        spark, "unused", index_root, ck, cent, cb,
        target_rows_per_cell=target,
    )
    rest = e.filter(F.col("vec_id") % 4 != 0)
    mj1.apply_batch(rest.limit(1), 1)  # stamp round persists the target
    assert _read_occ_target(resolve_index_path(index_root)) == target
    # grow the corpus past 3x the build-time density: 4x fires
    mj1.apply_batch(rest, 2)
    occ1 = mj1.stats()  # occupancy surfaces through stats -> HTTP
    assert occ1["occupancy_ratio"] > 3.0
    assert occ1["needs_reindex"] is True

    # restart WITHOUT the ctor arg: the persisted target keeps the
    # signal (the generation is self-describing, like its model)
    mj2 = VectorIndexMaintainJob(spark, "unused", index_root, ck)
    assert mj2.occupancy()["needs_reindex"] is True

    # reindex on the current corpus records the retrained build-time
    # density (corpus rows / cells) -> ratio returns to ~1, signal off
    reindex(spark, index_root, e, cent, cb)
    mj3 = VectorIndexMaintainJob(spark, "unused", index_root, ck)
    occ3 = mj3.occupancy()
    assert 0.9 <= occ3["occupancy_ratio"] <= 1.1
    assert occ3["needs_reindex"] is False


def test_filtered_serving_with_carry_cols(spark, tmp_path):
    """A maintain job with carry_cols writes metadata into the index;
    a serving job with a where predicate returns top-k among matching
    rows only (== inline tier over the pre-filtered corpus), and
    compaction PRESERVES carried columns so the filtered service is
    identical afterwards."""
    from dtle_spark.streaming.ann_serving import compact_index

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding", "label"
    )
    cent, cb = _model(e.select("vec_id", "embedding"))
    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent, cb,
        carry_cols=("label",),
    )
    parts = [e.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    for i, p in enumerate(parts):
        mj.apply_batch(p, i)

    q = e.filter(F.col("vec_id") % 53 == 0).select("vec_id", "embedding")
    pred = F.col("label") < 3
    sj = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, where=pred, **PQ,
    )
    sj.apply_batch(q, 0)
    want = _topk_map(_inline(e.filter(pred).select("vec_id", "embedding"),
                             q, cent, cb))
    got0 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 0).collect()
    }
    assert got0 == want and len(got0) > 0

    # compaction keeps the carried column -> identical filtered service
    assert compact_index(spark, index_root, max_batches=1, gc_previous=True) == 3
    assert "label" in mj.index().columns
    sj.apply_batch(q, 1)
    got1 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in sj.results().filter(F.col("__serve_batch") == 1).collect()
    }
    assert got1 == want


def test_manager_vector_jobs_lifecycle_and_recover(spark, tmp_path):
    """Vector jobs under the SAME control plane as replication jobs:
    JobManager create/list/metrics/pause/resume/position/delete plus
    recover() on a fresh manager — the model reloads from the
    generation's persisted copy (save_model at create), never from
    memory, and recovered jobs resume their checkpoints."""
    from dtle_spark.streaming.jobs import JobManager

    e = _embeddings(spark)
    cent, cb = _model(e)
    spec_root = str(tmp_path / "specs")
    index_root = str(tmp_path / "index")
    results_root = str(tmp_path / "results")
    vsrc, qsrc = str(tmp_path / "vecs"), str(tmp_path / "queries")
    os.makedirs(vsrc)
    os.makedirs(qsrc)
    half0 = e.filter(F.col("vec_id") % 2 == 0)
    half0.coalesce(1).write.parquet(os.path.join(vsrc, "b0"))
    q = e.filter(F.col("vec_id") % 53 == 0)
    q.coalesce(1).write.parquet(os.path.join(qsrc, "q0"))

    mgr = JobManager(spark, spec_root=spec_root)
    mj = mgr.create_vector_maintain(
        "vec-maintain", os.path.join(vsrc, "*"), index_root,
        str(tmp_path / "mck"), cent, cb,
    )
    mj.process_available()
    assert mj.index().count() == half0.count()
    # serving constructed WITHOUT model tables: loads the persisted one
    sj = mgr.create_ann_serving(
        "ann-serve", os.path.join(qsrc, "*"), index_root, results_root,
        str(tmp_path / "sck"), **PQ,
    )
    sj.process_available()
    assert _topk_map(sj.results()) == _topk_map(_inline(half0, q, cent, cb))

    st = mgr.list()
    assert st["vec-maintain"]["type"] == "vector_maintain"
    assert st["ann-serve"]["type"] == "ann_serving"
    # the occupancy-drift signal rides the same stats surface the HTTP
    # /v2/jobs and /v2/job/<name> routes serialize (VERDICT r14 #1) —
    # None here because no build-time target was declared or persisted
    assert st["vec-maintain"]["needs_reindex"] is None
    assert st["vec-maintain"]["rows_per_cell"] > 0
    assert mgr.position("vec-maintain")["max_ingest_batch"] == 0
    assert mgr.metrics("ann-serve")["__serve_batch"] == 0
    mgr.pause("ann-serve")
    assert not mgr.get("ann-serve").stats()["active"]
    mgr.resume("ann-serve")

    # fresh manager: recover restores both jobs from specs alone
    mgr.pause("vec-maintain")
    mgr.pause("ann-serve")
    mgr2 = JobManager(spark, spec_root=spec_root)
    assert sorted(mgr2.recover(start=False)) == ["ann-serve", "vec-maintain"]

    # recovered jobs resume their checkpoints: only NEW files process
    half1 = e.filter(F.col("vec_id") % 2 == 1)
    half1.coalesce(1).write.parquet(os.path.join(vsrc, "b1"))
    q.coalesce(1).write.parquet(os.path.join(qsrc, "q1"))
    mgr2.resume("vec-maintain")
    mgr2.get("vec-maintain").process_available()
    assert mgr2.get("vec-maintain").index().count() == e.count()
    assert mgr2.position("vec-maintain")["max_ingest_batch"] == 1
    mgr2.resume("ann-serve")
    mgr2.get("ann-serve").process_available()
    res = mgr2.get("ann-serve").results()
    got1 = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in res.filter(F.col("__serve_batch") == 1).collect()
    }
    assert got1 == _topk_map(_inline(e, q, cent, cb))

    # delete = stop + deregister + spec removal
    mgr2.delete("ann-serve")
    assert "ann-serve" not in mgr2.list()
    assert not os.path.exists(os.path.join(spec_root, "ann-serve.json"))

    # a manager WITHOUT persistence must accept non-serializable kwargs
    # (nothing round-trips) — e.g. the rerank corpus callable
    mgr3 = JobManager(spark)
    mgr3.create_ann_serving(
        "rr", os.path.join(qsrc, "*"), index_root,
        str(tmp_path / "rrres"), str(tmp_path / "rrck"),
        rerank=20, vectors=lambda: e, start=False, **PQ,
    )
    assert mgr3.get("rr").rerank == 20


def test_cdc_random_script_matches_dict_replay(spark, tmp_path):
    """Randomized (seeded) op scripts: a sequence of upsert/delete
    batches with interleaved compactions must leave the live index
    EQUAL to a plain last-op-wins dict replay — the generalization of
    the handwritten delete/upsert/revive scenarios. Catches ordering
    rules the examples can't sweep (tombstone vs ingest_batch
    comparisons across compaction watermark resets)."""
    import random

    from dtle_spark.streaming.ann_serving import compact_index

    e = _embeddings(spark).limit(200).localCheckpoint()
    cent, cb = _model(e)
    base = {r["vec_id"]: r["embedding"] for r in e.collect()}
    ids = sorted(base)

    for seed in (7, 23):
        rng = random.Random(seed)
        index_root = str(tmp_path / f"index{seed}")
        mj = VectorIndexMaintainJob(
            spark, "unused", index_root, str(tmp_path / f"ck{seed}"),
            cent, cb,
        )
        live: dict[int, int] = {}  # id -> batch of last upsert
        for batch_id in range(6):
            ups = rng.sample(ids, rng.randint(5, 40))
            dels = rng.sample(ids, rng.randint(5, 40))
            # same-batch overlap resolves to the upsert (A3 contract)
            updf = e.filter(F.col("vec_id").isin(ups)).withColumn(
                "op", F.lit("upsert")
            )
            dedf = e.filter(F.col("vec_id").isin(dels)).withColumn(
                "op", F.lit("delete")
            )
            mj.apply_batch(dedf.unionByName(updf), batch_id)
            for i in dels:
                live.pop(i, None)
            for i in ups:
                live[i] = batch_id
            if rng.random() < 0.4:
                compact_index(spark, index_root, max_batches=1,
                              gc_previous=True)
            got = {r["id"] for r in mj.live_index().select("id").collect()}
            assert got == set(live), (seed, batch_id)


def test_wire_cdc_to_vector_index_e2e(spark, tmp_path):
    """The binlog as a vector-index feed: a CDC WIRE stream of an
    embeddings table (full insert batch, then a mixed
    update/delete/update-then-delete batch) flows through
    wire_to_vector_ops into the CDC maintain job via the reader +
    transform hooks; the served top-k equals the inline tier over the
    logically-current table — replication and vector serving joined
    end to end."""
    import json

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from dtle_spark.streaming.ann_serving import wire_to_vector_ops
    from dtle_spark.streaming.wire import WIRE_SCHEMA

    e = _embeddings(spark).limit(300).localCheckpoint()
    cent, cb = _model(e)
    row_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def wrow(seq, op, before=None, after=None):
        return Row(
            sid="ab12cd34-0000-1111-2222-333333333333", gno=seq, seq=seq,
            lc=0, op=op, ts=None, schema_name="db1", table_name="vecs",
            before=json.dumps(before) if before is not None else None,
            after=json.dumps(after) if after is not None else None,
            query=None,
        )

    def img(r, rev=False):
        emb = list(reversed(r["embedding"])) if rev else list(r["embedding"])
        return {"vec_id": r["vec_id"], "embedding": [float(x) for x in emb]}

    rows = e.collect()
    b0 = [wrow(i + 1, "i", after=img(r)) for i, r in enumerate(rows)]
    # batch 1: update ids %11 (reversed embedding), then delete ids %7
    # at HIGHER seqs — an id in both (%77) must resolve to the delete
    b1 = [
        wrow(1000 + r["vec_id"], "u", before=img(r), after=img(r, rev=True))
        for r in rows if r["vec_id"] % 11 == 0
    ] + [
        wrow(2000 + r["vec_id"], "d", before=img(r))
        for r in rows if r["vec_id"] % 7 == 0
    ]
    wsrc = str(tmp_path / "wire")
    os.makedirs(wsrc)
    spark.createDataFrame(b0, WIRE_SCHEMA).coalesce(1).write.parquet(
        os.path.join(wsrc, "b0"))
    spark.createDataFrame(b1, WIRE_SCHEMA).coalesce(1).write.parquet(
        os.path.join(wsrc, "b1"))

    index_root = str(tmp_path / "index")
    # direct hooks exercise the raw adapter path; the MANAGED leg below
    # uses the JSON wire_table descriptor instead
    mj = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent, cb,
        reader=lambda s: (
            s.readStream.schema(WIRE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(wsrc, "*"))
        ),
        transform=lambda b: wire_to_vector_ops(b, "db1", "vecs", row_schema),
    )
    mj.start()
    mj.process_available()

    current = (
        e.filter((F.col("vec_id") % 7 != 0) & (F.col("vec_id") % 11 != 0))
        .unionByName(
            e.filter((F.col("vec_id") % 11 == 0) & (F.col("vec_id") % 7 != 0))
            .select("vec_id", F.reverse("embedding").alias("embedding"))
        )
        .localCheckpoint()
    )
    assert mj.live_index().count() == current.count()

    q = e.filter(F.col("vec_id") % 53 == 0)
    sj = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, **PQ,
    )
    sj.apply_batch(q, 0)
    assert _topk_map(sj.results()) == _topk_map(_inline(current, q, cent, cb))

    # MANAGED + RECOVERABLE bridge: the same pipeline through a
    # JobManager wire_table descriptor (plain JSON — callables cannot
    # persist in a spec), then a fresh manager recovers it and drains
    # a THIRD wire batch of new inserts
    from dtle_spark.streaming.jobs import JobManager

    spec_root = str(tmp_path / "specs")
    mroot = str(tmp_path / "midx")
    wire_table = {
        "schema_name": "db1", "table_name": "vecs",
        "row_schema": "vec_id long, embedding array<float>",
    }
    mgr = JobManager(spark, spec_root=spec_root)
    wj = mgr.create_vector_maintain(
        "wire-vec", os.path.join(wsrc, "*"), mroot,
        str(tmp_path / "wck"), cent, cb, wire_table=wire_table,
    )
    wj.process_available()
    assert wj.live_index().count() == current.count()
    mgr.pause("wire-vec")

    extra = [
        wrow(3000 + i, "i",
             after={"vec_id": 900000 + i,
                    "embedding": img(rows[i])["embedding"]})
        for i in range(40)
    ]
    spark.createDataFrame(extra, WIRE_SCHEMA).coalesce(1).write.parquet(
        os.path.join(wsrc, "b2"))
    mgr2 = JobManager(spark, spec_root=spec_root)
    assert mgr2.recover(start=False) == ["wire-vec"]
    mgr2.resume("wire-vec")
    mgr2.get("wire-vec").process_available()
    assert mgr2.get("wire-vec").live_index().count() == current.count() + 40


def test_serving_rejects_unusable_models(spark, tmp_path):
    """Stale-model failures happen at JOB CONSTRUCTION, not per-batch
    mid-stream: a gapped codebook and a rerank request without the fp32
    corpus are both rejected before any stream starts."""
    import pytest

    e = _embeddings(spark)
    cent, cb = _model(e)
    args = (
        spark, str(tmp_path / "q"), str(tmp_path / "i"),
        str(tmp_path / "r"), str(tmp_path / "c"),
    )
    with pytest.raises(ValueError, match="codebook"):
        AnnServingJob(*args, cent, cb.filter("sub != 3"), **PQ)
    with pytest.raises(ValueError, match="vectors"):
        AnnServingJob(*args, cent, cb, rerank=50, **PQ)
    with pytest.raises(ValueError, match="callable"):
        AnnServingJob(*args, cent, cb, rerank=50, vectors=e, **PQ)
    with pytest.raises(ValueError, match="codebook"):
        VectorIndexMaintainJob(*args[:4], cent, cb.filter("code != 7"))


def test_pk_changing_update_tombstones_old_id(spark):
    """r8 ADVICE medium: an update whose BEFORE and AFTER ids differ
    is the full A3 pair — delete(before id) + upsert(after id). Keying
    only on the after image left the stale vector served under the old
    id forever. Same-id updates still emit exactly one upsert, and a
    later same-batch re-insert of the vacated id wins the per-id
    latest-seq collapse."""
    import json

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from dtle_spark.streaming.ann_serving import wire_to_vector_ops
    from dtle_spark.streaming.wire import WIRE_SCHEMA

    row_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def wrow(seq, op, before=None, after=None):
        return Row(
            sid="ab12cd34-0000-1111-2222-333333333333", gno=seq, seq=seq,
            lc=0, op=op, ts=None, schema_name="db1", table_name="vecs",
            before=json.dumps(before) if before is not None else None,
            after=json.dumps(after) if after is not None else None,
            query=None,
        )

    def img(i, v):
        return {"vec_id": i, "embedding": [float(v), 0.0]}

    batch = spark.createDataFrame([
        # PK-changing update: 1 -> 2
        wrow(10, "u", before=img(1, 1.0), after=img(2, 2.0)),
        # same-id update: 3 stays 3 (no synthesized delete)
        wrow(11, "u", before=img(3, 3.0), after=img(3, 3.5)),
        # PK-change 4 -> 5 then re-insert of the vacated id 4 at a
        # HIGHER seq: the collapse must keep the upsert, not the
        # synthesized delete
        wrow(12, "u", before=img(4, 4.0), after=img(5, 5.0)),
        wrow(13, "i", after=img(4, 4.5)),
    ], WIRE_SCHEMA)
    ops = {
        r["vec_id"]: r["op"]
        for r in wire_to_vector_ops(batch, "db1", "vecs", row_schema).collect()
    }
    assert ops == {
        1: "delete",   # the vacated id is tombstoned
        2: "upsert",
        3: "upsert",   # same-id update: upsert only
        4: "upsert",   # re-insert outranks the synthesized delete
        5: "upsert",
    }


def test_compact_all_deleted_index_stays_servable(spark, tmp_path):
    """r8 ADVICE low: compacting a fully-deleted index produces a
    generation with zero parquet data files. The _SCHEMA sidecar +
    read_index fallback keep every reader working: live_index() is
    EMPTY (not an error), a serve batch commits zero rows and its
    watermark, and the next maintain batch revives the index."""
    from dtle_spark.streaming.ann_serving import (
        CDC_VECTOR_SCHEMA,
        compact_index,
    )

    e = _embeddings(spark).limit(300).localCheckpoint()
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, str(tmp_path / "src"), index_root, str(tmp_path / "mck"),
        cent, cb, schema=CDC_VECTOR_SCHEMA,
    )
    mj.apply_batch(e.withColumn("op", F.lit("upsert")), 0)
    mj.apply_batch(e.withColumn("op", F.lit("delete")), 1)
    assert compact_index(spark, index_root, max_batches=0,
                         gc_previous=True) == 3  # 2 index + 1 tombstone
    # all three readers survive the file-less generation
    assert mj.live_index().count() == 0
    assert mj.index().count() == 0
    q = e.limit(5)
    sj = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, **PQ,
    )
    sj.apply_batch(q, 0)
    assert sj.results().count() == 0
    assert sj.position()["__serve_batch"] == 0  # watermark committed
    # new data revives the SAME generation: maintain, then serve again
    revived = e.limit(40).withColumn("op", F.lit("upsert")).localCheckpoint()
    mj.apply_batch(revived, 4)
    assert mj.live_index().count() == 40
    sj.apply_batch(q, 1)
    served = sj.results().filter(F.col("__serve_batch") == 1)
    inline = _inline(revived.drop("op"), q, cent, cb)
    assert _topk_map(served) == _topk_map(inline)


def test_zero_norm_query_yields_no_rows(spark, tmp_path):
    """r8 ADVICE low: a zero-norm query vector used to score 0/0 = NaN
    against every candidate, and NaN sorts ABOVE all doubles
    descending — the query got an arbitrary top-k. The probe stage now
    drops zero-norm queries (matching the inline tiers' both-sides
    norm filter); real queries in the same batch are unaffected."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    e = _embeddings(spark).limit(200).localCheckpoint()
    cent, cb = _model(e)
    index_root = str(tmp_path / "index")
    mj = VectorIndexMaintainJob(
        spark, "unused", index_root, str(tmp_path / "mck"), cent, cb,
    )
    mj.apply_batch(e, 0)
    dim = len(e.first()["embedding"])
    qschema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    queries = spark.createDataFrame(
        [Row(vec_id=777777, embedding=[0.0] * dim)], qschema
    ).unionByName(e.limit(3))
    sj = AnnServingJob(
        spark, "unused", index_root, str(tmp_path / "results"),
        str(tmp_path / "sck"), cent, cb, **PQ,
    )
    sj.apply_batch(queries, 0)
    res = sj.results()
    assert res.filter(F.col("query_id") == 777777).count() == 0
    assert res.select("query_id").distinct().count() == 3
    assert not any(
        r["qcos"] != r["qcos"] for r in res.collect()  # no NaN scores
    )
