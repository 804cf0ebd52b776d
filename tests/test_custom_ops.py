"""Edge cases for the custom operators (as-of, range join, connected
components) + the F-2-style type-matrix wire round trip."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dtle_spark.functions.graph import connected_components
from dtle_spark.operators.asof import asof_join_backward, range_join_bucketed
from dtle_spark.streaming.wire import from_wire, to_wire


class TestAsof:
    def test_backward_match_tie_and_miss(self, spark):
        left = spark.createDataFrame(
            [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")], "k long, ts long, name string"
        )
        right = spark.createDataFrame(
            [(1, 10, "c1"), (1, 15, "c2"), (1, 25, "c3")], "k long, ts long, tag string"
        )
        out = {r["name"]: r["r_tag"] for r in
               asof_join_backward(left, right, key="k", ts="ts").collect()}
        # tie (ts=10) matches; 20 takes latest<=20 (c2); key 2 has no right -> null
        assert out == {"p1": "c1", "p2": "c2", "p3": None}


class TestRangeJoin:
    def test_boundaries_half_open(self, spark):
        facts = spark.createDataFrame([(0.0,), (24.99,), (25.0,), (399.0,), (400.0,)], "value double")
        iv = spark.createDataFrame(
            [("a", 0.0, 25.0), ("b", 25.0, 400.0)], "tier string, lo double, hi double"
        )
        out = sorted(
            (r["value"], r["tier"]) for r in range_join_bucketed(facts, iv, "value").collect()
        )
        # 400.0 falls outside every interval (half-open hi)
        assert out == [(0.0, "a"), (24.99, "a"), (25.0, "b"), (399.0, "b")]


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        # chain 1-2-3-4 (diameter forces multiple rounds) + island 7-8
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (7, 8)], "id_1 long, id_2 long"
        )
        out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


TYPES_ROW = T.StructType(
    [
        T.StructField("c_long", T.LongType()),
        T.StructField("c_int", T.IntegerType()),
        T.StructField("c_short", T.ShortType()),
        T.StructField("c_byte", T.ByteType()),
        T.StructField("c_double", T.DoubleType()),
        T.StructField("c_float", T.FloatType()),
        T.StructField("c_dec", T.DecimalType(20, 0)),  # unsigned-bigint carrier
        T.StructField("c_str", T.StringType()),
        T.StructField("c_bin", T.BinaryType()),
        T.StructField("c_bool", T.BooleanType()),
        T.StructField("c_date", T.DateType()),
        T.StructField("c_ts", T.TimestampType()),
    ]
)


def test_type_matrix_wire_roundtrip(spark):
    """§1.3 fidelity: every mapped Spark type survives the JSON wire
    form (to_wire -> from_wire), including unsigned-bigint-as-decimal
    > int64 max, empty-string vs NULL, and binary."""
    from dtle_spark.model import change_schema

    row = {
        "c_long": -(2**62), "c_int": 2**31 - 1, "c_short": -32768, "c_byte": 127,
        "c_double": 1.5e300, "c_float": 2.5,
        "c_dec": Decimal(2**64 - 1),  # > int64: the bigint-unsigned edge
        "c_str": "", "c_bin": b"\x00\xff", "c_bool": True,
        "c_date": datetime(2024, 5, 1).date(), "c_ts": datetime(2024, 5, 1, 12, 30, 0, 123456),
    }
    null_row = {k: None for k in row}
    changes = spark.createDataFrame(
        [
            {"sid": "s", "gno": 1, "seq": 1, "lc": 0, "op": "i", "ts": None,
             "schema_name": "d", "table_name": "t", "before": None, "after": row, "query": None},
            {"sid": "s", "gno": 2, "seq": 2, "lc": 0, "op": "i", "ts": None,
             "schema_name": "d", "table_name": "t", "before": None, "after": null_row, "query": None},
        ],
        change_schema(TYPES_ROW),
    )
    back = from_wire(to_wire(changes), TYPES_ROW).orderBy("seq").collect()
    got = back[0]["after"].asDict()
    assert got == row
    assert all(v is None for v in back[1]["after"].asDict().values())


def test_mysql_type_map_covers_reference_enum():
    """§1.3: the 27-type MySQL enumeration (mysqlconfig/types.go:24-57)
    all resolve, with the documented widenings and edge rules."""
    from pyspark.sql import types as T

    from dtle_spark.model import mysql_type_to_spark

    cases = {
        "tinyint": T.ByteType(), "tinyint unsigned": T.ShortType(),
        "smallint": T.ShortType(), "smallint unsigned": T.IntegerType(),
        "mediumint": T.IntegerType(), "mediumint unsigned": T.IntegerType(),
        "int": T.IntegerType(), "int unsigned": T.LongType(),
        "bigint": T.LongType(), "bigint unsigned": T.DecimalType(20, 0),
        "float": T.FloatType(), "double": T.DoubleType(),
        "char": T.StringType(), "varchar": T.StringType(),
        "text": T.StringType(), "tinytext": T.StringType(),
        "binary": T.BinaryType(), "varbinary": T.BinaryType(),
        "blob": T.BinaryType(), "date": T.DateType(),
        "datetime": T.TimestampNTZType(), "timestamp": T.TimestampType(),
        "time": T.LongType(), "year": T.IntegerType(),
        "enum": T.StringType(), "set": T.StringType(), "json": T.StringType(),
    }
    for name, expected in cases.items():
        assert mysql_type_to_spark(name) == expected, name
    assert mysql_type_to_spark("decimal", 18, 4) == T.DecimalType(18, 4)
    assert mysql_type_to_spark("bit", 1) == T.BooleanType()
    assert mysql_type_to_spark("bit", 17) == T.BinaryType()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mysql_type_to_spark("geometry")


class TestSimhashChunkBucketing:
    def test_pairs_match_bruteforce_within_guarantee(self, spark):
        """6x10-bit pigeonhole is EXACT for hamming distance <= 5: the
        bucketed join must find the identical pair set a full cross
        join finds (sf0.001 documents corpus)."""
        from dtle_spark.functions.dedup import simhash_near_pairs, simhash_signatures

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        got = sorted(
            (r["id_1"], r["id_2"], r["distance"])
            for r in simhash_near_pairs(docs, "doc_id", "text", max_distance=5).collect()
        )
        s = simhash_signatures(docs, "doc_id", "text")
        a = s.select(F.col("doc_id").alias("id_1"), F.col("simhash").alias("sh_1"))
        b = s.select(F.col("doc_id").alias("id_2"), F.col("simhash").alias("sh_2"))
        brute = sorted(
            (r["id_1"], r["id_2"], r["distance"])
            for r in a.join(b, F.col("id_1") < F.col("id_2"))
            .withColumn("distance", F.expr("bit_count(sh_1 ^ sh_2)"))
            .filter("distance <= 5")
            .collect()
        )
        assert got == brute and len(brute) > 0

    def test_distance_beyond_guarantee_rejected(self, spark):
        from dtle_spark.functions.dedup import simhash_near_pairs

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with pytest.raises(ValueError, match="chunks"):
            simhash_near_pairs(docs, "doc_id", "text", max_distance=6)


class TestMinhashBucketCap:
    def test_hot_bucket_dropped(self, spark):
        """A boilerplate cluster larger than the cap must not produce
        O(k^2) candidates: every band bucket of the identical docs is
        hot, so the capped join drops them all (exact dedup upstream is
        the designed catch for full duplicates)."""
        from dtle_spark.functions.dedup import minhash_dedup_pairs

        boiler = [(i, "the same boilerplate legal disclaimer text repeated verbatim "
                      "across every document in this hot cluster") for i in range(80)]
        distinct = [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                    (101, "alpha beta gamma delta epsilon zeta eta theta iota lambda")]
        docs = spark.createDataFrame(boiler + distinct, "doc_id long, text string")
        out = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5, max_bucket=64)
        pairs = {(r["id_1"], r["id_2"]) for r in out.collect()}
        assert (100, 101) in pairs
        assert not any(i < 80 and j < 80 for i, j in pairs)
        # with the cap lifted the hot cluster floods back in
        flood = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5, max_bucket=10**6)
        assert flood.count() >= 80 * 79 // 2


class TestIvfTopk:
    def test_ivf_recall_against_bruteforce(self, spark):
        """IVF probing 8 of ~20 cells must recover most exact top-5
        neighbors. The fixture embeddings are isotropic-random (no
        cluster structure — measured), so recall ~= probed fraction;
        0.5 at a 0.4 probe fraction is the honest bar."""
        from dtle_spark.functions.similarity import brute_force_topk, ivf_topk

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") % 50 == 0)
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in brute_force_topk(e, q, k=5).collect()}
        approx = {(r["query_id"], r["neighbor_id"])
                  for r in ivf_topk(e, q, k=5, nprobe=8, centroid_stride=25).collect()}
        assert len(approx & exact) / len(exact) >= 0.5
        # every reported neighbor carries its true cosine rank ordering
        by_q = {}
        for r in ivf_topk(e, q, k=5, nprobe=8, centroid_stride=25).collect():
            by_q.setdefault(r["query_id"], []).append((r["rnk"] if "rnk" in r else r["rank"], r["cosine"]))
        for ranks in by_q.values():
            ordered = sorted(ranks)
            assert all(ordered[i][1] >= ordered[i + 1][1] for i in range(len(ordered) - 1))

    def test_ivf_plan_is_corpus_shuffle_free(self, spark):
        """The assignment stage must not shuffle the corpus: no Exchange
        between the embeddings scan and the cell assignment (broadcast
        centroid array + array_max fold)."""
        from dtle_spark.functions.similarity import ivf_topk

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") % 50 == 0)
        plan = ivf_topk(e, q, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan
        # the only hash shuffles allowed are the tiny windowed stages
        # (query probing / final top-k), both keyed by query_id
        import re
        hash_exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
        assert all(x.startswith("query_id") for x in hash_exchanges), hash_exchanges


class TestCorpusAssembly:
    def test_pack_sequences_invariants(self, spark):
        """Packing is a permutation of the corpus; offsets advance by
        n_tokens within a partition; bin ids are contiguous from 0."""
        from dtle_spark.functions.corpus import pack_sequences

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = pack_sequences(docs, budget=1024).collect()
        assert len(out) == docs.count()
        by_part = {}
        for r in out:
            by_part.setdefault(r["part"], []).append(r)
        for rows in by_part.values():
            rows.sort(key=lambda r: r["id"])
            cum = 0
            for r in rows:
                assert r["bin"] == cum // 1024 and r["bin_offset"] == cum % 1024
                cum += r["n_tokens"]

    def test_stratified_sample_deterministic_and_proportional(self, spark):
        from dtle_spark.functions.corpus import stratified_sample

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        rates = {"en": (1, 2), "de": (1, 4)}
        a = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, rates).collect()}
        assert a == b  # same draw every run
        langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
        n_en = sum(1 for d, l in langs.items() if l == "en")
        k_en = sum(1 for d in a if langs[d] == "en")
        assert abs(k_en / n_en - 0.5) < 0.15
        assert not any(langs[d] not in rates for d in a)  # default rate 0 drops others
        # growth stability: sampling a subset picks exactly the subset's survivors
        half = docs.filter("doc_id % 2 = 0")
        c = {r["doc_id"] for r in stratified_sample(half, rates).collect()}
        assert c == {d for d in a if d % 2 == 0}


class TestTrainedIvf:
    def test_train_and_search(self, spark):
        """Lloyd refinement: centroid table stays well-formed (unit
        directions, contiguous ids), the k-means objective (mean best
        cosine to a centroid direction) does not degrade, and ivf_topk
        accepts the trained table."""
        from dtle_spark.functions.similarity import (
            cosine_expr, ivf_topk, train_centroids,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

        def objective(cent):
            v = e.selectExpr("embedding AS vec")
            arr = cent.agg(F.expr(
                "sort_array(collect_list(struct(cent_id, c_vec)))").alias("cents"))
            from dtle_spark.functions.similarity import dot_expr
            score = (f"({dot_expr('vec', 'c.c_vec')}) / "
                     f"(sqrt({dot_expr('vec', 'vec')}) * sqrt({dot_expr('c.c_vec', 'c.c_vec')}))")
            best = f"array_max(transform(cents, c -> {score}))"
            return v.crossJoin(F.broadcast(arr)).selectExpr(f"{best} AS b") \
                    .agg(F.avg("b")).collect()[0][0]

        init = e.filter("vec_id % 25 = 1").selectExpr(
            "vec_id AS cent_id", "embedding AS c_vec")
        trained = train_centroids(e, iters=2).localCheckpoint()
        rows = trained.collect()
        assert 0 < len(rows) <= 20
        assert sorted(r["cent_id"] for r in rows) == list(range(len(rows)))
        for r in rows:
            n = sum(x * x for x in r["c_vec"])
            assert abs(n - 1.0) < 1e-3  # unit direction
        assert objective(trained) >= objective(init) - 1e-9
        out = ivf_topk(e, e.filter("vec_id % 50 = 0"), k=5, nprobe=8,
                       centroids=trained).collect()
        assert len(out) > 0 and all(r["rank"] <= 5 for r in out)

    def test_exact_mean_centroids_recall_and_full_probe_exactness(self, spark):
        """The oracle-gated trained path (ivf_exact_mean_centroids, one
        integer-exact Lloyd step): probing ALL k cells must reproduce
        brute-force exactly (recall 1.0 — partitioning is lossless when
        fully probed), and a half probe keeps recall >= the probed
        fraction on isotropic fixtures."""
        from dtle_spark.functions.similarity import (
            brute_force_topk, ivf_exact_mean_centroids, ivf_topk,
        )

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") % 50 == 0)
        cent = ivf_exact_mean_centroids(e, k=16).localCheckpoint()
        assert cent.count() == 16

        exact = {(r["query_id"], r["neighbor_id"])
                 for r in brute_force_topk(e, q, k=5).collect()}
        full = {(r["query_id"], r["neighbor_id"])
                for r in ivf_topk(e, q, k=5, nprobe=16, centroids=cent).collect()}
        assert full == exact  # all cells probed == exact search

        half = {(r["query_id"], r["neighbor_id"])
                for r in ivf_topk(e, q, k=5, nprobe=8, centroids=cent).collect()}
        assert len(half & exact) / len(exact) >= 0.5


class TestSourceMixing:
    def test_thresholds_exact_and_deterministic(self, spark):
        from dtle_spark.functions.corpus import source_mixing

        rows = [(i, f"s{i % 4}") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        # s0 target 5% of total (pool is 25%) -> keep ~20%; s1 target 50%
        # (pool 25%) -> implied rate 2 > 1 keeps ALL; s2/s3 absent -> dropped
        out = source_mixing(df, {"s0": (1, 20), "s1": (1, 2)})
        got = out.groupBy("source").count().collect()
        by_src = {r["source"]: r["count"] for r in got}
        assert set(by_src) == {"s0", "s1"}
        assert by_src["s1"] == 100  # rate > 1 keeps every row
        assert 0 < by_src["s0"] < 100  # genuinely downsampled
        # deterministic: same ids survive on re-run
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(r["doc_id"] for r in source_mixing(df, {"s0": (1, 20), "s1": (1, 2)}).collect())
        assert a == b

    def test_growth_stability(self, spark):
        # a kept id stays kept when the corpus grows proportionally
        # (same per-id draw; thresholds move only with the mix)
        from dtle_spark.functions.corpus import source_mixing

        small = spark.createDataFrame([(i, "s0") for i in range(100)], "doc_id long, source string")
        big = spark.createDataFrame([(i, "s0") for i in range(200)], "doc_id long, source string")
        kept_small = {r["doc_id"] for r in source_mixing(small, {"s0": (1, 10)}).collect()}
        kept_big = {r["doc_id"] for r in source_mixing(big, {"s0": (1, 10)}).collect()}
        # single-source corpus: rate = total/n = 1/10 either way -> identical draws
        assert kept_small == {i for i in kept_big if i < 100}


class TestStripBoilerplate:
    def test_boiler_removed_order_kept(self, spark):
        from dtle_spark.functions.corpus import strip_boilerplate

        boiler = "accept cookies"
        docs = [
            (1, f"{boiler}\nalpha\nbeta"),
            (2, f"gamma\n{boiler}\ndelta"),
            (3, f"{boiler}\nepsilon"),
            (4, "zeta\neta"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r["id"]: r for r in strip_boilerplate(df, min_docs=3).collect()}
        assert out[1]["clean_text"] == "alpha\nbeta"
        assert out[2]["clean_text"] == "gamma\ndelta"  # order preserved
        assert out[3]["clean_text"] == "epsilon"
        assert out[4]["clean_text"] == "zeta\neta"  # untouched
        assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)

    def test_fully_boiler_doc_survives_as_empty(self, spark):
        from dtle_spark.functions.corpus import strip_boilerplate

        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "x")], "doc_id long, text string"
        )
        out = {r["id"]: r for r in strip_boilerplate(df, min_docs=3).collect()}
        assert len(out) == 3  # no doc rows lost
        assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0


class TestGopherRules:
    def test_each_rule_boundary(self, spark):
        from dtle_spark.functions.textstats import gopher_flags

        good = "the quick brown fox jumps over the lazy dog and then " * 10
        short = "the cat is small"                    # < 50 words
        digits = " ".join(["1234"] * 60) + " the is"  # alpha ratio ~0
        longwords = " ".join(["pneumonoultramicroscopic"] * 60) + " the is"
        df = spark.createDataFrame(
            [(1, good), (2, short), (3, digits), (4, longwords)], "doc_id long, text string"
        )
        flags = gopher_flags(F.col("text"))
        out = {r["doc_id"]: r for r in df.select("doc_id", *[
            flags[k].alias(k) for k in ("n_words", "words_ok", "mean_len_ok", "alpha_ok", "stop_ok", "keep")
        ]).collect()}
        assert out[1]["keep"] is True
        assert out[2]["words_ok"] is False and out[2]["keep"] is False
        assert out[3]["alpha_ok"] is False and out[3]["keep"] is False
        assert out[4]["mean_len_ok"] is False and out[4]["keep"] is False


class TestQuantizedAnn:
    def test_quantize_bounds_and_recall(self, spark):
        from dtle_spark.functions.similarity import (
            brute_force_topk, quantize_int8, quantized_topk,
        )
        from dtle_spark.tableio import load_table

        sf = "/root/testdata/sf0.001"
        e = load_table(spark, sf, "embeddings")
        qz = quantize_int8(e)
        mx = qz.select(
            F.expr("max(array_max(transform(qvec, x -> abs(x))))").alias("m")
        ).collect()[0]["m"]
        assert mx == 127  # scale maps the max component to exactly +-127

        q = e.filter(F.col("vec_id") % 50 == 0)
        exact = brute_force_topk(e, q, k=10)
        approx = quantized_topk(e, q, k=10)
        ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.9, f"int8 recall {recall}"

    def test_quantized_cos_tracks_exact(self, spark):
        from dtle_spark.functions.similarity import brute_force_topk, quantized_topk
        from dtle_spark.tableio import load_table

        sf = "/root/testdata/sf0.001"
        e = load_table(spark, sf, "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
                 for r in brute_force_topk(e, q, k=10).collect()}
        approx = {(r["query_id"], r["neighbor_id"]): r["qcos"]
                  for r in quantized_topk(e, q, k=10).collect()}
        common = set(exact) & set(approx)
        assert common
        worst = max(abs(exact[p] - approx[p]) for p in common)
        assert worst < 0.05, f"max |cos - qcos| = {worst}"


class TestKmvSketch:
    def test_exact_below_k(self, spark):
        from dtle_spark.functions.sketches import kmv_distinct

        df = spark.createDataFrame([(i % 50,) for i in range(1000)], "x long")
        r = kmv_distinct(df, "x", k=256).collect()[0]
        assert r["got_k"] == 50 and r["kmv_estimate"] == 50.0  # exact when D < k

    def test_estimate_within_error_bound(self, spark):
        from dtle_spark.functions.sketches import kmv_distinct

        # 5000 distinct values, k=256 -> SE ~ 1/sqrt(254) ~ 6.3%
        df = spark.range(0, 5000).selectExpr("id * 7919 AS x")
        r = kmv_distinct(df, "x", k=256).collect()[0]
        err = abs(r["kmv_estimate"] - 5000) / 5000
        assert err < 0.25, f"kmv error {err:.3f}"

    def test_takeordered_not_global_sort(self, spark):
        """The k-minima must compile to TakeOrderedAndProject (per-
        partition heaps), never a full Sort+Exchange of the hashes."""
        from dtle_spark.functions.sketches import kmv_distinct

        df = spark.range(0, 10000).selectExpr("id AS x")
        inner = kmv_distinct(df, "x", k=64)
        plan = inner._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_merge_equals_whole_data_sketch(self, spark):
        """Sketch-of-parts merged == sketch-of-whole (mergeability)."""
        from dtle_spark.functions.sketches import kmv_distinct, kmv_merge, kmv_minima

        whole = spark.range(0, 4000).selectExpr("id * 104729 AS x")
        part1 = whole.filter("x % 3 != 0")
        part2 = whole.filter("x % 3 != 1")  # overlapping parts
        merged = kmv_merge(
            kmv_minima(part1, "x", k=128).unionByName(kmv_minima(part2, "x", k=128)),
            k=128,
        ).collect()[0]
        direct = kmv_distinct(part1.unionByName(part2), "x", k=128).collect()[0]
        assert merged.asDict() == direct.asDict()

    def test_grouped_merge_equals_whole_data_sketch(self, spark):
        """Per-group sketch-of-parts merged == grouped sketch-of-whole
        (the mergeability contract, per group), and each group's
        estimate matches the global-lane estimator on that group's
        rows alone."""
        from dtle_spark.functions.sketches import (
            kmv_distinct,
            kmv_distinct_grouped,
            kmv_merge_grouped,
            kmv_minima_grouped,
        )

        whole = spark.range(0, 6000).selectExpr(
            "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b'"
            " ELSE 'c' END AS g",
            "id * 104729 AS x",
        )
        a, b = whole.filter("id < 2500"), whole.filter("id >= 2000")  # overlap
        merged = {
            r["grp"]: (r["got_k"], r["kth_min"], r["kmv_estimate"])
            for r in kmv_merge_grouped(
                kmv_minima_grouped(a, "g", "x", k=64).unionByName(
                    kmv_minima_grouped(b, "g", "x", k=64)
                ),
                k=64,
            ).collect()
        }
        direct = {
            r["grp"]: (r["got_k"], r["kth_min"], r["kmv_estimate"])
            for r in kmv_distinct_grouped(whole, "g", "x", k=64).collect()
        }
        assert merged == direct and set(direct) == {"a", "b", "c"}
        solo = kmv_distinct(whole.filter("g = 'b'"), "x", k=64).collect()[0]
        assert direct["b"] == (
            solo["got_k"], solo["kth_min"], solo["kmv_estimate"]
        )

    def test_null_values_draw_no_minima_slot(self, spark):
        """NULL keys hash to NULL and must be excluded BEFORE the
        k-minima fold: Spark sorts NULLS FIRST (a NULL would occupy a
        slot and inflate got_k) while DuckDB sorts NULLS LAST — the
        filter keeps both engines' sketch state identical, and KMV
        estimates distinct NON-NULL like COUNT(DISTINCT)."""
        from dtle_spark.functions.sketches import kmv_distinct, kmv_minima

        df = spark.createDataFrame(
            [(None,)] * 5 + [(i,) for i in range(1, 11)], "x long"
        )
        r = kmv_distinct(df, "x", k=256).collect()[0]
        assert r["got_k"] == 10 and r["kmv_estimate"] == 10.0
        hvs = kmv_minima(df, "x", k=256).collect()[0]["hvs"]
        assert len(hvs) == 10 and all(h is not None for h in hvs)


class TestCmsSketch:
    def test_never_underestimates_and_bound(self, spark):
        """CMS point estimates are >= exact for EVERY key (min of
        counters that each include the key's true count), and over by
        at most eps*N with eps = e/width for most keys."""
        from dtle_spark.functions.sketches import cms_estimate, cms_sketch

        df = spark.range(0, 6000).selectExpr("id % 300 AS x")  # 20 each
        sk = cms_sketch(df, "x", depth=4, width=256)
        keys = spark.range(0, 300).selectExpr("id AS x")
        est = {r["key"]: r["est_cnt"]
               for r in cms_estimate(sk, keys, "x", depth=4, width=256).collect()}
        assert all(est[k] >= 20 for k in range(300))
        # N=6000, width=256 -> eps*N ~ 64; allow the loose bound
        assert sum(est.values()) / 300 < 20 + 64

    def test_absent_key_small_estimate(self, spark):
        from dtle_spark.functions.sketches import cms_estimate, cms_sketch

        df = spark.range(0, 2000).selectExpr("id % 100 AS x")
        sk = cms_sketch(df, "x", depth=4, width=512)
        ghost = spark.createDataFrame([(999999,)], "x long")
        [r] = cms_estimate(sk, ghost, "x", depth=4, width=512).collect()
        # min over 4 rows of collision mass only; never negative
        assert 0 <= r["est_cnt"] <= 2000 * 4 / 512

    def test_merge_equals_whole_data_sketch(self, spark):
        """Counters are additive: sketch(A) + sketch(B) ==
        sketch(A union B), cell by cell — the per-day -> per-month
        fold needs no rescan."""
        from dtle_spark.functions.sketches import cms_merge, cms_sketch

        whole = spark.range(0, 3000).selectExpr("id % 250 AS x")
        a, b = whole.filter("id < 1000"), whole.filter("id >= 1000")
        merged = {(r["row"], r["bucket"]): r["cnt"] for r in cms_merge(
            cms_sketch(a, "x").unionByName(cms_sketch(b, "x"))).collect()}
        direct = {(r["row"], r["bucket"]): r["cnt"]
                  for r in cms_sketch(whole, "x").collect()}
        assert merged == direct

    def test_bounded_state(self, spark):
        from dtle_spark.functions.sketches import cms_sketch

        df = spark.range(0, 50000).selectExpr("id AS x")  # 50k distinct
        assert cms_sketch(df, "x", depth=4, width=128).count() <= 4 * 128

    def test_grouped_merge_and_isolation(self, spark):
        """Grouped CMS: merge-of-parts == sketch-of-whole per group;
        each group's table is independent (a group's estimate equals
        the global sketch of that group's rows alone — no cross-group
        counter pollution); estimates never underestimate per group."""
        from dtle_spark.functions.sketches import (
            cms_estimate,
            cms_estimate_grouped,
            cms_merge_grouped,
            cms_sketch,
            cms_sketch_grouped,
        )

        whole = spark.range(0, 4000).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END AS g",
            "id % 100 AS k",
        )
        a, b = whole.filter("id < 1500"), whole.filter("id >= 1500")
        merged = {(r["grp"], r["row"], r["bucket"]): r["cnt"]
                  for r in cms_merge_grouped(
                      cms_sketch_grouped(a, "g", "k").unionByName(
                          cms_sketch_grouped(b, "g", "k"))).collect()}
        direct_g = cms_sketch_grouped(whole, "g", "k")
        direct = {(r["grp"], r["row"], r["bucket"]): r["cnt"]
                  for r in direct_g.collect()}
        assert merged == direct

        probes = whole.selectExpr("g AS grp", "k AS key").distinct()
        est = {(r["grp"], r["key"]): r["est_cnt"]
               for r in cms_estimate_grouped(direct_g, probes).collect()}
        exact = {(r["g"], r["k"]): r["cnt"] for r in
                 whole.groupBy("g", "k").agg(F.count("*").alias("cnt")).collect()}
        assert all(est[p] >= exact[p] for p in exact)

        xs = whole.filter("g = 'x'")
        solo = {r["key"]: r["est_cnt"] for r in cms_estimate(
            cms_sketch(xs, "k"), xs.selectExpr("k AS key").distinct(), "key"
        ).collect()}
        assert all(est[("x", k)] == v for k, v in solo.items())


class TestPrioritySample:
    def test_sample_shape_and_estimator(self, spark):
        from dtle_spark.functions.corpus import priority_sample
        from dtle_spark.tableio import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        got = priority_sample(d, 100, weight_sql="n_chars").collect()
        assert len(got) == 100
        # est_weight = max(w, tau) >= w always
        assert all(r["est_weight"] >= r["w"] for r in got)
        # the total-mass estimate (sum over the whole-population
        # subset) should land near the true total character mass
        true_total = d.agg(F.sum("n_chars")).collect()[0][0]
        est_total = sum(r["est_weight"] for r in got)
        assert abs(est_total - true_total) / true_total < 0.5

    def test_deterministic_and_weight_biased(self, spark):
        from dtle_spark.functions.corpus import priority_sample

        df = spark.range(0, 5000).selectExpr(
            "id AS doc_id",
            # 1% of docs carry weight 1000, the rest weight 1
            "CASE WHEN id % 100 = 0 THEN 1000 ELSE 1 END AS wt",
        )
        a = {r["doc_id"] for r in priority_sample(
            df, 50, weight_sql="wt", id_col="doc_id").collect()}
        b = {r["doc_id"] for r in priority_sample(
            df, 50, weight_sql="wt", id_col="doc_id").collect()}
        assert a == b  # same draw every run
        heavy = sum(1 for i in a if i % 100 == 0)
        assert heavy > 35  # 50 heavy ids hold ~91% of total mass

    def test_exhaustive_when_population_small(self, spark):
        from dtle_spark.functions.corpus import priority_sample

        df = spark.range(0, 30).selectExpr("id AS doc_id", "id + 1 AS wt")
        got = priority_sample(df, 100, weight_sql="wt", id_col="doc_id").collect()
        assert len(got) == 30
        # degenerate case: the sample IS the population, estimator = w
        assert all(r["est_weight"] == r["w"] for r in got)

    def test_topn_plan_no_global_sort(self, spark):
        from dtle_spark.functions.corpus import priority_sample

        df = spark.range(0, 20000).selectExpr("id AS doc_id", "id % 97 + 1 AS wt")
        inner = (
            df.filter("wt > 0")
            .selectExpr("doc_id", "CAST(wt AS DOUBLE) AS w")
        )
        # the scored+limit stage compiles to TakeOrderedAndProject
        sample = priority_sample(df, 64, weight_sql="wt", id_col="doc_id")
        assert sample.count() == 64


class TestLogHistSketch:
    def test_relative_error_bound(self, spark):
        """Every quantile estimate is within the 1/(2*subdiv) relative
        bound of the true discrete percentile (bucket midpoint vs a
        value inside the bucket)."""
        from dtle_spark.functions.sketches import (
            loghist_quantiles,
            loghist_sketch,
        )

        df = spark.range(1, 20001).selectExpr("id * id AS x")  # skewed
        est = {r["q"]: r["est"] for r in loghist_quantiles(
            loghist_sketch(df, "x"), [(1, 2), (9, 10), (99, 100)]).collect()}
        import math

        truth = {"1/2": 10000 ** 2, "9/10": 18000 ** 2, "99/100": 19800 ** 2}
        for q, t in truth.items():
            assert abs(est[q] - t) / t < 1 / 16, (q, est[q], t)

    def test_merge_equals_whole_data_sketch(self, spark):
        from dtle_spark.functions.sketches import loghist_merge, loghist_sketch

        whole = spark.range(1, 5001).selectExpr("id * 37 AS x")
        a, b = whole.filter("id < 2000"), whole.filter("id >= 2000")
        merged = {(r["e"], r["sub"]): r["cnt"] for r in loghist_merge(
            loghist_sketch(a, "x").unionByName(loghist_sketch(b, "x"))
        ).collect()}
        direct = {(r["e"], r["sub"]): r["cnt"]
                  for r in loghist_sketch(whole, "x").collect()}
        assert merged == direct

    def test_bounded_state_and_positive_only(self, spark):
        from dtle_spark.functions.sketches import loghist_sketch

        df = spark.range(-100, 100000).selectExpr("id AS x")
        sk = loghist_sketch(df, "x", subdiv=16).collect()
        assert len(sk) <= 63 * 16
        assert sum(r["cnt"] for r in sk) == 99999  # x <= 0 excluded

    def test_grouped_merge_helper_equals_whole(self, spark):
        from dtle_spark.functions.sketches import (
            loghist_merge_grouped,
            loghist_sketch_grouped,
        )

        whole = spark.range(1, 3001).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END AS g", "id * 13 AS x"
        )
        a, b = whole.filter("id < 1000"), whole.filter("id >= 1000")
        merged = {(r["grp"], r["e"], r["sub"]): r["cnt"]
                  for r in loghist_merge_grouped(
                      loghist_sketch_grouped(a, "g", "x").unionByName(
                          loghist_sketch_grouped(b, "g", "x"))).collect()}
        direct = {(r["grp"], r["e"], r["sub"]): r["cnt"]
                  for r in loghist_sketch_grouped(whole, "g", "x").collect()}
        assert merged == direct

    def test_huge_values_clamped_inside_octave(self, spark):
        """Above 2^53 CAST(x AS DOUBLE) rounds; a mantissa rounding UP
        to the next power of two would put sub at subdiv (outside
        [0, subdiv)) without the least() clamp. 2^63-1 rounds to 2^63
        exactly — the worst case — and must still land in-bucket."""
        from dtle_spark.functions.sketches import loghist_sketch

        df = spark.createDataFrame(
            [(9223372036854775807,), (9223371487098961920,), (1,)], "x long"
        )
        sk = loghist_sketch(df, "x", subdiv=16).collect()
        assert sum(r["cnt"] for r in sk) == 3
        for r in sk:
            assert 0 <= r["sub"] < 16, (r["e"], r["sub"])

    def test_grouped_sketch_merge_and_error_bound(self, spark):
        """The grouped lane: per-group merge == whole-data grouped
        sketch (cell addition within each group), and each group's
        p50 estimate stays inside the 1/(2*subdiv) relative bound of
        its own exact median."""
        from dtle_spark.functions.sketches import (
            loghist_quantiles_grouped,
            loghist_sketch_grouped,
        )

        whole = spark.range(1, 10001).selectExpr(
            "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS g",
            "id * id AS x",
        )
        a, b = whole.filter("x < 2000 * 2000"), whole.filter("x >= 2000 * 2000")
        merged = {
            (r["grp"], r["e"], r["sub"]): r["cnt"]
            for r in loghist_sketch_grouped(a, "g", "x")
            .unionByName(loghist_sketch_grouped(b, "g", "x"))
            .groupBy("grp", "e", "sub").agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        direct = {
            (r["grp"], r["e"], r["sub"]): r["cnt"]
            for r in loghist_sketch_grouped(whole, "g", "x").collect()
        }
        assert merged == direct

        est = {
            (r["grp"], r["q"]): r["est"]
            for r in loghist_quantiles_grouped(
                loghist_sketch_grouped(whole, "g", "x"), [(1, 2)]
            ).collect()
        }
        truth = {"even": 5000 ** 2, "odd": 5001 ** 2}
        for g, t in truth.items():
            assert abs(est[(g, "1/2")] - t) / t < 1 / 16, (g, est[(g, "1/2")], t)


class TestIncrementalDedup:
    def test_tiers_and_incoming_pairs_kept(self, spark):
        from dtle_spark.functions.dedup import incremental_neardup_filter

        base = ("spark shuffles the hash join twice before the window "
                "aggregate runs and the broadcast side stays resident") * 3
        near = base.replace("resident", "cached", 1)  # near-dup of history
        hist = spark.createDataFrame(
            [(0, base), (2, "completely different historical text about nothing")],
            "doc_id long, text string",
        )
        inc = spark.createDataFrame(
            [
                (1, base),          # exact dup of history -> dropped
                (3, near),          # near dup of history  -> dropped
                (5, "a genuinely fresh incoming document with new words entirely"),
                # 7 and 9 duplicate EACH OTHER but not history -> both kept
                (7, "incoming pair text repeated across the increment batch"),
                (9, "incoming pair text repeated across the increment batch"),
            ],
            "doc_id long, text string",
        )
        kept = sorted(
            r["doc_id"]
            for r in incremental_neardup_filter(hist, inc, threshold=0.5).collect()
        )
        assert kept == [5, 7, 9]


class TestTruncatedAnn:
    def test_full_dim_truncation_is_identity_ranking(self, spark):
        from dtle_spark.functions.similarity import brute_force_topk, truncate_normalize
        from dtle_spark.tableio import load_table

        sf = "/root/testdata/sf0.001"
        e = load_table(spark, sf, "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        full = {(r["query_id"], r["rank"]): r["neighbor_id"]
                for r in brute_force_topk(e, q, k=5).collect()}
        tr = truncate_normalize(e, 64)  # full width: pure renormalize
        qt = tr.filter(F.col("vec_id") % 50 == 0)
        same = {(r["query_id"], r["rank"]): r["neighbor_id"]
                for r in brute_force_topk(tr, qt, k=5).collect()}
        assert full == same  # scaling each vector cannot change cosine order

    def test_half_dim_recall_reported(self, spark):
        from dtle_spark.functions.similarity import brute_force_topk, truncate_normalize
        from dtle_spark.tableio import load_table

        sf = "/root/testdata/sf0.001"
        e = load_table(spark, sf, "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        ex = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(e, q, k=10).collect()}
        tr = truncate_normalize(e, 32)
        qt = tr.filter(F.col("vec_id") % 50 == 0)
        ap = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(tr, qt, k=10).collect()}
        recall = len(ex & ap) / len(ex)
        # fixture embeddings are NOT MRL-trained: half-dim recall is the
        # honest random-prefix floor, asserted only as non-degenerate
        assert recall > 0.2, f"truncated recall {recall}"


def test_normalize_text_rules(spark):
    from dtle_spark.functions.textstats import normalize_text

    dirty = "“Smart” ‘quotes’, en–dash, em—dash,​zero﻿width   spaces "
    df = spark.createDataFrame([(dirty,)], "t string")
    out = df.select(normalize_text(F.col("t")).alias("n")).collect()[0]["n"]
    assert out == '"Smart" \'quotes\', en-dash, em-dash,zerowidth spaces'


def test_multiprobe_recall_beats_single_bucket(spark):
    from dtle_spark.functions.similarity import (
        brute_force_topk, lsh_bucket_topk, lsh_multiprobe_topk,
    )
    from dtle_spark.tableio import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    ex = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(e, q, k=5).collect()}
    single = {(r["query_id"], r["neighbor_id"]) for r in lsh_bucket_topk(e, q, k=5).collect()}
    multi = {(r["query_id"], r["neighbor_id"]) for r in lsh_multiprobe_topk(e, q, k=5).collect()}
    r_single = len(ex & single) / len(ex)
    r_multi = len(ex & multi) / len(ex)
    # candidate superset -> recall vs exact can only improve (top-k
    # membership itself may differ: better candidates displace worse)
    assert r_multi >= r_single


def test_duplicated_span_stats_flags_shared_runs(spark):
    from dtle_spark.functions.dedup import duplicated_span_stats

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1"),
            (2, shared + " unique2 tail2"),
            (3, "totally different words with no overlap at all here"),
            (4, "short doc"),  # < 8 tokens -> zero windows
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in duplicated_span_stats(docs, "doc_id", "text").collect()}
    # docs 1/2 share the leading 8-token window; their suffixes differ
    assert out[1]["n_dup"] >= 1 and out[2]["n_dup"] >= 1
    assert out[1]["n_dup"] < out[1]["n_windows"]  # unique tail windows
    assert out[3]["n_dup"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0


def test_containment_catches_subset_jaccard_misses(spark):
    from dtle_spark.functions.dedup import containment_pairs, ngram_jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog near the river bank"
    long_doc = quote + " " + " ".join(f"filler{i} pad{i} extra{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, long_doc, "s"), (2, quote, "s")], "doc_id long, text string, source string"
    )
    cont = containment_pairs(docs, "doc_id", "text", "source", threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0  # full quote
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", "source", threshold=0.9).collect()
    assert jac == []  # Jaccard under-scores the asymmetric duplicate


def test_unigram_commonness_orders_bland_above_rare(spark):
    from dtle_spark.functions.textstats import unigram_commonness

    docs = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "rarest singleton tokens only"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in unigram_commonness(docs, "doc_id", "text").collect()}
    # "common" occurs 4x -> floor(log2(4)) = 2 bits each; singletons 0
    assert out[1]["mean_bits"] == 2.0 and out[1]["info_bits"] == 8
    assert out[2]["mean_bits"] == 0.0
    assert out[3] == {"id": 3, "n_tokens": 0, "info_bits": 0, "mean_bits": 0.0} or (
        out[3]["n_tokens"] == 0 and out[3]["info_bits"] == 0 and out[3]["mean_bits"] == 0.0
    )


def test_star_cc_equals_min_label_on_adversarial_graphs(spark):
    from dtle_spark.functions.graph import (
        connected_components, connected_components_star,
    )

    # chain (max diameter), clique, hub (max skew), plus cross-links
    chain = [(i, i + 1) for i in range(100, 120)]
    clique = [(a, b) for a in range(200, 208) for b in range(200, 208) if a < b]
    hub = [(300, i) for i in range(301, 340)]
    bridge = [(119, 200), (207, 300)]  # chain+clique+hub -> one component
    iso = [(900, 901), (902, 903)]
    pairs = spark.createDataFrame(
        chain + clique + hub + bridge + iso, "id_1 long, id_2 long"
    )
    a = {(r["node"], r["component"]) for r in connected_components(pairs, max_iter=40).collect()}
    b = {(r["node"], r["component"]) for r in connected_components_star(pairs).collect()}
    assert a == b
    # the merged component labels with the global min
    comp = dict(b)
    assert comp[339] == 100 and comp[207] == 100 and comp[119] == 100
    assert comp[901] == 900 and comp[903] == 902
    # under-iterated min-label must FAIL LOUDLY, not mis-cluster silently
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=3).collect()


def test_star_cc_equals_min_label_on_lsh_pairs(spark):
    from dtle_spark.functions.dedup import minhash_dedup_pairs
    from dtle_spark.functions.graph import (
        connected_components, connected_components_star,
    )
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5).localCheckpoint()
    a = {(r["node"], r["component"]) for r in connected_components(pairs).collect()}
    b = {(r["node"], r["component"]) for r in connected_components_star(pairs).collect()}
    assert a == b and len(a) > 0


def test_corpus_shuffle_is_stable_permutation(spark):
    from dtle_spark.functions.corpus import corpus_shuffle
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = corpus_shuffle(d, "doc_id", shards=16).collect()
    # a permutation: every (shard, pos) slot unique, positions contiguous 1..n
    assert len({(r["shard"], r["pos"]) for r in full}) == len(full)
    by_shard = {}
    for r in full:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # growth-stable: a prefix corpus assigns every common doc the SAME
    # shard (appends never move existing docs across shards)
    sub = corpus_shuffle(d.filter(F.col("doc_id") < 400), "doc_id", shards=16).collect()
    full_shard = {r["id"]: r["shard"] for r in full}
    assert all(full_shard[r["id"]] == r["shard"] for r in sub)


def test_remove_duplicated_spans_semantics(spark):
    from dtle_spark.functions.dedup import remove_duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-token window
    docs = spark.createDataFrame(
        [
            (1, shared + " keep1 keep2"),
            (2, shared + " keep3 keep4"),
            (3, "unique words that appear nowhere else in this tiny corpus"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in remove_duplicated_spans(docs, "doc_id", "text").collect()}
    # the shared window is removed from BOTH docs; unique tails survive
    assert out[1]["clean_text"] == "keep1 keep2"
    assert out[2]["clean_text"] == "keep3 keep4"
    assert out[1]["n_tokens"] == 10 and out[1]["n_kept"] == 2
    # untouched doc passes through whole
    assert out[3]["n_kept"] == out[3]["n_tokens"]
    assert out[3]["clean_text"].startswith("unique words")


def test_span_signal_and_transform_are_consistent(spark):
    """duplicated_span_stats (signal) and remove_duplicated_spans
    (transform) must agree on the real corpus: a doc loses tokens iff
    it has duplicated windows, and clean docs pass through verbatim."""
    from dtle_spark.functions.dedup import (
        duplicated_span_stats, remove_duplicated_spans,
    )
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    sig = {r["id"]: r for r in duplicated_span_stats(d, "doc_id", "text").collect()}
    out = {r["id"]: r for r in remove_duplicated_spans(d, "doc_id", "text").collect()}
    assert set(sig) == set(out)
    n_dirty = 0
    for i, s in sig.items():
        o = out[i]
        assert o["n_tokens"] == s["n_windows"] + 7 if s["n_windows"] > 0 else True
        if s["n_dup"] == 0:
            # no duplicated window -> nothing removed
            assert o["n_kept"] == o["n_tokens"], i
        else:
            n_dirty += 1
            # each duplicated window covers >= 8 tokens, overlaps dedup
            assert o["n_kept"] < o["n_tokens"], i
            assert o["n_tokens"] - o["n_kept"] >= 8, i
    assert n_dirty > 0  # fixture corpus genuinely contains duplication


def test_export_training_shards_e2e(spark, tmp_path):
    import json
    import os

    from dtle_spark.functions.corpus import export_training_shards
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    out_dir = str(tmp_path / "corpus")
    os.makedirs(out_dir)
    man = export_training_shards(d, out_dir, budget=512, shards=4)
    # manifest written last and consistent with the data
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        assert json.load(f) == man
    back = spark.read.parquet(os.path.join(out_dir, "data"))
    assert back.count() == man["n_docs"] == d.count()
    rows = back.collect()
    # every doc exactly once; (shard, pos) is the training order
    assert len({r["id"] for r in rows}) == len(rows)
    assert len({(r["shard"], r["pos"]) for r in rows}) == len(rows)
    # packing invariant per shard: bins fill sequentially in pos order
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        cum = 0
        for r in rs:
            assert r["bin"] == cum // 512 and r["bin_offset"] == cum % 512, shard
            cum += r["n_tokens"]
    # deterministic: a second export reproduces the same manifest
    out2 = str(tmp_path / "corpus2")
    os.makedirs(out2)
    assert export_training_shards(d, out2, budget=512, shards=4) == man


def test_simhash_triple_bucketing_is_exact(spark):
    """Combination bucketing must be candidate-complete: pairs equal
    the brute-force all-pairs bit_count filter at max_distance=3."""
    from dtle_spark.functions.dedup import simhash_near_pairs, simhash_signatures
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        (r["id_1"], r["id_2"], r["distance"])
        for r in simhash_near_pairs(d, "doc_id", "text").collect()
    }
    s = simhash_signatures(d, "doc_id", "text").collect()
    expected = set()
    for i in range(len(s)):
        for j in range(i + 1, len(s)):
            a, b = s[i], s[j]
            dist = bin(a["simhash"] ^ b["simhash"]).count("1")
            if dist <= 3:
                lo, hi = sorted((a["doc_id"], b["doc_id"]))
                expected.add((lo, hi, dist))
    assert got == expected and len(expected) > 0


def test_minhash_hash_fn_lanes_agree(spark):
    """The xxhash64 production lane must find the same verified
    near-dup pairs as the md5 oracle-parity lane. Verification (exact
    jaccard over hashed shingle sets) is hash-agnostic up to
    negligible 40-bit collisions, so the pair SETS should be identical
    here; only borderline LSH recall could ever differ, and the
    fixtures' true near-dups are far from the banding boundary."""
    from dtle_spark.functions.dedup import minhash_dedup_pairs
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    md5_pairs = {
        (r["id_1"], r["id_2"])
        for r in minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5).collect()
    }
    xx_pairs = {
        (r["id_1"], r["id_2"])
        for r in minhash_dedup_pairs(
            d, "doc_id", "text", threshold=0.5, hash_fn="xxhash64"
        ).collect()
    }
    assert len(md5_pairs) > 0
    assert xx_pairs == md5_pairs
    # jaccard values agree too (independent hash domains, same sets)
    md5_j = {
        (r["id_1"], r["id_2"]): round(r["jaccard"], 6)
        for r in minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5).collect()
    }
    xx_j = {
        (r["id_1"], r["id_2"]): round(r["jaccard"], 6)
        for r in minhash_dedup_pairs(
            d, "doc_id", "text", threshold=0.5, hash_fn="xxhash64"
        ).collect()
    }
    assert md5_j == xx_j


def test_codegen_signatures_match_interpreted_reference(spark):
    """r14 rewrite pin: the codegen explode+hash-aggregate signature
    paths (minhash_sigs, simhash_signatures) must be BIT-IDENTICAL to
    the retired interpreted HOF folds (minhash_signature,
    simhash_bits_expr) — including the empty-token-list edge (lane
    init 2^40 / simhash 0)."""
    from pyspark.sql import functions as F

    from dtle_spark.functions.dedup import (
        SIMHASH_BITS,
        doc_hash_sets,
        hex_window_sql,
        minhash_signature,
        minhash_sigs,
        simhash_bits_expr,
        simhash_signatures,
        _toks,
    )
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # an empty-token doc exercises the explode_outer/coalesce edge; a
    # NULL-text doc exercises the NULL-array edge (ADVICE r14: the
    # interpreted folds return NULL — aggregate(NULL, ...) — and the
    # codegen forms must too, NOT the lane-init/zero signature that
    # would clump every NULL doc into one LSH bucket clique)
    d = d.unionByName(
        spark.createDataFrame(
            [(10 ** 9, "!!! ..."), (10 ** 9 + 1, None)],
            "doc_id long, text string",
        )
    )

    # NULL text never reaches minhash as a NULL array (shingles_expr
    # maps it to ['']), so the NULL-array edge needs a direct row
    base = doc_hash_sets(d, "doc_id", "text").unionByName(
        spark.createDataFrame(
            [(10 ** 9 + 2, None, None)],
            "doc_id long, hx array<long>, hy array<long>",
        )
    )
    ref_min = {
        r["doc_id"]: r["sig"]
        for r in base.withColumn("sig", minhash_signature()).select(
            "doc_id", "sig"
        ).collect()
    }
    new_min = {
        r["doc_id"]: r["sig"] for r in minhash_sigs(base, ["doc_id"]).collect()
    }
    assert new_min == ref_min and len(new_min) == d.count() + 1
    assert new_min[10 ** 9 + 2] is None

    h = hex_window_sql("m", 1, "spark", width=15)
    ref_sim = {
        r["doc_id"]: r["simhash"]
        for r in d.select(
            "doc_id",
            F.expr(
                f"transform(transform({_toks('text')}, x -> md5(x)), m -> {h})"
            ).alias("th"),
        ).select(
            "doc_id", simhash_bits_expr("th", SIMHASH_BITS).alias("simhash")
        ).collect()
    }
    new_sim = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(d, "doc_id", "text").collect()
    }
    assert new_sim == ref_sim and new_sim[10 ** 9] == 0
    assert new_sim[10 ** 9 + 1] is None


def test_minhash_sigs_from_rows_matches(spark):
    """r16 rewrite pin (VERDICT task 3): the exploded codegen
    shingle-hash lane (shingle_hash_rows -> minhash_sigs_from_rows)
    must produce BIT-IDENTICAL signatures to the array lane
    (doc_hash_sets -> minhash_sigs) — including the punctuation-only
    and NULL-text edges (both shingle to [''] in the array lane and to
    one '' row in the exploded lane; duplicate shingles may differ
    between lanes but min() is duplicate-insensitive) — and the
    candidate hash-set rebuild (hx_from_tokens over pinned tokens)
    must equal doc_hash_sets' hx arrays."""
    from pyspark.sql import functions as F
    from dtle_spark.functions.dedup import (
        _toks,
        doc_hash_sets,
        hx_from_tokens,
        minhash_sigs,
        minhash_sigs_from_rows,
        shingle_hash_rows,
    )
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    d = d.unionByName(
        spark.createDataFrame(
            [(10 ** 9, "!!! ..."), (10 ** 9 + 1, None), (10 ** 9 + 2, "")],
            "doc_id long, text string",
        )
    )
    for hash_fn in ("md5", "xxhash64"):
        ref = {
            r["doc_id"]: r["sig"]
            for r in minhash_sigs(
                doc_hash_sets(d, "doc_id", "text", hash_fn=hash_fn), ["doc_id"]
            ).collect()
        }
        got = {
            r["doc_id"]: r["sig"]
            for r in minhash_sigs_from_rows(
                shingle_hash_rows(d, ["doc_id"], text_col="text", hash_fn=hash_fn),
                ["doc_id"],
            ).collect()
        }
        assert got == ref and len(got) == d.count(), hash_fn
        assert all(s is not None for s in got.values()), hash_fn
        # the verify-tier array rebuild from pre-tokenized columns
        toks = d.select("doc_id", F.expr(_toks("text")).alias("__t"))
        hx_ref = {
            r["doc_id"]: r["hx"]
            for r in doc_hash_sets(d, "doc_id", "text", hash_fn=hash_fn).collect()
        }
        hx_got = {
            r["doc_id"]: r["hs"]
            for r in toks.select(
                "doc_id", hx_from_tokens("__t", hash_fn=hash_fn).alias("hs")
            ).collect()
        }
        assert hx_got == hx_ref, hash_fn


class TestBpeTrain:
    def _python_reference(self, texts, n_merges, min_count=2):
        """The classic reference algorithm, verbatim (Sennrich et al.):
        word-freq table, char symbols + </w>, argmax adjacent pair,
        leftmost-first merge."""
        import re
        from collections import Counter

        wf = Counter()
        for t in texts:
            for w in re.findall(r"[a-z0-9]+", t.lower()):
                wf[w] += 1
        syms = {w: list(w) + ["</w>"] for w in wf}
        merges = []
        for _ in range(n_merges):
            pc = Counter()
            for w, cnt in wf.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += cnt
            if not pc:
                break
            # tie-break: highest count, then lexicographically SMALLEST pair
            top = max(pc.values())
            cands = sorted([p for p, n in pc.items() if n == top])
            pair, n = cands[0], top
            if n < min_count:
                break
            merges.append(pair)
            a, b = pair
            for w in syms:
                s, out = syms[w], []
                for tok in s:
                    if out and out[-1] == a and tok == b:
                        out[-1] = a + b
                    else:
                        out.append(tok)
                syms[w] = out
        return merges, syms

    def test_matches_python_reference(self, spark):
        from dtle_spark.functions.bpe import bpe_train
        from dtle_spark.tableio import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
        texts = [r["text"] for r in d.select("text").collect()]
        merges, syms_df = bpe_train(d, n_merges=25)
        ref_merges, ref_syms = self._python_reference(texts, 25)
        assert merges == ref_merges and len(merges) == 25
        got = {r["word"]: list(r["syms"]) for r in syms_df.collect()}
        assert got == ref_syms

    def test_apply_reproduces_training_segmentation(self, spark):
        from dtle_spark.functions.bpe import bpe_apply, bpe_train
        from dtle_spark.tableio import load_table
        from pyspark.sql import functions as F

        d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(60)
        merges, syms_df = bpe_train(d, n_merges=12)
        applied = bpe_apply(d, merges)
        # every (word -> pieces) from apply equals the training table's
        # final segmentation for that word
        train = {r["word"]: tuple(r["syms"]) for r in syms_df.collect()}
        rows = applied.select("word", "pieces").distinct().collect()
        assert rows and all(tuple(r["pieces"]) == train[r["word"]] for r in rows)
        # apply is map-only: no exchange in the plan (check on the
        # un-limited table — the test's own .limit() would add one)
        full = load_table(spark, "/root/testdata/sf0.001", "documents")
        plan = bpe_apply(full, merges)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestQualityClassifier:
    def test_separates_weak_labels_and_keep_is_deterministic(self, spark):
        """GPT-3-style curated-vs-raw LR filter. The fixture corpus is a
        uniform random bag over a small vocabulary (no metadata-text
        correlation — the `lang` column is unlearnable by design), so
        the weak "curated" label is a text-derived frequency concept:
        docs mentioning 'spark' at least twice. Hashed-tf LR must
        recover it on a held-out split; the Pareto keep rule must admit
        a tail of low scorers and reproduce the exact same keep set on
        a re-run (md5-uniform draw, no RNG state)."""
        from dtle_spark.functions.quality_model import (
            pareto_keep,
            score_quality,
            train_quality_classifier,
        )
        from dtle_spark.tableio import load_table
        from pyspark.sql import functions as F

        d = load_table(spark, "/root/testdata/sf0.001", "documents").withColumn(
            "is_curated",
            F.expr(
                "size(filter(regexp_extract_all(lower(text), '[a-z0-9]+', 0),"
                " t -> t = 'spark')) >= 2"
            ),
        )
        train = d.filter(F.col("doc_id") % 3 != 0)
        holdout = d.filter(F.col("doc_id") % 3 == 0)
        model = train_quality_classifier(
            positive=train.filter(F.col("is_curated")),
            raw=train,
            n_features=1 << 14,
        )
        scored = score_quality(model, holdout).select(
            "doc_id", "is_curated", "quality_score"
        )
        rows = scored.collect()
        assert rows
        pos = [r["quality_score"] for r in rows if r["is_curated"]]
        neg = [r["quality_score"] for r in rows if not r["is_curated"]]
        assert pos and neg
        # calibrated separation: curated mean well above raw-rest mean
        assert sum(pos) / len(pos) > sum(neg) / len(neg) + 0.2
        # ranking quality: AUC > 0.8 on the holdout
        import itertools

        wins = sum(
            1 if p > n else (0.5 if p == n else 0)
            for p, n in itertools.product(pos, neg)
        )
        auc = wins / (len(pos) * len(neg))
        assert auc > 0.8, auc

        kept = pareto_keep(scored).cache()
        keep_ids = {r["doc_id"] for r in kept.filter("keep").collect()}
        n = kept.count()
        assert 0 < len(keep_ids) < n  # filters something, keeps something
        # the tail re-admission is real: kept docs include sub-top
        # scorers (P(draw > 0.3) ~= 9.4% per doc; with this holdout
        # size a few low-mid scorers always survive)
        low_kept = kept.filter(F.col("keep") & (F.col("quality_score") < 0.75))
        assert low_kept.count() > 0
        # determinism: a fresh pipeline over the same inputs keeps the
        # exact same set (the draw depends only on doc_id)
        again = pareto_keep(score_quality(model, holdout).select(
            "doc_id", "lang", "quality_score"
        ))
        keep_ids2 = {r["doc_id"] for r in again.filter("keep").collect()}
        assert keep_ids2 == keep_ids
        kept.unpersist()


def test_probe_index_equals_rehash_operator(spark):
    """The persisted-index probe must drop exactly the ids the
    re-hashing operator (incremental_neardup_filter) drops — the
    index IS the same computation, materialized once."""
    from dtle_spark.functions.dedup import (
        incremental_neardup_filter,
        probe_index,
        with_dedup_index,
    )
    from dtle_spark.tableio import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    history = d.filter(F.col("doc_id") % 2 == 0)
    incoming = d.filter(F.col("doc_id") % 2 == 1)

    survivors_rehash = {
        r["doc_id"]
        for r in incremental_neardup_filter(history, incoming, threshold=0.5)
        .select("doc_id")
        .collect()
    }
    hist_idx = with_dedup_index(history)
    inc_idx = with_dedup_index(incoming)
    dropped = {
        r["id"] for r in probe_index(hist_idx, inc_idx, threshold=0.5).collect()
    }
    all_inc = {r["doc_id"] for r in incoming.select("doc_id").collect()}
    assert all_inc - dropped == survivors_rehash
    assert dropped  # fixtures do contain cross-side duplicates


def test_with_dedup_index_id_contract(spark):
    """ADVICE r14 (dedup.py with_dedup_index): the band attach is an id
    equi-join, so a NULL id must raise loudly at execution — the old
    inner join silently dropped the row from the index (and thus from
    corpus_ingest survivors). NULL-TEXT rows, by contrast, stay in the
    index (left join; shingles_expr maps NULL text to [''] so they even
    keep real band digests and die in the exact tier like empty docs)."""
    import pytest
    from dtle_spark.functions.dedup import with_dedup_index

    ok = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_dedup_index(ok).collect()}
    assert set(rows) == {1, 2}  # the NULL-text row survives the build
    assert rows[1]["__bands"] is not None
    # a NULL id raises at execution, never a silent drop
    bad = spark.createDataFrame(
        [(None, "some text here")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="with_dedup_index: NULL doc_id"):
        with_dedup_index(bad).collect()


def test_cc_auto_dispatch_by_edge_count(spark, monkeypatch):
    """VERDICT r5 #7: the dedup entry points choose the CC variant by
    edge count — min-label below the threshold, large/small-star at or
    above it — and both paths return the same clustering."""
    from dtle_spark.functions import graph as G

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_1 long, id_2 long"
    )
    calls = []
    real_min, real_star = G.connected_components, G.connected_components_star
    monkeypatch.setattr(
        G, "connected_components",
        lambda *a, **k: calls.append("min") or real_min(*a, **k),
    )
    monkeypatch.setattr(
        G, "connected_components_star",
        lambda *a, **k: calls.append("star") or real_star(*a, **k),
    )
    small = {
        (r["node"], r["component"])
        for r in G.connected_components_auto(pairs).collect()
    }
    assert calls == ["min"]  # 3 edges < threshold
    big = {
        (r["node"], r["component"])
        for r in G.connected_components_auto(pairs, star_threshold=1).collect()
    }
    assert calls == ["min", "star"]
    expected = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert small == expected and big == expected


def test_probe_index_self_equals_pair_operator(spark):
    """probe_index_self (the within-batch near-dup pass) must drop
    exactly the larger id of every pair minhash_dedup_pairs finds on
    the same set at the same threshold — same index columns, same
    band-join + jaccard verify."""
    from dtle_spark.functions.dedup import (
        minhash_dedup_pairs,
        probe_index_self,
        with_dedup_index,
    )
    from dtle_spark.tableio import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5)
    expected = {
        max(r["id_1"], r["id_2"]) for r in pairs.collect()
    }
    got = {
        r["id"]
        for r in probe_index_self(with_dedup_index(d), threshold=0.5).collect()
    }
    assert got == expected
    assert got  # fixtures contain near-dup pairs


class TestProductQuantization:
    """PQ tier (similarity.pq_codebook/pq_refine/pq_encode/pq_topk):
    recall gate vs brute force plus structural invariants — the
    quantization ladder's third rung (fp32 -> int8 SQ -> PQ)."""

    M, KSUB, DIM = 16, 16, 64

    def _fixture(self, spark):
        from dtle_spark.tableio import load_table
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        return e, e.filter(F.col("vec_id") % 50 == 0)

    def test_recall_with_rerank_gate(self, spark):
        from dtle_spark.functions.similarity import (
            brute_force_topk, pq_codebook, pq_refine, pq_topk,
        )

        e, q = self._fixture(spark)
        cb = pq_refine(
            e, pq_codebook(e, m=self.M, ksub=self.KSUB),
            steps=2, m=self.M, ksub=self.KSUB,
        ).localCheckpoint()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_topk(e, q, k=10, m=self.M, ksub=self.KSUB,
                             codebook=cb, rerank=100).collect()
        }
        want = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(e, q, k=10).collect()
        }
        recall = len(got & want) / len(want)
        assert recall >= 0.9, f"PQ+rerank recall {recall} below gate"

    def test_refine_improves_pure_adc_recall(self, spark):
        """The deterministic Lloyd steps must actually help: pure-ADC
        recall with the refined codebook beats the raw init's (whose
        id%ksub partition puts every entry near the global mean)."""
        from dtle_spark.functions.similarity import (
            brute_force_topk, pq_codebook, pq_refine, pq_topk,
        )

        e, q = self._fixture(spark)
        want = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(e, q, k=10).collect()
        }

        def recall(cb):
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in pq_topk(e, q, k=10, m=self.M, ksub=self.KSUB,
                                 codebook=cb).collect()
            }
            return len(got & want) / len(want)

        cb0 = pq_codebook(e, m=self.M, ksub=self.KSUB).localCheckpoint()
        cb2 = pq_refine(e, cb0, steps=2, m=self.M, ksub=self.KSUB).localCheckpoint()
        assert recall(cb2) > recall(cb0)

    def test_encode_invariants(self, spark):
        """Codes are m ints in [0, ksub); rnorm equals the norm of the
        decoded reconstruction (disjoint sub-spaces: sum of entry
        norms2) recomputed independently driver-side."""
        import math

        from dtle_spark.functions.similarity import pq_codebook, pq_encode

        e, _ = self._fixture(spark)
        cb = pq_codebook(e, m=self.M, ksub=self.KSUB).localCheckpoint()
        entries = {(r["sub"], r["code"]): r["cvec"] for r in cb.collect()}
        assert len(entries) == self.M * self.KSUB
        enc = pq_encode(e, cb, m=self.M, ksub=self.KSUB).collect()
        assert len(enc) == e.count()
        for r in enc[:50]:
            assert len(r["codes"]) == self.M
            assert all(0 <= c < self.KSUB for c in r["codes"])
            n2 = sum(
                sum(x * x for x in entries[(s, c)])
                for s, c in enumerate(r["codes"])
            )
            assert math.isclose(r["rnorm"], math.sqrt(n2), rel_tol=1e-9)


class TestIvfPq:
    """Composed IVF x PQ tier (similarity.ivf_pq_topk): cells bound
    WHICH rows score, codes bound WHAT scoring touches."""

    def test_rerank_recovers_ivf_flat_exactly(self, spark):
        """With an adequate rerank pool, IVF-PQ must equal IVF-Flat on
        the SAME probes — the PQ compression step then costs zero
        recall; all loss is the (shared, tunable) cell pruning."""
        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import (
            ivf_exact_mean_centroids, ivf_pq_topk, ivf_topk,
        )
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        cent = ivf_exact_mean_centroids(e, k=16).localCheckpoint()
        flat = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(e, q, k=10, nprobe=4, centroids=cent).collect()
        }
        comp = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_pq_topk(e, q, k=10, nprobe=4, m=16,
                                 rerank=100).collect()
        }
        assert comp == flat

    def test_more_probes_more_recall(self, spark):
        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import brute_force_topk, ivf_pq_topk
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        bf = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(e, q, k=10).collect()
        }

        def recall(nprobe):
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_pq_topk(e, q, k=10, nprobe=nprobe, m=16,
                                     rerank=100).collect()
            }
            return len(bf & got) / len(bf)

        r4, r8 = recall(4), recall(8)
        assert r8 > r4 >= 0.4  # floor + the nprobe knob works

    def test_reuse_params_equal_inline_train(self, spark):
        """The persisted-index path: ivf_pq_topk given precomputed
        centroids= / codebook= returns EXACTLY what inline training
        (train=) produces — reuse changes where the tables come from,
        never a score. This is the production shape (train once, reuse
        across ingests/searches) the r7 params exist for."""
        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import (
            ivf_exact_mean_centroids, ivf_pq_topk, md5_train_sample,
            pq_codebook, pq_refine,
        )
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        tr = md5_train_sample(e)
        inline = ivf_pq_topk(e, q, k=10, nprobe=4, rerank=100, train=tr)
        cent = ivf_exact_mean_centroids(tr, k=16).localCheckpoint()
        cb = pq_refine(tr, pq_codebook(tr, m=8, ksub=16), steps=2, m=8, ksub=16)
        reused = ivf_pq_topk(
            e, q, k=10, nprobe=4, rerank=100, centroids=cent, codebook=cb
        )
        key = lambda r: (r["query_id"], r["rank"])
        a = {key(r): (r["neighbor_id"], r["cell"], r["cosine"]) for r in inline.collect()}
        b = {key(r): (r["neighbor_id"], r["cell"], r["cosine"]) for r in reused.collect()}
        assert a == b and len(a) > 0

    def test_sampled_train_recall_floor(self, spark):
        """The registry query's exact configuration (train on the 25%
        md5 draw, reuse params, nprobe=4, rerank=100) holds a recall
        floor vs brute force — sampling the TRAIN must not collapse
        search quality."""
        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import (
            brute_force_topk, ivf_pq_topk, md5_train_sample,
        )
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        bf = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(e, q, k=10).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_pq_topk(
                e, q, k=10, nprobe=4, rerank=100, train=md5_train_sample(e)
            ).collect()
        }
        assert len(bf & got) / len(bf) >= 0.35  # ~nprobe/n_cells bound


class TestMd5TrainSample:
    """similarity.md5_train_sample: the deterministic draw that lets
    sampled TRAINING live inside a hash-compared gate."""

    def test_deterministic_and_mass(self, spark):
        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import md5_train_sample

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        n = e.count()
        ids1 = sorted(r["vec_id"] for r in md5_train_sample(e).select("vec_id").collect())
        ids2 = sorted(r["vec_id"] for r in md5_train_sample(e).select("vec_id").collect())
        assert ids1 == ids2 and len(ids1) > 0
        # 4/16 nibbles = 25% expected mass; md5 is uniform, so allow
        # a generous binomial band (n=500 -> sd ~ 9.7; this is +-5 sd)
        frac = len(ids1) / n
        assert 0.15 <= frac <= 0.35, frac

    def test_is_pure_function_of_id(self, spark):
        """Rows selected depend ONLY on the id — restating the draw on
        a projected/re-partitioned frame selects the same ids (what the
        DuckDB oracle's WHERE-clause restatement relies on)."""
        import hashlib

        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import (
            TRAIN_SAMPLE_HEX, md5_train_sample,
        )

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        got = {r["vec_id"] for r in md5_train_sample(e).select("vec_id").collect()}
        want = {
            r["vec_id"]
            for r in e.select("vec_id").collect()
            if hashlib.md5(str(r["vec_id"]).encode()).hexdigest()[0] in TRAIN_SAMPLE_HEX
        }
        assert got == want


class TestCodebookGuards:
    """_require_dense_codebook: the loud seams that keep positional
    slicing from silently mis-scoring on bad reused codebooks."""

    def test_gapped_codebook_rejected(self, spark):
        import pytest

        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import pq_codebook, pq_refine

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cb = pq_codebook(e, m=8, ksub=16).localCheckpoint()
        gapped = cb.filter(~((cb.sub == 0) & (cb.code == 0)))
        with pytest.raises(ValueError, match="dense"):
            pq_refine(e, gapped, steps=1, m=8, ksub=16)

    def test_dim_mismatch_rejected(self, spark):
        """A stale codebook trained with a different m has wrong
        sub-vector lengths — pq_encode must refuse it, not zip_with-
        truncate into silently wrong distances."""
        import pytest

        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import pq_codebook, pq_encode

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        # trained at m=16 (4-dim entries) but only subs 0..7 kept, so
        # it is dense over 8 x 16 — ONLY the dim guard can catch it
        stale = pq_codebook(e, m=16, ksub=16).filter("sub < 8").localCheckpoint()
        with pytest.raises(ValueError, match="sub-vector dim"):
            pq_encode(e, stale, m=8, ksub=16)


def test_leakage_safe_split_invariants(spark):
    """The split's whole point: no near-dup cluster straddles
    train/val; the assignment is deterministic across runs; both sides
    are populated at the default 10% val rate."""
    from dtle_spark.tableio import load_table
    from dtle_spark.functions.corpus import leakage_safe_split
    from dtle_spark.functions.dedup import minhash_dedup_pairs
    from dtle_spark.functions.graph import connected_components

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5).localCheckpoint()
    clusters = connected_components(pairs).localCheckpoint()
    out = leakage_safe_split(d, clusters).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    # every edge's endpoints share a side (stronger: every cluster)
    by_unit = {}
    for r in out:
        by_unit.setdefault(r["unit_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_unit.values())
    for p in pairs.collect():
        assert split_of[p["id_1"]] == split_of[p["id_2"]]
    sides = set(split_of.values())
    assert sides == {"train", "val"}
    # deterministic: a second run reproduces the exact assignment
    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(d, clusters).collect()}
    assert again == split_of


def test_canonical_docs_invariants(spark):
    """Exactly one canonical per cluster, and it carries the cluster's
    max quality (ties to lowest id)."""
    from dtle_spark.queries import REGISTRY

    out = REGISTRY["canonical_docs"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1
        best = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert canon[0]["doc_id"] == best["doc_id"]


def test_perplexity_buckets_balanced_and_ordered(spark):
    """ntile bands are balanced (sizes differ by <= 1) and ordered:
    every head score >= every middle score >= every tail score."""
    from dtle_spark.queries import REGISTRY

    out = REGISTRY["perplexity_buckets"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    bands = {}
    for r in out:
        bands.setdefault(r["band"], []).append(r["mean_bits"])
    sizes = sorted(len(v) for v in bands.values())
    assert sizes[-1] - sizes[0] <= 1
    assert min(bands["head"]) >= max(bands["middle"]) >= min(bands["middle"])
    assert min(bands["middle"]) >= max(bands["tail"])


class TestPerplexityBandsSampled:
    """The sampled-threshold production lane of perplexity_buckets
    (textstats.perplexity_buckets_sampled): same band semantics, no
    global sort — pytest-pinned against the oracle-gated ntile lane,
    the same pairing as the xxhash64-vs-md5 dedup lanes."""

    def _docs(self, spark):
        from dtle_spark.tableio import load_table

        return load_table(spark, "/root/testdata/sf0.001", "documents")

    def test_agrees_with_ntile_lane_where_defined(self, spark):
        """Where ntile banding is WELL-DEFINED (the doc's score-tie
        group does not straddle an ntile boundary), the thresholded
        lane must agree. Docs inside a boundary-straddling tie are
        excluded: ntile splits those by id to force equal counts — an
        arbitrary choice no threshold can (or should) reproduce. The
        fixture is extreme here (475 of 500 docs tie at mean_bits=9.0),
        which is exactly why the metric must be tie-aware."""
        from dtle_spark.functions.textstats import (
            perplexity_buckets, perplexity_buckets_sampled,
        )

        docs = self._docs(spark)
        nrows = perplexity_buckets(docs).collect()
        ntile = {r["id"]: r["band"] for r in nrows}
        score_bands: dict = {}
        score_of: dict = {}
        for r in nrows:
            score_bands.setdefault(r["mean_bits"], set()).add(r["band"])
            score_of[r["id"]] = r["mean_bits"]
        sampled = {
            r["id"]: r["band"]
            for r in perplexity_buckets_sampled(docs).collect()
        }
        assert set(ntile) == set(sampled)
        defined = [i for i in ntile if len(score_bands[score_of[i]]) == 1]
        assert defined, "fixture left no unambiguous docs"
        agree = sum(ntile[i] == sampled[i] for i in defined) / len(defined)
        assert agree >= 0.95, f"band agreement {agree} on {len(defined)} docs"
        # ordering invariant holds for the thresholded lane too
        bands: dict = {}
        for r in perplexity_buckets_sampled(docs).collect():
            bands.setdefault(r["band"], []).append(r["mean_bits"])
        assert min(bands["head"]) >= max(bands["tail"])

    def test_near_equal_masses_on_distinct_scores(self, spark):
        """On a score distribution WITHOUT mass ties (600 distinct
        values) the sampled thresholds approximate the equal-mass ntile
        cut: >= 0.9 per-doc agreement and every band within 25% of
        equal mass — the fixture's 9.0-tie pathology, inverted."""
        from dtle_spark.functions.textstats import (
            apply_band_thresholds, fit_band_thresholds,
        )
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        u = spark.range(600).select(
            F.col("id"),
            (F.col("id").cast("double") / 7.0).alias("mean_bits"),
        ).localCheckpoint()
        ts = fit_band_thresholds(u)
        got = {r["id"]: r["bucket"]
               for r in apply_band_thresholds(u, ts).collect()}
        w = Window.orderBy(F.col("mean_bits").desc(), F.col("id"))
        want = {r["id"]: r["bucket"]
                for r in u.withColumn("bucket", F.ntile(3).over(w)).collect()}
        agree = sum(got[i] == want[i] for i in want) / len(want)
        assert agree >= 0.9, f"agreement {agree}"
        from collections import Counter
        masses = Counter(got.values())
        assert all(abs(m - 200) <= 50 for m in masses.values()), masses

    def test_banding_pass_is_map_only(self, spark):
        """The plan pin the lane exists for: given fitted thresholds,
        banding adds NO shuffle, window, or sort over the scores — at
        100 TB it composes into the scoring stage for free."""
        from dtle_spark.functions.textstats import (
            apply_band_thresholds, fit_band_thresholds, unigram_commonness,
        )

        docs = self._docs(spark)
        u = unigram_commonness(docs).localCheckpoint()
        ts = fit_band_thresholds(u)
        plan = apply_band_thresholds(u, ts)._jdf.queryExecution().executedPlan().toString()
        for op in ("Exchange", "Window", "Sort"):
            assert op not in plan, f"banding pass is not map-only: found {op}\n{plan}"

    def test_deterministic_and_ties_never_split(self, spark):
        from dtle_spark.functions.textstats import (
            fit_band_thresholds, perplexity_buckets_sampled,
            unigram_commonness,
        )

        docs = self._docs(spark)
        u = unigram_commonness(docs).localCheckpoint()
        assert fit_band_thresholds(u) == fit_band_thresholds(u)
        a = {(r["id"], r["bucket"]) for r in perplexity_buckets_sampled(docs).collect()}
        b = {(r["id"], r["bucket"]) for r in perplexity_buckets_sampled(docs).collect()}
        assert a == b
        # equal scores -> equal bands (ntile splits ties by id; the
        # thresholded lane must not)
        by_score: dict = {}
        for r in perplexity_buckets_sampled(docs).collect():
            by_score.setdefault(r["mean_bits"], set()).add(r["bucket"])
        assert all(len(v) == 1 for v in by_score.values())

    def test_empty_sample_fails_loud(self, spark):
        import pytest

        from dtle_spark.functions.textstats import (
            fit_band_thresholds, unigram_commonness,
        )

        docs = self._docs(spark)
        u = unigram_commonness(docs).localCheckpoint()
        with pytest.raises(ValueError, match="sample is empty"):
            fit_band_thresholds(u, hex_chars="zz")  # no md5 hex matches


def test_ivf_index_append_equals_rebuild(spark):
    """Incremental IVF maintenance: assigning only the new batch
    against the frozen centroids and unioning equals re-assigning the
    full corpus — same rows, bit for bit (the incremental_dedup
    equivalence, vector edition)."""
    from dtle_spark.tableio import load_table
    from dtle_spark.functions.similarity import (
        ivf_assign_cells, ivf_exact_mean_centroids, ivf_index_append,
    )
    from pyspark.sql import functions as F

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    old = e.filter(F.col("vec_id") % 4 != 0)
    new = e.filter(F.col("vec_id") % 4 == 0)
    # centroids FROZEN from the original corpus (the train event)
    cent = ivf_exact_mean_centroids(old, k=16).localCheckpoint()
    index = ivf_assign_cells(old, cent).localCheckpoint()
    appended = ivf_index_append(index, new, cent)
    rebuilt = ivf_assign_cells(e, cent)
    a = {(r["neighbor_id"], r["cell"], r["n_norm"]) for r in appended.collect()}
    b = {(r["neighbor_id"], r["cell"], r["n_norm"]) for r in rebuilt.collect()}
    assert a == b
    assert appended.count() == e.count()


def test_cluster_representatives_semantics(spark):
    """cluster_representatives: hand-checkable 2-D case — every vector
    lands in its nearest centroid's cell, rank 1 is the TRUE-cosine
    most-central member (a long vector must not outrank a better-
    aligned short one), a zero vector gets centrality 0.0 (a
    deterministic rank, not an engine-ordered NULL), and the n bound
    holds per cell."""
    from dtle_spark.functions.similarity import cluster_representatives

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cent_id long, c_vec array<float>",
    )
    vecs = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),     # perfectly central in cell 0
            (11, [9.0, 3.0]),     # long but tilted: cos < vec 10's
            (12, [1.0, 0.4]),     # cell 0, less central than 10
            (13, [0.0, 2.0]),     # cell 1, perfectly aligned
            (14, [0.1, 1.0]),     # cell 1
            (15, [0.0, 0.0]),     # zero vector: centrality 0.0
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["cell"], r["rank"]): (r["vec_id"], r["centrality"])
        for r in cluster_representatives(vecs, cent, n=2).collect()
    }
    assert got[(0, 1)][0] == 10 and abs(got[(0, 1)][1] - 1.0) < 1e-9
    # vec 11 has the biggest dot but NOT the best cosine: rank 2 goes
    # to whichever of 11/12 is better aligned (12: cos ~0.928 > 11's
    # ~0.949?) — compute: 11 cos = 9/sqrt(90)=0.9487; 12 cos =
    # 1/sqrt(1.16)=0.9285 -> 11 wins rank 2 on true cosine
    assert got[(0, 2)][0] == 11
    assert got[(1, 1)][0] == 13 and abs(got[(1, 1)][1] - 1.0) < 1e-9
    assert got[(1, 2)][0] == 14
    # zero vector fell outside both cells' top-2; with n=3 it appears
    # with centrality exactly 0.0
    all3 = {r["vec_id"]: r["centrality"]
            for r in cluster_representatives(vecs, cent, n=3).collect()}
    assert all3[15] == 0.0
    # n bound holds
    assert cluster_representatives(vecs, cent, n=1).count() == 2


class TestRpEmbedAnn:
    """rp_text_embedding (the oracle-gated feature-hashing lane,
    dedup.py) composed into the ANN stack: the documents table flows
    into the persisted IVF-PQ index with no external model. The
    neighbor semantics are oracle-gated by the rp_embed_neighbors
    registry query; here the index composition is pinned."""

    def test_docs_to_ann_index_composition(self, spark, tmp_path):
        """rp embeddings (60-dim int counts) feed the IVF-PQ stack with
        m=6 (60 % 6 == 0): train on the md5 sample, build the persisted
        index, and the indexed+reranked search recalls a solid majority
        of the exact top-5 — the docs->vector bridge end to end."""
        from pyspark.sql import functions as F

        from dtle_spark.functions import dedup as dd
        from dtle_spark.functions import similarity as sim
        from dtle_spark.tableio import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        e = (
            dd.rp_text_embedding(d, "doc_id", "text")
            .select(
                F.col("doc_id").alias("vec_id"),
                F.expr("transform(emb, x -> CAST(x AS FLOAT))").alias(
                    "embedding"
                ),
            )
            .filter(
                F.expr(
                    "aggregate(embedding, CAST(0 AS DOUBLE),"
                    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
                )
                > 0
            )
            .localCheckpoint()
        )
        m, dim = 6, 60
        tr = sim.md5_train_sample(e)
        cent = sim.ivf_exact_mean_centroids(tr, k=16, dim=dim).localCheckpoint()
        cb = sim.pq_refine(
            tr, sim.pq_codebook(tr, m=m, ksub=16, dim=dim, means=cent),
            steps=2, m=m, ksub=16, dim=dim,
        ).localCheckpoint()
        path = str(tmp_path / "docvec_index")
        sim.ivf_pq_build_index(e, cent, cb, m=m, ksub=16, dim=dim, path=path)
        q = e.filter(F.col("vec_id") % 97 == 0)
        got = sim.ivf_pq_topk_indexed(
            spark, path, q, cent, cb, vectors=e, k=5, nprobe=8,
            m=m, ksub=16, dim=dim, rerank=50,
        )
        exact = sim.brute_force_topk(e, q, id_col="vec_id", k=5)
        g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
        x = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        assert len(x) > 0
        recall = len(g & x) / len(x)
        assert recall >= 0.6, recall


class TestRetrieval:
    """BM25/RRF beyond the oracle gates (bm25_topk / hybrid_rrf
    registry queries): fusion algebra on handmade rankings."""

    def test_rrf_fusion_algebra(self, spark):
        """A doc ranked in BOTH lists outscores docs in one; ties break
        by id; absent entries contribute zero, not null-poisoning."""
        from dtle_spark.functions.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "id long, rank int"
        )
        b = spark.createDataFrame(
            [(2, 1), (9, 2), (3, 3)], "id long, rank int"
        )
        out = {r["id"]: (r["rank"], r["rrf"]) for r in
               rrf_fuse([a, b], k0=60, k=10).collect()}
        # doc 2: 1/62 + 1/61 tops everything; doc 3 in both beats
        # single-list docs 1 (1/61) and 9 (1/62)
        assert out[2][0] == 1 and out[3][0] == 2
        assert out[1][0] == 3 and out[9][0] == 4
        assert out[1][1] == 1.0 / 61 and out[9][1] == 1.0 / 62
        assert abs(out[2][1] - (1 / 62 + 1 / 61)) < 1e-15


class TestIvfPqPersistedIndex:
    """ivf_pq_build_index(path=...) + ivf_pq_topk_indexed: the on-disk
    cell-partitioned layout and its partition-pruned read path."""

    def _tables(self, spark):
        from dtle_spark.tableio import load_table
        from dtle_spark.functions.similarity import (
            ivf_exact_mean_centroids, md5_train_sample, pq_codebook, pq_refine,
        )
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = e.filter(F.col("vec_id") % 50 == 0)
        tr = md5_train_sample(e)
        cent = ivf_exact_mean_centroids(tr, k=16).localCheckpoint()
        cb = pq_refine(tr, pq_codebook(tr, m=8, ksub=16),
                       steps=2, m=8, ksub=16).localCheckpoint()
        return e, q, cent, cb

    def test_indexed_equals_inline(self, spark, tmp_path):
        """Searching the persisted index returns EXACTLY what the
        inline tier computes from the same trained tables — same rows,
        same cosines (shared ADC stage, pytest-pinned)."""
        from dtle_spark.functions.similarity import (
            ivf_pq_build_index, ivf_pq_topk, ivf_pq_topk_indexed,
        )

        e, q, cent, cb = self._tables(spark)
        path = str(tmp_path / "ivfpq_index")
        ivf_pq_build_index(e, cent, cb, path=path)
        inline = ivf_pq_topk(e, q, k=10, nprobe=4, rerank=100,
                             centroids=cent, codebook=cb)
        indexed = ivf_pq_topk_indexed(
            spark, path, q, cent, cb, vectors=e, k=10, nprobe=4, rerank=100)
        key = lambda r: (r["query_id"], r["rank"])
        a = {key(r): (r["neighbor_id"], r["cell"], r["cosine"]) for r in inline.collect()}
        b = {key(r): (r["neighbor_id"], r["cell"], r["cosine"]) for r in indexed.collect()}
        assert a == b and len(a) > 0

    def test_filtered_search_equals_inline_on_filtered_corpus(
        self, spark, tmp_path
    ):
        """FILTERED (hybrid) search over a carry_cols-attributed index:
        ivf_pq_topk_indexed(where=...) == ivf_pq_topk over the
        pre-filtered corpus — same model means same codes and same
        probes, so restricting candidates by the carried metadata
        column commutes with encoding. The predicate reaches the probed
        cells' parquet scan as a PushedFilter."""
        import re

        from pyspark.sql import functions as F

        from dtle_spark.functions.similarity import (
            ivf_pq_build_index, ivf_pq_topk, ivf_pq_topk_indexed,
        )
        from dtle_spark.tableio import load_table

        e, q, cent, cb = self._tables(spark)
        labeled = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        path = str(tmp_path / "ivfpq_index")
        ivf_pq_build_index(labeled, cent, cb, path=path,
                           carry_cols=("label",))
        indexed = ivf_pq_topk_indexed(
            spark, path, q, cent, cb, k=10, nprobe=4,
            where=F.col("label") < 3,
        )
        inline = ivf_pq_topk(
            labeled.filter(F.col("label") < 3), q, k=10, nprobe=4,
            centroids=cent, codebook=cb,
        )
        key = lambda r: (r["query_id"], r["rank"])
        a = {key(r): (r["neighbor_id"], r["qcos"]) for r in indexed.collect()}
        b = {key(r): (r["neighbor_id"], r["qcos"]) for r in inline.collect()}
        assert a == b and len(a) > 0
        plan = indexed._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert m and "label" in m.group(1), plan[:2000]

    def test_exclude_self_off_for_independent_query_ids(self, spark, tmp_path):
        """Query streams with their OWN id space must not lose the
        corpus vector sharing a query's number: exclude_self=False
        keeps it (here the query IS corpus vector 0 relabeled, so the
        self-match surfaces at rank 1, cosine 1); the default True is
        the corpus-drawn-queries contract and drops it."""
        from pyspark.sql import functions as F

        from dtle_spark.functions.similarity import (
            ivf_pq_build_index, ivf_pq_topk_indexed,
        )

        e, q, cent, cb = self._tables(spark)
        path = str(tmp_path / "ivfpq_index")
        ivf_pq_build_index(e, cent, cb, path=path)
        probe = e.filter(F.col("vec_id") == 0)  # query_id 0 = corpus id 0
        kept = ivf_pq_topk_indexed(
            spark, path, probe, cent, cb, k=5, nprobe=4, exclude_self=False
        ).collect()
        top = {r["rank"]: r["neighbor_id"] for r in kept}
        assert top[1] == 0
        dropped = ivf_pq_topk_indexed(
            spark, path, probe, cent, cb, k=5, nprobe=4
        ).collect()
        assert 0 not in {r["neighbor_id"] for r in dropped}

    def test_probe_scan_prunes_partitions(self, spark, tmp_path):
        """The layout's whole point: the indexed search's scan reads
        ONLY the probed cells' partitions — PartitionFilters carry the
        cell IN (...) predicate, and the scanned partition count equals
        the probed cell count, not n_cells."""
        import re

        from dtle_spark.functions.similarity import (
            ivf_pq_build_index, ivf_pq_topk_indexed,
        )
        from pyspark.sql import functions as F

        e, q, cent, cb = self._tables(spark)
        path = str(tmp_path / "ivfpq_index")
        ivf_pq_build_index(e, cent, cb, path=path)
        one_q = q.filter(F.col("vec_id") == 0)  # 1 query -> nprobe cells
        out = ivf_pq_topk_indexed(spark, path, one_q, cent, cb,
                                  k=5, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "cell" in m.group(1), plan[:2000]
        # results only ever come from the <= nprobe probed cells
        assert out.select("cell").distinct().count() <= 2


def test_drift_cells_slices_equal_separate_sketches(spark):
    """r16 fused drift-cell build: the kind-0 slice must equal
    cms_sketch and the kind-1 slice loghist_sketch over the same
    input (cells AND counts), global and grouped — the invariant that
    makes dq's fused TV chain bit-identical to the per-kind chains."""
    from pyspark.sql import functions as F

    from dtle_spark.functions import sketches as sk
    from dtle_spark.tableio import load_table
    from tests.conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders").limit(500)
    x = "CAST(round(o_totalprice * 100) AS BIGINT)"
    fused = sk.drift_cells(o, "o_orderpriority", x, depth=4, width=64).collect()
    cms = {(r["row"], r["bucket"]): r["cnt"]
           for r in sk.cms_sketch(o, "o_orderpriority", depth=4, width=64).collect()}
    lh = {(r["e"], r["sub"]): r["cnt"]
          for r in sk.loghist_sketch(o.selectExpr(f"{x} AS x"), "x").collect()}
    got_cms = {(r["a"], r["b"]): r["cnt"] for r in fused if r["kind"] == 0}
    got_lh = {(r["a"], r["b"]): r["cnt"] for r in fused if r["kind"] == 1}
    assert got_cms == {(int(k[0]), int(k[1])): v for k, v in cms.items()}
    assert got_lh == {(int(k[0]), int(k[1])): v for k, v in lh.items()}

    fused_g = sk.drift_cells_grouped(
        o, "o_orderpriority", "o_orderstatus", x, depth=4, width=64
    ).collect()
    cms_g = {(r["grp"], r["row"], r["bucket"]): r["cnt"]
             for r in sk.cms_sketch_grouped(o, "o_orderpriority",
                                            "o_orderstatus", depth=4,
                                            width=64).collect()}
    lh_g = {(r["grp"], r["e"], r["sub"]): r["cnt"]
            for r in sk.loghist_sketch_grouped(
                o.selectExpr("o_orderpriority", f"{x} AS x"),
                "o_orderpriority", "x").collect()}
    got_cms_g = {(r["grp"], r["a"], r["b"]): r["cnt"]
                 for r in fused_g if r["kind"] == 0}
    got_lh_g = {(r["grp"], r["a"], r["b"]): r["cnt"]
                for r in fused_g if r["kind"] == 1}
    assert got_cms_g == {(k[0], int(k[1]), int(k[2])): v for k, v in cms_g.items()}
    assert got_lh_g == {(k[0], int(k[1]), int(k[2])): v for k, v in lh_g.items()}
