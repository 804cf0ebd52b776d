"""Plan-quality regression tests: the physical plans the docstrings
promise. These fail if a refactor silently loses pushdown, pruning, or
a broadcast — the properties that matter at 100 TB."""

from __future__ import annotations

import pytest

from dtle_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def plan_of(name: str, spark) -> str:
    return (
        REGISTRY[name]
        .spark_fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of("q1_pricing_summary", spark)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # 7 needed columns only — the widest unused column must not be read
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q6_filters_reach_scan(spark):
    plan = plan_of("q6_revenue_delta", spark)
    assert "PushedFilters: [" in plan
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in plan.split("PushedFilters")[1][:400]


def test_q3_broadcasts_customer(spark):
    plan = plan_of("q3_shipping_priority", spark)
    assert "BroadcastHashJoin" in plan


def test_q5_broadcast_chain(spark):
    """All three dims broadcast; the only SortMerge/shuffled join may be
    lineitem⋈orders."""
    plan = plan_of("q5_region_revenue", spark)
    assert plan.count("BroadcastHashJoin") >= 3


def test_where_filter_expression_pushdown(spark):
    plan = plan_of("where_filter", spark)
    # the simple conjuncts push to parquet; pow() stays in the Filter
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:300]


def test_ann_bruteforce_no_corpus_shuffle(spark):
    """Corpus side must not shuffle: query side broadcast, one scan."""
    plan = plan_of("ann_topk_bruteforce", spark)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_text_ops_stay_jvm_side(spark):
    """Text analytics stay JVM-side: no Python eval nodes anywhere.
    (Higher-order lambdas are CodegenFallback, so WholeStageCodegen
    itself isn't required — Python absence is the property that
    matters; the only sanctioned Python is multimodal's mapInPandas.)"""
    for name in ("token_stats", "quality_score", "lang_id", "dedup_exact",
                 "dedup_minhash_lsh", "dedup_simhash", "ann_topk_bruteforce"):
        plan = plan_of(name, spark)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan, name


def test_tfidf_df_join_pruned_and_unforced(spark):
    """The df (document-frequency) table grows with corpus size (Heaps'
    law), so the join must NOT force a broadcast — either strategy is
    valid (AQE/cost decides). What IS pinned: the hapax mass (df = 1) is
    pruned from the join side and recovered via COALESCE, and the join
    is LEFT so pruning never drops terms."""
    from dtle_spark.queries import REGISTRY as R
    from tests.conftest import SF_DIR as S

    df = R["keyword_extract"].spark_fn(spark, S)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly one hint: the deliberate 1-row n_docs broadcast; the df_t
    # (vocabulary) side must carry none
    assert analyzed.count("ResolvedHint") == 1
    n_docs_subtree = analyzed.split("ResolvedHint")[1]
    assert "count(distinct" in n_docs_subtree[:400]
    plan = plan_of("keyword_extract", spark)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "coalesce(df_t" in plan


def test_quantized_ann_broadcast_and_jvm_side(spark):
    """Quantized search keeps the brute-force shape: query side
    broadcast (no corpus shuffle) and zero Python nodes."""
    plan = plan_of("ann_topk_quantized", spark)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_source_mixing_is_map_only_after_thresholds(spark):
    """Per-source thresholds broadcast onto the stream: the corpus side
    of the final join must not shuffle (the only exchanges belong to
    the tiny counts aggregation)."""
    plan = plan_of("source_mixing", spark)
    assert "BroadcastHashJoin" in plan


def test_boilerplate_strip_single_corpus_shuffle_key(spark):
    """Frequency count and anti-join both key on the line digest; the
    anti-join must be a broadcast (the boilerplate set is small) or at
    worst reuse the digest exchange — never a second full-width
    document shuffle."""
    plan = plan_of("boilerplate_strip", spark)
    assert "LeftAnti" in plan


def test_vocab_coverage_window_is_post_agg(spark):
    """The rank window must sit above the term aggregate (vocabulary-
    sized input), not above the corpus-sized explode."""
    plan = plan_of("vocab_coverage", spark)
    # plan strings print root-first: the Window must be a PARENT of the
    # term HashAggregate (earlier in the string), i.e. it consumes the
    # aggregate's vocabulary-sized output
    assert plan.index("Window") < plan.index("HashAggregate")
    # and the explode (corpus-sized Generate) must sit BELOW the
    # aggregate, not below the window directly
    assert plan.index("HashAggregate") < plan.index("Generate")


def test_duplicated_spans_no_pair_join(spark):
    """The ExactSubstr signal must be count-based, never a pair join:
    no nested-loop/cartesian anywhere, and zero Python nodes."""
    plan = plan_of("duplicated_spans", spark)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_commonness_stays_jvm_side(spark):
    """Score join + rollup are pure relational ops; the binary-string
    'log' keeps the scoring JVM-side (no Python eval)."""
    plan = plan_of("unigram_commonness", spark)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_containment_reuses_salted_block_join(spark):
    """Containment keeps the bounded-block economics: an equi-join on
    (block, salt) — never an unconstrained cross join."""
    plan = plan_of("containment_pairs", spark)
    assert "CartesianProduct" not in plan


def test_dsir_proxy_stays_jvm_side_single_vocab_pass(spark):
    """DSIR scoring is pure relational: no Python eval nodes, and the
    two frequency tables come from ONE conditional-count aggregate
    (exactly one HashAggregate keyed on `term` feeding the weight
    join — a second term-keyed pass would double the vocab shuffle)."""
    plan = plan_of("dsir_proxy", spark)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one partial+final pair per distinct grouping; count the FINAL
    # aggregates over the term key
    import re

    finals = [
        m
        for m in re.findall(r"HashAggregate\(keys=\[term[^\]]*\][^\n]*", plan)
        if "partial" not in m
    ]
    assert len(finals) == 1, finals


def test_grouping_sets_single_exchange(spark):
    """GROUPING SETS must expand map-side then aggregate through ONE
    shuffle — not one aggregate per set."""
    plan = plan_of("grouping_sets_orders", spark)
    assert "Expand" in plan
    assert plan.count("Exchange") <= 2  # expand agg + (AQE) result coalesce


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The co-located join technique SCALE.md prescribes for repeated
    big-big joins: persist both sides bucketed on the join key
    (bucketBy + sortBy), and the sort-merge join runs with ZERO
    Exchange — at 100 TB this converts every repeated fact-fact join
    from a full shuffle into local merges. Pinned here so the claim
    stays true against Spark upgrades/config drift."""
    from dtle_spark.tableio import load_table

    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    try:
        (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("bkt_orders"))
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable("bkt_lineitem"))
        joined = spark.table("bkt_orders").join(
            spark.table("bkt_lineitem"),
            spark.table("bkt_orders").o_orderkey
            == spark.table("bkt_lineitem").l_orderkey,
        )
        # force SMJ (no broadcast) so the bucketing is what's tested
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and it actually runs
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_text_rp_embedding_codegen_aggregate_jvm_side(spark):
    """Feature-hashing embeddings run as explode + whole-stage-codegen
    HASH AGGREGATE (the r11 rewrite: the earlier map-only HOF fold ran
    on the interpreted eval path and degraded 3-5x in long sessions —
    megamorphic profile pollution, adjudicated in BASELINE.md). Pin
    the intended shape: partial aggregation map-side (the shuffle
    carries one 61-long row per doc per partition), no Python eval
    nodes, no interpreted-lambda HOFs in the hot path."""
    plan = plan_of("text_rp_embedding", spark)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "HashAggregate" in plan
    # the per-token bit extraction must be codegen'd sums, not an
    # interpreted aggregate() fold over the token array
    assert "aggregate(th" not in plan


def test_exported_shards_partition_pruning(spark, tmp_path):
    """A trainer reading ONE exported shard must scan only that shard's
    partition dir: the shard predicate lands in PartitionFilters (a
    full-corpus scan per shard read would defeat the layout at 100 TB)."""
    from dtle_spark.functions.corpus import export_training_shards
    from dtle_spark.tableio import load_table

    d = load_table(spark, SF_DIR, "documents").limit(200)
    out = str(tmp_path / "corpus")
    export_training_shards(d, out, budget=512, shards=4)
    import os

    data_dir = os.path.join(out, "data")
    one = spark.read.parquet(data_dir).filter("shard = 3")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the shard predicate must land in PartitionFilters (metadata-level
    # pruning), NOT PushedFilters/Filter (which would still list and
    # open every shard's files)
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "shard" in pf and "= 3" in pf.replace("#", " ").replace(")", " ) "), pf
    # and only that shard's rows flow
    rows = one.select("shard").distinct().collect()
    assert [r["shard"] for r in rows] == [3]


def test_dedup_antijoin_no_forced_broadcast(spark):
    """The 'ship the deduplicated corpus' anti-joins must NOT force-
    broadcast the loser set: it is O(duplicate docs) — billions of ids
    at 100 TB — and a forced broadcast is a driver OOM, not a plan
    choice. The analyzed plan must carry no broadcast hint on the
    anti-join; AQE remains free to pick broadcast when the set is
    actually small."""
    for name in ("dedup_materialize", "semantic_dedup"):
        analyzed = (
            REGISTRY[name]
            .spark_fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert "ResolvedHint" not in analyzed, name
        assert "UnresolvedHint" not in analyzed, name


def test_chunk_documents_map_only(spark):
    """Chunking is embarrassingly parallel: no Exchange anywhere —
    tokens/sequence/posexplode run inside the row."""
    plan = plan_of("chunk_documents", spark)
    assert "Exchange" not in plan


def test_temperature_mixing_broadcast_counts_map_only_decision(spark):
    """The per-source count table broadcasts; the keep decision is a
    row-local integer compare (no second shuffle of the corpus)."""
    plan = plan_of("temperature_mixing", spark)
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed: the tiny count aggregation + its
    # broadcast — the corpus side itself must not hash-exchange
    assert "SortMergeJoin" not in plan


def test_pq_search_corpus_side_broadcast_only(spark):
    """PQ ADC scoring must stream the encoded corpus against BROADCAST
    queries/codebook — the corpus never hash-exchanges before scoring
    (the window after scoring partitions by query_id, which is the
    bounded |Q|-keyed set). The rerank joins build on the candidate
    pool and query sides, never shuffling the vector table."""
    from pyspark.sql import functions as F

    from dtle_spark.tableio import load_table
    from dtle_spark.functions import similarity as sim

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    cb = sim.pq_codebook(e, m=16, ksub=16).localCheckpoint()
    out = sim.pq_topk(e, q, k=10, m=16, ksub=16, codebook=cb, rerank=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every join touching the corpus side builds the OTHER side
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    assert "SortMergeJoin" not in plan
    # the encoded-codes scan is the checkpointed index, not a recompute
    assert "Scan ExistingRDD" in plan
    # exchanges exist only for the query_id window + tiny broadcast prep
    import re
    hash_ex = [l for l in plan.splitlines()
               if "Exchange hashpartitioning" in l]
    assert all("query_id" in l for l in hash_ex), hash_ex


def test_gapfill_spine_generated_not_shuffled(spark):
    """The calendar spine comes from explode(sequence) over broadcast
    one-row bounds — generated map-side, never a data-proportional
    shuffle; losing the broadcast would turn the crossJoin into a
    shuffled product."""
    plan = plan_of("gapfill_daily_revenue", spark)
    assert "explode(sequence(" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bounds crossJoin
    assert "CartesianProduct" not in plan


def test_salted_join_salt_survives_to_shuffle(spark):
    """The salt must reach the join keys (spreading the hot key across
    reducers) and be deterministic (xxhash64, not rand)."""
    plan = plan_of("skew_salted_join_spend", spark)
    assert "__salt" in plan
    assert "xxhash64" in plan
    assert "rand(" not in plan


def test_rollup_delta_partial_aggregates(spark):
    """Group-grain deltas partial-aggregate map-side before the
    shuffle — the property that keeps the delta wire cost at group
    cardinality, not batch size."""
    plan = plan_of("cdc_rollup_orders", spark)
    assert "partial_sum" in plan


def test_snapshot_diff_single_full_outer_join(spark):
    """One co-partitioned full-outer join on the PK; the row equality
    fold must not add a second pass over either side."""
    plan = plan_of("snapshot_diff_orders", spark)
    assert plan.count("FullOuter") == 1


def test_triaged_diff_digest_partial_aggregated_and_broadcast_prune(spark):
    """The triage pre-pass digests must partial-aggregate map-side
    (unchanged ranges never shuffle a data row), and the disagreeing
    range set must BROADCAST into the semi-join pruning both sides —
    a shuffled prune would cost what it saves."""
    plan = plan_of("snapshot_diff_triaged_orders", spark)
    assert "partial_sum" in plan and "partial_count" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the exact differ still runs exactly one full-outer key join
    assert plan.count("FullOuter") >= 1


def test_join_view_maintenance_all_broadcast(spark):
    """The join-view IVM queries must never sort-merge: the view mass
    is carved by BROADCAST anti/semi joins on the bounded Δ-key sets
    and the dims broadcast pruned — a shuffled carve would cost what
    incremental maintenance saves (the O(Δ) contract at 100 TB)."""
    for q in ("cdc_join_view_orders", "cdc_star_view_lineitem"):
        plan = plan_of(q, spark)
        assert "SortMergeJoin" not in plan, q
        assert "BroadcastHashJoin" in plan, q
        assert "LeftSemi" in plan and "LeftAnti" in plan, q


def test_temporal_join_extracts_equality_keys(spark):
    """The per-row temporal join must hash-join on the extracted fk
    equality with the interval containment as residual — a nested-loop
    or cartesian over time ranges would be quadratic at scale."""
    plan = plan_of("orders_with_customer_version", spark)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_sketch_queries_partial_aggregate(spark):
    """All sketch lanes (global and grouped) reduce to bounded state
    map-side."""
    for q in ("heavy_hitters_cms", "quantile_sketch_prices",
              "heavy_hitters_cms_by_type", "kmv_distinct_by_priority",
              "dq_drift_by_priority"):
        plan = plan_of(q, spark)
        assert "partial_count" in plan or "partial_sum" in plan, q


def test_grouped_sketch_partial_aggregates(spark):
    """The per-group log-histogram reduces to bounded cells map-side
    (the registry query's final plan starts from the extraction
    checkpoint, so pin the sketch stage itself)."""
    from dtle_spark.functions.sketches import loghist_sketch_grouped
    from dtle_spark.queries import _cents
    from dtle_spark.tableio import load_table
    from pyspark.sql import functions as F

    v = load_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", _cents(F.col("o_totalprice")).alias("cents")
    )
    plan = (
        loghist_sketch_grouped(v, "o_orderpriority", "cents")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan


def test_as_of_read_has_no_extra_key_shuffle(spark):
    """The history derivation owns the one per-key window sort; the
    as-of read adds only a filter on the version intervals — exactly
    one window operator in the whole plan."""
    plan = plan_of("orders_as_of_seq", spark)
    # exactly ONE window operator: the history derivation's lead();
    # the as-of read itself must add none (docstring contract)
    assert plan.count("RunningWindowFunction") + plan.count("Window") == 1
    # the interval read must not introduce a join or second window
    assert "SortMergeJoin" not in plan.split("Window")[0]


def test_minhash_sig_lane_is_codegen(spark):
    """r16 (VERDICT task 3): the minhash signature lane must carry NO
    interpreted higher-order lambdas — the shingle build / md5 / hex
    windows run per exploded row inside whole-stage codegen. Pinned on
    dedup_index_stats, the one minhash consumer whose final plan is not
    truncated by a localCheckpoint (the others pin their token tables,
    which hides the stage; see plans/r16/minhash_sig_stage_*.txt)."""
    plan = plan_of("dedup_index_stats", spark)
    assert "lambdafunction" not in plan
    assert "Generate explode" in plan  # the codegen shingle-index explode


def test_spread_skips_already_repartitioned_frames(spark):
    """ADVICE r15 / r16: when the optimizer's size estimate says
    'small' but the frame is an explicit repartition to >= target
    partitions under only narrow ops, spread() must NOT add a second
    Exchange — and must still add one for a genuinely small frame."""
    from pyspark.sql import functions as F

    from dtle_spark.util import spread

    small = spark.range(1000).select("id", (F.col("id") * 2).alias("v"))
    rp = small.repartition(64).filter("v % 2 = 0").select("id")
    assert spread(rp, min_partitions=32) is rp
    gen = small.repartition(64).select(
        F.explode(F.array("id", "v")).alias("x")
    )
    assert spread(gen, min_partitions=32) is gen
    # below-target repartition still re-spreads
    low = small.repartition(2)
    assert spread(low, min_partitions=32) is not low
    # and a plain small scan still re-spreads
    assert spread(small, min_partitions=32) is not small
