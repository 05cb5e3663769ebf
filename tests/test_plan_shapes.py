"""Physical-plan regression tests (SURVEY.md §4, the 100-TB contract).

Each assertion pins a plan property the scale design depends on — the
properties that silently regress when a query is refactored: predicate
pushdown reaching the parquet scan, column pruning, broadcast staying
broadcast, global top-k avoiding a global sort, and the IVF centroid
assignment staying a partial+final aggregate instead of an N x k window.

Plans are built (not executed): `executedPlan().toString()` on the
pre-AQE physical plan is enough for these static shapes.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    from __spark_entry__ import queries

    df = queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_reach_the_scan(spark):
    plan = _plan(spark, "proj_filter_pushdown")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # pushdown: the shipdate/discount predicates are scan DataFilters
    assert "l_shipdate" in scan and "l_discount" in scan
    # pruning: only the 4 referenced columns are read (of 16 in lineitem)
    cols = scan.split("FileScan parquet [")[1].split("]")[0].split(",")
    assert len(cols) == 4, cols


def test_dim_join_is_broadcast_hash(spark):
    plan = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_global_topk_has_no_global_sort(spark):
    plan = _plan(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan
    # a global Sort + Limit would read "Sort [.. ASC" above an Exchange
    assert "rangepartitioning" not in plan


def test_ivf_assignment_is_partial_aggregate_not_window(spark):
    plan = _plan(spark, "ann_ivf_topk")
    # assignment: broadcast NLJ feeding a partial min_by (map-side combine
    # collapses N x k candidate rows before any exchange)
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_min_by" in plan
    # every Window left in the plan is the bounded per-query top-3, never
    # one partitioned by vec_id (the old N x k assignment shape)
    windows = [l for l in plan.splitlines() if "Window [" in l]
    assert all("query_id" in w for w in windows), windows
    assert not any(
        "windowspecdefinition(vec_id" in l for l in plan.splitlines()
    )


def test_ivf_training_updates_are_partial_aggregates(spark):
    """The trained quantizer's Lloyd updates (round-3 item 1): centroid
    means are hash aggregates over (cid, dim) skinny rows — partial
    map-side combine, no window, no collect-to-driver training loop."""
    plan = _plan(spark, "ann_ivf_topk")
    assert "partial_avg" in plan  # centroid update combines map-side
    # probe-cell ranking windows over the bounded query sample only
    assert "windowspecdefinition(vec_id" not in plan


def test_ivf_bucketed_probe_prunes_buckets_no_index_exchange(spark):
    """The persisted-index probe (round-3): the cid.isin(probe cells)
    filter must engage BUCKET PRUNING on the bucketed index scan, the
    bounded query side must broadcast, and the index side must flow
    scan→join with no Exchange — the layout that makes ANN serving
    shuffle-free at 100 TB."""
    plan = _plan(spark, "ann_ivf_bucketed_probe")
    lines = plan.splitlines()
    scan_i = next(
        i for i, l in enumerate(lines)
        if "FileScan" in l and "ivf_index" in l
    )
    scan = lines[scan_i]
    assert "Bucketed: true" in scan, scan
    assert "SelectedBucketsCount" in scan, scan
    # the index scan's direct parent is the probe-cell INSET filter —
    # scan feeds the join with nothing in between (in particular no
    # Exchange; the only cid exchanges in the plan are the k-sized Lloyd
    # TRAINING aggregations inside the codebook, which is fine)
    assert "INSET" in lines[scan_i - 1], lines[scan_i - 1]
    assert "BroadcastExchange" in plan  # bounded query side broadcasts


def test_lsh_candidate_join_is_bucket_equi_join(spark):
    """Multi-probe SRP-LSH (round-3 item 2): the candidate join keys on
    the bucket id (hash-partitionable equi-join); the multi-probe explode
    lands on the bounded query side, never the N-row index side."""
    plan = _plan(spark, "ann_lsh_bucketed")
    assert "NestedLoop" not in plan
    assert "Generate explode" in plan  # probe masks explode (query side)
    joins = [l for l in plan.splitlines() if "Join" in l and "probe" in l]
    assert joins, plan  # equi-join keyed on the probe/bucket pair


def test_embedding_dedup_blocks_on_srp_bucket(spark):
    """dedup_embedding_cosine (round-3 item 3): candidate pairs come from
    an equi-join on the SRP bucket (cardinality 2**n_bits, a parameter),
    not the round-2 per-label all-pairs join (O(block^2) with a fixed
    handful of labels)."""
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "NestedLoop" not in plan
    assert "label" not in plan  # label no longer read at all (pruned scan)
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert any("bucket" in l for l in join_lines), join_lines


def test_salted_agg_is_two_level(spark):
    plan = _plan(spark, "salted_two_level_agg")
    # both aggregation levels carry partial+final pairs
    assert plan.count("partial_") >= 2


@pytest.mark.parametrize("name", ["dedup_minhash_lsh", "dedup_minhash_fast"])
def test_minhash_signatures_join_on_band_and_hash(spark, name):
    plan = _plan(spark, name)
    # the candidate join must be an equi (hash-partitionable) join on the
    # signature, never a nested-loop over doc pairs
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    assert "NestedLoop" not in plan


def test_tpch_q3_is_takeordered_with_broadcast_dim(spark):
    plan = _plan(spark, "tpch_q3_shipping")
    # top-10 must be TakeOrderedAndProject, never a global sort + limit
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    # the filtered customer dim broadcasts; date filters reach the scans
    assert "BroadcastHashJoin" in plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert any("l_shipdate" in s for s in scans)
    assert any("o_orderdate" in s for s in scans)


def test_subquery_corr_scalar_is_decorrelated(spark):
    from __spark_entry__ import queries

    df = queries()["subquery_corr_scalar"](spark, SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # Catalyst must rewrite the correlated scalar subquery into an
    # aggregate-on-correlation-key joined back to the outer table; a
    # surviving scalar-subquery node would mean per-row re-execution
    assert "scalar-subquery" not in opt.lower()
    assert "Aggregate" in opt and "Join" in opt


def test_bucketed_join_has_no_exchange(spark):
    # the §4 bucketing contract: both sides bucketed+sorted on the join
    # key -> SortMergeJoin directly over the scans, zero shuffles even
    # with broadcast disabled (at real scale neither side broadcasts)
    from ner_spark.queries_relational import _ensure_bucketed

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o_n, li_n = _ensure_bucketed(spark, SF_DIR)
        o, li = spark.table(o_n), spark.table(li_n)
        j = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_extendedprice"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2


def test_q18_semi_join_rewrite(spark):
    # IN (grouped HAVING subquery) must become a semi join against the
    # aggregated keys, never a per-row subquery re-execution
    plan = _plan(spark, "tpch_q18_large_volume")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_q17_is_decorrelated_to_agg_join(spark):
    # the correlated AVG must plan as one per-partkey aggregate joined
    # back (2 passes total), not a correlated re-scan
    plan = _plan(spark, "tpch_q17_small_qty")
    assert "partial_avg" in plan
    assert "Subquery" not in plan  # no per-row scalar subquery node


def test_explode_is_pipelined_generate(spark):
    plan = _plan(spark, "explode_lateral")
    assert "Generate posexplode" in plan
    assert "Exchange" not in plan  # row expansion never shuffles


def test_not_in_plans_null_aware_anti_join(spark):
    plan = _plan(spark, "join_null_aware_anti")
    # trailing 'true' on the BHJ line = isNullAwareAntiJoin
    assert "LeftAnti, BuildRight, true" in plan, plan


def test_partitioned_scan_prunes_on_partition_key(spark):
    plan = _plan(spark, "scan_partition_pruned")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # the partition-key predicate prunes directories at listing time...
    assert "PartitionFilters: [isnotnull(event_type" in scan
    assert "= purchase)" in scan
    # ...while the value predicate pushes into parquet row groups
    assert "GreaterThan(value,50.0)" in scan
    # and event_type is a partition column, never read as data
    assert "ReadSchema: struct<user_id:bigint,value:double>" in scan


def test_dynamic_partition_pruning_fires_on_fact_dim_join(spark):
    # DPP: a filter on the dim side prunes the partitioned fact's scan at
    # run time via a dynamicpruning subquery on the partition key
    from pyspark.sql import functions as F

    from ner_spark.queries_relational import _ensure_partitioned_events

    path = _ensure_partitioned_events(spark, SF_DIR)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("click", 0), ("view", 0), ("error", 0), ("signup", 0)],
        "event_type string, is_rev int",
    )
    j = (
        fact.join(dim, "event_type")
        .where(F.col("is_rev") == 1)
        .groupBy("event_type")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan


def test_arrow_ann_is_map_side_topk(spark):
    plan = _plan(spark, "ann_topk_arrow")
    assert "MapInArrow" in plan
    # the only exchange ranks the O(queries x k x batches) candidates,
    # never the full N scored rows: it must sit ABOVE the MapInArrow
    pre_arrow = plan.split("MapInArrow")[-1]
    assert "Exchange" not in pre_arrow


def test_aqe_splits_skewed_join_partitions(spark):
    """Runtime skew handling (§4.1, north rule 'AQE skew-join'): a
    SortMergeJoin whose left side is one hot key must come out of AQE
    with skew=true (the skewed partition split into parallel sub-reads)
    under cluster-realistic thresholds scaled to fixture bytes."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # hot key 0 carries 200k rows; 63 cold keys carry ~3k each
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") < 200_000, 0)
            .otherwise(F.col("id") % 64)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 64).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        j = left.join(right, "k").groupBy("tag").count()
        j.collect()  # AQE decides skew splits at runtime
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan


def test_merge_upsert_fact_side_never_shuffles(spark):
    # MERGE-as-dataflow: the CDC delta must broadcast into a LeftAnti
    # hash join; a SortMergeJoin here would shuffle the full fact table
    plan = _plan(spark, "merge_upsert_orders")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_mix_domains_rates_table_is_broadcast(spark):
    plan = _plan(spark, "mix_domains_weighted")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_shuffle_running_window(spark):
    # one hash Exchange onto the stream key, then a single Window with a
    # running (UNBOUNDED PRECEDING..CURRENT ROW) frame — no extra sort
    # passes, no second shuffle
    plan = _plan(spark, "pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan


def test_label_prop_argmax_is_aggregate_not_window(spark):
    # the per-node label argmax must stay a max_by(struct) hash
    # aggregate (map-side combinable); a row_number window would add a
    # sort per iteration. checkpoint=False keeps the iteration plan
    # visible (the registered query checkpoints, leaving only an
    # ExistingRDD scan to inspect).
    from ner_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    df = label_propagation(edges, iters=1, checkpoint=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan
    assert "Window" not in plan


def test_text_repetition_prunes_to_two_columns(spark):
    # only (doc_id, text) of the 5 document columns may be read, and the
    # n-gram expansion must not introduce any nested-loop join
    plan = _plan(spark, "text_repetition")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    for s in scans:
        cols = s.split("FileScan parquet [")[1].split("]")[0].split(",")
        assert len(cols) <= 2, s
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_keep_best_winner_is_aggregate_not_window(spark):
    plan = _plan(spark, "dedup_keep_best")
    # winner per cluster = partial+final max_by(doc_id, struct(...)) hash
    # aggregate (map-side combine); the oracle's ROW_NUMBER formulation
    # would appear as a Window partitioned by cluster_id — forbidden here
    assert "partial_max_by" in plan
    assert not any(
        "cluster_id" in l for l in plan.splitlines() if "Window [" in l
    ), "winner selection regressed to a per-cluster window sort"


def test_decontaminate_probe_broadcasts_the_eval_side(spark):
    plan = _plan(spark, "dedup_decontaminate")
    # the benchmark gram set is the broadcast build side; the corpus
    # (100-TB side) must stream past it without a shuffle for the probe
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_cogroup_survives_column_pruning(spark):
    """Regression: df.count() on the cogrouped as-of join. With both
    cogroup sides built from one shared scan, Spark 4.1's column pruning
    under a zero-column parent misbinds the right side's attributes and
    the pandas UDF crashes (KeyError: 'ts') — only on count()-like
    plans, so the full-materialization differential never saw it. The
    query now reads each side from its own scan; this pins both paths."""
    from __spark_entry__ import queries

    df = queries()["join_asof_cogroup"](spark, SF_DIR)
    assert df.count() == len(df.toPandas())


def test_kmeans_assignment_is_partial_aggregate_not_window(spark):
    plan = _plan(spark, "kmeans_lloyd")
    # every assignment round: broadcast centroids -> BNLJ -> partial
    # min_by; regressing to a row_number window over the N x k cross
    # product is the scale-killer ann_ivf round 1 had
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_min_by" in plan
    assert "windowspecdefinition(vec_id" not in plan


def test_bm25_stats_are_broadcast_and_topk_is_takeordered(spark):
    plan = _plan(spark, "text_bm25_topk")
    # the O(1)/O(|query|) side tables join back as broadcasts; the final
    # cut is TakeOrderedAndProject, never a global sort
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Generate explode" in plan  # tokenization is a pipelined Generate


def test_lateral_topk_is_map_side_window_group_limit(spark):
    plan = _plan(spark, "join_lateral_topk")
    # DecorrelateInnerQuery + WindowGroupLimit: a PARTIAL top-k per key
    # runs before the exchange, so the shuffle carries <=k rows per key
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "BroadcastHashJoin" in plan


def test_unpivot_is_shuffle_free_expand(spark):
    plan = _plan(spark, "unpivot_lineitem_metrics")
    assert "Expand" in plan
    assert "Exchange" not in plan  # melt never shuffles


def test_vocab_topk_is_two_level_agg_with_takeordered(spark):
    plan = _plan(spark, "text_vocab_topk")
    # two-level: partial agg on (token, doc_id) collapses repeats before
    # the token shuffle; top-50 never global-sorts
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_bloom_runtime_filter_injects_on_fact_scan(spark):
    """Runtime bloom-filter join pruning: under the shared injection
    knobs the selective orders predicate becomes a bloom_filter_agg
    subquery whose might_contain probe lands on the lineitem side BEFORE
    the join, and the filtered values equal the plain join's (decimal
    sum — exact accumulation, so the two physical plans' differing
    partial-agg orders cannot produce a float mismatch)."""
    from pyspark.sql import functions as F

    from ner_spark.queries_relational import BLOOM_INJECT_CONFS
    from ner_spark.session import set_confs

    def q():
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                ).alias("rev"),
            )
        )

    baseline = {r["l_returnflag"]: (r["n"], r["rev"]) for r in q().collect()}
    with set_confs(spark, BLOOM_INJECT_CONFS):
        df = q()
        got = {r["l_returnflag"]: (r["n"], r["rev"]) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, plan[:2000]
    assert "bloom_filter_agg" in plan
    # the probe must sit on the lineitem (application) side scan branch
    probe_line = next(l for l in plan.splitlines() if "might_contain" in l)
    assert "l_orderkey" in probe_line
    assert got == baseline
