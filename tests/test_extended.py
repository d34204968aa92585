"""Extended-surface tests: approximate aggregate twins (sketches are
not cross-engine comparable, so the oracle covers the exact form and
these cover the approximations with tolerance) and plan-shape
assertions for partition pruning and salting."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import load
from synthea_etl_spark.plans.extended import (
    q45_partition_pruned_read,
    q46_salted_agg,
    q53_distinct_agg,
    q54_percentiles,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_approx_count_distinct_within_tolerance(spark):
    """HLL++ (rsd=2%) must land within 5% of the exact distinct count
    — the mergeable one-pass scale path for q53."""
    e = load(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n_users for r in q53_distinct_agg(spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r.au
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("au"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(approx[t] - n) / n < 0.05, (t, approx[t], n)


def test_percentile_approx_within_tolerance(spark):
    """percentile_approx (accuracy=10000) must land within 2% relative
    of the exact interpolated percentile — the one-pass mergeable
    scale path for q54."""
    e = load(spark, SF_DIR, "events")
    exact = {r.event_type: r.p90 for r in q54_percentiles(spark, SF_DIR).collect()}
    approx = {
        r.event_type: r.ap
        for r in e.groupBy("event_type")
        .agg(F.percentile_approx("value", 0.9, 10000).alias("ap"))
        .collect()
    }
    for t, v in exact.items():
        assert abs(approx[t] - v) <= max(abs(v) * 0.02, 1e-6), (t, approx[t], v)


def test_partition_pruning_reaches_scan(spark):
    """q45's latest-date scalar subquery must prune at the file-index
    level: the scan's PartitionFilters carry the date equality, AND the
    executed scan's numFiles metric shows only the latest date's files
    were read (runtime proof, not just plan shape). AQE is disabled for
    the measurement so the scan node holding the metric is reachable."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = q45_partition_pruned_read(spark, SF_DIR)
        plan = _plan(df)
        assert "PartitionFilters" in plan
        start = plan.index("PartitionFilters")
        assert "event_date" in plan[start : start + 200]

        df.collect()
        scans = []
        stack = [df._jdf.queryExecution().executedPlan()]
        while stack:
            node = stack.pop()
            if node.nodeName().strip().startswith("Scan"):
                metrics = node.metrics()
                it = metrics.iterator()
                vals = {}
                while it.hasNext():
                    kv = it.next()
                    vals[kv._1()] = kv._2().value()
                scans.append(vals)
            children = node.children()
            for i in range(children.length()):
                stack.append(children.apply(i))
        # main scan = the one that read data columns (numFiles > 0 and
        # rows > 0); it must have read exactly one date partition, and
        # numFiles must equal the latest date dir's file count on disk
        # (not the whole layout's) -- the runtime files-read proof
        main = [s for s in scans if s.get("numOutputRows", 0) > 0]
        assert main, scans
        assert main[0].get("numPartitions") == 1, main
        layout = os.path.join(tempfile.gettempdir(), "sparkgraft_part_events")
        date_dirs = sorted(
            d for d in os.listdir(layout) if d.startswith("event_date=")
        )
        latest_files = [
            f
            for f in os.listdir(os.path.join(layout, date_dirs[-1]))
            if f.endswith(".parquet")
        ]
        total_files = sum(
            1
            for d in date_dirs
            for f in os.listdir(os.path.join(layout, d))
            if f.endswith(".parquet")
        )
        assert main[0].get("numFiles") == len(latest_files), (
            main[0].get("numFiles"),
            len(latest_files),
        )
        assert len(latest_files) < total_files
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Co-located joins via bucketing (the 100 TB fact-fact join
    strategy): two tables bucketed by the join key join WITHOUT any
    Exchange in the plan — bucket pruning replaces the shuffle. The
    reference never joins two facts; at scale this is how repeated
    lineitem-orders-grade joins amortize their shuffle to write time."""
    warehouse = str(tmp_path / "wh")
    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        # force the sort-merge path: at real scale neither side fits a
        # broadcast — that's the regime bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name, df, key in (("t_ord", orders, "o_orderkey"), ("t_li", li, "l_orderkey")):
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{warehouse}/{name}")
                .saveAsTable(name)
            )
        j = spark.table("t_li").join(
            spark.table("t_ord"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_li")
        spark.sql("DROP TABLE IF EXISTS t_ord")


def test_salted_agg_no_single_key_reducer(spark):
    """The first (wide) aggregation of the salted plan must group by
    (key, salt) — visible as two HashAggregate pairs in the plan."""
    df = q46_salted_agg(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 4  # partial+final, both phases
    assert "_salt" in plan


def test_no_accidental_cartesian_products(spark):
    """Plan lint over the ENTIRE declared inventory: no query may plan
    a cartesian/broadcast-nested-loop join except the ops that are
    intentionally all-pairs over a broadcast side (brute-force kNN and
    exact near-dup scoring). Guards against a refactor silently
    dropping a join condition."""
    import __spark_entry__ as ent
    from tests.conftest import SF_SMALL

    allowed = {
        "q37_knn_bruteforce",      # broadcast queries x corpus by design
        "q39_knn_ann_lsh",         # broadcast probe set
        "q43_knn_ann_ivf",         # broadcast probe set
        "q72_tfidf_top_terms",     # crossJoin of a 1-row count frame
        "q106_tpch_q11",           # 1-row broadcast scalar threshold
        "q111_expectations",       # fk_check crossJoin of 1-row total
        "q162_bm25_topk",          # crossJoin of the 1-row corpus stats
        "q167_bm25_index_topk",    # same 1-row stats crossJoin, via index
        "q175_cluster_top_terms",  # crossJoin of the 1-row n_clusters
        "q177_chunk_retrieval",    # 1-row stats crossJoin via index
        "q179_hybrid_rrf_retrieval",  # q37 brute arm + q167 1-row stats
        "q182_temperature_mixture",   # crossJoin of the 1-row weight total
        "q183_ivf_index_stats",       # crossJoin of the 1-row mean occupancy
        "q185_unigram_nll_quality",   # crossJoin of the 1-row token total
        "q189_pq_adc_topk",           # broadcast of the bounded query batch
        "q194_dsir_importance",       # crossJoins of the two 1-row LM totals
        "q200_token_budget_curriculum",  # crossJoin of the 1-row token total
        "q201_epoch_repetition_plan",    # crossJoin of the 1-row weight total
        "q208_pq_rerank",                # q189's bounded query-batch crossJoin
        "q220_bigram_lm_quality",        # crossJoins of the 1-row vocab size / OOV nll
        "q221_quality_feature_frame",    # q185's 1-row token-total crossJoin
        "q222_token_drift_monitor",      # crossJoins of the 1-row n_ref / vstats
        "q225_annealing_schedule",       # crossJoins of the 1-row phase budgets
        "q226_crawl_training_pipeline",  # q225's 1-row phase-budget crossJoins
        "q228_crawl_budget_allocation",  # crossJoin of the 1-row budget totals
        "q229_doremi_reweight",          # q220's 1-row vocab/OOV + 1-row ref-NLL/weight-total crossJoins
        "q230_unimax_allocation",        # crossJoins of the 1-row budget/cap totals
        "q236_selective_pruning",        # q220's 1-row vocab-size / OOV-nll crossJoins
        "q238_filter_threshold_sweep",   # crossJoin of the 1-row positive total
        "q239_ranking_metrics",          # q37's broadcast query-panel crossJoin
        "q241_ngram_saturation",         # crossJoin of the 1-row max-id frame
        "q250_ppl_rules_calibration",    # q220's 1-row crossJoins + the 1-row base-rate frame
        "q252_hard_negatives",           # bm25_topk's 1-row corpus-stats crossJoin
        "q254_bootstrap_ci",             # crossJoin of the 1-row point estimate x 1-row bounds
        "q272_ann_health_verdict",       # q183's class: crossJoins of 1-row cell/hit totals
        "q282_rep_policy_audit",         # crossJoins of the 1-row totals x 1-row dropped stats
        "q285_bt_strength",              # crossJoin of the 1-row strength total
        "q293_rate_cusum_monitor",       # crossJoin of the 1-row hour-bounds frame
    }
    bad = []
    for name, fn in ent.queries().items():
        df = fn(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if name in allowed:
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"unintended cartesian/BNLJ in: {bad}"
