"""Capture .explain('formatted') for the round-15-touched queries.

Usage:
    python tools/capture_plans_r15.py <out_dir> <suffix> [sf_dir]

Writes <out_dir>/<query>_<suffix>.txt for each query in TOUCHED.
Run from the repo (or worktree) whose code state should be captured:
the "before" run executes in a git worktree at the pre-optimization
commit, the "after" run in the working tree.

Plans are captured at sf0.01 (the gate's own scale): physical plan
shape (Exchange count, join strategy, PushedFilters/ReadSchema,
codegen spans) is what the round's claims are about and does not
depend on row counts; queries with eager driver loops (connected
components) stay cheap at this scale.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

from synthea_etl_spark.session import get_session  # noqa: E402

TOUCHED = [
    # codegen text-stat rewrites (gopher/stopword helpers)
    "q188_gopher_quality_rules",
    "q192_curation_funnel",
    "q221_quality_feature_frame",
    "q225_annealing_schedule",
    "q226_crawl_training_pipeline",
    # duplicated-subtree cuts
    "q216_snapshot_churn",
    "q223_site_boilerplate_removal",
    "q229_doremi_reweight",
    "q285_bt_strength",
    # connected-components riders (loop restructure)
    "q71_near_dup_clusters",
    "q180_canonical_near_dup_reps",
    "q195_dup_cluster_histogram",
    "q209_incremental_clusters",
    "q255_cluster_grain_split",
    "q269_dedup_quality_shift",
    "q274_cluster_source_purity",
    "q282_rep_policy_audit",
    # partitioned-write rebalance
    "q204_ivf_rollover_probe",
    # second batch: q200/q31 codegen swaps, q214/q228 subtree cuts
    "q31_text_quality",
    "q200_token_budget_curriculum",
    "q214_split_leakage_audit",
    "q228_crawl_budget_allocation",
    # third batch: q219 scan fusion, q222 single-pass fold
    "q219_recrawl_schedule",
    "q222_token_drift_monitor",
    # fourth batch (found by tools/scan_audit.py): q250's double
    # LM-build, q252's double BM25 stack
    "q250_ppl_rules_calibration",
    "q252_hard_negatives",
    # fourth batch: q220's internal LM-dim duplication (ctx derived
    # from the checkpointed c2 cells; vocab_n checkpointed)
    "q220_bigram_lm_quality",
    "q236_selective_pruning",
    # fifth batch (scan_audit sweep): duplicated-subtree cuts across
    # the remaining multi-scan queries
    "q239_ranking_metrics",
    "q259_ranking_metrics_ann",
    "q25_scd2_two_loads",
    "q82_scd2_asof",
    "q293_rate_cusum_monitor",
    "q272_ann_health_verdict",
    "q273_vocab_drift_jaccard",
    "q244_dedup_axis_funnel",
    "q238_filter_threshold_sweep",
    "q230_unimax_allocation",
    "q201_epoch_repetition_plan",
    "q176_corpus_overlap",
    "q174_proximity_search",
    "q191_mined_bitext",
    "q286_vocab_zipf_audit",
    "q182_temperature_mixture",
    "q185_unigram_nll_quality",
    "q194_dsir_importance",
    "q193_dataset_diff",
    "q196_dataset_card",
    "q197_bloom_dedup_probe",
    "q118_pagerank",
]


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])  # optional: capture just these names
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("capture_plans_r15")
    from synthea_etl_spark.plans import all_queries

    qs = all_queries()
    for name in TOUCHED:
        if only and name not in only:
            continue
        spec = qs.get(name)
        if spec is None:
            print(f"SKIP {name}: not declared")
            continue
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {suffix} (sf_dir={sf_dir})\n")
            fh.write(buf.getvalue())
        print(f"WROTE {path}")
    spark.stop()


if __name__ == "__main__":
    main()
