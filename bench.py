"""Benchmark harness: times headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is executed as a real action (count of the final plan) after a
warm-up of the session; per-query time includes planning + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from spotify_tags_etl_spark.plans import registry
from spotify_tags_etl_spark.session import get_spark

#: Headline queries: one per operator family — scan+filter, 3-way join,
#: group-agg, window, outer-join agg, event-time bucketing.
HEADLINE = [
    "q05_equality_filter",
    "q06_join3_theta_sort",
    "q13_groupby_agg",
    "q14_argmax_window",
    "q23_outer_join_agg",
    "q25_cumulative_window",
    "q26_time_bucket_agg",
]

#: LLM-pipeline suite: the queries whose plans define the 100 TB story —
#: MinHash+LSH near-dup (banded single self-join), hyperplane-LSH ANN,
#: broadcast token-frequency scoring, fused mixture sampling, and the
#: composed training pipeline.
LLM_SUITE = [
    "dd02_minhash_lsh",
    "ss02_lsh_ann",
    "tx08_mean_token_freq",
    "tz07_mixture_sample",
    "tp01_training_pipeline",
    # round-4: the composed curation pipeline (operators/ycuration.py)
    "yp01_curation_pipeline",
    # round-5 (operators/yscale.py): inverted-index sparse retrieval +
    # deterministic per-group reservoir
    "yb02_tfidf_neighbors",
    "yu01_grouped_reservoir_sample",
    "yc01_chunk_documents",
    "yf01_repetition_score",
    "yx01_split_leakage_audit",
    # round-6 (operators/ytrain.py): training-run planners/evals
    "yv01_mixing_schedule",
    "yv02_mrr_eval",
    "yv03_vocab_coverage",
    "yv04_epoch_shuffle",
    # round-6 (operators/yrlhf.py): preference-data construction + eval
    # scoring — the RLHF-era half of the training-data story
    "yv05_preference_pairs",
    "yv08_pass_at_k",
    # round-6 late: BPE merge learning + the per-domain curation gate
    "yv10_bpe_merge_rounds",
    "yv15_domain_quality_gate",
    # round-6 close: off-policy eval (IPS/SNIPS/ESS) + waterfilling
    # token-budget mixing — the policy-scoring and budget-capping steps
    "yv16_ips_offpolicy",
    "yv18_token_waterfill",
    "yv20_lsh_parameter_plan",
    "yv23_rlhf_eval_report",
    # round-8 (operators/zcops.py): sequence packing (the stage that
    # assembles training windows), the tokenizer round-trip audit, the
    # LSH semantic-dedup decision, and the per-source curriculum
    "zc01_sequence_packing",
    "zc02_tokenizer_roundtrip",
    "zc03_semantic_dedup",
    "zc05_curriculum_schedule",
    "zc06_pack_efficiency",
    # round-7 (operators/zaops.py): the tokenizer APPLY step and the
    # Bradley-Terry arena fit
    "za01_bpe_apply",
    "za02_bradley_terry",
    # round-9 (operators/zdops.py): composed reports — the RAG
    # index-build manifest, planner-sized semantic dedup, and
    # contamination-aware packing
    "zd02_rag_index_manifest",
    "zd03_semantic_dedup_planned",
    "zd04_contamination_aware_packing",
    # round-9 late (operators/zeops.py): in-engine quality-classifier
    # training (batch perceptron over hashed bigrams) + the averaged-
    # weight keep/drop gate it deploys
    "ze01_perceptron_filter",
    "ze02_classifier_gate",
    "ze04_gate_calibration",
    "ze05_hard_examples",
    # round-10 late: curated windows snake-assigned to output shards
    # (the packing -> filesystem writer-balance step)
    "zg05_curated_shard_plan",
]

#: Streaming suite: real streaming executions (AvailableNow through the
#: engine) — windowed agg, stateful dedup, foreachBatch CDC merge, and
#: incremental near-dup. Timings include the fixed micro-batch machinery
#: cost, which is the honest number for the streaming path.
STREAMING_SUITE = [
    "st01_stream_windowed_agg",
    "st02_stream_dedup",
    "st08_stream_upsert",
    "st09_stream_neardup",
    "xk03_stream_hll_rollup",
    # round-7: incremental DPO pair construction (versioned-parquet
    # extremes merge) + incremental histogram-merge quantile drift
    "za04_stream_preference_pairs",
    "zb02_stream_quantile_drift",
    # round-8: incremental DSIR importance scoring (census SUM-merge +
    # idempotent per-batch doc histograms) + the streaming padding
    # monitor (order-free banded packing stats as a 13-row SUM-merge)
    "zc04_stream_importance_weights",
    "zc07_stream_pack_efficiency",
    # round-9: the streaming dedup-funnel twin (exact census SUM/MIN
    # merge + per-batch signature/shingle stores) and the streaming
    # index-build manifest (stream-static assignment join)
    "zd05_stream_dedup_funnel",
    "zd07_stream_rag_manifest",
    # round-9 late: streaming classifier-gate census (stream-static
    # scoring against the batch-trained averaged perceptron) and the
    # incremental five-stage curation lineage
    "ze03_stream_classifier_gate",
    "zf02_stream_curation_lineage",
    # round-10 late: incremental Gopher-style hard-rule census (rules
    # are per-doc-local, so the census is a pure SUM-merge)
    "zg07_stream_quality_rules",
]

#: Classic decision-support suite: the TPC-H-shaped multi-way join /
#: top-k / semi-join pipelines (operators/classics.py).
CLASSICS_SUITE = [
    "xq01_shipping_priority",
    "xq02_local_supplier_volume",
    "xq03_returned_items",
    "xq04_large_volume_customers",
    "xq05_global_avg_filter",
    "xq06_nation_volume_shipping",
    "xq08_forecast_revenue",
    "xq09_priority_late_ship",
    "xq10_promo_revenue_share",
    "xq11_disjunctive_revenue",
    "xq12_customer_order_distribution",
    "xq13_top_supplier_revenue",
    "xq14_small_quantity_revenue",
    # round-4 part 2 (operators/classics2.py): the remaining TPC-H shapes
    "yq02_min_cost_supplier",
    "yq08_market_share",
    "yq09_product_profit",
    "yq11_important_stock",
    "yq16_supplier_relationship",
    "yq20_majority_share_suppliers",
    "yq21_sole_return_supplier",
]

#: Analytics / curation suite (round-3 continuation): cohort retention,
#: RFM, duplicated-span detection, HLL rollup merge, bitmap runtime
#: filter, PPS sampling — the event-analytics + data-curation shapes.
ANALYTICS_SUITE = [
    "xc01_cohort_retention",
    "xc02_rfm_segments",
    "xk01_dup_span_detect",
    "xk02_hll_rollup_merge",
    "xb01_bitmap_runtime_filter",
    "xi01_pps_systematic_sample",
    "xz03_ivm_join_delta",
    # round-4: the two ex-global-NTILE plans, now range-partitioned
    # exact ranks (operators/scalerank.py) — benched to keep them honest
    "xh01_equi_depth_histogram",
    "xi04_curriculum_order",
    # round-5 (operators/yscale.py): prefix_sum-powered KS drift test and
    # range-frame Pareto frontier
    "yd02_ks_two_sample",
    "ys01_pareto_frontier",
    "ym01_sequence_pattern_match",
    "yl03_dau_mau_stickiness",
    "yl04_topk_drift",
    "yy01_pipeline_health_report",
    # round-7: mergeable-histogram quantile drift (the t-digest role,
    # exact)
    "za03_quantile_drift",
]

#: Curation/sketch suite (round-3 batch 6): count-min build+estimate
#: (batch and streaming-merged), Bloom decontamination gate, integer
#: PageRank, rolling median, partition-pruned layout round trip.
CURATION_SUITE = [
    "xz06_cms_heavy_hitters",
    "xw06_stream_cms_rollup",
    "xu02_bloom_decontaminate",
    "xg03_pagerank_transitions",
    "xl03_rolling_median",
    "xv03_partition_prune_scan",
    # round-4 additions (operators/ycuration.py)
    "ya01_ngram_novelty",
    "yt01_containment_dedup",
    "yh01_hll_intersection",
    "yw01_lateness_audit",
    "yn01_contrastive_negatives",
    # round-5 (operators/yscale.py): global first-fit compaction planner
    # and the per-day stats manifest it pairs with
    "yz01_compaction_planner",
    "yl01_partition_stats_manifest",
    "yw02_write_audit_publish",
    "yz02_retention_delete_plan",
    # round-6 close: one-pass PR-curve threshold sweep + held-out
    # bigram coverage (the filter-calibration and LM-fit audits)
    "yv21_pr_threshold_sweep",
    "yv22_bigram_coverage",
    # round-7: DSIR-style hashed-n-gram importance scoring (data
    # selection toward a target distribution)
    "zb03_importance_weights",
    # round-9: the per-source dedup-funnel survival report (exact ->
    # near -> semantic, composed from dd01/dd02/zc03) and the five-stage
    # first-drop-reason lineage that extends it with decontamination +
    # DSIR selection
    "zd01_dedup_funnel",
    "zf01_curation_lineage",
    # round-10: the curated-corpus packing manifest and curriculum
    # (zf01 survivors through zc01/zc05 machinery) and the gate
    # threshold sweep (PR curve over the published ze01 fit artifact)
    "zg01_curated_pack_manifest",
    "zg02_curated_curriculum",
    "zg03_gate_threshold_sweep",
    # round-10 late: the per-source corpus datasheet (curation x gate
    # intersection), the Gopher-style first-fail hard-rule census, and
    # the stage-overlap redundancy matrix over the flags artifact
    "zg04_corpus_datasheet",
    "zg06_quality_rule_census",
    "zg08_stage_overlap",
    "zg09_rule_threshold_sweep",
    "zg10_curation_mix_shift",
    # round-11: the unified three-system keep-set (rules -> funnel ->
    # gate at its tuned operating point) with its packed/sharded
    # manifests, the seven-system redundancy matrix, and the unified
    # curriculum — plus the streaming twin of the keep-set
    "zh01_unified_keepset",
    "zh02_unified_pack_manifest",
    "zh03_unified_shard_plan",
    "zh04_stream_unified_keepset",
    "zh05_system_overlap",
    "zh06_unified_curriculum",
    # round-12: the digest-stamped corpus release manifest and the gate
    # operating-point sensitivity sweep over the unified keep-set
    "zi01_release_manifest",
    "zi02_gate_sensitivity",
]

#: Mining/analysis suite (round-3 batches 14-19): rule mining, robust
#: trend, experiment analysis, backtesting, greedy selection, FK discovery.
MINING_SUITE = [
    "xz16_association_rules",
    "xr06_kendall_trend",
    "xs06_ab_test_analysis",
    "xl04_seasonal_naive_backtest",
    "xz10_greedy_cover",
    "xs05_fk_discovery",
    # round-5 (operators/yscale.py): statistical tests, relational matmul,
    # grid spatial join, projection recall eval
    "yg02_rank_sum_test",
    "ye01_int8_projection",
    "yn02_grid_neighbor_join",
    "ye02_projection_recall_eval",
    "yd03_energy_distance",
]


def _git_head() -> str | None:
    """Short hash of the repo HEAD (``+dirty`` when the working tree
    has modifications), or None outside a git checkout — provenance
    for every bench record."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if not head:
            return None
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        return f"{head}+dirty" if dirty else head
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("spotify-tags-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()
    names = [
        n
        for n in HEADLINE + LLM_SUITE + STREAMING_SUITE + CLASSICS_SUITE + ANALYTICS_SUITE + CURATION_SUITE + MINING_SUITE
        if registry.resolve(n) in queries
    ]

    # Warm-up: one untimed pass of EVERY benchmarked query, so each timed
    # run measures steady-state execution (JIT, codegen per operator shape,
    # parquet footer + page cache all paid up front for every shape —
    # warming only one shape would leave the others' first-run codegen in
    # their timed numbers).
    for name in names:
        queries[registry.resolve(name)](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = queries[registry.resolve(name)](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    headline_total = round(sum(timings[n] for n in names if n in HEADLINE), 4)
    llm_total = round(sum(timings[n] for n in names if n in LLM_SUITE), 4)
    stream_total = round(sum(timings[n] for n in names if n in STREAMING_SUITE), 4)
    classics_total = round(sum(timings[n] for n in names if n in CLASSICS_SUITE), 4)
    analytics_total = round(sum(timings[n] for n in names if n in ANALYTICS_SUITE), 4)
    curation_total = round(sum(timings[n] for n in names if n in CURATION_SUITE), 4)
    mining_total = round(sum(timings[n] for n in names if n in MINING_SUITE), 4)
    record = {
        "metric": "headline_suite_wall_clock",
        "value": headline_total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "suites": {
            "headline": headline_total,
            "llm_pipeline": llm_total,
            "streaming": stream_total,
            "classics": classics_total,
            "analytics": analytics_total,
            "curation": curation_total,
            "mining": mining_total,
        },
        # provenance: which commit this record measured (r11 verdict #6
        # — a round must not close against an open record from the
        # wrong commit; tests/test_sweep_records.py checks ancestry)
        "git_head": _git_head(),
    }
    print(json.dumps(record))
    # Insurance against truncated stdout capture (the driver's BENCH_rN
    # record has carried only a tail fragment for several rounds): every
    # run also writes the full JSON to a stable repo path.
    try:
        last = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_last.json")
        with open(last, "w") as fh:
            json.dump(record, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # stdout line is still the contract; the file is best-effort


if __name__ == "__main__":
    main()
