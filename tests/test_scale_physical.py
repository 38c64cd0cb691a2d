"""Physical-plan assertions for the scale helpers: bucketing must remove
exchanges, salting must preserve semantics while spreading keys, and the
headline scans must keep pushdown + pruning (the .explain contract the
engine promises in README/SURVEY §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_tags_etl_spark.operators.skew import (
    bucketed_join,
    salted_join,
    salted_sum,
    write_bucketed,
)
from spotify_tags_etl_spark.sources.tpch import load_table


def _executed_plan(df) -> str:
    df.count()  # force AQE final plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_sum_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: r.s
        for r in ev.groupBy("event_type").agg(F.sum(F.col("value").cast("decimal(14,2)")).alias("s")).collect()
    }
    salted = {
        r.event_type: r.s
        for r in salted_sum(ev, "event_type", F.col("value").cast("decimal(14,2)"), out="s").collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey").groupBy("o_custkey").count()
    salted = salted_join(orders, customer, "o_custkey").groupBy("o_custkey").count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_test")
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "bucket_test.orders_b", "o_custkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"), "c_name"),
        "bucket_test.customer_b", "o_custkey",
    )
    yield
    spark.sql("DROP DATABASE IF EXISTS bucket_test CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = bucketed_join(
        spark, "bucket_test.orders_b", "bucket_test.customer_b", "o_custkey", force_sort_merge=True
    )
    plan = _executed_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: zero shuffle on either side
    assert "Bucketed: true" in plan


def test_unbucketed_same_join_shuffles(spark, sf_dir):
    """Control: the same sort-merge join over plain parquet needs an
    Exchange on both sides — the shuffle bucketing eliminates."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"), "c_name")
    plan = _executed_plan(orders.hint("merge").join(customer, "o_custkey"))
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" in plan


def test_headline_scan_pushdown_and_pruning(spark, sf_dir):
    """The q13 contract: the shipdate filter reaches the parquet scan and
    only the 6 needed columns are read (of 10+)."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("q13_groupby_agg").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_broadcast_join_for_small_dim(spark, sf_dir):
    from spotify_tags_etl_spark.plans import registry

    plan = _executed_plan(registry.get("q06_join3_theta_sort").builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q23_preaggregates_below_join(spark, sf_dir):
    """The outer-join aggregate must aggregate orders BEFORE the join —
    shuffling per-customer partials, never full order rows. In the plan:
    the HashAggregate over o_custkey sits below the join, and no aggregate
    over the join output remains above it."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("q23_outer_join_agg").builder(spark, sf_dir)
    plan = _executed_plan(df)
    join_pos = plan.find("Join")
    assert join_pos != -1
    below = plan[join_pos:]
    assert "HashAggregate" in below, "orders aggregation should be below (after in text) the join"
    above = plan[:join_pos]
    assert "HashAggregate" not in above, "no re-aggregation above the join"


def test_partition_pruning_on_partitioned_layout(spark, sf_dir, tmp_path):
    """The 100 TB layout contract: a dataset written partitionBy(lang)
    prunes non-matching partitions at scan — the one-lang query reads one
    directory, visible as PartitionFilters in the scan node."""
    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    df = spark.read.parquet(out).where(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert "isnotnull(lang" in plan or "lang#" in plan
    # and the result only touches the en partition
    n_en = docs.where(F.col("lang") == "en").count()
    assert df.count() == n_en


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_upsert_lww_is_one_keyed_join(spark, sf_dir):
    """st08's engine-level merge must be a single co-partitioned
    full-outer join on the merge key — never a nested-loop/cartesian
    (which would make the standing-table merge quadratic at scale)."""
    from spotify_tags_etl_spark.operators.maintenance import upsert_lww

    base = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_ns").alias("ts_us"), "value"
    ).dropDuplicates(["user_id"])
    changes = base.withColumn("value", F.col("value") + 1)
    plan = _formatted_plan(spark, upsert_lww(base, changes, "user_id", ("ts_us", "event_id")))
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    """tx06's 1→N chunk fan-out must stay inside the scan stage: a narrow
    tokenize → posexplode pipeline with zero Exchanges — at 100 TB the
    chunker reads and emits partition-local, nothing crosses the wire."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("tx06_chunk_tokens").builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode node


def test_redaction_is_shuffle_free_and_jvm_side(spark, sf_dir):
    """tx05 is a pure per-row regexp pipeline: no Exchange, no Python
    eval nodes — everything stays in JVM codegen."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("tx05_redact_pii").builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_ratio_two_shuffles_with_partial_agg(spark, sf_dir):
    """tx07 shuffles exactly twice — once per aggregation level
    ((doc_id,bigram) then doc_id) — and both have map-side partial
    aggregates, so shuffled bytes are O(distinct bigrams), not O(tokens)."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("tx07_repetition_ratio").builder(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 2, f"expected 2 hash exchanges, plan has {n_shuffles}"
    # partial (merge-side) aggregates below each exchange
    assert plan.count("HashAggregate") >= 4


def test_shard_plan_single_agg_shuffle(spark, sf_dir):
    """tz04 reduces to one hash-agg shuffle of N_SHARDS groups plus the
    final tiny range exchange for the ORDER BY."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("tz04_shard_plan").builder(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange rangepartitioning") <= 1


def test_ivf_broadcast_side_is_centroids_only(spark, sf_dir):
    """vx01's only nested-loop join is the deliberate 8-row centroid
    broadcast (probe assignment); the corpus-side join must be a hash or
    sort-merge equi-join on the centroid id, never a cartesian."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("vx01_ivf_ann").builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    # Exactly the deliberate nested-loop joins survive: the two 8-row
    # centroid-broadcast probe assignments (corpus side + query side).
    # A third would mean the corpus-candidate join regressed to NLJ.
    # (formatted mode prints each node twice: tree line + "(n) Node"
    # detail header — count the headers.)
    import re

    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 2
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_salt_is_retry_and_layout_stable(spark, sf_dir):
    """The shuffle salt must be a pure function of row CONTENT: a map-task
    retry (simulated here by a different physical layout) must assign every
    row the same salt, or retried rows land in reduce partitions whose
    output other reducers already fetched (rows double-count or vanish)."""
    from spotify_tags_etl_spark.operators.skew import _row_salt

    ev = load_table(spark, sf_dir, "events").limit(500)
    a = {tuple(r) for r in ev.select("event_id", _row_salt(ev, 16).alias("s")).collect()}
    ev2 = ev.repartition(7)
    b = {tuple(r) for r in ev2.select("event_id", _row_salt(ev2, 16).alias("s")).collect()}
    assert a == b


def test_kmeans_plan_narrow_assignment(spark, sf_dir):
    """vx03: centroids reach every assignment stage as ONE broadcast
    array row and the argmin is a per-row fold — the corpus is NEVER
    hash-exchanged (the window-argmin formulation shuffles corpus×k rows
    on vec_id per iteration); pipeline stays JVM-side."""
    from spotify_tags_etl_spark.operators.similarity import kmeans_assignments

    df = kmeans_assignments(load_table(spark, sf_dir, "embeddings"))
    plan = _executed_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    import re

    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "vec_id" not in keys  # only centroid-stat partials shuffle


def test_mixture_sample_single_corpus_pass(spark, sf_dir):
    """tz07: one corpus scan, zero hash exchanges — the mixture rates are
    driver-computed from an O(#strata) aggregate and fused into the scan
    as a literal when-ladder."""
    from spotify_tags_etl_spark.operators.training import mixture_sample

    df = mixture_sample(load_table(spark, sf_dir, "documents"))
    plan = _executed_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # rates are a literal when-ladder (driver-side O(#strata) stats), so
    # the returned plan is scan -> filter -> project -> output sort:
    # exactly ONE corpus scan and ZERO hash exchanges of any kind.
    assert plan.count("FileScan parquet") == 1
    assert "Exchange hashpartitioning" not in plan


def test_xq02_broadcasts_all_dims(spark, sf_dir):
    """The six-way Q5 shape must broadcast region/nation/supplier (and
    leave orders⋈lineitem as the only real fact-side join) — no
    nested-loop anywhere."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("xq02_local_supplier_volume").builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_xq04_aggregates_once_below_semijoin(spark, sf_dir):
    """Q18's quantity threshold must be computed by ONE lineitem
    aggregate feeding a semi-join — a second aggregate above the join
    (the naive correlated form) would re-shuffle the fact table."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("xq04_large_volume_customers").builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_xz01_prefix_join_shape(spark, sf_dir):
    """The exact sim-join must broadcast the shingle-frequency dim and
    keep every join an equi-join — prefix filtering exists precisely to
    avoid the all-pairs nested loop."""
    from spotify_tags_etl_spark.plans import registry

    df = registry.get("xz01_exact_simjoin_prefix").builder(spark, sf_dir)
    plan = _formatted_plan(spark, df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_bitmap_semi_join_filters_before_exchange(spark, sf_dir):
    """xb01's bitmap pre-filter must (a) be exact vs the plain semi-join,
    (b) actually drop the overwhelming majority of probe rows before the
    closing exact semi-join — the runtime-filter pattern's entire point
    is that the wide exchange carries ~|matches|, not the fact table —
    and (c) broadcast the bitmap (<=1024 rows by construction)."""
    from spotify_tags_etl_spark.operators.skew import bitmap_of, bitmap_semi_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    cheap = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") < 2000)

    got = bitmap_semi_join(li, cheap, "l_orderkey", "o_orderkey")
    plain = li.join(
        cheap.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert sorted(r.l_orderkey for r in got.collect()) == sorted(
        r.l_orderkey for r in plain.collect()
    )

    # Pre-filter selectivity: reconstruct the bitmap-pass set alone.
    bmp = bitmap_of(cheap, "o_orderkey")
    pre = (
        li.withColumn("_p", F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(1 << 16)))
        .withColumn("_seg", F.expr("_p DIV 64"))
        .join(F.broadcast(bmp), F.col("_seg") == F.col("seg"))
        .where(F.expr("(bits & shiftleft(1L, CAST(pmod(_p, 64) AS INT))) != 0"))
    )
    total, passed, matched = li.count(), pre.count(), plain.count()
    assert passed < total * 0.2, (total, passed)   # filter does real work
    assert passed >= matched                        # no false negatives

    plan = _executed_plan(bitmap_semi_join(li, cheap, "l_orderkey", "o_orderkey"))
    assert "BroadcastHashJoin" in plan


def test_xc01_single_user_exchange(spark, sf_dir):
    """Cohort retention must shuffle user-sized data exactly once: the
    collect_set fold (distinct weeks + min in one aggregate), with the
    cohort matrix and its size window both matrix-sized — a self-join
    for cohort size would duplicate the whole user exchange subtree
    (the first cut did exactly that: 5 exchanges, none reused)."""
    import re

    from spotify_tags_etl_spark.plans import registry

    df = registry.get("xc01_cohort_retention").builder(spark, sf_dir)
    plan = _executed_plan(df)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 3, plan
    assert len(re.findall(r"Exchange hashpartitioning\(user_id", plan)) == 1, plan


def test_xn02_windows_share_one_exchange(spark, sf_dir):
    """Both of xn02's window passes (greedy cumsum + per-source total)
    must share a single source-keyed exchange — a second shuffle for
    the unordered total would double the wide work for no reason."""
    import re

    from spotify_tags_etl_spark.plans import registry

    plan = _executed_plan(registry.get("xn02_token_budget_cap").builder(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_new_maintenance_ops_stay_jvm_side(spark, sf_dir):
    """xl01/xw02/xz03 are pure DataFrame algebra: no Python eval nodes,
    and the expected join strategies — xw02's full outer cannot
    broadcast (SMJ is correct); xl01's spine join and xz03's delta join
    may broadcast at gate scale."""
    from spotify_tags_etl_spark.plans import registry

    for name, must_not in (
        ("xl01_gap_fill_locf", ("EvalPython", "CartesianProduct")),
        ("xw02_table_diff", ("EvalPython", "BroadcastNestedLoopJoin")),
        ("xz03_ivm_join_delta", ("EvalPython", "CartesianProduct")),
    ):
        plan = _executed_plan(registry.get(name).builder(spark, sf_dir))
        for bad in must_not:
            assert bad not in plan, (name, bad)
    # full outer must be a sort-merge join
    plan = _executed_plan(registry.get("xw02_table_diff").builder(spark, sf_dir))
    assert "SortMergeJoin" in plan and "FullOuter" in plan


def test_dynamic_partition_pruning_via_dim_join(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: when the partition-key predicate lives
    on a JOINED dim (not the fact scan), Catalyst must inject a runtime
    subquery filter into the fact's PartitionFilters — the optimization
    that makes star-schema date filters prune a partitioned 100 TB fact
    without a literal predicate. Visible as 'dynamicpruning' in the
    fact scan."""
    out = str(tmp_path / "docs_by_lang_dpp")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("en", "english"), ("de", "german")], "lang string, lang_name string"
    ).where(F.col("lang_name") == "english")
    joined = fact.join(dim, "lang").select("doc_id", "n_chars")
    plan = _formatted_plan(spark, joined)
    assert "dynamicpruning" in plan.lower(), plan
    n_en = docs.where(F.col("lang") == "en").count()
    assert joined.count() == n_en
