"""Physical-plan regression guards.

Correctness tests prove the operators compute the right rows; these prove
the PLANS are the ones we'd want on a 1000-executor cluster: broadcast
joins where a side is dimension-sized, predicate/projection pushdown into
the parquet scans, no single-partition exchanges on unbounded data, no
cartesian products outside the documented brute-force baselines, and no
interpreted higher-order-function lambdas left in the similarity hot path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sql_duckdb_parquet__spark.queries import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def plan_of(df, mode: str = "formatted") -> str:
    sess = df.sparkSession
    return sess._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_q04_broadcasts_dimension_joins(spark):
    """At sf0.01 the customer side is measurably under the auto-broadcast
    threshold — Catalyst must pick a broadcast exchange on its own (no
    hint in the query, see test_q04_customer_join_is_not_hint_broadcast),
    not a sort-merge over the fact table."""
    plan = plan_of(REGISTRY["q04_segment_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_parquet_scan_pushes_filters_and_prunes_columns(spark):
    """A filtered two-column aggregate must reach the scan as PushedFilters
    + a pruned ReadSchema — never a full-width scan."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    df = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    # pruned read schema: only the three referenced columns
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "o_orderkey" not in read_schema and "o_custkey" not in read_schema


def test_q51_has_no_single_partition_exchange(spark):
    """The round-1 weak finding: a global dense_rank window funneled the
    whole vocabulary through one task.  The two-phase ranking must keep
    every exchange partitioned."""
    plan = plan_of(REGISTRY["q51_vocab_ids"](spark, SF_DIR))
    assert "Exchange SinglePartition" not in plan


def _without_auto_broadcast(spark, builder):
    """Plan with auto-broadcast disabled: any BroadcastExchange left in the
    initial plan can only come from an explicit ``F.broadcast`` hint."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        return plan_of(builder())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q51_vocab_join_is_not_hint_broadcast(spark):
    """The vocabulary is unbounded at 100 TB of web text: the words⋈vocab
    join must NOT carry a broadcast hint (round-2 weak finding).  With
    auto-broadcast disabled, the only BroadcastExchange allowed in the
    plan is the metadata-sized per-range-partition offsets table."""
    plan = _without_auto_broadcast(
        spark, lambda: REGISTRY["q51_vocab_ids"](spark, SF_DIR)
    )
    assert plan.count("BroadcastExchange (") <= 1  # tree node occurrences
    # the vocab side must ride a shuffled join on `word`
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Left keys [1]: [word" in plan


def test_q04_customer_join_is_not_hint_broadcast(spark):
    """customer scales linearly with SF (~15 B rows at 100 TB lineitem
    scale): the q04 enrichment join must NOT carry a broadcast hint — a
    hint bypasses AQE's size check and OOMs at 100× (round-3 weak
    finding).  q04 uses no legitimate hints, so with auto-broadcast off
    the plan must contain no BroadcastExchange at all."""
    plan = _without_auto_broadcast(
        spark, lambda: REGISTRY["q04_segment_revenue"](spark, SF_DIR)
    )
    assert "BroadcastExchange" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_q19_semijoin_is_not_hint_broadcast(spark):
    """The high-balance customer set is a ~10% slice of an unbounded
    table (output-scale, not metadata): the left-semi must NOT carry a
    broadcast hint (round-3 weak finding)."""
    plan = _without_auto_broadcast(
        spark,
        lambda: REGISTRY["q19_high_balance_order_stats"](spark, SF_DIR),
    )
    assert "BroadcastExchange" not in plan


def test_q42_candidate_semijoin_is_not_hint_broadcast(spark):
    """Candidate-id cardinality is output-scale (billions at 100 TB): the
    verify semi-join must NOT carry a broadcast hint (round-2 weak
    finding).  q42 uses no legitimate hints, so with auto-broadcast off
    the plan must contain no BroadcastExchange at all."""
    plan = _without_auto_broadcast(
        spark, lambda: REGISTRY["q42_minhash_lsh_pairs"](spark, SF_DIR)
    )
    assert "BroadcastExchange" not in plan


def test_q42_lsh_is_not_cartesian(spark):
    """MinHash+LSH near-dup: candidates come from the band-bucket join —
    the plan must contain no cartesian product (the round-1 all-pairs
    verify regression)."""
    plan = plan_of(REGISTRY["q42_minhash_lsh_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_q56_simhash_sql_is_not_cartesian_and_stays_jvm(spark):
    """The oracle-checked SimHash twin must pair via the band join (no
    cartesian) and keep the signature math in JVM built-ins (no Python
    eval nodes in the plan)."""
    plan = plan_of(REGISTRY["q56_simhash_sql_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_q58_asof_is_single_keyed_window_not_range_join(spark):
    """The as-of join must be the union-and-window composition: no
    cartesian/broadcast-nested-loop range join, and a Window over the
    join key present in the plan."""
    plan = plan_of(REGISTRY["q58_asof_click_attribution"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_q59_rollup_is_single_pass_expand(spark):
    """ROLLUP must plan as one Expand + aggregate, not unioned rescans:
    exactly one scan of the orders table."""
    plan = plan_of(REGISTRY["q59_rollup_revenue"](spark, SF_DIR))
    assert "Expand" in plan
    assert plan.count("orders.parquet") <= 1


def test_q60_range_join_is_window_not_nested_loop(spark):
    """The 1-hour range join must be a value-range window frame, not an
    inequality join (BroadcastNestedLoop/Cartesian)."""
    plan = plan_of(REGISTRY["q60_range_window_clicks"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_q55_neardup_is_not_cartesian(spark):
    plan = plan_of(REGISTRY["q55_embedding_neardup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_q66_neardup_sql_twin_is_not_cartesian(spark):
    """The fully-oracle-backed near-dup twin must keep q55's plan shape:
    bucket-join candidate generation, no cartesian product."""
    plan = plan_of(REGISTRY["q66_embedding_neardup_sql"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_encode_sink_has_no_repack_exchange(spark):
    """The blob sink must ride the encode stage's own tasks: exactly ONE
    shuffle in the whole encode plan (the part_id repartition feeding the
    mapInArrow kernel), and in particular no round-robin repack exchange
    between the kernel and the sink — at 100 TB the old
    ``repartition(n_files)`` moved every compressed byte through the
    network a second time purely for file packing (round-4 verdict's top
    at-scale cost; compact_store owns file-count hygiene now)."""
    from etl_sql_duckdb_parquet__spark.encode import (
        plan_partitions,
        synth_token_table,
    )
    from etl_sql_duckdb_parquet__spark.encode.encode_job import (
        encode_sink_frame,
        input_stats,
    )

    df = synth_token_table(spark, n_docs=200, seed=5)
    shares, _ = input_stats(df)
    planned, n_parts, _ = plan_partitions(
        df, target_tokens=20_000, shares=shares
    )
    plan = plan_of(
        encode_sink_frame(planned, n_parts, "run_plan_test"), "simple"
    )
    # the single data shuffle: hash on part_id into the kernel
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # no repack between kernel and sink (and no other shuffle shape)
    assert "RoundRobinPartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    # the kernel sits ABOVE the exchange (top-down plan print), i.e. the
    # frame the sink writes is the kernel's direct output
    assert plan.index("MapInArrow") < plan.index("Exchange"), plan


def test_similarity_dot_products_are_codegen(spark):
    """The unrolled dot product must stay out of interpreted HOF-lambda
    land: no zip_with/lambda anywhere, and (in the post-AQE final plan —
    codegen spans only materialize once adaptive execution finalizes) the
    projection sits inside a WholeStageCodegen span."""
    df = REGISTRY["q45_cosine_topk"](spark, SF_DIR)
    plan = plan_of(df)
    assert "zip_with" not in plan and "lambdafunction" not in plan
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # "*(N)" prefixes mark WholeStageCodegen spans in the executed plan;
    # the dot-product Project must sit inside one
    assert "*(" in final and "Project [a_id" in final
