"""Physical-plan regression guards (SURVEY.md §4).

The scale story rests on three plan properties that are easy to break
silently with an innocent-looking refactor:

1. the null-text filter reaches the parquet scan (PushedFilters),
2. the scan reads only the 4 needed columns (ReadSchema pruning),
3. the job has exactly ONE wide exchange (the salted repartition) —
   no accidental extra shuffle before or after the Arrow stage.

These assertions read the *formatted explain*, not timings, so they
are stable across machines.
"""

from __future__ import annotations

import re

from extractor import job
from tests.conftest import GOLDEN_INPUT


def _formatted_plan(spark) -> str:
    df = job.plan_extract(job.read_transcripts(spark, GOLDEN_INPUT), 16)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_null_filter_pushed_to_scan(spark):
    plan = _formatted_plan(spark)
    scan = plan[plan.index("Scan parquet"):]
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", scan)
    assert pushed is not None, plan
    assert "IsNotNull(text)" in pushed.group(1), pushed.group(1)


def test_scan_reads_only_needed_columns(spark):
    plan = _formatted_plan(spark)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"conv_id", "turn_idx", "text", "tool"}, cols


def test_exactly_one_exchange(spark):
    plan = _formatted_plan(spark)
    # count numbered operator entries ("(4) Exchange"), not tree-art
    # lines — formatted explain prints each operator twice
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, "expected the single salted repartition, got:\n" + plan


def test_arrow_eval_python_stage_present(spark):
    # the extraction stage must be the Arrow-batched map, not a
    # row-at-a-time BatchEvalPython
    plan = _formatted_plan(spark)
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def _executed_plan(spark, name, sf="/root/testdata/sf0.001"):
    from extractor.queries import QUERIES

    df = QUERIES[name](spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def test_similarity_joins_have_no_allpairs_plan(spark):
    """The three similarity queries that were all-pairs in round 1
    must stay blocked equi-joins: no cartesian product and no
    broadcast-nested-loop join anywhere in the physical plan."""
    for name in ("simhash_hamming_pairs", "simhash_near_dup_scaled",
                 "j4_near_dup_pairs_lev", "ann_lsh_bucketed",
                 "ann_ivf_topk", "minhash_lsh_candidates",
                 "j1_iou_box_join", "j10_attribution_interval_join",
                 "minhash_incremental_candidates", "semdedup_prune",
                 "minhash_verified_pairs", "semdedup_prune_salted",
                 "semdedup_pipeline", "minhash_dedup_survivors"):
        plan = _executed_plan(spark, name)
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in plan, (name, bad, plan)


def test_simhash_scaled_candidates_linear(spark):
    """The round-2 verdict's top finding: narrow bands degenerate to
    ~n^2 candidates. The scale path's 30-bit 3-block keys must keep
    candidate volume ~linear in corpus size. Synthetic corpus: every
    3rd doc is an exact duplicate of its predecessor (n/3 planted dup
    pairs x 20 table collisions each), all other docs share no words,
    so their signatures are ~uniform and random 30-bit key collisions
    are ~20*C(n,2)/2^30 ~ 0 at these n. Doubling n must ~double raw
    candidate count (quadratic would quadruple)."""
    import hashlib

    from extractor.queries import _simhash_scaled_join, simhash_signatures

    def corpus(n):
        rows = []
        for i in range(n):
            if i % 3 == 2:
                text = rows[-1][1]  # exact dup of predecessor
            else:
                text = " ".join(
                    hashlib.md5("{}:{}".format(i, j).encode()).hexdigest()[:8]
                    for j in range(40))
            rows.append(("d{:05d}".format(i), text))
        return spark.createDataFrame(rows, "doc_id string, text string")

    c1 = _simhash_scaled_join(simhash_signatures(corpus(600)),
                              candidates_only=True).count()
    c2 = _simhash_scaled_join(simhash_signatures(corpus(1200)),
                              candidates_only=True).count()
    print("simhash scaled candidates: n=600 ->", c1, "; n=1200 ->", c2)
    assert c1 > 0
    assert c2 <= 2.6 * c1, (c1, c2)


def test_ann_lsh_recall_vs_exact(spark):
    """LSH candidates are probabilistic; report recall against the
    exact brute-force top-5 oracle and hold a floor consistent with
    SRP theory for these embeddings (true neighbors at cos ~0.33:
    per-table collision ~(1 - theta/pi)^4 ~ 0.25, expected recall
    over 8 tables ~0.69; measured 0.74 at sf0.001 / 0.76 at sf0.01 —
    planes are deterministic, so this is stable, not flaky)."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {(r["query_id"], r["neighbor_id"])
             for r in QUERIES["ann_cosine_topk"](spark, sf).collect()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in QUERIES["ann_lsh_bucketed"](spark, sf).collect()}
    recall = len(exact & got) / len(exact)
    print("ann_lsh recall vs exact top-5:", recall)
    assert recall >= 0.65, recall


def test_ann_ivf_recall_vs_exact(spark):
    """IVF-flat recall floor vs the exact top-5 oracle. Deterministic:
    the k-means sample, init, and iteration count are all fixed, so
    the measured 0.92 (sf0.001) / 0.74 (sf0.01) is stable; floor 0.65
    matches the LSH path's gate. Also checks the probed-cells design
    yields no duplicate (query, neighbor) rows (cells partition the
    corpus, so no dedup shuffle exists to hide a double-emission)."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {(r["query_id"], r["neighbor_id"])
             for r in QUERIES["ann_cosine_topk"](spark, sf).collect()}
    rows = QUERIES["ann_ivf_topk"](spark, sf).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(rows) == len(got), "duplicate pairs from probed cells"
    recall = len(exact & got) / len(exact)
    print("ann_ivf recall vs exact top-5:", recall)
    assert recall >= 0.65, recall


def test_asof_join_single_shuffle(spark):
    """The as-of join's whole point is one shuffle on the key (vs a
    range join's per-key row blowup): the plan must contain exactly
    one Exchange, and no join operator at all (it is a window, not a
    join, on the physical side)."""
    import re

    from extractor.queries import QUERIES

    df = QUERIES["j9_asof_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 1, plan
    assert "Join" not in plan, plan


def test_pipeline_op_plan_shapes(spark):
    """pii_scrub is a pure narrow projection — zero Exchange in the
    plan; contamination_flag must join the corpus against the
    BROADCAST benchmark shingle set (a shuffled join would move every
    corpus shingle for a benchmark-sized build side)."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    plan = (QUERIES["pii_scrub"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    plan = (QUERIES["contamination_flag"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan


def test_ann_lsh_no_driver_side_collect_in_build(spark):
    """Building the LSH plan must not collect row DATA to the driver
    (the old version did a .first() to learn the dimension). Parquet
    footer/schema metadata jobs are fine; row-fetch jobs are not —
    compare the job count of building the LSH plan against building a
    plain projection of the same table."""
    from extractor.queries import QUERIES, t

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_during(fn):
        before = len(tracker.getJobIdsForGroup(None) or [])
        fn()
        return len(tracker.getJobIdsForGroup(None) or []) - before

    sf = "/root/testdata/sf0.001"
    baseline = jobs_during(lambda: t(spark, sf, "embeddings").select("vec_id"))
    lsh = jobs_during(lambda: QUERIES["ann_lsh_bucketed"](spark, sf))
    assert lsh <= baseline, (lsh, baseline)


def test_round3_extension_plan_shapes(spark):
    """Plan gates for the round-3 extension batch (the architectural
    claims each docstring makes, pinned against refactor drift):

    - funnel_conversion: the oracle needs 4 scans of events and 3
      joins; the Spark plan must do it in ONE scan, ONE exchange
      (the user_id window shuffle — the distinct reuses that
      partitioning because user_id is a prefix of its keys) and ZERO
      join operators.
    - stratified_sample_balanced: the per-stratum rate table joins
      onto the full scan as a BROADCAST (shuffling the corpus by lang
      to meet a <=#langs-row table would be the scale bug).
    - dup_ngram_spans / tfidf_top_terms: never a cartesian — the
      dup-gram semi join and the term df join are equi-joins on
      bounded keys.
    """
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"

    plan = (QUERIES["funnel_conversion"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert len(re.findall(r"Scan parquet", plan)) == 1, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan, plan

    plan = (QUERIES["stratified_sample_balanced"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan

    for name in ("dup_ngram_spans", "tfidf_top_terms"):
        plan = (QUERIES[name](spark, sf)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan, plan


def test_quality_sampling_plan_shapes(spark):
    """gopher_quality_filter is a pure narrow projection (zero
    exchanges); domain_cap_sample is one shuffle on source;
    length_decile_bins must NOT sort the data globally — no
    rangepartitioning exchange, and its (<=2) single-partition
    exchanges carry only the tiny distinct-n_chars counts table
    (the whole point of the offset+rank_within formulation)."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"

    plan = (QUERIES["gopher_quality_filter"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan

    plan = (QUERIES["domain_cap_sample"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan

    plan = (QUERIES["length_decile_bins"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange rangepartitioning" not in plan, plan
    assert len(re.findall(r"Exchange SinglePartition", plan)) <= 2, plan


def test_domain_cap_scaled_salted_first_pass(spark):
    """The scaled cap's first shuffle must partition on
    (source, salt) — the whole point — and the plan has exactly two
    hash exchanges (pre-cap + re-cap)."""
    from extractor.queries import QUERIES

    plan = (QUERIES["domain_cap_sample_scaled"](spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert re.search(r"Exchange hashpartitioning\(source#\d+, salt#\d+", plan), plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located join via bucketing (the 100-TB fact-join recipe):
    both sides written with bucketBy(8, custkey) + sortBy, then joined
    on the bucket key — the plan must be a SortMergeJoin with ZERO
    Exchange (bucket layout replaces the shuffle). This is the sink
    contract export_merged relies on writ large: pre-partitioned
    storage turns every downstream key-join/agg into a narrow op.
    Result equality vs the plain (shuffling) join is asserted too.
    """
    from pyspark.sql import functions as F
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(sf + "/orders.parquet")
    cust = spark.read.parquet(sf + "/customer.parquet")
    for name, df, key in (("b_orders", orders, "o_custkey"),
                          ("b_cust", cust, "c_custkey")):
        (df.write.format("parquet").mode("overwrite")
           .option("path", str(tmp_path / name))
           .bucketBy(8, key).sortBy(key).saveAsTable(name))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_cust"),
            F.col("o_custkey") == F.col("c_custkey")).select(
            "o_orderkey", "c_mktsegment")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        expected = orders.join(
            cust, F.col("o_custkey") == F.col("c_custkey")).count()
        assert j.count() == expected and expected > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_truncate_and_sft_plan_shapes(spark):
    """truncate_tokens is the cheap-and-wide map that must never
    shuffle (zero Exchange); sft_pair_build is one window = exactly
    one hash Exchange and no join operator."""
    import re

    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    plan = (QUERIES["truncate_tokens"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    plan = (QUERIES["sft_pair_build"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_runtime_bloom_filter_reduces_probe_side(spark, tmp_path):
    """The 100-TB fact-join reducer: with runtime bloom filters on,
    a selective dimension side injects a might_contain() predicate
    into the FACT scan's stage — rows that cannot join are dropped
    before the shuffle, the semi-join reduction that matters when the
    probe side is 1000x the build side. Thresholds are floored for
    test scale (the defaults require a 10 GB probe side — the
    production setting); result must equal the plain join. Confs are
    set/restored on the shared session (getOrCreate would hand back
    this same session, so a second-session approach would stop() the
    fixture for every later test)."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    flags = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    li = spark.read.parquet(sf + "/lineitem.parquet")
    orders = (spark.read.parquet(sf + "/orders.parquet")
              .where("o_orderpriority = '1-URGENT'"))
    j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .select("l_orderkey", "o_orderpriority"))
    exp = j.count()  # plain-config join, same session
    old_vals = {k: spark.conf.get(k, None) for k in flags}
    for k, v in flags.items():
        spark.conf.set(k, v)
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan
        got = j.count()
    finally:
        for k, v in old_vals.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert got == exp > 0


def test_round4_batch_plan_shapes(spark):
    """Plan gates for the round-4 continuation batch:

    - w9_rle_collapse: ONE exchange total, on user_id — the lag
      window, the running sum, and the final (user_id, run_idx,
      event_type) groupBy all reuse the window's hashpartitioning
      (user_id is a subset of the group keys, so ClusteredDistribution
      is already satisfied; a second exchange would mean the reuse
      broke).
    - vocab_oov_rate: the K-row vocabulary must broadcast into the
      probe (never shuffle the corpus token stream for membership),
      and the vocab build must be a TakeOrdered, not a global sort.
    - dpo_pair_build: ONE exchange on (lang, source) — max_by/min_by
      are mergeable, so no window/sort appears.
    """
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"

    plan = (QUERIES["w9_rle_collapse"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    ex = re.findall(r"Exchange \w+", plan)
    assert len(ex) == 1 and "hashpartitioning" in ex[0], plan

    plan = (QUERIES["vocab_oov_rate"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan

    plan = (QUERIES["dpo_pair_build"](spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    ex = re.findall(r"Exchange \w+", plan)
    assert len(ex) == 1 and "hashpartitioning" in ex[0], plan
    assert "Window" not in plan, plan


def test_ann_pq_recall_and_rerank_shape(spark):
    """PQ shortlist + exact re-rank: final recall@5 equals the
    shortlist capture rate (the re-rank is exact cosine), measured
    1.00 (sf0.001, sf0.01) / 0.92 (sf0.1) with the fixed M=16/K=64/
    R=100 geometry — floor 0.75, above the LSH/IVF 0.65 gate because
    the re-rank protocol should beat single-stage approximations.
    Determinism: fixed sample, init, iterations. Shape: the ADC scan
    must read codes through exactly one ArrowEvalPython (the encode
    UDF) and the full-vector re-rank join must be broadcast, never a
    sort-merge over the corpus."""
    from extractor.queries import QUERIES

    for sf, floor in (("/root/testdata/sf0.001", 0.75),
                      ("/root/testdata/sf0.01", 0.75)):
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in QUERIES["ann_cosine_topk"](spark, sf).collect()}
        rows = QUERIES["ann_pq_topk"](spark, sf).collect()
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        assert len(rows) == len(got), "duplicate pairs"
        recall = len(exact & got) / len(exact)
        print("ann_pq recall vs exact top-5:", sf, recall)
        assert recall >= floor, (sf, recall)

    df = QUERIES["ann_pq_topk"](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan's toString repeats operators in the
    # "== Initial Plan ==" section — count only the final plan:
    # the encode UDF must evaluate exactly ONCE over the corpus
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_containment_prefix_join_plan(spark):
    """Candidate generation is an equi join on prefix-shingle hashes
    (probe side) against the full shingle index (outer side) — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere, mirroring
    the jaccard_prefix_join gate."""
    from extractor.queries import QUERIES

    df = QUERIES["containment_prefix_join"](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q5_star_join_plan(spark):
    """TPC-H Q5's plan must be the star shape the docstring promises:
    every dimension hop a BroadcastHashJoin (>= 4 of them; AQE may
    also broadcast orders at test SF), never a CartesianProduct /
    BroadcastNestedLoopJoin despite the 6-table predicate set, the
    o_orderdate window PUSHED into the orders scan, and the orders
    ReadSchema pruned to exactly the 3 columns the query touches."""
    from extractor.queries import QUERIES

    df = QUERIES["q5_local_supplier_volume"](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert ("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,"
            "o_orderdate:timestamp" in plan), plan


def test_ann_ivfpq_recall_and_plan(spark):
    """IVF-PQ must match IVF-flat's recall (measured identical:
    0.92 sf0.001 / 0.74 sf0.01 — PQ-within-cells + exact re-rank
    loses nothing over the coarse quantizer; every miss is an nprobe
    cell miss) at a fraction of the scan bytes. Floor 0.65 = the
    family gate. Plan: candidates come from an equi join on cell id
    (never a cross join against the corpus), encode is exactly one
    ArrowEvalPython in the final adaptive plan, and no
    CartesianProduct appears anywhere."""
    from extractor.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {(r["query_id"], r["neighbor_id"])
             for r in QUERIES["ann_cosine_topk"](spark, sf).collect()}
    rows = QUERIES["ann_ivfpq_topk"](spark, sf).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(rows) == len(got), "duplicate pairs"
    recall = len(exact & got) / len(exact)
    print("ann_ivfpq recall vs exact top-5:", recall)
    assert recall >= 0.65, recall

    df = QUERIES["ann_ivfpq_topk"](spark, sf)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ArrowEvalPython") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def _final_plan(spark, name, sf="/root/testdata/sf0.001"):
    from extractor.queries import QUERIES

    df = QUERIES[name](spark, sf)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_subquery_family_plans(spark):
    """The six TPC-H subquery patterns must decorrelate into the
    distributed shapes their docstrings promise — never a per-row
    subquery re-execution (CartesianProduct / BroadcastNestedLoopJoin
    is how that failure presents at the physical layer).

    q4  EXISTS            -> LeftSemi hash join (non-equi date
                             comparison rides as the extra condition)
    q17 correlated scalar -> Aggregate over lineitem joined back on
                             the correlation key (two hash joins, a
                             partial_avg stage; NOT one scan/probe)
    q18 IN + HAVING       -> LeftSemi over the grouped aggregate
    q19 OR-of-conjuncts   -> common equi-key extracted (hash join) +
                             disjunctive filter pushed to the scan
    q22 scalar + NOT EXISTS -> one-row Subquery broadcast + plain
                             LeftAnti; acctbal>0 pushed to the scan
    q16 NOT IN            -> NULL-AWARE anti join; and at sf0.001
                             (blocklist empty) AQE's empty-relation
                             propagation removes the join entirely —
                             both runtime outcomes pinned."""
    for name in ("q4_order_priority_exists", "q17_small_qty_revenue",
                 "q18_large_volume_orders", "q19_disjunctive_revenue",
                 "q22_idle_balance_anti", "q16_supplier_cnt_not_in",
                 "q21_sole_late_supplier", "q20_dominant_part_suppliers",
                 "q2_min_qty_supplier", "q7_nation_trade_volume",
                 "q8_market_share", "q9_product_profit",
                 "q10_returned_revenue_topk", "q11_important_stock",
                 "q13_order_count_distribution", "q15_top_supplier",
                 "q6_forecast_revenue", "q12_priority_by_returnflag",
                 "q14_promo_effect"):
        final = _final_plan(spark, name)
        assert "CartesianProduct" not in final, (name, final)
        assert "BroadcastNestedLoopJoin" not in final, (name, final)
        if name == "q4_order_priority_exists":
            assert "LeftSemi" in final, final
            assert "GreaterThanOrEqual(o_orderdate" in final, final
        elif name == "q17_small_qty_revenue":
            assert final.count("BroadcastHashJoin") >= 2, final
            assert "partial_avg" in final, final
        elif name == "q18_large_volume_orders":
            assert "LeftSemi" in final, final
            assert "partial_sum" in final, final
        elif name == "q19_disjunctive_revenue":
            assert ("BroadcastHashJoin" in final
                    or "SortMergeJoin" in final), final
            assert "Or(" in final, final  # disjunct pushed to scan
        elif name == "q22_idle_balance_anti":
            assert "LeftAnti" in final, final
            assert "Subquery" in final, final
            assert "GreaterThan(c_acctbal,0.0)" in final, final
        elif name == "q16_supplier_cnt_not_in":
            # empty blocklist at sf0.001: AQE eliminates the anti join
            assert "LeftAnti" not in final, final
        elif name == "q2_min_qty_supplier":
            # scalar-over-derived-CTE decorrelation: a per-partkey
            # min Aggregate over the rollup, joined back by equality
            # (tie-inclusive) — the rollup itself aggregated, never
            # re-executed per outer row
            assert "partial_min" in final, final
            assert final.count("partial_sum(l_quantity") == 2, final
        elif name == "q20_dominant_part_suppliers":
            # nested decorrelation: the correlated scalar inside the
            # HAVING becomes a per-partkey Aggregate joined back onto
            # the (suppkey, partkey) Aggregate; the IN becomes a
            # LeftSemi. Two sum aggregates, two joins, zero re-scans.
            assert "LeftSemi" in final, final
            assert final.count("partial_sum(l_quantity") >= 2, final
        elif name in ("q7_nation_trade_volume", "q8_market_share",
                      "q9_product_profit"):
            # star joins: every dimension hop is a broadcast hash
            # join; the selective part/nation predicates are pushed
            # into the broadcast-build scans, never applied post-join
            assert final.count("BroadcastHashJoin") >= 3, final
            if name == "q8_market_share":
                assert "PROMO" in final, final
            if name == "q9_product_profit":
                assert "gear" in final, final
            if name == "q7_nation_trade_volume":
                assert "NATION_3" in final, final
        elif name == "q10_returned_revenue_topk":
            # distributed top-k: per-task local top-20 merged at the
            # driver — never a global single-partition sort
            assert "TakeOrderedAndProject(limit=20" in final, final
            assert "partial_sum" in final, final
        elif name == "q11_important_stock":
            # global scalar threshold: ONE-row Subquery broadcast
            # into the post-aggregate filter; dimension broadcast
            # exchanges reused between outer and subquery plans
            assert "Subquery" in final, final
            assert "partial_sum(l_quantity" in final, final
            assert "ReusedExchange" in final, final
        elif name == "q13_order_count_distribution":
            # the priority exclusion must live in the JOIN (LeftOuter
            # preserved, filter on the build side), not a post-join
            # WHERE that would fake an inner join
            assert "LeftOuter" in final, final
            assert "1-URGENT" in final, final
        elif name == "q15_top_supplier":
            # global tie-inclusive argmax: scalar max Subquery +
            # equality filter over the derived aggregate
            assert "Subquery" in final, final
            assert "partial_max" in final, final
        elif name == "q6_forecast_revenue":
            # pure scan query: zero joins, the predicate set pushed
            # to the parquet scan (toString elides the full
            # PushedFilters list, so pin the prefix + the quantity
            # predicate in the Filter operator)
            assert "Join" not in final, final
            assert "PushedFilters: [IsNotNull(l_shipdate)" in final, final
            assert "(l_quantity" in final, final
        elif name == "q12_priority_by_returnflag":
            # dual conditional counts in ONE aggregate over ONE join —
            # never two filtered passes unioned; the cross-table date
            # predicate rides the join
            assert "Union" not in final, final
            assert final.count("FileScan parquet") == 2, final
            assert "(l_shipdate" in final and "o_orderdate" in final, final
        elif name == "q14_promo_effect":
            # single-group conditional ratio: one broadcast join, the
            # month window pushed to the fact scan, two scans total
            assert "BroadcastHashJoin" in final, final
            assert final.count("FileScan parquet") == 2, final
        elif name == "q21_sole_late_supplier":
            # the two correlated subqueries against the same fact
            # table must decorrelate to ONE semi and ONE anti hash
            # join on l_orderkey, the suppkey inequality riding as
            # each join's extra condition (never a re-exec per row)
            assert "LeftSemi" in final, final
            assert "LeftAnti" in final, final
            assert "NOT (l_suppkey" in final or "l_suppkey#" in final, final

    # non-empty blocklist (sf0.01): the null-aware anti join itself
    # (trailing `true` = isNullAwareAntiJoin in the operator header)
    import re

    final = _final_plan(spark, "q16_supplier_cnt_not_in",
                        "/root/testdata/sf0.01")
    assert re.search(r"LeftAnti, BuildRight, true", final), final


def test_ranking_skyline_spine_plan_shapes(spark):
    """Plan gates for the ranking-eval / skyline / gap-fill batch:

    - ir_eval_ndcg: both top-10 cuts (score + ideal-grade) run the
      salted two-stage pattern — pmod(xxhash64(doc_id)) partitioning
      appears in the window specs, and no SortMergeJoin sneaks in
      (every join side is a broadcast: idf, stats, the two bounded
      metric frames).
    - skyline_pareto_parts: the single-partition running-max window
      reads the per-size AGGREGATE (HashAggregate upstream of the
      Window, domain-bounded rows), the frontier rejoins as a
      broadcast LeftSemi, and the quadratic NOT EXISTS of the oracle
      never appears (no CartesianProduct / nested loop).
    - time_spine_gapfill: the spine comes from Generate(explode) on
      the users side (31 rows per key), the daily-close join is a
      hash join, and the only sort feeding the LOCF window keys on
      user_id."""
    final = _final_plan(spark, "ir_eval_ndcg")
    assert "pmod(xxhash64(doc_id" in final, final
    assert "SortMergeJoin" not in final, final
    assert "CartesianProduct" not in final, final

    final = _final_plan(spark, "skyline_pareto_parts")
    assert "LeftSemi" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final
    # the global window must sit above the per-size aggregate, never
    # above the raw scan: Window appears after (deeper than) the
    # aggregate's max(p_retailprice)
    assert "partial_max(p_retailprice" in final, final

    final = _final_plan(spark, "time_spine_gapfill")
    # the daily-close frame is persisted: its two consumers (user
    # list + spine join) must not re-scan events (review finding —
    # one scan materializes the cache, the other branch reads it)
    assert final.count("events.parquet") == 1, final
    # the sequence() spine is CONSTANT-FOLDED to a literal array at
    # plan time (both endpoints are literals) — the Generate explodes
    # an UnsafeArrayData, not a runtime sequence call
    assert "Generate explode(" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final


def test_url_canonicalization_single_shuffle_jvm_only(spark):
    """url_canonical_host_counts must canonicalize entirely JVM-side
    (parse_url + lambda filter + array_sort are all codegen'd
    expressions — no Python eval node) and pay exactly one Exchange,
    the (host, canon_url) groupBy with map-side partial counts."""
    import re

    from extractor.queries import QUERIES

    df = QUERIES["url_canonical_host_counts"](
        spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in final, final
    assert "ArrowEvalPython" not in final, final
    assert "MapInPandas" not in final, final
    assert len(re.findall(r"Exchange hashpartitioning", final)) == 1, final
    assert "partial_count" in final, final


def test_table_profile_single_pass_expand(spark):
    """table_profile_documents must profile every column in ONE scan:
    the multi-column count(DISTINCT) set plans as a single Expand
    (k-way gid-tagged fan-out) feeding one aggregation — never one
    scan per column (the plan shows exactly one FileScan of
    documents), and stack() unpivots the 1-row result without any
    further Exchange."""
    final = _final_plan(spark, "table_profile_documents")
    assert "Expand" in final, final
    assert final.count("FileScan parquet") == 1, final
    assert "CartesianProduct" not in final, final


def test_dq_and_incremental_plan_shapes(spark):
    """dq_expectations' referential-integrity check must be a hash
    LeftAnti on the key only (never a nested loop over the fact
    table); incremental_agg_merge must show BOTH paths' aggregates
    (state + delta partials, then the merge agg) with the ts cutoff
    pushed to each events scan."""
    final = _final_plan(spark, "dq_expectations")
    assert "LeftAnti" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final

    final = _final_plan(spark, "incremental_agg_merge")
    assert final.count("partial_count") >= 2, final
    assert "Union" in final, final
    # cutoff reaches the parquet scans as a pushed filter
    assert "2024-01-16" in final, final


def test_corr_suffstats_single_scan_jvm_only(spark):
    """corr_suffstats_qty_disc must be the cheapest possible profile:
    one FileScan with a 3-column ReadSchema, map-side partial_sum,
    exactly ONE Exchange (the l_returnflag groupBy), and zero Python
    eval nodes — the derived corr is a post-agg projection, never a
    second pass over the fact table."""
    final = _final_plan(spark, "corr_suffstats_qty_disc")
    assert final.count("FileScan parquet") == 1, final
    assert "partial_sum" in final, final
    assert len(re.findall(r"Exchange hashpartitioning", final)) == 1, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final
    m = re.search(r"ReadSchema: struct<([^>]*)>", final)
    assert m is not None, final
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_returnflag", "l_quantity", "l_discount"}, cols


def test_content_chunk_dedup_plan(spark):
    """content_chunk_dedup: chunking is ONE Arrow MapInPandas pass
    with no shuffle before it; exactly two hash Exchanges follow (the
    chunk-hash window + the per-doc rollup); no row-at-a-time Python,
    no nested-loop join."""
    final = _final_plan(spark, "content_chunk_dedup")
    assert "MapInPandas" in final, final
    assert "BatchEvalPython" not in final, final
    assert len(re.findall(r"Exchange hashpartitioning", final)) == 2, final
    assert "CartesianProduct" not in final, final
    # chunker consumes only (doc_id, text)
    m = re.search(r"ReadSchema: struct<([^>]*)>", final)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "text"}, cols


def test_ann_mmr_plan_single_exchange_groups(spark):
    """ann_mmr_topk: the candidate stage's Window partitioning on
    query_id must be REUSED by the applyInPandas grouping — exactly
    one hash Exchange end to end — and WindowGroupLimit must push the
    top-C cut to the map side (per-partition top-40 before the
    shuffle, the property that keeps the shuffle at C rows per query
    regardless of corpus size). The cross join is the broadcast of
    the bounded query side, never a shuffled all-pairs."""
    final = _final_plan(spark, "ann_mmr_topk")
    assert len(re.findall(r"Exchange hashpartitioning", final)) == 1, final
    assert "FlatMapGroupsInPandas" in final, final
    assert final.count("WindowGroupLimit") >= 2, final  # partial + final
    assert "BatchEvalPython" not in final, final
    assert "BroadcastExchange" in final, final


def test_hard_negative_mining_plan(spark):
    """hard_negative_mining: Q queries must share ONE corpus pass —
    the token explode is semi-joined against the broadcast query-term
    set (LeftSemi + BroadcastExchange, never a shuffled join), idf
    and query-term joins are broadcasts, and the per-query negative
    cut plans a WindowGroupLimit map-side top-k. No Python eval
    anywhere — the whole query is JVM expressions."""
    final = _final_plan(spark, "hard_negative_mining")
    assert "LeftSemi" in final, final
    assert "BroadcastExchange" in final, final
    assert "WindowGroupLimit" in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct"):
        assert node not in final, final
    # exactly ONE corpus-scale shuffle (the (doc_id, term) tf groupBy
    # — persisted so idf and scoring share it); every other exchange
    # moves term- or query-level data, which is bounded by |vocab
    # slice| and Q, not by corpus size
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", final)
    corpus_scale = [k for k in keys if "doc_id" in k and "term" in k]
    assert len(corpus_scale) == 1, keys
    assert len(keys) <= 5, keys


def test_sorted_neighborhood_no_global_sort(spark):
    """sorted_neighborhood_pairs exists to prove global ranking
    WITHOUT the Exchange SinglePartition a naive un-partitioned
    row_number window plans (one task sorting the corpus): the plan
    must show the order-preserving range Exchange, no single-partition
    Exchange anywhere, and the window-pair generation as an equi-join
    (never a nested-loop band join)."""
    final = _final_plan(spark, "sorted_neighborhood_pairs")
    assert "rangepartitioning" in final, final
    assert "SinglePartition" not in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final


def test_kn_bigram_plan(spark):
    """kn_bigram_nll: token instances must reduce to per-doc bigram
    multiplicities BEFORE the LM joins (the (doc_id, w1, w2) partial
    agg appears on the map side), N1+(··) arrives by broadcast, and
    no nested-loop join or Python eval exists anywhere."""
    final = _final_plan(spark, "kn_bigram_nll")
    assert "partial_count" in final or "partial_sum" in final, final
    # the three LM joins are HASH joins on the bigram/context keys
    n_hash_joins = (final.count("BroadcastHashJoin")
                    + final.count("SortMergeJoin")
                    + final.count("ShuffledHashJoin"))
    assert n_hash_joins >= 3, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct"):
        assert node not in final, final
    # the only nested-loop join allowed is the Cross against the
    # 1-row N1+(··) totals frame (bounded build side by construction)
    assert final.count("BroadcastNestedLoopJoin") <= 1, final
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in final \
        or "BroadcastNestedLoopJoin" not in final, final


def test_homoglyph_skeleton_plan(spark):
    """homoglyph_skeleton_dedup must stay the dedup_exact profile:
    the skeleton is pure JVM codegen (translate chains — no Python
    eval), the union feeds ONE skel_fp groupBy (plus the Expand the
    distinct-count adds), and nothing joins."""
    final = _final_plan(spark, "homoglyph_skeleton_dedup")
    # the distinct-count plans as the standard two-phase distinct agg
    # (a (skel_fp, raw_fp) dedup shuffle feeding the skel_fp rollup) —
    # no Expand; both exchanges must be keyed on skel_fp
    assert "partial_count" in final, final
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", final)
    assert 1 <= len(keys) <= 2, keys
    assert all("skel_fp" in k for k in keys), keys
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "Join"):
        assert node not in final, final
    assert "Union" in final, final


def test_entity_resolution_pipeline_plan(spark):
    """entity_resolution_pipeline = blocking + verify in one plan:
    same no-global-sort constraints as the blocking stage (range
    Exchange, no SinglePartition, hash/broadcast pair join only), and
    the Levenshtein verify is a JVM filter on the joined rows — no
    Python eval, no second join."""
    final = _final_plan(spark, "entity_resolution_pipeline")
    assert "rangepartitioning" in final, final
    assert "SinglePartition" not in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final
    assert "levenshtein" in final, final


def test_perplexity_buckets_no_global_sort(spark):
    """perplexity_buckets ranks the whole corpus by perplexity — the
    classic ntile() trap. The plan must carry NO Exchange
    SinglePartition (the global rank comes from the range-partition +
    offset machinery) while still containing the KN LM's hash joins."""
    final = _final_plan(spark, "perplexity_buckets")
    assert "SinglePartition" not in final, final
    assert "rangepartitioning" in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct"):
        assert node not in final, final


def test_incremental_join_merge_plan(spark):
    """incremental_join_merge: all four delta terms must keep their
    cutoff predicates at the scans (the date literal and the custkey
    modulo both appear as pushed/scan-side filters), each term is a
    hash/broadcast equi-join, and a Union feeds ONE merge aggregate."""
    final = _final_plan(spark, "incremental_join_merge")
    assert "Union" in final, final
    assert "1999-01-01" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "MapInPandas"):
        assert node not in final, final
    n_joins = (final.count("BroadcastHashJoin")
               + final.count("SortMergeJoin")
               + final.count("ShuffledHashJoin"))
    assert n_joins == 4, final


def test_dsir_select_plan(spark):
    """dsir_select: token instances must reduce to per-(doc,bucket)
    multiplicities map-side (partial agg before the shuffle); both
    <=4096-row model tables join by BROADCAST hash; the only
    nested-loop joins are the two Cross joins against the 1-row
    totals; ranking rides the range-partition machinery (never an
    Exchange SinglePartition); no Python eval anywhere."""
    final = _final_plan(spark, "dsir_select")
    assert "partial_count" in final or "partial_sum" in final, final
    assert final.count("BroadcastHashJoin") >= 2, final
    assert final.count("BroadcastNestedLoopJoin") <= 2, final
    assert "BroadcastNestedLoopJoin BuildLeft" not in final \
        or "Cross" in final, final
    assert "rangepartitioning" in final, final
    assert "SinglePartition" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct"):
        assert node not in final, final


def test_dict_entity_tag_and_ewma_plans(spark):
    """dict_entity_tag: the gram explode must join the alias
    gazetteer by BROADCAST hash join (the small-dim pattern its
    docstring promises) and reduce with a partial agg; never a
    nested loop, never Python. ewma_user_value: exactly one Exchange
    (hashpartitioning on user_id) feeding the window; the bounded
    fold is a JVM higher-order function, no Python eval."""
    final = _final_plan(spark, "dict_entity_tag")
    assert "BroadcastHashJoin" in final, final
    assert "partial_count" in final or "partial_min" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final

    final = _final_plan(spark, "ewma_user_value")
    assert "hashpartitioning(user_id" in final, final
    assert final.count("Exchange") == 1, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_entity_cooccurrence_and_drift_plans(spark):
    """entity_cooccurrence: the pair stage is an EQUI-join on doc_id
    (never an all-pairs nested loop); marginals + the 1-row doc count
    join broadcast (the only nested-loop is that 1-row cross). drift:
    exactly one corpus-scale Exchange (the lang x source partial agg)
    — marginals reduce the cell table and come back broadcast."""
    final = _final_plan(spark, "entity_cooccurrence")
    assert "CartesianProduct" not in final, final
    assert final.count("BroadcastNestedLoopJoin") <= 1, final  # 1-row nd
    assert "BroadcastHashJoin" in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final

    final = _final_plan(spark, "drift_chi2_cells")
    assert "partial_count" in final, final
    assert final.count("BroadcastNestedLoopJoin") <= 1, final  # 1-row tot
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_event_seq_bloom_mix_plans(spark):
    """event_seq_match: ONE Exchange (hashpartitioning on user_id
    feeding the collect_list agg), regex entirely JVM-side, no joins,
    no Python. bloom_incremental_dedup: the 32Ki-word filter table
    joins BROADCAST; no nested loop, no Python — the bloom is pure
    relational algebra. mix_temperature_alloc: only the 1-row totals
    broadcast is a nested-loop cross; the corpus reduces through a
    partial-agg'd count before any window."""
    final = _final_plan(spark, "event_seq_match")
    assert "hashpartitioning(user_id" in final, final
    assert final.count("Exchange") == 1, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "SortMergeJoin", "BroadcastHashJoin"):
        assert node not in final, final

    final = _final_plan(spark, "bloom_incremental_dedup")
    assert "BroadcastHashJoin" in final, final
    assert "partial_" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final

    final = _final_plan(spark, "mix_temperature_alloc")
    assert "partial_count" in final, final
    assert final.count("BroadcastNestedLoopJoin") <= 1, final  # 1-row tot
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_winnow_contamination_plan(spark):
    """Winnowing: gram hashing + the packed-key windowed MIN stay
    JVM-side (no Python eval), the window costs one doc_id exchange,
    and the benchmark fingerprint set joins BROADCAST; never a
    nested loop."""
    final = _final_plan(spark, "winnow_contamination")
    assert "hashpartitioning(doc_id" in final, final
    assert "BroadcastHashJoin" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_hits_plan(spark):
    """HITS: every half-round is an equi-join + partial-agg'd sum —
    no nested loop anywhere, no Python eval, and the edge list is
    scanned through the persisted distinct (InMemoryTableScan), not
    re-read per round."""
    final = _final_plan(spark, "hits_hub_authority")
    assert "partial_sum" in final, final
    assert "InMemoryTableScan" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_skipgram_pairs_plan(spark):
    """skipgram: vocabulary keep-probabilities join BROADCAST; the
    context pairing is an EQUI-join on (doc_id, rank) via offset
    expansion — never a per-doc range self-join; the only nested
    loop is the 1-row token-total broadcast; no Python eval."""
    final = _final_plan(spark, "skipgram_pairs")
    assert "BroadcastHashJoin" in final, final
    # the 1-row token-total cross can materialize TWICE when another
    # test's cached frame matches the vocab subtree (CacheManager
    # plan-matching defeats exchange reuse, so the freq->tot branch
    # duplicates) — both instances are the bounded 1-row cross, never
    # an unbounded nested loop
    assert final.count("BroadcastNestedLoopJoin") <= 2, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_bitmap_entity_intersect_plan(spark):
    """Bitmap intersect: bitmap build reduces through a partial
    bit_or; the pair stage is an EQUI-join on word_idx (never a
    nested loop over entity pairs); AND+popcount stay JVM-side."""
    final = _final_plan(spark, "bitmap_entity_intersect")
    assert "partial_bit_or" in final or "partial_" in final, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_event_seq_sessionized_plan(spark):
    """Sessionized CEP: the lag window, the running session counter,
    AND the (user_id, sess) aggregation all reuse ONE user_id
    exchange (HashPartitioning(user_id) satisfies the clustered
    distribution of the superset group key); regex stays JVM-side."""
    final = _final_plan(spark, "event_seq_sessionized")
    assert final.count("Exchange") == 1, final
    assert "hashpartitioning(user_id" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_dbscan_core_points_plan(spark):
    """DBSCAN core detection: the eps-neighborhood count is a hash
    EQUI-join on grid-cell keys (9x constant probe fan-out) — never a
    distance nested loop over point pairs; squared-integer distance
    and the count stay JVM-side."""
    final = _final_plan(spark, "dbscan_core_points")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_dbscan_labels_plan(spark):
    """Full DBSCAN: the eps-pair join is grid-blocked (hash equi-join
    on cell keys, persisted and reused for count/core-edges/border);
    the CC loop contracts JVM-side — no nested loops, no Python eval
    anywhere."""
    final = _final_plan(spark, "dbscan_labels")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_assoc_rule_pairs_plan(spark):
    """A-Priori 2-itemsets: basket pairing is an EQUI-join on
    l_orderkey (bounded basket fan-out), support lookups are hash
    joins; the only nested loop is the bounded 1-row basket-total
    broadcast cross (skipgram's pattern, same CacheManager-duplication
    allowance); no Python eval."""
    final = _final_plan(spark, "assoc_rule_pairs")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert final.count("BroadcastNestedLoopJoin") <= 2, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_graph_random_walks_plan(spark):
    """Hash-seeded walks: every hop is a pair of hash equi-joins
    (degree lookup + (node, rank) adjacency probe) — a static 2L-join
    plan, no per-walk loop, no nested loop, no Python eval; the md5
    step choice stays JVM-side."""
    final = _final_plan(spark, "graph_random_walks")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_apriori_triples_plan(spark):
    """A-Priori 3-itemsets: basket pair/triple expansion and every
    frequent-item/pair prune must be equi-joins (hash or
    sort-merge); the only nested loops allowed are the bounded
    1-row relative-minsup broadcast crosses; no Python eval, no
    cartesian product."""
    final = _final_plan(spark, "apriori_triples")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_allen_interval_census_plan(spark):
    """Allen census: the per-user span pair join must be an
    EQUI-join on user_id (type-domain-bounded fan-out, the apriori
    in-basket discipline), never a cartesian; the 13-row literal
    relation table broadcast-joins the census."""
    final = _final_plan(spark, "allen_interval_census")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final


def test_mm_ahash_near_dup_plan(spark):
    """aHash banding: candidates must come from the band-keyed
    EQUI-join (the scaled-SimHash recipe) — an all-pairs plan here
    is exactly the quadratic the bands exist to avoid; hashing is
    array-lambda projection, no Python eval."""
    final = _final_plan(spark, "mm_ahash_near_dup")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_logrank_gap_survival_plan(spark):
    """Log-rank: gap extraction is the per-user lag window; the
    only joins are the broadcast 1-row span/total crosses — no
    corpus-scale join of any kind."""
    final = _final_plan(spark, "logrank_gap_survival")
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_item_item_cf_plan(spark):
    """Item-item CF: basket pairing must be the customer-keyed
    EQUI-join (fan-out bounded by the basket cap) and the
    popularity/top-k assembly hash joins — an all-pairs plan here
    is the exact quadratic the cap exists to bound; no Python
    eval anywhere."""
    final = _final_plan(spark, "item_item_cf")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_burrows_delta_plan(spark):
    """Burrows' Delta: the only corpus-scale stage is the
    (source, word, count) fold; marker selection must be a bounded
    TakeOrderedAndProject (never a global sort), and the pair
    terms come from word-keyed equi-joins on the 30-row marker
    frame. The persisted tc fold nests an AdaptiveSparkPlan whose
    own '== Initial Plan ==' marker truncates _final_plan's split
    BEFORE the marker-selection subtree, so the positive assert
    reads the FULL executed-plan string."""
    from extractor.queries import QUERIES

    df = QUERIES["burrows_delta"](spark, "/root/testdata/sf0.001")
    df.collect()
    whole = df._jdf.queryExecution().executedPlan().toString()
    final = whole.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in whole, whole
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in whole, whole


def test_bray_curtis_plan(spark):
    """Bray-Curtis: the word-keyed self-join (<= C(k,2) fan-out
    per term) must be an equi-join with the k-row totals broadcast
    back — no cartesian, no nested loop."""
    final = _final_plan(spark, "bray_curtis_source_dissim")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final
    assert "BroadcastNestedLoopJoin" not in final, final


def test_jonckheere_terpstra_plan(spark):
    """Jonckheere-Terpstra: the cumulative identity must keep the
    plan free of any pairwise GROUP join — only the bounded
    grid build (k-row source frame crossed with the value domain)
    and windows; no Python eval."""
    final = _final_plan(spark, "jonckheere_terpstra")
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_cross_correlation_types_plan(spark):
    """CCF: the lag shift is applied BEFORE the join so the day
    key must stay a plain EQUI join (hash/sort-merge) — a theta
    join on d + l here would be the nested-loop regression; no
    Python eval."""
    final = _final_plan(spark, "cross_correlation_types")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_centroid_outlier_score_plan(spark):
    """Centroid outliers: the per-vector score join must be the
    corpus x dim frame against the BROADCAST label x dim centroid
    table — never a shuffle of the exploded frame onto a
    non-broadcast side, never Python."""
    final = _final_plan(spark, "centroid_outlier_score")
    assert "BroadcastHashJoin" in final, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final


def test_jw_probe_best_match_plan(spark):
    """JW probe: the ONLY Python in the plan must be the
    Arrow-batched pandas UDF over the blocked candidate pairs
    (ArrowEvalPython — the justified surface, since Spark has no
    jaro builtin); the block join is an equi join; never a
    row-at-a-time BatchEvalPython, never a cartesian."""
    final = _final_plan(spark, "jw_probe_best_match")
    assert "ArrowEvalPython" in final, final
    assert "BatchEvalPython" not in final, final
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final


def test_lru_stack_distance_plan(spark):
    """LRU stack distances: the k-type grid must come from a
    BROADCAST cross of the bounded type set (BroadcastNestedLoop
    Cross is the expected physical form of a bounded cross), the
    per-position re-join an equi join, and the distance windows —
    never a range self-join of the corpus against itself; no
    Python."""
    from extractor.queries import QUERIES

    df = QUERIES["lru_stack_distance_profile"](
        spark, "/root/testdata/sf0.001")
    df.collect()
    whole = df._jdf.queryExecution().executedPlan().toString()
    final = whole.split("== Initial Plan ==")[0]
    # the persisted position frame nests an AdaptiveSparkPlan whose
    # own Initial-Plan marker truncates _final_plan before the
    # distance-join subtree (the burrows_delta lesson) — read the
    # full string for the positive asserts
    assert "HashJoin" in whole or "SortMergeJoin" in whole, whole
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in whole, whole


def test_join_qerror_audit_plan(spark):
    """q-error audit: the three actuals must be count-only hash
    joins (no row materialization beyond the count aggregate), the
    stat folds plain aggregates; no Python, no cartesian beyond
    the bounded 1-row stat crosses."""
    final = _final_plan(spark, "join_qerror_audit")
    assert "HashJoin" in final or "SortMergeJoin" in final, final
    assert "CartesianProduct" not in final, final
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in final, final
