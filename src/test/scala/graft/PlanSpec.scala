package graft

import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Physical-plan shape assertions (SURVEY §4): the optimizations SCALE.md
  * relies on must actually appear in the executed plan — column pruning to
  * the scan, filter pushdown, broadcast joins for dims, TakeOrderedAndProject
  * for top-k, and partial (map-side) aggregation.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02 scan prunes columns: o_comment-free ReadSchema") {
    // select 6 of 6 columns here, so use a pruned projection directly
    val df = t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_extendedprice"),
      s"scan should not read unprojected columns:\n$plan")
  }

  test("filter pushdown reaches the parquet scan") {
    val df = t(spark, sf, "lineitem")
      .where(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThan(l_quantity,45"),
      s"expected pushed filter in:\n$plan")
  }

  test("q09 flagship uses two-phase hash aggregation") {
    val plan = planOf("q09_flagship_category")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("partial"), s"expected partial agg in:\n$plan")
  }

  test("q10 city analytics broadcasts the dimension tables") {
    val plan = planOf("q10_city_analytics")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dims should not sort-merge:\n$plan")
  }

  test("q17 last-7-days plans as top-k, not a global sort") {
    val plan = planOf("q17_last7_days")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k in:\n$plan")
  }

  test("q18 topk plans as TakeOrderedAndProject") {
    val plan = planOf("q18_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k in:\n$plan")
  }

  test("q09 stays inside whole-stage codegen") {
    // AQE prints codegen spans only once the plan is finalized by a run
    val df = SparkEntry.queries("q09_flagship_category")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expected codegen spans in:\n$plan")
  }

  test("date-partitioned silver prunes partitions on a date filter") {
    graft.etl.Pipeline.initialLoad(spark, n = 200, seed = 7L)
    graft.etl.Pipeline.rebuildSilverPartitioned(spark)
    val someDate = spark.table("silver_sales_clean_bydate")
      .select(max(col("order_date"))).first().getDate(0)
    val df = spark.table("silver_sales_clean_bydate")
      .where(col("order_date") === lit(someDate))
      .select("order_id", "total_amount")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("order_date"),
      s"expected partition pruning in:\n$plan")
    // the filter must be a partition filter, not a pushed data filter
    assert(!plan.replaceAll("\\s", "").contains("PushedFilters:[],PartitionFilters:[]"),
      s"no pruning happened:\n$plan")
    assert(df.count() > 0)
  }

  test("q55 partitioned write is read back through a pruned partition filter") {
    // run the query once so the table exists, then re-derive the read side
    SparkEntry.queries("q55_partitioned_write")(spark, sf).collect()
    val df = spark.table("graft_q55_partitioned")
      .where(col("o_year") === 1996)
      .select("o_orderpriority", "o_totalprice")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("o_year"),
      s"expected o_year partition pruning in:\n$plan")
    assert(!plan.replaceAll("\\s", "").contains("PartitionFilters:[]"),
      s"no pruning happened:\n$plan")
    assert(df.count() > 0)
  }

  test("no query plans an unbroadcast Cartesian product") {
    SparkEntry.all.foreach { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct:\n$plan")
    }
  }

  test("unpartitioned windows appear only over frames bounded by construction") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    // An unpartitioned window funnels its whole input through ONE task, so
    // it is legal only when the frame is bounded by CONSTRUCTION — an
    // aggregate over a calendar/digit/shard-grid key whose cardinality
    // cannot grow with the data. Every query here must justify its bound;
    // anything NOT listed that plans an unpartitioned window is the q145
    // bug class (a single task sorting a frame that scales with the data).
    // The map value documents the bound; the assertion is exact set
    // equality so the list can't rot in either direction.
    val allowed = Map(
      "q72_daily_delta" -> "calendar frame: one row per day after a date agg",
      "q92_global_index" -> "256-row md5-prefix shard-count frame",
      "q145_concentration" -> "<=8192-row log-grid shard-count frame (Gini rank itself is shard-partitioned)",
      "q151_chi_square_cells" -> "cohort x event_type contingency cells (both domains enumerable)",
      "q161_revenue_trend" -> "calendar frame: one row per month after a month agg",
      "q177_cusum_changepoint" -> "calendar frame: cumulative sum over one row per day after a date agg",
      "q188_hist_quantiles" -> "64-row bin frame: cumulative counts over a fixed 64-bin histogram",
      "q196_epoch_shuffle" -> "q92's 256-row md5-prefix shard-count frame (epoch arithmetic rides the same index)",
      "q198_budget_mix" -> "source-dimension frame: greedy cumulative scan over the source catalog",
      "q204_adoption_curve" -> "calendar frame: one row per day after the first-seen agg",
      "q205_open_orders" -> "calendar frame: sweep-line deltas collapse to one row per day",
      "q206_rolling_zscore" -> "calendar frame: trailing window over the one-row-per-day series",
      "q220_ks_drift" -> "<=8192-row log-grid shard-count frame (per-value ECDF cumsums are shard-partitioned)",
      "q240_forecast_baselines" -> "calendar frame: lag windows over the one-row-per-day revenue series",
      // q273's centered-MA window (calendar frame, one row per day) sits
      // BEHIND its eager localCheckpoint since the round-10 hardening, so
      // it executes at plan-build time and no longer appears in the
      // optimized plan this sweep collects — the bound itself is
      // unchanged and documented at TimeSeriesOps.seasonalDecomposition
      "q285_rolling_hll" -> "calendar frame: trailing 7-day sketch union over one row per day",
      "q311_unimax_budget" -> "language-vocabulary frame: the waterfill windows run over one row per language",
      "q320_budget_select" -> "<=1001-row permille density grid frame (the straddle bucket's per-doc window IS rprm-partitioned)",
      "q327_bpe_budget" -> "q320's <=1001-row density grid frame, re-priced in BPE tokens (rprm <= 1000 since every word is >= 1 BPE token)",
      "q337_zipf_slope" -> "<=256-row top-rank frame: the rank window runs AFTER orderBy().limit(256) (TakeOrdered), bounded by construction",
      "q364_hybrid_retrieval" -> "query-catalog frame: the synthetic q_id ranking runs over one row per DISTINCT retrieval query (3 here; the query set, never the corpus)")
    val offenders = SparkEntry.all.flatMap { q =>
      val unpart = q.fn(spark, sf).queryExecution.optimizedPlan
        .collectWithSubqueries {
          case w: LogicalWindow if w.partitionSpec.isEmpty => w
        }
      if (unpart.nonEmpty) Some(q.name) else None
    }.toSet
    assert(offenders == allowed.keySet,
      s"unpartitioned-window set drifted.\n  unexpected: ${(offenders -- allowed.keySet).toSeq.sorted}\n  stale allowlist: ${(allowed.keySet -- offenders).toSeq.sorted}")
  }

  test("q60 range join plans as pure equi-joins, never a nested loop") {
    val plan = planOf("q60_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketized range join must stay an equi-join:\n$plan")
    assert(plan.contains("Join"), s"expected the (user_id, bucket) join in:\n$plan")
  }

  test("q62 bucketed tables join with zero exchanges") {
    // run the graded query once so the bucketed tables exist, then probe
    // the bare join's plan: bucket-co-located scans, no shuffle
    SparkEntry.queries("q62_bucketed_join")(spark, sf).collect()
    val li = spark.table("graft_q62_lineitem_bucketed")
    val o = spark.table("graft_q62_orders_bucketed")
    val j = li.join(o.hint("merge"), li("l_orderkey") === o("o_orderkey"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed co-located join must not shuffle either side:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"expected bucketed scans in:\n$plan")
  }

  test("q103 prunes fact partitions at runtime (DPP) and joins buckets with no shuffle") {
    val df = SparkEntry.queries("q103_dpp_join")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the fact scan's PartitionFilters must carry a dynamicpruning
    // subquery fed by the dim's broadcast — runtime pruning, not static
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$plan")
    // the orderkey join must read bucket i against bucket i: no hash
    // exchange on either join key anywhere in the plan (the only
    // exchanges are the dim broadcast and the final agg/sort)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed orderkey join must not shuffle either fact side:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"expected bucketed scans in:\n$plan")
  }

  test("q24 minhash plan has no join (single-pass window assignment)") {
    val plan = planOf("q24_dedup_minhash")
    assert(!plan.contains("Join"), s"bucket-min must be a window, not a join:\n$plan")
    assert(plan.contains("Window"))
  }

  test("q85 3-way join plans top-k as TakeOrderedAndProject") {
    val plan = planOf("q85_shipping_priority")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must plan as per-partition heaps, not a global sort:\n$plan")
  }

  test("q86 6-way join broadcasts the dimension chain") {
    val plan = planOf("q86_local_supplier_volume")
    assert(plan.contains("BroadcastHashJoin"),
      s"supplier/nation/region chain must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"6-way join must stay equi-join only:\n$plan")
  }

  test("q75 full outer joins pre-aggregated inputs, not the fact table") {
    val plan = planOf("q75_full_outer_reconcile")
    assert(plan.contains("FullOuter"), s"expected full outer join in:\n$plan")
    // both join inputs must already be aggregates: a partial HashAggregate
    // below the join on each side means the join moves per-customer rows,
    // never order history
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SMJ full outer in:\n$plan")
    val below = plan.substring(joinIdx)
    assert(below.contains("HashAggregate"),
      s"join inputs must be pre-aggregated:\n$plan")
  }

  test("q66 contamination probes via a broadcast semi-join (corpus never shuffles)") {
    val plan = planOf("q66_contamination")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark shingle set must broadcast into a semi-join probe:\n$plan")
  }

  test("q79 profile plans one two-level aggregate, never an Expand") {
    val plan = planOf("q79_profile")
    // the tall stack shape replaces the N-countDistinct Expand; the only
    // aggregation is partial+final on (column_name, v)
    assert(!plan.contains("Expand"),
      s"profiling must not plan a distinct Expand:\n$plan")
    assert(plan.contains("HashAggregate") && plan.contains("partial"),
      s"expected two-level aggregation in:\n$plan")
  }

  test("q81 window suite sorts per partition, never globally before the window") {
    val plan = planOf("q81_window_suite")
    assert(plan.contains("Window"), s"expected window in:\n$plan")
    assert(plan.contains("hashpartitioning(o_orderpriority"),
      s"window must partition by priority (bounded per-partition sorts):\n$plan")
  }

  test("q87 unpivot plans a single Expand, no join") {
    val plan = planOf("q87_unpivot")
    assert(plan.contains("Expand"), s"unpivot should plan as Expand:\n$plan")
    assert(!plan.contains("Join"), s"unpivot must not join:\n$plan")
  }

  test("q91 chunking is scan + generate, no join and no window") {
    val plan = planOf("q91_doc_chunk")
    assert(plan.contains("Generate"), s"expected explode Generate in:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"chunking must stay row-local:\n$plan")
  }

  test("q92 global index: corpus window is shard-partitioned") {
    val plan = planOf("q92_global_index")
    // the row_number over the corpus partitions by shard; the only
    // unpartitioned window is the 256-row shard-offset frame above an
    // aggregate
    assert(plan.contains("hashpartitioning(shard"),
      s"corpus window must partition by shard:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"shard offsets must broadcast back, not shuffle the corpus:\n$plan")
  }

  test("q115 top-N per group pushes a WindowGroupLimit below the shuffle") {
    val plan = planOf("q115_topn_per_group")
    // InferWindowGroupLimit must rewrite rn<=3 into group-limit nodes —
    // a Partial one before the exchange (per-map-partition top-3) and a
    // Final one after; without it every fact row would shuffle
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown in:\n$plan")
    assert(plan.contains("Partial"),
      s"expected the pre-shuffle Partial group-limit in:\n$plan")
  }

  test("q13 multi-distinct aggregate rewrites through Expand") {
    // RewriteDistinctAggregates: three countDistinct columns in one agg
    // must become one Expand + double aggregation, not three scans
    val plan = planOf("q13_distinct_count")
    assert(plan.contains("Expand"), s"expected Expand rewrite in:\n$plan")
  }

  test("q133 inverted-index posting cap pushes a WindowGroupLimit") {
    // same rewrite as q115: the rn <= maxPostings filter must become a
    // per-partition group limit so a hot term's posting candidates are
    // bounded map-side, never fully sorted at one reducer
    val plan = planOf("q133_inverted_index")
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown in:\n$plan")
  }

  test("q120 SCD2 plans ONE exchange for both window passes") {
    val plan = planOf("q120_scd2_dim")
    // lag-collapse and lead/row_number share (user_id, ts, event_id)
    // partitioning+sort: exactly one hashpartitioning exchange on
    // user_id should appear (plus the presentation range sort)
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly one user_id exchange, got $exchanges in:\n$plan")
  }

  test("q121 co-occurrence broadcasts the part dimension") {
    val plan = planOf("q121_cooccur_brands")
    assert(plan.contains("BroadcastHashJoin"),
      s"part dim must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }

  test("q122 BPE pairs: partial agg collapses pairs before the shuffle, top-k never sorts globally") {
    val plan = planOf("q122_bpe_pairs")
    assert(plan.contains("partial"), s"expected map-side combine in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k plan in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q124 z-order stats: the interleave stays in the scan stage (one shuffle on the bucket)") {
    val plan = planOf("q124_zorder_stats")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly one hash exchange (5-bit bucket agg), got $exchanges in:\n$plan")
  }

  test("q125 equi-depth binning broadcasts boundaries — no ntile global sort") {
    val plan = planOf("q125_equidepth_bins")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"boundary row must broadcast:\n$plan")
    // the only range exchange allowed is the final 10-row presentation
    // sort; the fact table itself must not range-partition (ntile shape)
    assert(!plan.contains("Window"),
      s"no window/ntile may appear:\n$plan")
  }

  test("q143 MAD: both stats frames broadcast back, fact never re-shuffles") {
    val plan = planOf("q143_mad_outliers")
    // the dev frame feeds both the MAD aggregate and the final count, so
    // the med join's subtree can appear twice in the unexecuted text —
    // what matters is that every stats join broadcasts
    val bcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bcasts >= 2, s"expected the med+mad joins to broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"type-cardinality stats must never sort-merge:\n$plan")
  }

  test("q149 HAVING subquery executes ONE independent aggregate, no per-group rerun") {
    val df = SparkEntry.queries("q149_revenue_share_having")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the scalar threshold appears as a single (reused) subquery node;
    // a correlated rewrite would surface joins or repeated aggregates
    val subq = "Subquery".r.findAllIn(plan).length
    assert(subq >= 1, s"expected a scalar subquery node:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"threshold must not join row-by-row:\n$plan")
  }

  test("q150 session paths: top-k is TakeOrdered, collect is capped below it") {
    val plan = planOf("q150_session_paths")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 paths must not global-sort:\n$plan")
    assert(plan.contains("WindowGroupLimit") || plan.contains("Filter"),
      s"the rn<=8 cap must run before collect_list:\n$plan")
  }

  test("q154 lapsed customers: anti join with the date predicate pushed to orders") {
    val df = SparkEntry.queries("q154_lapsed_customers")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must decorrelate to an anti join:\n$plan")
    assert(plan.replaceAll("\\s", "").contains("PushedFilters:[IsNotNull(o_custkey),GreaterThanOrEqual(o_orderdate")
      || plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter must reach the orders scan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q155 top supplier: scalar MAX over the derived aggregate, no rescan join loop") {
    val plan = planOf("q155_top_supplier")
    assert("Subquery".r.findAllIn(plan).nonEmpty,
      s"expected a scalar subquery for the max:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"max threshold must not join row-by-row:\n$plan")
  }

  test("q160 sliding windows fan out via a bounded Expand, never a join") {
    val plan = planOf("q160_sliding_window")
    assert(plan.contains("Expand"),
      s"width/slide fan-out must be a row-local Expand:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"),
      s"sliding windows must not join events to a window table:\n$plan")
  }

  test("q163 disjunctive bands: both sides of the OR-of-ANDs push below the join") {
    val plan = planOf("q163_disjunctive_bands")
    val flat = plan.replaceAll("\\s", "")
    // CNF extraction must factor the part-only conjuncts out of the
    // disjunction and push them into the part scan... (PushedFilters
    // strings are truncated in toString, so pin the stable PREFIX of the
    // pushed disjunction, not its tail)
    assert(flat.contains("Or(Or(And(EqualTo(p_brand"),
      s"part-side OR-of-ANDs must reach the part scan:\n$plan")
    // ...and the quantity bands into the lineitem scan, so neither side
    // joins unfiltered rows
    assert(flat.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      s"quantity-band disjunction must reach the lineitem scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the filtered part side must broadcast:\n$plan")
  }

  test("q165 dominant supplier: correlated threshold decorrelates, INs become semi joins") {
    val plan = planOf("q165_dominant_supplier")
    assert(plan.contains("LeftSemi"),
      s"the IN chains must plan as semi joins:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the correlated 15% threshold must join per part, not per row:\n$plan")
  }

  test("q152 SCD2 lookup joins on the user key with the interval as residual") {
    val plan = planOf("q152_scd2_lookup")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin"),
      s"point-in-time lookup must be a keyed join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval predicate must ride the equi-join as a residual:\n$plan")
  }

  test("q194 snapshot diff plans one full-outer join pair, never a nested loop") {
    val plan = planOf("q194_table_diff")
    assert(plan.contains("FullOuter"), s"expected a FullOuter join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"diff must stay a key equi-join:\n$plan")
  }

  test("q195 trend slopes broadcast the nation dimension and stay sort-free") {
    val plan = planOf("q195_trend_slopes")
    assert(plan.contains("BroadcastHashJoin"),
      s"nation should broadcast:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"regression-by-aggregation must not plan a window:\n$plan")
  }

  test("q190 phrase search prunes both posting sides with broadcast semi joins") {
    val plan = planOf("q190_phrase_match")
    assert("LeftSemi".r.findAllIn(plan).size >= 1,
      s"expected the w2 posting prune as a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"posting intersection must stay an equi-join:\n$plan")
  }

  test("q213 interval overlap plans as an equi-join, never a nested loop") {
    val plan = planOf("q213_overlap_orders")
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"bucketized overlap must stay an equi-join on (customer, bucket):\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"),
      s"pair dedup should plan as an aggregate:\n$plan")
  }

  test("q217 BPE encode broadcasts the vocabulary against the word stream") {
    val plan = planOf("q217_bpe_encode")
    assert(plan.contains("BroadcastHashJoin"),
      s"the KB-sized vocabulary must broadcast:\n$plan")
  }

  test("q220 KS argmax plans as TakeOrdered, never a global sort") {
    val plan = planOf("q220_ks_drift")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-1 argmax should be TakeOrdered:\n$plan")
  }

  test("q223 contract suite evaluates every contract in one scan") {
    val plan = planOf("q223_data_contracts")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"all contracts must share ONE customer scan, found $scans:\n$plan")
  }

  test("q233 centroid assignment broadcasts the centroid relation") {
    val plan = planOf("q233_centroid_assign")
    assert(plan.contains("BroadcastHashJoin"),
      s"the labels x dim centroid relation must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scoring must stay a d-keyed equi-join:\n$plan")
  }

  test("q226 hybrid skew join keeps a broadcast hot branch") {
    val plan = planOf("q226_hybrid_skew_join")
    // the hot-key routers and the hot-side join are all broadcast —
    // hot keys must never reach an exchange
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"expected broadcast routers + hot join:\n$plan")
  }

  test("q186 pagerank re-reads the checkpointed edges, not the fact join, per round") {
    // after localCheckpoint the executed plan must not contain three
    // repetitions of the orders x lineitem scan — the iterations read
    // the materialized RDD instead
    val plan = planOf("q186_trade_pagerank")
    val factScans = "Scan ExistingRDD".r.findAllIn(plan).size
    assert(factScans >= 3,
      s"iterations should read the checkpointed edge RDD:\n$plan")
    val lineitemScans = "lineitem".r.findAllIn(plan).size
    assert(lineitemScans <= 2,
      s"the fact aggregation must run once, not per round:\n$plan")
  }
}
