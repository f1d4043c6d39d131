package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that matter at 100 TB must be
  * visible in the plan, not assumed — broadcast joins stay broadcast,
  * filters and projections reach the parquet scan, bucketed joins avoid
  * shuffles, and hot paths stay inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite with CacheDrained {

  // queries under plan inspection persist-and-track helper frames; drain
  // per test like the harness does
  override def afterEach(): Unit = CacheTracker.releaseAll()

  private def plan(name: String): String =
    SparkEntry.queries(name)(TestSpark.spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString

  test("train_split_safe's component broadcast is byte-gated, not unconditional") {
    val spark = TestSpark.spark
    import spark.implicits._
    val comp = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster")
    def hasHint(rows: Long): Boolean =
      graft.operators.DedupOps.gatedBroadcastComp(comp, rows)
        .queryExecution.analyzed.collectFirst {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
        }.isDefined
    // demo-scale component frame keeps the hint; past the byte budget the
    // hint disappears and AQE owns the join choice (the 100 TB shape: a
    // few-% dup rate is billions of rows, never driver-broadcastable)
    assert(hasHint(graft.operators.DedupOps.BroadcastMaxComponents))
    assert(!hasHint(graft.operators.DedupOps.BroadcastMaxComponents + 1))
  }

  test("graph triangles/communities build the co-purchase edge list once (persisted, not recomputed)") {
    val spark = TestSpark.spark
    Seq("graph_triangles", "graph_communities").foreach { q =>
      val df = SparkEntry.queries(q)(spark, TestSpark.Sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // the expensive subtree (lineitem self-join + distinct) must be
      // consumed from the persisted edge frame: downstream branches read
      // the cache, and LIVE lineitem parquet scans number at most two
      // (the single self-join's two sides) instead of one per consuming
      // branch — the r6 3x-recompute regression shape. Live scans are
      // counted on the plan TREE (a cached InMemoryRelation prints its
      // full lineage in toString but executes none of it).
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def liveScans(pl: SparkPlan): Int = pl match {
        case a: AdaptiveSparkPlanExec => liveScans(a.executedPlan)
        case qs: QueryStageExec => liveScans(qs.plan)
        case f: FileSourceScanExec =>
          if (f.relation.location.inputFiles.exists(_.contains("lineitem"))) 1 else 0
        case other => other.children.map(liveScans).sum
      }
      val scans = liveScans(df.queryExecution.executedPlan)
      if (q == "graph_triangles") {
        // the final plan consumes the persisted edge frame directly
        assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
          s"$q does not read the persisted edge list:\n${p.take(2000)}")
        assert(scans <= 2, s"$q rebuilt the edge list ($scans live lineitem scans)")
      } else {
        // label propagation's output is the last round's localCheckpoint:
        // truncated lineage means the final action re-scans NOTHING — the
        // cached edge list was consumed inside the rounds
        assert(scans == 0, s"$q final plan re-scans lineitem ($scans live scans)")
      }
      CacheTracker.releaseAll()
    }
  }

  test("inv_agg_pushdown pushes the manifest rollup into the V2 walk") {
    val p = plan("inv_agg_pushdown")
    assert(p.contains("PushedAggregation") && p.contains("PushedGroupBy: [parent_directory]"),
      s"manifest aggregation not pushed into the source:\n${p.take(2000)}")
  }

  test("inv_agg_pushdown_prefix composes the rollup with the exactly-pushed prefix filter") {
    val p = plan("inv_agg_pushdown_prefix")
    // both pushdowns visible on the SAME scan: the rollup under a prefix
    // is one partial row per (partition, matching directory)
    assert(p.contains("PushedAggregation") && p.contains("PushedGroupBy: [parent_directory]"),
      s"prefix rollup lost the aggregate pushdown:\n${p.take(2000)}")
    assert(p.contains("StringStartsWith(parent_directory"),
      s"prefix rollup lost the filter pushdown:\n${p.take(2000)}")
    // the exactly-applied prefix must not be re-evaluated post-scan (a
    // residual Filter would also have blocked the aggregate pushdown)
    val residual = p.linesIterator
      .filter(l => l.contains("Filter ") && l.toLowerCase.contains("startswith"))
    assert(residual.isEmpty, s"prefix left residual:\n${p.take(2000)}")
  }

  test("inv_incremental_scan composes mtime watermark + files-only + rollup on one scan") {
    val p = plan("inv_incremental_scan")
    assert(p.contains("PushedAggregation") && p.contains("PushedGroupBy: [parent_directory]"),
      s"incremental rollup lost the aggregate pushdown:\n${p.take(2000)}")
    assert(p.contains("GreaterThanOrEqual(mtime_ms") && p.contains("EqualTo(is_folder"),
      s"incremental scan lost a pushed filter:\n${p.take(2000)}")
  }

  test("corpus clean gate tokenizes once per scan (no alias-inlined regexp fan-out)") {
    // r7 verdict weak #1: Catalyst inlined the `toks` alias into every gate
    // conjunct, so the corpus-prep hot path ran regexp_extract_all ~10x per
    // row. The gate now binds toks as a lambda variable (opaque to
    // CollapseProject / PushPredicateThroughNonJoin): every plan node must
    // evaluate regexp_extract_all at most ONCE.
    Seq("corpus_clean", "corpus_mix_report").foreach { q =>
      val p = plan(q)
      val bad = p.linesIterator
        .filter(l => "regexp_extract_all".r.findAllIn(l).length > 1).toList
      assert(bad.isEmpty,
        s"$q has a plan node that re-tokenizes: " +
          bad.headOption.getOrElse("").take(300))
      // and the gate really is the lambda-bound form, not a rewritten alias
      assert(p.contains("lambdafunction(named_struct(keep_q"),
        s"$q gate lost the lambda binding:\n${p.take(1500)}")
    }
  }

  test("capped sessionization rides one window exchange (carry-forward start, no per-session shuffle)") {
    val p = plan("events_sessionize_capped")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one exchange feeds all three window functions (lag, cumsum, running
    // max — same user_id partitioning and us order) and one is the final
    // group-by's partial-agg exchange; a min-over-(user,gid) session start
    // would add a third
    assert(exchanges <= 2, s"capped sessionizer grew a per-session shuffle:\n$p")
    assert("Window".r.findAllIn(p).length >= 1)
  }

  test("identity/dimension joins are broadcast, not shuffled") {
    Seq("identity_join", "acl_map_entries", "inv_remap_owners", "tpch_q3", "tpch_q5")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
        assert(!p.contains("SortMergeJoin"), s"$q fell back to sort-merge")
      }
  }

  test("q7/q10/q18 keep broadcast dims; q18's only wide shuffle is the order-qty agg") {
    Seq("tpch_q7", "tpch_q10", "tpch_q18").foreach { q =>
      val df = SparkEntry.queries(q)(TestSpark.spark, TestSpark.Sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast dim join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to all-pairs:\n$p")
    }
  }

  test("q2/q9/q16/q21 completion tier: broadcast dims, no all-pairs fallback") {
    Seq("tpch_q2", "tpch_q9", "tpch_q16").foreach { q =>
      val df = SparkEntry.queries(q)(TestSpark.spark, TestSpark.Sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast dim join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to all-pairs:\n$p")
    }
    // q21 runs the aggregation REWRITE of the oracle's EXISTS/NOT-EXISTS
    // pair: per-order supplier stats instead of three correlated fact
    // passes. The scale property: at cluster scale the orders side does
    // NOT broadcast, the fact join sort-merges on the order key, and BOTH
    // stacked groupBys — (orderkey, suppkey) then (orderkey) — ride that
    // partitioning (subset clustering), so neither adds an exchange.
    // Reproduce the cluster regime by disabling broadcast; inspected
    // PRE-execution (the test-sf result is empty → AQE collapses it).
    val conf21 = TestSpark.spark.conf
    val saved21 = conf21.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val p21 = try {
      conf21.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SparkEntry.queries("tpch_q21")(TestSpark.spark, TestSpark.Sf)
        .queryExecution.executedPlan.toString
    } finally conf21.set("spark.sql.autoBroadcastJoinThreshold", saved21)
    assert(!p21.contains("CartesianProduct") && !p21.contains("BroadcastNestedLoopJoin"),
      s"q21 degenerated to all-pairs:\n$p21")
    assert(!p21.matches("(?s).*Exchange hashpartitioning\\(l_orderkey#\\d+L?, l_suppkey.*"),
      s"q21's per-supplier groupBy re-shuffles instead of riding the join:\n$p21")
    // fact-key exchanges = the sort-merge join's two inputs only; the
    // aggregations above them must contribute zero more
    val okExchanges = "Exchange hashpartitioning\\((?:l_orderkey|o_orderkey)#"
      .r.findAllIn(p21).size
    assert(okExchanges <= 2, s"q21 rewrite re-shuffles the fact side ($okExchanges):\n$p21")
  }

  test("q19's quantity band and q14's date band reach the lineitem scan") {
    Seq("tpch_q19" -> "l_quantity", "tpch_q14" -> "l_shipdate").foreach {
      case (q, c) =>
        val p = SparkEntry.queries(q)(TestSpark.spark, TestSpark.Sf)
          .queryExecution.executedPlan.toString
        assert(p.contains("PushedFilters: ["), s"$q scan has no pushed filters")
        assert(p.contains(c), s"$q's $c filter missing from the scan")
    }
  }

  test("sim_near_dup_pairs generates candidates via LSH buckets, not an all-pairs join") {
    val df = SparkEntry.queries("sim_near_dup_pairs")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"near-dup pairs fell back to an all-pairs nested-loop join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"near-dup pairs fell back to a cartesian product:\n$p")
  }

  test("distributed rank/prefix-sum queries have no single-partition exchange") {
    Seq("pack_nextfit_dist", "phase_order_dirs", "train_shuffle_order").foreach { q =>
      val df = SparkEntry.queries(q)(TestSpark.spark, TestSpark.Sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!p.contains("Exchange SinglePartition"),
        s"$q serializes through a single-partition exchange:\n$p")
    }
  }

  test("dedup_jaccard has no window operator (df filter is a broadcast anti-join)") {
    val df = SparkEntry.queries("dedup_jaccard")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"dedup_jaccard reintroduced a window shuffle:\n$p")
  }

  test("label-centroid assignment broadcasts the tiny centroid side") {
    val df = SparkEntry.queries("sim_label_centroids")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), s"centroid join lost its broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"centroid assignment degenerated to all-pairs:\n$p")
  }

  test("ivf candidate generation is an equi-join on list id, never all-pairs") {
    val df = SparkEntry.queries("sim_ann_ivf")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"IVF degenerated to all-pairs:\n$p")
  }

  test("containment pairs ride the same windowless bucket join as Jaccard") {
    val df = SparkEntry.queries("dedup_containment")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"containment reintroduced a window shuffle:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"containment degenerated to all-pairs:\n$p")
  }

  test("dedup_passages dedups via hash aggregation, not a window over the passage hash") {
    val df = SparkEntry.queries("dedup_passages")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"passage first-occurrence reintroduced a window shuffle:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"passage dedup degenerated to all-pairs:\n$p")
  }

  test("fuzzy decontamination broadcasts the eval shingle side") {
    val df = SparkEntry.queries("decontam_fuzzy")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"fuzzy decontam lost the broadcast of the eval side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy decontam degenerated to all-pairs:\n$p")
  }

  test("decontamination joins the gram corpus against a broadcast eval side") {
    val df = SparkEntry.queries("decontam_ngram")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the eval gram set is the tiny side by construction: the corpus scan
    // must stream past a broadcast, never shuffle into a sort-merge join
    assert(p.contains("BroadcastHashJoin"), s"decontam lost its broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"decontam shuffles the corpus grams:\n$p")
  }

  test("filters and column pruning reach the parquet scan") {
    val exec = SparkEntry.queries("tpch_q6")(TestSpark.spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(exec.contains("PushedFilters: ["), "no pushed filters on tpch_q6 scan")
    assert(exec.contains("l_shipdate"), "shipdate filter missing from scan")
    // q6 needs only 4 columns; the scan must not read the full 11-column schema
    assert(!exec.contains("l_returnflag"), "q6 scan reads unneeded columns")
  }

  test("scan-side pruning on the inventory projection (2-col read)") {
    val exec = SparkEntry.queries("pack_dir_sizes")(TestSpark.spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    // dir sizes needs only l_partkey and l_extendedprice
    assert(!exec.contains("l_shipdate"), "pack_dir_sizes reads unneeded columns")
  }

  test("hot aggregations run inside whole-stage codegen") {
    Seq("tpch_q1", "tpch_q6", "join_inner_agg").foreach { q =>
      // AQE finalizes the physical plan only on execution
      val df = SparkEntry.queries(q)(TestSpark.spark, TestSpark.Sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // "*(n)" prefixes mark WholeStageCodegen spans in the final AQE plan
      assert(p.contains("*(1)"), s"$q not codegen'd:\n$p")
      // the scan → filter → partial-agg pipeline must share one span
      assert(p.contains("*(1) HashAggregate") || p.contains("*(1) Filter"),
        s"$q scan pipeline not fused:\n$p")
    }
  }

  test("higher-order ACL mapping stays map-side (no hash-partition shuffle)") {
    val df = SparkEntry.queries("acl_map_entries_ho")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    // AQE toString prints Final + Initial plans; inspect the final only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the only exchanges allowed are the dedupe of the 4 raw keys and the
    // final deterministic range sort — no shuffle from the mapping itself
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 1, s"HO mapping gained shuffles:\n$p")
  }

  test("AQE re-plans shuffles at runtime (coalesced readers on a sort-merge join)") {
    val spark = TestSpark.spark
    val conf = spark.conf
    val savedBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      import org.apache.spark.sql.functions._
      val l = Tables.lineitem(spark, TestSpark.Sf)
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val r = Tables.orders(spark, TestSpark.Sf)
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
      val joined = l.join(r, Seq("k")).agg(count(lit(1)))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      // runtime re-optimization observed: post-shuffle partitions merged to
      // the advisory size (the same machinery that splits skewed partitions
      // when per-partition bytes warrant it at real scale)
      assert(p.contains("AQEShuffleRead coalesced"), s"AQE did not re-plan:\n$p")
      assert(p.contains("isFinalPlan=true"))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
  }

  test("AQE splits a skewed join partition at runtime (skew-join machinery)") {
    val spark = TestSpark.spark
    val conf = spark.conf
    val saved = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
      "spark.sql.adaptive.coalescePartitions.enabled" -> conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true"))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // thresholds scaled down so the test-sized hot key trips the same
      // machinery that splits multi-GB skewed partitions at cluster scale
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      import spark.implicits._
      // one hot key carrying ~98% of the left side
      val left = spark.range(200000)
        .select((when(col("id") % 50 === 0, col("id") % 97).otherwise(0L)).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val right = spark.range(97).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("d"))
      // no aggregation downstream: skew-splitting changes the join's output
      // partitioning, so AQE only applies it when nothing downstream
      // requires that partitioning (else it would cost an extra shuffle)
      val joined = left.join(right, Seq("k"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffled join:\n$p")
      assert(p.contains("skew=true") && p.contains("AQEShuffleRead skewed"),
        s"AQE did not split the skewed partition:\n$p")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact scan") {
    val spark = TestSpark.spark
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffled join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // production default only arms the filter for 10GB+ fact scans; lower
      // it so the test-sized fact side exercises the same machinery
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val l = Tables.lineitem(spark, TestSpark.Sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val o = Tables.orders(spark, TestSpark.Sf)
        .filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
      val j = l.join(o, col("l_orderkey") === col("o_orderkey")).agg(count(lit(1)).as("n"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      // the dim filter's bloom filter is pushed into the fact side BEFORE
      // the join's shuffle — rows for unsold orders never leave the scan stage
      assert(p.contains("might_contain"), s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("cached dataset is served from the in-memory columnar store") {
    val spark = TestSpark.spark
    val df = Tables.orders(spark, TestSpark.Sf)
      .filter(col("o_orderstatus") === "F").cache()
    try {
      df.count()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"), s"cache not used:\n$p")
    } finally df.unpersist()
  }

  test("hive-style partitioned write prunes partitions at the scan (PartitionFilters)") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.lineitem(spark, TestSpark.Sf)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val p = scan.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning —
    // non-matching partitions are never listed, the 100 TB layout lever),
    // NOT in PushedFilters (row-group stats checked after opening files)
    assert(p.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"returnflag filter not applied at partition level:\n$p")
    val files = scan.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(files.nonEmpty && files.forall(_.contains("l_returnflag=R")),
      s"scan read non-matching partition directories: $files")
  }

  test("bucketed join on the same keys avoids the shuffle exchange") {
    val spark = TestSpark.spark
    val wh = Files.createTempDirectory("graft-buckets").toString
    Tables.orders(spark, TestSpark.Sf)
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.customer(spark, TestSpark.Sf)
      .withColumn("c_custkey", col("c_custkey")) // keep schema
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b").hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
    assert(joined.count() > 0)
    val p = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key: no Exchange below the join
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, "expected sort-merge join of bucketed tables")
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      "bucketed join still shuffles")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }

  test("count-min estimates join the tiny cell tables via broadcast") {
    val df = SparkEntry.queries("events_count_min")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // 4 cell tables of at most W rows each: all four joins must broadcast —
    // a sort-merge fallback would shuffle the full key set four times
    assert(p.contains("BroadcastHashJoin"), s"count-min lost its broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"count-min cell join fell back to sort-merge:\n$p")
  }

  test("upsert merge anti-join broadcasts the change batch; base is never sorted") {
    val df = SparkEntry.queries("inv_merge_upsert")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // latest-wins = updates ∪ (base anti-join updates): with a small change
    // batch the anti-join must broadcast (the 100 TB base side stays
    // unshuffled); no Window and no SortAggregate anywhere — the final
    // orderBy is the only sort
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"upsert merge lost its broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"upsert merge shuffles the base side:\n$p")
    assert(!p.contains("Window") && !p.contains("SortAggregate"),
      s"upsert merge reintroduced a per-key sort:\n$p")
  }

  test("binned interval join plans as an equi join, never a nested loop") {
    val df = SparkEntry.queries("join_interval_binned")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the whole point of the bin rewrite: the no-equi-key BETWEEN join must
    // ride a hash/sort equi join on the bin column with the BETWEEN as a
    // residual, not a quadratic BroadcastNestedLoopJoin
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned interval join degenerated to all-pairs:\n$p")
    assert(p.contains("Join") && p.contains("bin"),
      s"expected an equi join keyed on the bin column:\n$p")
  }

  test("pagerank rounds keep an O(1) plan (checkpointed lineage, no plan growth)") {
    val df = SparkEntry.queries("graph_pagerank")(TestSpark.spark, TestSpark.Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the returned frame is the checkpointed round-10 labels: its plan must
    // be a scan of materialized partitions, not 10 stacked join rounds
    assert(p.contains("Scan ExistingRDD"), s"pagerank result is not checkpoint-backed:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"pagerank final plan still carries join rounds:\n$p")
  }

  test("bucketed tables co-locate the fact join: zero exchanges in the joined plan") {
    // THE 100 TB recurring-join pattern: pay the shuffle once at WRITE
    // time (bucketBy on the join key), then every subsequent join on that
    // key is exchange-free — the plan must show SortMergeJoin with NO
    // Exchange below it. This is the storage-layout twin of the zorder
    // work: layout decided at write time buys plan shape forever after.
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val li = Tables.lineitem(spark, TestSpark.Sf)
        .select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, TestSpark.Sf)
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bkt")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bkt")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").count()
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ on the bucketed pair:\n$p")
      assert(!p.substring(p.indexOf("SortMergeJoin")).contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      // control: the same join over the raw parquet MUST shuffle both sides
      val raw = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").count()
      raw.collect()
      val rp = raw.queryExecution.executedPlan.toString
      assert(rp.contains("Exchange hashpartitioning"),
        s"control join unexpectedly exchange-free:\n$rp")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
