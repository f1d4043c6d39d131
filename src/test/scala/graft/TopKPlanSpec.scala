package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom bounded-heap top-k operator (graft.plans): the rewrite must
  * fire exactly on the safe pattern, the physical pair must replace the
  * map-side sort, and results must be row-identical to the window form. */
class TopKPlanSpec extends AnyFunSuite with CacheDrained {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("row_number <= k rewrites to the two-phase heap exec, no map-side full sort") {
    val df = SparkEntry.queries("topk_heap")(spark, TestSpark.Sf)
    val p = executed(df)
    assert(p.contains("TopKPerKey"), s"rewrite did not fire:\n$p")
    // partial (pre-exchange) and final (post-exchange) instances
    assert("TopKPerKey".r.findAllIn(p).size >= 2, s"expected partial+final pair:\n$p")
    // the only Sorts allowed sit above the final heap output (the Window
    // re-deriving rn over <= k*keys rows, plus the query's orderBy); the
    // map side below the hash exchange must be sort-free — that missing
    // full sort IS the operator's win over the built-in group-limit path
    val mapSide = p.substring(p.lastIndexOf("Exchange hashpartitioning"))
    assert(mapSide.contains("TopKPerKey"), s"no heap partial below the exchange:\n$p")
    assert(!mapSide.contains("Sort ["), s"map side still sorts:\n$p")
  }

  test("rank-limit downstream of an aggregation also rides the heap (events_top_types_daily)") {
    val df = SparkEntry.queries("events_top_types_daily")(spark, TestSpark.Sf)
    val p = executed(df)
    // the rewrite fires on the declarative filter shape even when the
    // window's child is a hash aggregate, not a scan
    assert(p.contains("TopKPerKey"), s"aggregated-input rewrite did not fire:\n$p")
    assert(p.contains("HashAggregate"), s"count rollup missing:\n$p")
  }

  test("heap result is row-identical to the unrewritten rank() window form") {
    // rank() never matches RewriteRankLimit; with a total ordering it
    // computes the same set, so it is the in-engine control
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val control = Tables.orders(spark, TestSpark.Sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", rank().over(w))
      .filter(col("rn") <= 5)
      .orderBy(col("o_orderpriority"), col("rn"))
    assert(!executed(control).contains("TopKPerKey"),
      "rank() form must stay on the built-in path")
    val heap = SparkEntry.queries("topk_heap")(spark, TestSpark.Sf)
    assert(heap.collect().toSeq == control.collect().toSeq)
  }

  test("wide (per-supplier) variant matches the rank() control too") {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    val control = Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("rn", rank().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("l_suppkey"), col("rn"))
    val heap = SparkEntry.queries("topk_heap_wide")(spark, TestSpark.Sf)
    assert(heap.collect().toSeq == control.collect().toSeq)
  }

  test("rewrite respects null ordering and k=1 equality form") {
    val df = Seq(
      ("a", Some(3), 1), ("a", None, 2), ("a", Some(1), 3), ("a", Some(1), 4),
      ("b", None, 5), ("b", None, 6), ("c", Some(7), 7)
    ).toDF("k", "v", "id")
    // NULLS FIRST ascending (Spark default): nulls must win rank 1
    val w = Window.partitionBy("k").orderBy(col("v").asc_nulls_first, col("id"))
    val top = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(executed(top).contains("TopKPerKey"), "rn = 1 form should fire")
    val got = top.select("k", "id").as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 2, "b" -> 5, "c" -> 7))
    // NULLS LAST descending: nulls must lose
    val w2 = Window.partitionBy("k").orderBy(col("v").desc_nulls_last, col("id"))
    val top2 = df.withColumn("rn", row_number().over(w2)).filter($"rn" < 2)
    val got2 = top2.select("k", "id").as[(String, Int)].collect().toMap
    assert(got2 == Map("a" -> 1, "b" -> 5, "c" -> 7))
  }

  test("GLOBAL rank limit (empty partition spec) rides the heap via AllTuples") {
    // an unpartitioned row_number ≤ k — the global top-k shape. The
    // rewrite fires with an empty clustering; the final phase must demand
    // AllTuples (ClusteredDistribution(Nil) is rejected by Spark), so the
    // plan is partial heaps (≤ k rows each) → single-partition exchange →
    // final heap. Control: orderBy + limit of the same ordering.
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val global = Tables.orders(spark, TestSpark.Sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .orderBy("rn")
    val p = executed(global)
    assert(p.contains("TopKPerKey"), s"global rank-limit rewrite did not fire:\n$p")
    val control = Tables.orders(spark, TestSpark.Sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(7)
      .collect().toSeq
    assert(global.select("o_orderkey", "o_totalprice").collect().toSeq == control)
  }

  test("unsafe patterns stay on the built-in path") {
    val df = Seq(("a", 1, 1), ("a", 2, 2), ("b", 3, 3)).toDF("k", "v", "id")
    val w = Window.partitionBy("k").orderBy("v", "id")
    // rank-like but not row_number
    val r1 = df.withColumn("rn", dense_rank().over(w)).filter($"rn" <= 1)
    // no upper bound on rn
    val r2 = df.withColumn("rn", row_number().over(w)).filter($"rn" >= 2)
    // a second non-rank window expression over the same spec would change
    // under input limiting
    val r3 = df.withColumn("rn", row_number().over(w))
      .withColumn("s", sum("v").over(Window.partitionBy("k")))
      .filter($"rn" <= 1)
    Seq(r1, r2, r3).foreach { r =>
      assert(!executed(r).contains("TopKPerKey"),
        s"rewrite fired on an unsafe pattern:\n${executed(r)}")
    }
    // r3 sanity: the partition-wide sum must see all rows
    assert(r3.select("k", "s").as[(String, Long)].collect().toMap ==
      Map("a" -> 3L, "b" -> 3L))
  }

  test("a single hot key does not break the bounded heap (skew safety)") {
    // one key with 200k rows + 100 cold keys: the sort path would sort the
    // hot partition in full; the heap retains exactly k rows per key per
    // partition regardless of skew, so this must stay fast and exact
    val hot = spark.range(200000).selectExpr("'hot' AS k", "id AS v", "id")
    val cold = spark.range(1000).selectExpr(
      "concat('c', id % 100) AS k", "id + 1000000 AS v", "id + 1000000 AS id")
    val df = hot.unionByName(cold)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val top = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(executed(top).contains("TopKPerKey"))
    val rows = top.select("k", "v").as[(String, Long)].collect()
    assert(rows.count(_._1 == "hot") == 2)
    assert(rows.filter(_._1 == "hot").map(_._2).sorted.toSeq == Seq(199998L, 199999L))
    assert(rows.length == 2 + 100 * 2)
  }

  test("partial memory valve: forced flushing changes nothing in the answer") {
    // threshold 3 keys on a 100-key input: every partial partition flushes
    // repeatedly; the final phase must still produce the exact top-k
    spark.conf.set(graft.plans.TopKStrategy.MaxPartialKeysConf, "3")
    try {
      val df = spark.range(100000).selectExpr(
        "concat('k', id % 100) AS k", "id AS v", "id")
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      val top = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      assert(executed(top).contains("TopKPerKey"))
      val got = top.select("k", "v").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      // per key: the two largest ids congruent to that key mod 100
      (0 until 100).foreach { kk =>
        val top2 = (0L until 100000L).filter(_ % 100 == kk).sorted.takeRight(2)
        assert(got(s"k$kk") == top2, s"key k$kk wrong under forced flushing")
      }
    } finally spark.conf.unset(graft.plans.TopKStrategy.MaxPartialKeysConf)
  }

  test("heap top-k result is independent of input partitioning") {
    val base = Tables.orders(spark, TestSpark.Sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    def run(parts: Int) = {
      val df = base.repartition(parts)
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
      assert(executed(df).contains("TopKPerKey"))
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    }
    // partial heaps see different row subsets per layout; the merged final
    // answer must not
    assert(run(1) == run(13))
  }

  test("extra filter conjuncts survive the rewrite") {
    val df = Seq(("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("b", 9, 4))
      .toDF("k", "v", "id")
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val top = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2 && $"v" > 1)
    assert(executed(top).contains("TopKPerKey"))
    assert(top.select("k", "v").as[(String, Int)].collect().toSet ==
      Set(("a", 3), ("a", 2), ("b", 9)))
  }
}
