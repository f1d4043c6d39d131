package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCALING.md measurement main: A/B of the single-tokenize clean gate
  * (lambda-bound `toks` — ONE regexp_extract_all per row, the r8 rewrite)
  * against the prior alias-bound form (Catalyst's alias inlining fans the
  * `toks` alias out into every gate conjunct — ~10 regexp_extract_all per
  * row after predicate pushdown). At sf0.1 the tokenize is not the
  * bottleneck and the two forms measure flat within noise (r8 verdict #3);
  * this main measures the rewrite where regex cost dominates.
  *
  * Two timed shapes per form, interleaved old/new so hypervisor drift
  * hits both evenly:
  *  - `gate`: survivors count + surviving bytes (the pure gate scan —
  *    isolates the per-row expression cost from funnel machinery)
  *  - `funnel`: the full corpus_clean retention funnel (same body as the
  *    registered query, parameterized over the flags frame)
  *
  * Not a registered query: corpus_clean stays the oracled surface. Both
  * forms' outputs are asserted identical before anything is timed —
  * a perf A/B over diverging answers would be meaningless.
  *
  * Usage: runMain graft.operators.GateAb <sfDir> [iters]
  */
object GateAb {

  private val StopEn = Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")
  private val StopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
  private val StopFr = Seq("le", "la", "les", "et", "est", "dans", "pour", "que")

  private def hits(tokens: Column, ws: Seq[String]): Column =
    size(filter(tokens, t => t.isin(ws: _*))).cast("long")

  /** the pre-rewrite gate: `toks` is a plain select alias, so
    * CollapseProject / PushPredicateThroughNonJoin inline it into every
    * conjunct that references it — the multi-tokenize plan shape the r8
    * rewrite removed (verbatim copy of the r7 cleanFlags) */
  private def oldFlags(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val t = graft.Tables.documents(spark, sfDir)
      .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
    t.select(col("doc_id"), col("text"),
      (length(col("text")).cast("long") >= 100 &&
        size(col("toks")).cast("long") >= 20 &&
        when(size(col("toks")) === 0, lit(0.0))
          .otherwise(size(array_distinct(col("toks"))).cast("long") * lit(1.0)
            / size(col("toks")).cast("long")) >= 0.2 &&
        when(size(col("toks")) === 0, lit(0.0))
          .otherwise(hits(col("toks"), StopEn) * lit(1.0) / size(col("toks")).cast("long"))
          .between(0.01, 0.6)).as("keep_q"),
      (hits(col("toks"), StopEn) >= hits(col("toks"), StopDe) &&
        hits(col("toks"), StopEn) >= hits(col("toks"), StopFr)).as("is_en"))
  }

  /** pure gate scan: survivors + surviving bytes in one aggregation */
  private def gateOnly(f: DataFrame, clean: Column): DataFrame =
    f.filter(clean)
      .agg(count(lit(1)).as("n_surv"), sum(length(col("text"))).as("bytes"))

  /** the corpus_clean funnel body, parameterized over the flags frame and
    * its verdict columns (same dataflow as the registered query) */
  private def funnel(f: DataFrame, clean: Column, keepQ: Column): DataFrame = {
    val surv = f.filter(clean)
    val u = surv.withColumn("is_uniq",
      row_number().over(Window.partitionBy(md5(col("text").cast("binary")))
        .orderBy("doc_id")) === 1)
      .select("doc_id", "is_uniq")
    val c = f.agg(
      count(lit(1)).as("n1"),
      sum(when(keepQ, 1).otherwise(0)).cast("long").as("n2"),
      sum(when(clean, 1).otherwise(0)).cast("long").as("n3"))
    val c4 = u.agg(sum(when(col("is_uniq"), 1).otherwise(0)).cast("long").as("n4"))
    val stages = c.crossJoin(c4).select(explode(array(
      struct(lit("1_total").as("stage"), col("n1").as("n")),
      struct(lit("2_quality").as("stage"), col("n2").as("n")),
      struct(lit("3_english").as("stage"), col("n3").as("n")),
      struct(lit("4_unique").as("stage"), col("n4").as("n")))).as("e"))
      .select(col("e.stage"), col("e.n"))
    val splits = u.filter(col("is_uniq"))
      .withColumn("b", (col("doc_id") % 100 * 61) % 100)
      .withColumn("stage", when(col("b") < 90, "5_train")
        .when(col("b") < 95, "6_val").otherwise("7_test"))
      .groupBy("stage").agg(count(lit(1)).as("n"))
    stages.unionByName(splits).orderBy("stage")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def oldF = oldFlags(spark, sfDir)
    def newF = TextOps.cleanFlags(spark, sfDir)
    val oldClean = col("keep_q") && col("is_en")

    // answers must agree before any timing matters
    val a = funnel(oldF, oldClean, col("keep_q")).collect().map(_.toString).toSeq
    val b = funnel(newF, col("clean"), col("keep_q")).collect().map(_.toString).toSeq
    require(a == b, s"old and new gate funnels diverge:\nold=$a\nnew=$b")

    // the plan-shape evidence next to the wall numbers: tokenizes per plan
    // node for each form (old inlines the alias into every conjunct)
    def fanout(df: DataFrame): List[Int] =
      df.queryExecution.executedPlan.toString.linesIterator
        .map(l => "regexp_extract_all".r.findAllIn(l).length).filter(_ > 0).toList
    println(s"[gateab] tokenizes/plan-node old=${fanout(gateOnly(oldF, oldClean))} " +
      s"new=${fanout(gateOnly(newF, col("clean")))}")

    def time(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gateab] $label%-14s $dt%8.3f s")
      dt
    }

    val acc = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to iters) {
      acc("gate_old") :+= time("gate_old")(gateOnly(oldF, oldClean))
      acc("gate_new") :+= time("gate_new")(gateOnly(newF, col("clean")))
      acc("funnel_old") :+= time("funnel_old")(funnel(oldF, oldClean, col("keep_q")))
      acc("funnel_new") :+= time("funnel_new")(funnel(newF, col("clean"), col("keep_q")))
    }
    def med(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    Seq("gate_old", "gate_new", "funnel_old", "funnel_new").foreach { k =>
      println(f"[gateab] MEDIAN $k%-12s ${med(acc(k))}%8.3f s  " +
        s"(series ${acc(k).map(x => f"$x%.3f").mkString(", ")})")
    }
    println(f"[gateab] speedup gate   ${med(acc("gate_old")) / med(acc("gate_new"))}%.2fx")
    println(f"[gateab] speedup funnel ${med(acc("funnel_old")) / med(acc("funnel_new"))}%.2fx")
    spark.stop()
  }
}
