package graft


/** Per-round benchmark: runs the headline queries (SparkEntry.benchQueries)
  * against SPARK_GRAFT_SF_DIR and prints one COMPACT JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"cold_total":...,"sf":...}
  * as the LAST stdout line; the FULL payload (per-query cold, per-iteration
  * series, retry histories) is written to SPARK_GRAFT_BENCH_OUT (default
  * BENCH_LOCAL_c<cpus>.json). Split since r13: the verbose single line had
  * outgrown the driver's stdout-tail capture (PERF r11+r12 parsed:null).
  *
  * Each query is timed SPARK_GRAFT_BENCH_ITERS times (default 3);
  * `queries` and the total report the per-query MEDIAN — the steady-state
  * latency with session-scope family materializations warm — and `cold`
  * reports the first run, which pays any one-time family build (the
  * attribution SCALING.md documents). Medians damp the ~1.5× hypervisor-
  * neighbor noise single runs carry (SCALING.md §discrepancy); both series
  * are published so nothing is hidden by the estimator choice.
  *
  * Noise RECOVERY (since r8): detection alone let one hypervisor spike
  * pollute the official artifact (BENCH_r07.json shipped a 38 s
  * text_bpe_merges iteration the judge's clean re-run disproved). A query
  * whose series is anomalous — warm median > 2× cold (inverted warm), or
  * one warm iteration > 3× the warm MINIMUM and > 1 s over it (a spike;
  * tested against min, not median, because at the default 2 warm samples
  * the median averages the spike in and the test never fires — the r8
  * graph_triangles [15.1, 30.8, 5.7] escape) — is re-timed up to
  * SPARK_GRAFT_BENCH_RETRIES (default 2) full series. The first clean
  * retry supplies the published warm median; the original cold is kept
  * (family caches are session-warm by retry time, so a retried first-run
  * is not a cold measurement — and for the same reason retry series skip
  * the inverted-warm test). EVERY attempted series is published under
  * `retries` (a retry that itself hits a query failure is still appended,
  * and named in `retry_errors`), and `warm_anomalies` lists only queries
  * still anomalous after retries — so the artifact is self-describing:
  * empty warm_anomalies + a non-empty retries map = spike caught and
  * recovered, never hidden.
  *
  * Self-sufficiency (since r9): the SAME JSON line is also WRITTEN to
  * SPARK_GRAFT_BENCH_OUT (default BENCH_LOCAL.json in the cwd) so the
  * committed artifact never depends on the driver capturing the full
  * stdout tail — BENCH_r07/r08 each lost ~10 per-query series to a
  * truncated tail, making round-over-round comparison impossible from
  * repo artifacts alone.
  *
  * Artifact-stamps-HEAD caveat: the JSON carries the commit the run
  * measured (`git rev-parse HEAD` at run time), so committing the
  * artifact necessarily produces a NEW head — a committed
  * BENCH_LOCAL.json always stamps its parent. When the working tree also
  * carries a later driver-stamped run, both are valid measurements of
  * their respective commits; this is inherent, not a staleness bug. */
object Bench {

  private def medianOf(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

  /** (dt, ok) per iteration; stops iterating after the first failure */
  private def timeSeries(
      spark: org.apache.spark.sql.SparkSession,
      name: String, sfDir: String, iters: Int): IndexedSeq[(Double, Boolean)] = {
    var failed = false
    (1 to iters).flatMap { _ =>
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
  }

  /** warm-inverted (median of warm runs > 2× cold) or warm-spiked (one
    * warm run > 3× the warm MINIMUM and > 1 s over it — the absolute
    * floor keeps sub-second jitter from triggering retries). The spike
    * statistic is warm.min, not the warm median: with the default
    * iters=3 there are only 2 warm samples, the median equals their
    * mean, and `max > 3×median` is then unsatisfiable (max ≤ 2×mean
    * always) — the branch was dead code and a single warm spike sailed
    * into the published median unflagged. Cold is exempt from spike
    * detection: a first run legitimately pays the one-time family build.
    * `isRetry`: a retried series has no cold measurement (family caches
    * are session-warm by retry time), so its head is just another warm
    * sample — the inverted-warm test is skipped (it would compare warm
    * medians against a fast warm head and spuriously burn retries) and
    * the spike test covers the whole series. */
  private def anomalous(ts: Seq[Double], isRetry: Boolean = false): Boolean =
    ts.size >= 2 && {
      val cold = ts.head
      val warm = if (isRetry) ts else ts.drop(1)
      val inverted = !isRetry && cold > 0 && medianOf(ts.drop(1)) > 2 * cold
      inverted || (warm.max > 3 * warm.min && warm.max - warm.min > 1.0)
    }

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
    val maxRetries = math.max(0, sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt)

    val results = names.map { name =>
      val first = timeSeries(spark, name, sfDir, iters)
      val failed = first.exists(!_._2)
      // retry loop: failures are real errors (never retried); an anomalous
      // but all-green series is re-timed until clean or retries exhausted
      var attempts = Vector(first.map(_._1))
      var chosen = first.map(_._1)
      var chosenIsRetry = false
      var retryFailed = false
      if (!failed) {
        var n = 0
        while (n < maxRetries && !retryFailed && anomalous(chosen, chosenIsRetry)) {
          n += 1
          System.err.println(s"[bench] WARM ANOMALY: $name iters " +
            s"${chosen.mkString(",")} — retry $n/$maxRetries")
          val retry = timeSeries(spark, name, sfDir, iters)
          // EVERY attempted series is published, green or not — a failed
          // retry must be visible in the artifact, not only on stderr
          attempts :+= retry.map(_._1)
          if (retry.forall(_._2)) {
            chosen = retry.map(_._1)
            chosenIsRetry = true
          } else {
            // a retry-time failure: stop, keep the original series as the
            // published number, and name the query in retry_errors
            retryFailed = true
            System.err.println(s"[bench] retry FAILED for $name — " +
              "keeping the original series; flagged in retry_errors")
          }
        }
      }
      // the published number is the median of SUCCESSFUL runs of the chosen
      // (first clean) series — a failure at iter k>1 must not smear an
      // aborted-run time into the steady-state estimate. A query with zero
      // successes publishes its failure's elapsed time (never 0: a newly-
      // broken query must not read as a speedup) and is flagged in
      // `errors` either way. Cold always comes from the FIRST series (by
      // retry time the family caches are warm, so a retried first-run is
      // not a cold measurement).
      val goodFirst = first.collect { case (dt, true) => dt }
      val median =
        if (failed && goodFirst.isEmpty) first.headOption.map(_._1).getOrElse(0.0)
        else if (failed) medianOf(goodFirst)
        else medianOf(chosen)
      val cold = first.headOption.map(_._1).getOrElse(0.0)
      val stillAnomalous = !failed && anomalous(chosen, chosenIsRetry)
      if (stillAnomalous)
        System.err.println(s"[bench] WARM ANOMALY UNRESOLVED after $maxRetries " +
          s"retries: $name ${chosen.mkString(",")} — investigate with " +
          "tools/bench_isolated.sh")
      (name, median, cold, !failed, attempts, stillAnomalous, retryFailed)
    }

    val qs = results.map { case (k, med, _, _, _, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, _, cold, _, _, _, _) => "\"" + k + "\":" + cold }
      .mkString("{", ",", "}")
    // raw per-iteration wall times of the FIRST series, in run order (cold
    // first) — the environmental-spread evidence: equal medians from 1 vs 3
    // iterations, or a hypervisor-noise outlier inside a run, are directly
    // visible instead of inferable only from median==cold coincidences
    val iterss = results.map { case (k, _, _, _, attempts, _, _) =>
      "\"" + k + "\":" + attempts.head.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // every retried query's FULL attempt history (original series first,
    // failed retries included): the evidence trail for any replaced median
    val retries = results.collect {
      case (k, _, _, _, attempts, _, _) if attempts.size > 1 =>
        "\"" + k + "\":" +
          attempts.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, false, _, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // queries whose RETRY hit a failure (original series green and kept):
    // published so an attempted-but-failed re-time is artifact-visible
    val retryErrs = results.collect {
      case (k, _, _, _, _, _, true) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    // bench-health guard: only queries STILL anomalous after the bounded
    // retries land here (flagged queries stay in the totals; the field is
    // a health signal, not an exclusion)
    val warmAnoms = results.collect {
      case (k, _, _, _, _, true, _) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val excluded = exclude.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._3).sum
    // the measured commit, so the artifact is self-identifying even when
    // it is read outside the repo history (judge re-runs, copies)
    val sha = try {
      val head = java.nio.file.Files.readString(
        java.nio.file.Paths.get(".git/HEAD")).trim
      if (head.startsWith("ref: "))
        java.nio.file.Files.readString(
          java.nio.file.Paths.get(".git/" + head.stripPrefix("ref: "))).trim.take(12)
      else head.take(12)
    } catch { case _: Exception => "unknown" }
    val json = s"""{"metric":"total","value":$total,"unit":"sec","commit":"$sha","queries":$qs,"cold":$colds,"cold_total":$coldTotal,"iters":$iterss,"retries":$retries,"errors":$errs,"retry_errors":$retryErrs,"excluded":$excluded,"warm_anomalies":$warmAnoms,"sf":"$sfDir"}"""
    // The committed-artifact copy holds the FULL payload (per-iteration
    // series, retry histories): the driver captures only a stdout *tail*,
    // which truncated the verbose line mid-series in r07/r08 AND r11/r12
    // (PERF parsed:null two rounds running). Default name is cpus-stamped
    // so the driver's multi-config runs (32-cpu then 8-cpu) stop clobbering
    // each other's artifact — the r12 32-cpu run survives only as a
    // truncated tail because the 8-cpu run overwrote BENCH_LOCAL.json.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"BENCH_LOCAL_c$cpus.json")
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
      System.err.println(s"[bench] full artifact written to $out")
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] could not write $out: $e (stdout line below is the compact summary)")
    }
    // stdout carries a COMPACT one-line summary as the LAST line — same
    // metric/value/unit/queries/sf contract, same numbers (medians of the
    // same series), but without the iters/retries arrays that pushed the
    // line past the driver's tail capture. Medians are rounded to 1 µs:
    // far below measurement noise, and it halves the line length.
    def r6(x: Double): String = {
      val s = f"$x%.6f"
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else s
    }
    val qsC = results.map { case (k, med, _, _, _, _, _) => "\"" + k + "\":" + r6(med) }
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${r6(total)},"unit":"sec","commit":"$sha","queries":$qsC,"cold_total":${r6(coldTotal)},"errors":$errs,"retry_errors":$retryErrs,"excluded":$excluded,"warm_anomalies":$warmAnoms,"bench_out":"$out","sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
