package graft

import org.apache.spark.sql.SparkSession

/** Shared local-mode SparkSession builder for the tool mains (Bench,
  * Verify, RunOne, Plans, CandCount, LibRun, ScaleData). One place for
  * the settings every entry point needs:
  *
  *  - UTC session timezone: the NTZ↔LTZ timestamp casts in
  *    Tables.events/StreamOps.eventStream are instant-preserving only
  *    under UTC (the loaders also enforce it themselves).
  *  - `spark.network.timeout` raised 120s → 600s: in local mode the
  *    driver and all "executors" share one JVM, so a long GC pause
  *    (multi-second young collections on a large heap — SCALING.md §GC)
  *    stalls every heartbeat at once; at the default timeout one pause
  *    becomes executor-lost + task-retry cascades that bill tens of
  *    seconds to whichever query was running (the BENCH_r04
  *    acl_map_entries 24s artifact). On a real cluster the same setting
  *    is the standard defense for GC-heavy executors.
  *  - AQE on (Spark 4 default, pinned explicitly), shuffle partitions =
  *    parallelism (32-thread local mode needs 32, not the 200 default).
  */
object Sessions {
  def local(cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.network.timeout", "600s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
