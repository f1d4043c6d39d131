package graft

import org.apache.spark.sql.SparkSession

/** one SparkSession shared across all suites (forked test JVM) */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf = "/root/testdata/sf0.001"
}

/** Drains CacheTracker-tracked blocks after every test. Any spec that runs
  * SparkEntry queries must mix this in: tracked persists (e.g. nextFitDist's
  * ranged frame under train_pack_sequences) otherwise accumulate in the
  * shared session until an unrelated suite happens to release them. */
trait CacheDrained extends org.scalatest.BeforeAndAfterEach {
  this: org.scalatest.Suite =>
  override def afterEach(): Unit =
    try super.afterEach() finally CacheTracker.releaseAll()
}
