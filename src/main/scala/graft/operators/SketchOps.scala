package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables
import graft.functions.PortableHash

/** Sketch tier (north-star: sublinear-memory frequency estimation a
  * streaming/batch pipeline uses for heavy-hitter detection before exact
  * counting is affordable). The count-min sketch here is DETERMINISTIC —
  * the d hash rows are the fixed [[PortableHash]] permutation family over
  * H8, so the sketch (and its over-estimates) is bit-identical in Spark
  * and the DuckDB oracle, making even an approximate structure exactly
  * oracle-checkable.
  *
  * Scale shape: the sketch itself is d×w cells — CONSTANT memory at any
  * corpus size, built by one hash aggregation per row function over the
  * event stream; per-key estimates then broadcast-join the tiny cell
  * tables. No shuffle grows with the key cardinality except the final
  * exact-count compare (which exists only to expose estimation error).
  */
object SketchOps {

  private[graft] val D = 4 // hash rows
  private[graft] val W = 64 // buckets per row
  import PortableHash.{P, permA, permB}

  /** bucket i of the H8 value `h`, as DuckDB SQL */
  private def bucketSql(i: Int): String =
    s"((${permA(i)} * (h % $P) + ${permB(i)}) % $P) % $W"

  /** (user_id, b1..bD): each row's sketch buckets for its user key. Shared
    * with the streaming twin ([[graft.streaming.StreamOps.countMinCells]])
    * so the incremental sketch cannot drift from the oracled batch one.
    * Works on batch AND streaming frames (pure per-row expressions). */
  private[graft] def bucketed(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val h = PortableHash.h8(lpad(col("user_id").cast("string"), 8, "0"))
    events.select(
      (col("user_id") +:
        (1 to D).map(i => (PortableHash.minhashPerm(h, i) % W).as(s"b$i"))): _*)
  }

  val queries: Seq[GraftQuery] = Seq(

    // count-min estimate vs exact count of per-user event frequencies,
    // top 20 most-active users by estimate. est_n >= exact_n always
    // (count-min never under-counts); the gap is the collision error the
    // 4x64 sketch pays at this key cardinality.
    GraftQuery("events_count_min",
      s"""WITH k AS (SELECT user_id,
         |    ${PortableHash.h8Sql("lpad(CAST(user_id AS VARCHAR), 8, '0')")} AS h
         |  FROM events),
         |b AS (SELECT user_id,
         |    ${(1 to D).map(i => s"${bucketSql(i)} AS b$i").mkString(", ")}
         |  FROM k),
         |${(1 to D).map(i =>
           s"c$i AS (SELECT b$i AS bk, CAST(count(*) AS BIGINT) AS n$i FROM b GROUP BY b$i)")
           .mkString(",\n")},
         |keys AS (SELECT user_id,
         |    ${(1 to D).map(i => s"min(b$i) AS b$i").mkString(", ")},
         |    CAST(count(*) AS BIGINT) AS exact_n
         |  FROM b GROUP BY user_id)
         |SELECT k.user_id, least(${(1 to D).map(i => s"c$i.n$i").mkString(", ")}) AS est_n,
         |       k.exact_n
         |FROM keys k ${(1 to D).map(i => s"JOIN c$i ON c$i.bk = k.b$i").mkString(" ")}
         |ORDER BY est_n DESC, k.user_id LIMIT 20""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val b = bucketed(Tables.events(spark, sfDir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.CacheTracker.track(b)
      val cells = (1 to D).map(i =>
        b.groupBy(col(s"b$i").as("bk")).agg(count(lit(1)).as(s"n$i")))
      val keyAggs = (1 to D).map(i => min(col(s"b$i")).as(s"b$i")) :+
        count(lit(1)).as("exact_n")
      val keys = b.groupBy("user_id").agg(keyAggs.head, keyAggs.tail: _*)
      val joined = (1 to D).foldLeft(keys.alias("k")) { (acc, i) =>
        acc.join(broadcast(cells(i - 1).alias(s"c$i")), col(s"b$i") === col(s"c$i.bk"))
      }
      joined.select(col("user_id"),
          least((1 to D).map(i => col(s"n$i")): _*).as("est_n"), col("exact_n"))
        .orderBy(col("est_n").desc, col("user_id"))
        .limit(20)
    })
}
