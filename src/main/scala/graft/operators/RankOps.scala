package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables

/** Graph-ranking tier (north-star: crawl prioritization / source-authority
  * weighting for a web-corpus pipeline; no counterpart in the reference).
  * The demo graph is the session-bounded event-type transition digraph —
  * the same edge derivation as `events_transitions` — ranked by the
  * integer-exact PageRank in [[GraphOps.pageRank]]. At 100 TB the nodes
  * would be domains and the edges hyperlinks; the operator shape (join +
  * hash agg per round over a co-partitioned edge list) is unchanged.
  */
object RankOps {

  private val Iters = 10
  private val Scale = 1000000000L

  /** the r1..rIters power-iteration rounds as unrolled DuckDB CTEs —
    * aggregation is not allowed in a recursive CTE term, so the fixed
    * iteration count is replayed as a chain (same pattern as the k-means
    * oracle's unrolled Lloyd rounds) */
  private def prRoundsSql: String =
    (1 to Iters).map { k =>
      s"""r$k AS (
         |  SELECT nd.node,
         |    CAST(${15L * Scale} // (100 * (SELECT count(*) FROM nodes))
         |         + coalesce(s.c, 0) AS BIGINT) AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node,
         |           SUM((85 * r.rank * e.n) // (100 * e.w)) AS c
         |    FROM ew e JOIN r${k - 1} r ON r.node = e.src
         |    GROUP BY e.dst) s ON s.node = nd.node)""".stripMargin
    }.mkString(",\n")

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery("graph_pagerank",
      s"""WITH eb AS (SELECT event_id, user_id, event_type,
         |        epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |l AS (SELECT user_id, event_type, us,
         |        lag(event_type) OVER (PARTITION BY user_id
         |          ORDER BY us, event_type, event_id) AS src,
         |        lag(us) OVER (PARTITION BY user_id
         |          ORDER BY us, event_type, event_id) AS prev_us
         |      FROM eb),
         |ed AS (SELECT src, event_type AS dst, CAST(count(*) AS BIGINT) AS n
         |       FROM l WHERE src IS NOT NULL AND us - prev_us < ${EventOps.GapUs}
         |       GROUP BY src, event_type),
         |ow AS (SELECT src, SUM(n) AS w FROM ed GROUP BY src),
         |ew AS (SELECT ed.src, ed.dst, ed.n, ow.w FROM ed JOIN ow ON ow.src = ed.src),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)),
         |r0 AS (SELECT node,
         |  CAST($Scale // (SELECT count(*) FROM nodes) AS BIGINT) AS rank FROM nodes),
         |$prRoundsSql
         |SELECT node, rank AS rank_ppb FROM r$Iters
         |ORDER BY rank_ppb DESC, node""".stripMargin) { (spark, sfDir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_type", "event_id")
      val edges = Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
        .withColumn("src", lag("event_type", 1).over(w))
        .withColumn("prev_us", lag("us", 1).over(w))
        .filter(col("src").isNotNull && col("us") - col("prev_us") < EventOps.GapUs)
        .groupBy(col("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("n"))
      GraphOps.pageRank(edges, Iters, Scale)
        .select(col("node"), col("rank").as("rank_ppb"))
        .orderBy(col("rank_ppb").desc, col("node"))
    })
}
