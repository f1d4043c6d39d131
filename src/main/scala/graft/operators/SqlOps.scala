package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables

/** The engine's SQL front door: `spark.sql` over registered temp views —
  * same Catalyst plans as the DataFrame API, including subquery
  * decorrelation the reference has no analogue for (SURVEY.md §4). */
object SqlOps {

  private def register(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit =
    Seq("lineitem", "orders", "customer").foreach { t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(s"${t}_v")
    }

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery("sql_agg",
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      ) { (spark, sfDir) =>
      register(spark, sfDir)
      spark.sql(
        """SELECT l_returnflag, count(*) AS n,
          |       sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cents
          |FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // correlated scalar subquery — Catalyst decorrelates to an aggregate+join
    GraftQuery("sql_correlated_subquery",
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin,
      ) { (spark, sfDir) =>
      register(spark, sfDir)
      spark.sql(
        """SELECT c_custkey,
          |       (SELECT count(*) FROM orders_v WHERE o_custkey = c_custkey) AS n_orders
          |FROM customer_v WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin)
    },

    // IN-subquery (planned as left-semi)
    GraftQuery("sql_in_subquery",
      """SELECT count(*) AS n FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)""".stripMargin,
      ) { (spark, sfDir) =>
      register(spark, sfDir)
      spark.sql(
        """SELECT count(*) AS n FROM customer_v
          |WHERE c_custkey IN (SELECT o_custkey FROM orders_v WHERE o_totalprice > 450000)""".stripMargin)
    }
  )
}
