package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables._

/** TPC-H-shaped headline queries over the driver star schema — the bench
  * workload. Adapted to the columns the synthetic tables actually have
  * (FIXTURES.md §A); money in exact integer cents for oracle parity.
  *
  * Scale design: q1/q6 are pure scan+partial-agg (map-side combine, no
  * wide shuffle); q3/q5 broadcast the dimension sides and shuffle only on
  * the surviving fact keys; date filters push down to the parquet scan.
  */
object HeadlineOps {

  private def cents(c: Column): Column = floor(c * 100).cast("long")
  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  val queries: Seq[GraftQuery] = Seq(

    // Q1: pricing summary — scan + map-side partial agg, 6-group result
    GraftQuery("tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      bench = true) { (spark, sfDir) =>
      lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= ts("2000-01-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge_cents"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q3: top orders by revenue for one segment, date-banded
    GraftQuery("tpch_q3",
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY rev_cents DESC, o_orderkey LIMIT 10""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val cut = ts("1998-06-01 00:00:00")
      val c = customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(spark, sfDir).filter(col("o_orderdate") < cut)
      val l = lineitem(spark, sfDir).filter(col("l_shipdate") > cut)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("c_custkey") === col("o_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("odate"), col("rev_cents"))
    },

    // Q5: local-supplier revenue by nation within a region + date band
    GraftQuery("tpch_q5",
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name ORDER BY rev_cents DESC, n_name""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val o = orders(spark, sfDir)
        .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00")
          && col("o_orderdate") < ts("1999-01-01 00:00:00"))
      val n = nation(spark, sfDir)
        .join(broadcast(region(spark, sfDir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      lineitem(spark, sfDir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(spark, sfDir)), col("c_custkey") === col("o_custkey"))
        .join(broadcast(supplier(spark, sfDir)),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("n_name"))
    },

    // Q6: forecasting revenue change — scan + filter + global agg
    GraftQuery("tpch_q6",
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
      bench = true) { (spark, sfDir) =>
      lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-01-01 00:00:00")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("rev_cents"),
          count(lit(1)).as("n"))
    }
  )
}
