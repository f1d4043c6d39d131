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
    },

    // Q7: volume shipping between two nations — the two-role dimension
    // join (nation joined once through supplier, once through customer).
    // Both nation sides and the filtered supplier/customer dims broadcast;
    // the only wide shuffle is lineitem⋈orders on the order key.
    GraftQuery("tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |         l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val nat = nation(spark, sfDir)
        .filter(col("n_name").isin("NATION_18", "NATION_19"))
      val s = supplier(spark, sfDir)
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
      val c = customer(spark, sfDir)
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "cust_nation")
      lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .join(orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19")
          || (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q10: returned-item reporting — which customers returned the most
    // revenue in a quarter. Date + returnflag filters push to both scans;
    // customer/nation broadcast; top-20 via ordered limit (TakeOrdered).
    GraftQuery("tpch_q10",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY rev_cents DESC, c_custkey LIMIT 20""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val c = customer(spark, sfDir)
        .join(broadcast(nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          cents(col("c_acctbal")).as("acctbal_cents"))
      lineitem(spark, sfDir)
        .filter(col("l_returnflag") === "R")
        .join(orders(spark, sfDir)
          .filter(col("o_orderdate") >= ts("1998-01-01 00:00:00")
            && col("o_orderdate") < ts("1998-04-01 00:00:00")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name", "acctbal_cents")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("c_custkey"))
        .limit(20)
    },

    // Q14: promo revenue share for one month — conditional agg over a
    // broadcast fact⋈dim join, published as exact integer cents plus a
    // floor-division ppm ratio (both engines' integer division agrees on
    // the non-negative sums).
    GraftQuery("tpch_q14",
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST((1000000 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END)) // sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS promo_ppm
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00'""".stripMargin) { (spark, sfDir) =>
      val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-02-01 00:00:00"))
        .join(broadcast(part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))).as("promo_cents"),
          sum(rev).as("total_cents"))
        .selectExpr("promo_cents", "total_cents",
          "(1000000 * promo_cents) DIV total_cents AS promo_ppm")
    },

    // Q18: large-volume customers — the HAVING-subquery shape. The inner
    // per-order quantity agg is a map-side-combinable hash agg; the outer
    // join consumes it as a (small) semi-join side; the customer dim
    // broadcasts.
    GraftQuery("tpch_q18",
      """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY total_cents DESC, o_orderkey LIMIT 100""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val l = lineitem(spark, sfDir)
      val big = l.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      orders(spark, sfDir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("odate"),
          cents(col("o_totalprice")).as("total_cents"), col("sum_qty"))
        .orderBy(col("total_cents").desc, col("o_orderkey"))
        .limit(100)
    },

    // Q19: disjunctive brand/size/quantity predicate — the pushdown
    // stress-shape: the OR-of-conjunctions must evaluate after the
    // broadcast join (it spans both sides), but the common p_size upper
    // bound and quantity band still prune the scans.
    GraftQuery("tpch_q19",
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        |  count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (spark, sfDir) =>
      val q = col("l_quantity")
      val cond =
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) && q.between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && q.between(10, 20)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(1, 35) && q.between(20, 30))
      lineitem(spark, sfDir)
        .filter(q.between(1, 30))
        .join(broadcast(part(spark, sfDir).filter(col("p_size").between(1, 35))),
          col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_cents"),
          count(lit(1)).as("n"))
    },

    // Q22 (adapted): above-average-balance customers with no RECENT
    // orders, by nation — global scalar-aggregate threshold (broadcast
    // single row) + broadcast anti-join against the filtered recent-order
    // keys. Threshold averages POSITIVE balances only so the floor
    // division is over non-negative longs (Spark DIV truncates toward
    // zero, DuckDB // floors — they agree only on non-negatives).
    GraftQuery("tpch_q22",
      """WITH thr AS (
        |  SELECT CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT))
        |              // count(*) AS BIGINT) AS avg_cents
        |  FROM customer WHERE c_acctbal > 0),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |SELECT n_name, count(*) AS numcust,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(floor(c_acctbal * 100) AS BIGINT) > (SELECT avg_cents FROM thr)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (spark, sfDir) =>
      val c = customer(spark, sfDir)
      val thr = c.filter(col("c_acctbal") > 0)
        .agg(sum(cents(col("c_acctbal"))).as("sum_c"), count(lit(1)).as("cnt"))
        .selectExpr("sum_c DIV cnt AS avg_cents")
      val recent = orders(spark, sfDir)
        .filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
        .select(col("o_custkey")).distinct()
      c.join(broadcast(thr))
        .filter(cents(col("c_acctbal")) > col("avg_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"),
          sum(cents(col("c_acctbal"))).as("totbal_cents"))
        .orderBy("n_name")
    },

    // Q4 (adapted: no commit/receipt dates in this schema): order-priority
    // checking via an EXISTS semi-join with a MIXED equi + non-equi
    // condition — at least one line item shipped more than 30 days after
    // the order date. The semi-join hashes on the order key and evaluates
    // the date comparison as a residual, so the fact side streams once.
    GraftQuery("tpch_q4",
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (spark, sfDir) =>
      orders(spark, sfDir)
        .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00")
          && col("o_orderdate") < ts("1997-04-01 00:00:00"))
        .join(lineitem(spark, sfDir).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > expr("o_orderdate + INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Q8 (adapted): national market share — of all ECONOMY-part revenue
    // ordered by EUROPE customers, the ppm share supplied by NATION_13,
    // per order year. Six-way join where every dimension side broadcasts
    // (nation twice, in two roles); the integer-ppm ratio keeps the
    // published share exact in both engines.
    GraftQuery("tpch_q8",
      """SELECT o_year,
        |  CAST(sum(CASE WHEN s_nat = 'NATION_13'
        |    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS nat_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST((1000000 * sum(CASE WHEN s_nat = 'NATION_13'
        |    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END)) // sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS share_ppm
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n2.n_name AS s_nat,
        |         l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n1.n_regionkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY')
        |GROUP BY o_year ORDER BY o_year""".stripMargin) { (spark, sfDir) =>
      val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      val nr = nation(spark, sfDir)
        .join(broadcast(region(spark, sfDir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnat_key"))
      val c = customer(spark, sfDir)
        .join(broadcast(nr), col("c_nationkey") === col("cnat_key"))
        .select("c_custkey")
      val sn = supplier(spark, sfDir)
        .join(broadcast(nation(spark, sfDir)
          .select(col("n_nationkey").as("snat_key"), col("n_name").as("s_nat"))),
          col("s_nationkey") === col("snat_key"))
        .select("s_suppkey", "s_nat")
      lineitem(spark, sfDir)
        .join(broadcast(part(spark, sfDir).filter(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(when(col("s_nat") === "NATION_13", rev).otherwise(lit(0L))).as("nat_cents"),
          sum(rev).as("total_cents"))
        .selectExpr("o_year", "nat_cents", "total_cents",
          "(1000000 * nat_cents) DIV total_cents AS share_ppm")
        .orderBy("o_year")
    },

    // Q13: customer order-count distribution — the outer join with an
    // ON-clause filter (customers with zero qualifying orders must keep
    // their c_count = 0 row), then a second aggregation over the counts.
    GraftQuery("tpch_q13",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (spark, sfDir) =>
      customer(spark, sfDir).select("c_custkey")
        .join(orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_orderpriority"),
          col("c_custkey") === col("o_custkey")
            && col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15: top supplier by quarterly revenue — the scalar-max subquery
    // shape: the per-supplier revenue view feeds both the max (one row,
    // broadcast) and the equality filter against it.
    GraftQuery("tpch_q15",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin) { (spark, sfDir) =>
      val rev = lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= ts("1998-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-04-01 00:00:00"))
        .groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("total_rev"))
      val mx = rev.agg(max("total_rev").as("mx"))
      supplier(spark, sfDir)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx))
        .filter(col("total_rev") === col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    },

    // Q17: small-quantity-order revenue — the correlated per-part average
    // decorrelated into one per-part aggregate joined back. The classic
    // qty < 0.2·avg(qty) predicate becomes the INTEGER inequality
    // 5·qty·count < sum (qty is integer-valued), so the threshold is
    // exact in both engines with no float division anywhere.
    GraftQuery("tpch_q17",
      """WITH pa AS (SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |    CAST(count(*) AS BIGINT) AS cq
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        |       count(*) AS n
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN pa ON pa.l_partkey = lineitem.l_partkey
        |WHERE p_brand = 'Brand#13'
        |  AND CAST(l_quantity AS BIGINT) * 5 * cq < sq""".stripMargin) { (spark, sfDir) =>
      val pa = lineitem(spark, sfDir).groupBy(col("l_partkey").as("pa_key"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"), count(lit(1)).as("cq"))
      lineitem(spark, sfDir)
        .join(broadcast(part(spark, sfDir).filter(col("p_brand") === "Brand#13")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(pa), col("l_partkey") === col("pa_key"))
        .filter(expr("CAST(l_quantity AS BIGINT) * 5 * cq < sq"))
        .agg(sum(cents(col("l_extendedprice"))).as("rev_cents"),
          count(lit(1)).as("n"))
    },

    // Q2 (adapted: no partsupp table — the part↔supplier relation is
    // DERIVED from observed lineitem trade, cost = min observed sale in
    // cents): minimum-cost supplier per qualifying part within a region.
    // The correlated min-subquery decorrelates into a per-part aggregate
    // joined back on (part, cost). Scale shape: the part filter broadcasts
    // INTO the lineitem scan BEFORE the pair aggregation, so the derived
    // ps relation is built only for qualifying parts (the oracle builds it
    // for all parts then filters — same rows, ours never materializes the
    // full pair table).
    GraftQuery("tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cost_cents
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        |       JOIN nation ON s_nationkey = n_nationkey
        |       JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |best AS (SELECT ps.l_partkey AS bp, min(cost_cents) AS mc
        |         FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey GROUP BY 1)
        |SELECT CAST(floor(s_acctbal * 100) AS BIGINT) AS acctbal_cents, s_name, n_name,
        |       p_partkey, p_name, cost_cents
        |FROM part JOIN ps ON p_partkey = ps.l_partkey
        |JOIN eu ON ps.l_suppkey = eu.s_suppkey
        |JOIN best ON bp = p_partkey AND cost_cents = mc
        |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin) { (spark, sfDir) =>
      val pf = part(spark, sfDir)
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select("p_partkey", "p_name")
      val eu = supplier(spark, sfDir)
        .join(broadcast(nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(spark, sfDir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), cents(col("s_acctbal")).as("acctbal_cents"),
          col("n_name"))
      val ps = lineitem(spark, sfDir)
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "acctbal_cents", "n_name")
        .agg(min(cents(col("l_extendedprice"))).as("cost_cents"))
      val best = ps.groupBy(col("p_partkey").as("bp")).agg(min("cost_cents").as("mc"))
      ps.join(broadcast(best), col("p_partkey") === col("bp") && col("cost_cents") === col("mc"))
        .select("acctbal_cents", "s_name", "n_name", "p_partkey", "p_name", "cost_cents")
        .orderBy(col("acctbal_cents").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    // Q9 (adapted: supply cost proxied as 80% of the part's retail price,
    // integer cents): product-type profit by supplier nation and year —
    // the classic shuffle-heavy five-way join. Part filter and the
    // supplier→nation map broadcast; the one wide shuffle is
    // lineitem⋈orders on the order key; profit stays integer end-to-end.
    GraftQuery("tpch_q9",
      """SELECT nation, o_year, CAST(sum(profit_cents) AS BIGINT) AS profit_cents
        |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |        CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |        - CAST(l_quantity AS BIGINT) * CAST(floor(p_retailprice * 80) AS BIGINT) AS profit_cents
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      JOIN supplier ON s_suppkey = l_suppkey
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN nation ON n_nationkey = s_nationkey
        |      WHERE p_name LIKE '%widget%')
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val pf = part(spark, sfDir).filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), cents(col("p_retailprice") * 0.8).as("supp_cents"))
      val sn = supplier(spark, sfDir)
        .join(broadcast(nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      lineitem(spark, sfDir)
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
          - col("l_quantity").cast("long") * col("supp_cents")).as("profit_cents"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11 (adapted: "stock value" = observed traded value in cents from
    // the derived lineitem pair relation): parts holding an outsized share
    // of one nation's traded value — global scalar threshold via a
    // broadcast single-row cross join. The cut is SELF-SCALING (parts
    // above 2× the nation's mean part value, as an integer cross
    // multiplication value·np > 2·total): real TPC-H scales its q11
    // fraction by 1/SF for the same reason — a fixed per-part share
    // empties out as the part population grows. ~6% of parts qualify at
    // every measured sf (11 / 83 / 1 263 / 12 630 rows at sf0.001…sf1).
    GraftQuery("tpch_q11",
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |        CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS val_cents
        |        FROM lineitem GROUP BY 1, 2),
        |  nat AS (SELECT s_suppkey FROM supplier
        |          JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_13'),
        |  natval AS (SELECT l_partkey, CAST(sum(val_cents) AS BIGINT) AS value_cents
        |             FROM ps JOIN nat ON l_suppkey = s_suppkey GROUP BY 1),
        |  tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total,
        |                 CAST(count(*) AS BIGINT) AS np FROM natval)
        |SELECT l_partkey AS partkey, value_cents
        |FROM natval, tot WHERE value_cents * np > 2 * total
        |ORDER BY value_cents DESC, partkey""".stripMargin) { (spark, sfDir) =>
      val nat = supplier(spark, sfDir)
        .join(broadcast(nation(spark, sfDir).filter(col("n_name") === "NATION_13")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val natval = lineitem(spark, sfDir)
        .join(broadcast(nat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
      val tot = natval.agg(sum("value_cents").as("total"), count(lit(1)).as("np"))
      natval.join(broadcast(tot))
        .filter(col("value_cents") * col("np") > col("total") * 2)
        .select("partkey", "value_cents")
        .orderBy(col("value_cents").desc, col("partkey"))
    },

    // Q12 (adapted: no ship mode or commit/receipt dates — the mode
    // becomes a DERIVED shipping-delay bucket): late-shipment priority
    // accounting. The bucket CASE and the priority flag both evaluate
    // inside one post-join projection; the year filter pushes to the
    // lineitem scan.
    GraftQuery("tpch_q12",
      """SELECT delay_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM (SELECT o_orderpriority,
        |        CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'FAST'
        |             WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'NORMAL'
        |             ELSE 'SLOW' END AS delay_bucket
        |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY delay_bucket ORDER BY delay_bucket""".stripMargin) { (spark, sfDir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .join(orders(spark, sfDir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .select(hi.as("hi"),
          when(col("l_shipdate") <= expr("o_orderdate + INTERVAL 30 DAYS"), "FAST")
            .when(col("l_shipdate") <= expr("o_orderdate + INTERVAL 90 DAYS"), "NORMAL")
            .otherwise("SLOW").as("delay_bucket"))
        .groupBy("delay_bucket")
        .agg(sum(when(col("hi"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("hi"), 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("delay_bucket")
    },

    // Q16 (adapted: derived pair relation; "complaint" suppliers proxied
    // by negative balance): supplier counts by part attributes — the
    // distinct-pair + distinct-count + NOT-IN shape. The excluded-supplier
    // set broadcasts as an anti-join; the pair dedup rides the same
    // shuffle as the final distinct count.
    GraftQuery("tpch_q16",
      """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (spark, sfDir) =>
      val pf = part(spark, sfDir)
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = supplier(spark, sfDir).filter(col("s_acctbal") < 0).select("s_suppkey")
      lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
        .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // Q20 (adapted: "excess stock" = a supplier moved more than a
    // threshold quantity of one qualifying part in the year): the nested
    // semi-join chain — part name filter feeds a per-(supplier, part)
    // HAVING aggregate, whose supplier set semi-joins the nation-filtered
    // supplier dim. Every dimension side broadcasts; the only shuffle is
    // the pair aggregation.
    GraftQuery("tpch_q20",
      """WITH qual AS (SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey HAVING sum(CAST(l_quantity AS BIGINT)) > 30)
        |SELECT s_name, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3' AND s_suppkey IN (SELECT l_suppkey FROM qual)
        |ORDER BY s_name""".stripMargin) { (spark, sfDir) =>
      val qual = lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= ts("1997-01-01 00:00:00")
          && col("l_shipdate") < ts("1998-01-01 00:00:00"))
        .join(broadcast(part(spark, sfDir).filter(col("p_name").like("red%"))
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
        .filter(col("sq") > 30)
        .select("l_suppkey")
      supplier(spark, sfDir)
        .join(broadcast(nation(spark, sfDir).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    },

    // Q21 (adapted: lateness = shipped >60 days after the order date):
    // suppliers who kept multi-supplier orders waiting. The ORACLE keeps
    // the literal TPC-H EXISTS / NOT-EXISTS shape; the Spark plan is the
    // scale-right AGGREGATION REWRITE of it — an l1 row survives both
    // subqueries iff its order has >1 distinct supplier and exactly one
    // distinct LATE supplier (l1's own), so per-order supplier stats
    // answer all three correlated passes at once. One fact shuffle
    // (lineitem⋈orders on the order key) instead of three: both
    // downstream groupBys — (orderkey, suppkey) then (orderkey) — are
    // subsets of the join's hash partitioning and reshuffle nothing.
    // The hash-compare against the EXISTS oracle IS the equivalence
    // proof of the rewrite. Measured sf1→sf10: 12.6 s → 4.4 s warm.
    GraftQuery("tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_13'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val sn = supplier(spark, sfDir)
        .join(broadcast(nation(spark, sfDir).filter(col("n_name") === "NATION_13")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val late = col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAYS")
      val perSupp = lineitem(spark, sfDir).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders(spark, sfDir).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum(when(late, 1L).otherwise(0L)).as("late_lines"))
      val perOrder = perSupp.groupBy("l_orderkey")
        .agg(count(lit(1)).as("ns"),
          sum(when(col("late_lines") > 0, 1L).otherwise(0L)).as("nlate"),
          max(when(col("late_lines") > 0, col("l_suppkey"))).as("late_supp"),
          sum(col("late_lines")).as("late_line_total"))
        .filter(col("ns") > 1 && col("nlate") === 1)
      perOrder
        .join(broadcast(sn), col("late_supp") === col("s_suppkey"))
        .groupBy("s_name").agg(sum(col("late_line_total")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }
  )
}
