package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables._

/** Standard relational surface the engine exposes beyond the reference's
  * own single join (SURVEY.md §2.4 "absent join types", §2.5-§2.7): the
  * full join matrix, rollup/cube, windows, set ops, top-k. All built-in
  * Catalyst — zero custom code.
  *
  * Money sums use exact integer cents (`floor(x*100)` per row, BIGINT sum)
  * so results are bit-identical regardless of float summation order —
  * both at the DuckDB oracle and across 1000-executor partial aggregation.
  */
object RelationalOps {

  private def cents(c: String): org.apache.spark.sql.Column =
    floor(col(c) * 100).cast("long")

  val queries: Seq[GraftQuery] = Seq(

    // broadcast inner join + aggregation (dim side broadcast like op 23)
    GraftQuery("join_inner_agg",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      ) { (spark, sfDir) =>
      orders(spark, sfDir)
        .join(broadcast(customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum(cents("o_totalprice")).as("revenue_cents"))
        .orderBy("c_mktsegment")
    },

    // left outer join with null-aware count, then histogram
    GraftQuery("join_left_hist",
      """WITH oc AS (
        |  SELECT c_custkey, count(o_orderkey) AS n_ord
        |  FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        |    ON o.o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |SELECT n_ord, count(*) AS n_cust FROM oc GROUP BY n_ord ORDER BY n_ord""".stripMargin,
      ) { (spark, sfDir) =>
      customer(spark, sfDir)
        .join(orders(spark, sfDir).filter(col("o_orderstatus") === "F"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_ord"))
        .groupBy("n_ord").agg(count(lit(1)).as("n_cust"))
        .orderBy("n_ord")
    },

    // left-semi (EXISTS)
    GraftQuery("join_semi",
      """SELECT count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c.c_custkey AND o_totalprice > 400000)""".stripMargin,
      ) { (spark, sfDir) =>
      customer(spark, sfDir)
        .join(orders(spark, sfDir).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    },

    // left-anti (NOT EXISTS)
    GraftQuery("join_anti",
      """SELECT count(*) AS n FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey AND o_orderstatus = 'P')""".stripMargin,
      ) { (spark, sfDir) =>
      customer(spark, sfDir)
        .join(orders(spark, sfDir).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
    },

    // equi + band (range predicate) join
    GraftQuery("join_range",
      """SELECT p_brand, count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_quantity BETWEEN p_size - 2 AND p_size + 2
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
      ) { (spark, sfDir) =>
      lineitem(spark, sfDir)
        .join(broadcast(part(spark, sfDir)),
          col("l_partkey") === col("p_partkey")
            && col("l_quantity").between(col("p_size") - 2, col("p_size") + 2))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(floor(col("l_quantity")).cast("long")).as("qty"))
        .orderBy("p_brand")
    },

    // as-of join composed from equi-join + window rank (SURVEY §2.4):
    // latest order at-or-before each sampled event's timestamp
    GraftQuery("join_asof",
      """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 20 = 0),
        |j AS (SELECT e.event_id, o.o_orderkey,
        |        row_number() OVER (PARTITION BY e.event_id
        |                           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |      FROM e JOIN orders o
        |        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, o_orderkey FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
      ) { (spark, sfDir) =>
      val e = events(spark, sfDir).filter(col("event_id") % 20 === 0)
        .select("event_id", "user_id", "ts")
      val o = orders(spark, sfDir)
      val w = Window.partitionBy("event_id")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      e.join(o, col("o_custkey") === col("user_id") && col("o_orderdate") <= col("ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "o_orderkey")
        .orderBy("event_id")
    },

    // Nearest-event join (the two-sided, tolerance-bounded as-of variant):
    // each purchase matches its user's CLOSEST view within ±1 hour —
    // |view ts − purchase ts| minimized, ties to the earlier view then
    // lower event id, unmatched purchases dropped. Backward as-of
    // (join_asof) answers "state at time t"; nearest answers "the reading
    // attributable to t" (sensor alignment, attribution snapping). Scale
    // shape: the tolerance makes the range join BANDED (both sides also
    // equi-keyed by user), and the per-purchase argmin is the rank-limit
    // pattern the heap operator serves.
    GraftQuery("join_asof_nearest",
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
        |v AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'view'),
        |j AS (SELECT p.event_id, v.event_id AS view_id,
        |        abs(v.us - p.us) AS adiff_us,
        |        row_number() OVER (PARTITION BY p.event_id
        |          ORDER BY abs(v.us - p.us), v.us, v.event_id) AS rn
        |      FROM p JOIN v ON v.user_id = p.user_id
        |        AND abs(v.us - p.us) <= 3600000000)
        |SELECT event_id, view_id, CAST(adiff_us AS BIGINT) AS adiff_us
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin) { (spark, sfDir) =>
      val e = events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us").as("pus"))
      val v = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("us").as("vus"))
      val w = Window.partitionBy("event_id")
        .orderBy(col("adiff_us"), col("vus"), col("view_id"))
      p.join(v, Seq("user_id"))
        .filter(abs(col("vus") - col("pus")) <= 3600000000L)
        .withColumn("adiff_us", abs(col("vus") - col("pus")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "view_id", "adiff_us")
        .orderBy("event_id")
    },

    // cross join (small × small only)
    GraftQuery("join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (spark, sfDir) =>
      region(spark, sfDir).crossJoin(nation(spark, sfDir))
        .select("r_name", "n_name").orderBy("r_name", "n_name")
    },

    // Fuzzy record linkage (blocked edit-distance join) — the entity-
    // resolution primitive: find name pairs within edit distance 3,
    // BLOCKED on the name's second token so the quadratic comparison runs
    // only inside blocks, never across the corpus. The linkage runs on the
    // DISTINCT-name dimension (names are a vocabulary, bounded ≪ corpus at
    // 100 TB — the row side carries each name's support count instead of
    // exploding per-row pairs); within-block pairing is an equi-join on
    // the block key with a levenshtein post-filter — no cross join in the
    // plan. Residual risk is a mega-block (a stop-word block key), handled
    // in practice by block-key salting/length buckets; block sizes here
    // are vocabulary-bounded.
    GraftQuery("join_fuzzy",
      """WITH p AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk,
        |             count(*) AS n FROM part GROUP BY 1, 2)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
        |  a.n AS n_a, b.n AS n_b
        |FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin) { (spark, sfDir) =>
      val p = part(spark, sfDir)
        .groupBy(col("p_name"), split(col("p_name"), " ").getItem(1).as("blk"))
        .agg(count(lit(1)).as("n"))
      val a = p.select(col("p_name").as("name_a"), col("blk"), col("n").as("n_a"))
      val b = p.select(col("p_name").as("name_b"), col("blk"), col("n").as("n_b"))
      a.join(b, Seq("blk"))
        .filter(col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) <= 3)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
          col("n_a"), col("n_b"))
        .orderBy("name_a", "name_b")
    },

    // set operations: intersect / except / union-distinct (§2.7)
    GraftQuery("setops",
      """SELECT 'exc' AS op, k FROM (
        |    SELECT DISTINCT c_nationkey AS k FROM customer
        |    EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'int' AS op, k FROM (
        |    SELECT DISTINCT c_nationkey AS k FROM customer
        |    INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'uni' AS op, k FROM (
        |    SELECT c_nationkey AS k FROM customer
        |    UNION SELECT s_nationkey FROM supplier)
        |ORDER BY op, k""".stripMargin) { (spark, sfDir) =>
      val c = customer(spark, sfDir).select(col("c_nationkey").as("k"))
      val s = supplier(spark, sfDir).select(col("s_nationkey").as("k"))
      val exc = c.distinct().except(s.distinct()).select(lit("exc").as("op"), col("k"))
      val int = c.distinct().intersect(s.distinct()).select(lit("int").as("op"), col("k"))
      val uni = c.union(s).distinct().select(lit("uni").as("op"), col("k"))
      exc.unionByName(int).unionByName(uni).orderBy("op", "k")
    },

    // rollup with grouping-null sentinels
    GraftQuery("agg_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (spark, sfDir) =>
      orders(spark, sfDir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents("o_totalprice")).as("cents"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("cents"))
        .orderBy("status", "priority")
    },

    // cube
    GraftQuery("agg_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |       coalesce(l_linestatus, 'ALL') AS lstatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin) { (spark, sfDir) =>
      lineitem(spark, sfDir)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(floor(col("l_quantity")).cast("long")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("qty"))
        .orderBy("rflag", "lstatus")
    },

    // approx_count_distinct, checked against exact within 5%
    GraftQuery("agg_approx_distinct",
      """SELECT count(DISTINCT l_partkey) AS exact_cnt, TRUE AS approx_ok
        |FROM lineitem""".stripMargin) { (spark, sfDir) =>
      lineitem(spark, sfDir)
        .agg(countDistinct(col("l_partkey")).as("exact_cnt"),
          approx_count_distinct(col("l_partkey")).as("approx"))
        .select(col("exact_cnt"),
          (abs(col("approx") - col("exact_cnt")) <= col("exact_cnt") * 0.05).as("approx_ok"))
    },

    // ranking window: top-3 orders per (sampled) customer
    GraftQuery("window_rank",
      """WITH r AS (SELECT o_custkey, o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders WHERE o_custkey % 10 = 0)
        |SELECT o_custkey, rn, o_orderkey, cents FROM r WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (spark, sfDir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(spark, sfDir).filter(col("o_custkey") % 10 === 0)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), cents("o_totalprice").as("cents"))
        .orderBy("o_custkey", "rn")
    },

    // lag + running cumulative sum frame
    GraftQuery("window_lag_cumsum",
      """WITH w AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey % 25 = 0)
        |SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
        |FROM w ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, sfDir) =>
      val base = orders(spark, sfDir).filter(col("o_custkey") % 25 === 0)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          cents("o_totalprice").as("cents"))
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      base
        .withColumn("prev_order", lag(col("o_orderkey"), 1).over(w))
        .withColumn("run_cents",
          sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("o_custkey", "o_orderkey", "prev_order", "run_cents")
        .orderBy("o_custkey", "o_orderkey")
    },

    // full analytic-window matrix: rank / dense_rank / ntile / lead /
    // first_value over one partition spec
    GraftQuery("window_analytics",
      """WITH w AS (SELECT o_custkey, o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey % 50 = 0)
        |SELECT o_custkey, o_orderkey,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey) AS drnk,
        |  ntile(4) OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey) AS quartile,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey) AS next_ord,
        |  first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_ord
        |FROM w ORDER BY o_custkey, rnk, o_orderkey""".stripMargin) { (spark, sfDir) =>
      val base = orders(spark, sfDir).filter(col("o_custkey") % 50 === 0)
        .select(col("o_custkey"), col("o_orderkey"), cents("o_totalprice").as("cents"))
      val w = Window.partitionBy("o_custkey").orderBy(col("cents").desc, col("o_orderkey"))
      base
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("next_ord", lead(col("o_orderkey"), 1).over(w))
        .withColumn("top_ord", first_value(col("o_orderkey"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("o_custkey", "o_orderkey", "rnk", "drnk", "quartile", "next_ord", "top_ord")
        .orderBy("o_custkey", "rnk", "o_orderkey")
    },

    // multiset set ops: EXCEPT ALL / INTERSECT ALL preserve duplicates
    GraftQuery("setops_all",
      """SELECT 'exa' AS op, k, count(*) AS n FROM (
        |    SELECT c_nationkey AS k FROM customer
        |    EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY k
        |UNION ALL
        |SELECT 'ina' AS op, k, count(*) AS n FROM (
        |    SELECT c_nationkey AS k FROM customer
        |    INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY k
        |ORDER BY op, k""".stripMargin) { (spark, sfDir) =>
      val c = customer(spark, sfDir).select(col("c_nationkey").as("k"))
      val s = supplier(spark, sfDir).select(col("s_nationkey").as("k"))
      val exa = c.exceptAll(s).groupBy("k").agg(count(lit(1)).as("n"))
        .select(lit("exa").as("op"), col("k"), col("n"))
      val ina = c.intersectAll(s).groupBy("k").agg(count(lit(1)).as("n"))
        .select(lit("ina").as("op"), col("k"), col("n"))
      exa.unionByName(ina).orderBy("op", "k")
    },

    // RANGE window frame: trailing 30-day revenue per customer — peers by
    // value distance, not row count
    GraftQuery("window_range_frame",
      """WITH w AS (SELECT o_custkey, o_orderkey,
        |    CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey % 20 = 0)
        |SELECT o_custkey, o_orderkey, days, cents,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY days
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_cents
        |FROM w ORDER BY o_custkey, days, o_orderkey""".stripMargin) { (spark, sfDir) =>
      val base = orders(spark, sfDir).filter(col("o_custkey") % 20 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days"),
          cents("o_totalprice").as("cents"))
      val w = Window.partitionBy("o_custkey").orderBy("days").rangeBetween(-30, Window.currentRow)
      base.withColumn("trailing_cents", sum("cents").over(w))
        .orderBy("o_custkey", "days", "o_orderkey")
    },

    // unpivot / melt: wide aggregate → long (metric, value) format
    GraftQuery("agg_unpivot",
      """WITH wide AS (SELECT l_returnflag,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_base_cents' AS metric, sum_base_cents AS value FROM wide
        |ORDER BY l_returnflag, metric""".stripMargin) { (spark, sfDir) =>
      val wide = lineitem(spark, sfDir).groupBy("l_returnflag")
        .agg(sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(cents("l_extendedprice")).as("sum_base_cents"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base_cents")), "metric", "value")
        .orderBy("l_returnflag", "metric")
    },

    // skew-mitigated aggregation: two-stage salted aggregate over a
    // low-cardinality (hot-key) grouping — stage 1 aggregates on
    // (key, salt) spreading each hot key over 16 reducers, stage 2 merges.
    // Result is identical to the direct groupBy (the oracle); at 100 TB
    // this is the pattern for keys whose groups exceed one executor.
    GraftQuery("agg_salted_skew",
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      ) { (spark, sfDir) =>
      val salted = lineitem(spark, sfDir)
        .withColumn("salt", (col("l_orderkey") * 31 + col("l_linenumber")) % 16)
        .groupBy("l_returnflag", "salt")
        .agg(count(lit(1)).as("pn"), sum(floor(col("l_quantity")).cast("long")).as("pqty"))
      salted.groupBy("l_returnflag")
        .agg(sum("pn").as("n"), sum("pqty").as("qty"))
        .orderBy("l_returnflag")
    },

    // top-k (TakeOrderedAndProject)
    GraftQuery("topk_orders",
      """SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
      ) { (spark, sfDir) =>
      orders(spark, sfDir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), cents("o_totalprice").as("cents"))
    }
  )
}
