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

    // custom Catalyst expressions reachable from SQL: shingle_hashes +
    // minhash_sig registered in the function registry, driven entirely
    // through spark.sql (oracle re-derives the same min-signature element
    // from the composed portable form)
    GraftQuery("sql_custom_expr",
      s"""WITH sh AS (SELECT DISTINCT doc_id, ${graft.functions.PortableHash.h8Sql("substr(text, i, 8)")} AS h FROM (
         |    SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS i
         |    FROM documents WHERE doc_id < 50))
         |SELECT doc_id,
         |       CAST(min((${graft.functions.PortableHash.permA(0)} * (h % ${graft.functions.PortableHash.P}) + ${graft.functions.PortableHash.permB(0)}) % ${graft.functions.PortableHash.P}) AS BIGINT) AS mh0,
         |       count(DISTINCT h) AS n_shingles
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, sfDir) =>
      graft.functions.GraftFunctions.register(spark)
      graft.Tables.documents(spark, sfDir).createOrReplaceTempView("documents_v")
      spark.sql(
        """SELECT doc_id,
          |       element_at(minhash_sig(h, 32), 1) AS mh0,
          |       count(DISTINCT h) AS n_shingles
          |FROM (SELECT DISTINCT doc_id, explode(shingle_hashes(text, 8)) AS h
          |      FROM documents_v WHERE doc_id < 50)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    },

    // UDF surface (§2.12): a registered Scala UDF converting the reference's
    // rwx permission strings (adls_copy_utils.py hdi_permission payloads) to
    // octal — the oracle computes the same thing in pure SQL arithmetic.
    GraftQuery("scalar_perm_octal",
      s"""WITH ${graft.fixtures.RefFixtures.InvCte},
         |b AS (SELECT name, perms,
         |   (CASE WHEN substr(perms, 1, 1) = 'r' THEN 4 ELSE 0 END +
         |    CASE WHEN substr(perms, 2, 1) = 'w' THEN 2 ELSE 0 END +
         |    CASE WHEN substr(perms, 3, 1) = 'x' THEN 1 ELSE 0 END) * 100 +
         |   (CASE WHEN substr(perms, 4, 1) = 'r' THEN 4 ELSE 0 END +
         |    CASE WHEN substr(perms, 5, 1) = 'w' THEN 2 ELSE 0 END +
         |    CASE WHEN substr(perms, 6, 1) = 'x' THEN 1 ELSE 0 END) * 10 +
         |   (CASE WHEN substr(perms, 7, 1) = 'r' THEN 4 ELSE 0 END +
         |    CASE WHEN substr(perms, 8, 1) = 'w' THEN 2 ELSE 0 END +
         |    CASE WHEN substr(perms, 9, 1) = 'x' THEN 1 ELSE 0 END) AS octal
         |  FROM inv)
         |SELECT name, perms, CAST(octal AS INT) AS octal
         |FROM b ORDER BY name""".stripMargin) { (spark, sfDir) =>
      val permOctal = udf { perms: String =>
        def bits(s: String): Int =
          (if (s(0) == 'r') 4 else 0) + (if (s(1) == 'w') 2 else 0) + (if (s(2) == 'x') 1 else 0)
        bits(perms.substring(0, 3)) * 100 + bits(perms.substring(3, 6)) * 10 +
          bits(perms.substring(6, 9))
      }
      spark.udf.register("perm_octal", permOctal)
      graft.fixtures.RefFixtures.inventory(spark, sfDir)
        .select(col("name"), col("perms"), permOctal(col("perms")).as("octal"))
        .orderBy("name")
    },

    // LATERAL correlated subquery with ORDER BY + LIMIT — per-customer
    // top-2 orders. Catalyst decorrelates the limit into a ranked window
    // join; no per-row re-execution (the nested-loop shape the reference's
    // per-item Python loops would imply)
    GraftQuery("sql_lateral_topn",
      """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c.c_custkey, l.o_orderkey""".stripMargin,
      ) { (spark, sfDir) =>
      register(spark, sfDir)
      spark.sql(
        """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
          |FROM customer_v c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_v o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
          |WHERE c.c_mktsegment = 'BUILDING'
          |ORDER BY c.c_custkey, l.o_orderkey""".stripMargin)
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
    },

    // WITH RECURSIVE through the SQL front door (new in Spark 4):
    // transitive closure — every event type reachable from 'signup' in
    // the session-transition digraph. Spark 4.1 supports only UNION ALL
    // recursion, so termination on this cyclic graph comes from a depth
    // bound (depth < 6 ≥ any diameter of the bounded type alphabet; walk
    // fan-out ≤ |types|^6 — fine on a type graph, and the standard guard
    // wherever UNION-fixpoint recursion is unavailable); the DISTINCT
    // projection collapses the walk to the closure. Both engines run the
    // same shape — the operator family the engine previously expressed
    // only as unrolled fixed-round CTE chains (pagerank/k-means/BFS
    // oracles) now has its declarative form.
    GraftQuery("sql_recursive_cte",
      s"""WITH RECURSIVE ed AS (
         |  SELECT src, dst FROM (
         |    SELECT lag(event_type) OVER (PARTITION BY user_id
         |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_type, event_id) AS src,
         |           event_type AS dst,
         |           epoch_us(CAST(ts AS TIMESTAMP))
         |             - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
         |               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_type, event_id) AS gap
         |    FROM events) WHERE src IS NOT NULL AND gap < ${EventOps.GapUs}
         |  GROUP BY src, dst),
         |reach(node, depth) AS (
         |  SELECT 'signup' AS node, 0 AS depth
         |  UNION ALL
         |  SELECT ed.dst, r.depth + 1 FROM reach r JOIN ed ON ed.src = r.node
         |  WHERE r.depth < 6)
         |SELECT DISTINCT node FROM reach ORDER BY node""".stripMargin) { (spark, sfDir) =>
      Tables.events(spark, sfDir).createOrReplaceTempView("events_v")
      spark.sql(
        s"""WITH RECURSIVE ed AS (
           |  SELECT src, dst FROM (
           |    SELECT lag(event_type) OVER (PARTITION BY user_id
           |             ORDER BY unix_micros(CAST(ts AS TIMESTAMP)), event_type, event_id) AS src,
           |           event_type AS dst,
           |           unix_micros(CAST(ts AS TIMESTAMP))
           |             - lag(unix_micros(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
           |               ORDER BY unix_micros(CAST(ts AS TIMESTAMP)), event_type, event_id) AS gap
           |    FROM events_v) WHERE src IS NOT NULL AND gap < ${EventOps.GapUs}
           |  GROUP BY src, dst),
           |reach(node, depth) AS (
           |  SELECT 'signup' AS node, 0 AS depth
           |  UNION ALL
           |  SELECT ed.dst, r.depth + 1 FROM reach r JOIN ed ON ed.src = r.node
           |  WHERE r.depth < 6)
           |SELECT DISTINCT node FROM reach ORDER BY node""".stripMargin)
    }
  )
}
