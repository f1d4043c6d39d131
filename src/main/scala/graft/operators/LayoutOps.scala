package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables._
import graft.functions.ZOrderKey.zorder2

/** Multi-dimensional data-layout operators: the Z-order (Morton)
  * clustering key that makes min/max data-skipping work on MORE THAN ONE
  * filter column. At 100 TB the win is at write time: sorting (or
  * range-partitioning) a table by `zorder2(a, b)` tiles the (a, b) key
  * space, so every output file / parquet row group covers a bounded span
  * of BOTH columns and a point or range filter on EITHER prunes most of
  * the scan from footer stats alone — a 1-D sort gives that for its one
  * leading column and nothing for the rest. The key is pure long
  * arithmetic (a codegen ZOrderKey expression, bit-identical in DuckDB),
  * so the layout decision itself is oracled; LayoutSpec measures the
  * actual per-file span narrowing on a range-partitioned write. */
object LayoutOps {

  /** DuckDB twin of ZOrderKey.spread: 5 magic-mask dilation rounds */
  private def spreadSql(x: String): String =
    Seq((16, 281470681808895L), (8, 71777214294589695L),
      (4, 1085102592571150095L), (2, 3689348814741910323L),
      (1, 6148914691236517205L))
      .foldLeft(s"(CAST($x AS BIGINT) & 4294967295)") { case (v, (sh, m)) =>
        s"(($v | ($v << $sh)) & $m)"
      }

  private def zorderSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** compaction target bytes — sized so sf0.01 directories yield multi-
    * group plans (the 128 MiB analogue at fixture file sizes) */
  val CompactTarget: Long = 64000000L

  val queries: Seq[GraftQuery] = Seq(

    // the clustering key itself, per row — interleaving the part and
    // order dimensions of lineitem (the two columns a copy/reporting
    // workload filters by). Pure per-row arithmetic: no shuffle, no
    // join; stays inside one codegen span with the scan.
    GraftQuery("layout_zorder",
      s"""SELECT l_orderkey, l_linenumber,
         |  ${zorderSql("l_partkey", "l_orderkey")} AS zkey
         |FROM lineitem""".stripMargin) { (spark, sfDir) =>
      lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_linenumber"),
          zorder2(col("l_partkey"), col("l_orderkey")).as("zkey"))
    },

    // layout quality audit: cut the z-key range into 16 equal-width
    // strides (what a range-partitioned write makes into files) and
    // report each stride's span of BOTH source dimensions — the
    // data-skipping evidence a table-format stats collector publishes.
    // Distributed shape: one scalar max (broadcast single row) + one
    // hash aggregation; no global sort anywhere (ntile would serialize
    // through a single partition — the write path uses
    // repartitionByRange, see LayoutSpec).
    GraftQuery("layout_zorder_stats",
      s"""WITH z AS (SELECT l_partkey, l_orderkey,
         |        ${zorderSql("l_partkey", "l_orderkey")} AS zkey
         |      FROM lineitem),
         |s AS (SELECT (max(zkey) // 16) + 1 AS stride FROM z)
         |SELECT zkey // (SELECT stride FROM s) AS zbucket,
         |  count(*) AS n,
         |  CAST(min(l_partkey) AS BIGINT) AS pk_min,
         |  CAST(max(l_partkey) AS BIGINT) AS pk_max,
         |  CAST(min(l_orderkey) AS BIGINT) AS ok_min,
         |  CAST(max(l_orderkey) AS BIGINT) AS ok_max
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin) { (spark, sfDir) =>
      val z = lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_orderkey"),
          zorder2(col("l_partkey"), col("l_orderkey")).as("zkey"))
      val stride = z.agg((expr("max(zkey) DIV 16") + 1).as("stride"))
      z.join(broadcast(stride))
        .groupBy(expr("zkey DIV stride").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
          min("l_orderkey").as("ok_min"), max("l_orderkey").as("ok_max"))
        .orderBy("zbucket")
    },

    // Small-files compaction planner — the table-maintenance operator every
    // lakehouse runs: within each directory, walk files in name order and
    // assign each to merge group floor(bytes-before-it / target), so every
    // group holds ~target bytes (one file may straddle a boundary; a group
    // overshoots by at most one file). Output is the rewrite manifest
    // (directory, group, file count, bytes) a compactor executes.
    // Distributed shape: ONE window cumsum partitioned by directory (per-
    // directory file counts are bounded — the same reason the reference
    // bin-packs directories, generate-file-list.py:19-50) + one hash agg.
    // No global sort, no driver state; at 100 TB each directory's plan is
    // independent, so the job parallelizes over directories.
    GraftQuery("layout_compact_plan",
      s"""WITH ${graft.fixtures.RefFixtures.InvFilesCte},
         |w AS (SELECT parent_directory, name, length,
         |        CAST(sum(length) OVER (PARTITION BY parent_directory ORDER BY name
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          - length AS cum_before
         |      FROM invf)
         |SELECT parent_directory, CAST(cum_before // $CompactTarget AS BIGINT) AS grp_id,
         |  count(*) AS n_files, CAST(sum(length) AS BIGINT) AS grp_bytes
         |FROM w GROUP BY 1, 2
         |ORDER BY parent_directory, grp_id""".stripMargin,
      bench = true) { (spark, sfDir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("parent_directory").orderBy("name")
        .rowsBetween(Long.MinValue, 0)
      graft.fixtures.RefFixtures.invFiles(spark, sfDir)
        .select(col("parent_directory"), col("name"), col("length"))
        .withColumn("cum_before", sum("length").over(w) - col("length"))
        .groupBy(col("parent_directory"),
          expr(s"cum_before DIV $CompactTarget").as("grp_id"))
        .agg(count(lit(1)).as("n_files"), sum("length").as("grp_bytes"))
        .orderBy("parent_directory", "grp_id")
    }
  )
}
