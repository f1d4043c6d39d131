package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** every implemented operator, each with its DuckDB oracle where
    * SQL-expressible (SURVEY.md §2 inventory + north-star extensions) */
  def all: Seq[GraftQuery] =
    InventoryOps.queries ++ PackingOps.queries ++ ScalarOps.queries ++
      RelationalOps.queries ++ HeadlineOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ EventOps.queries ++
      MultimodalOps.queries ++ SqlOps.queries ++ ExtraAggOps.queries ++
      TrainPrepOps.queries ++ RankOps.queries ++ SketchOps.queries ++
      LayoutOps.queries ++ CleanOps.queries ++ PqOps.queries ++
      BpeOps.queries ++ TopKOps.queries ++ CdcOps.queries ++
      RetrievalOps.queries ++ StatsOps.queries ++ PipelineOps.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Distinct-identities pipeline (§7.2 step 1): scan → project → explode →
    * filter → union → distinct → broadcast identity join. */
  def entry(spark: SparkSession): DataFrame =
    queries("identity_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** heavier subset run by Bench each round */
  def benchQueries: Seq[String] = all.filter(_.bench).map(_.name)
}
