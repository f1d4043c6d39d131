package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a named
  * DataFrame builder over an sf directory plus (when SQL-expressible)
  * an equivalent DuckDB oracle query over the same parquet tables.
  *
  * Column names of `run`'s result and the oracle SQL must agree exactly
  * (the driver sorts columns by name before hashing values).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** heavier queries included in the per-round benchmark */
    bench: Boolean = false)

object GraftQuery {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle), bench = false)

  def apply(name: String, oracle: String, bench: Boolean)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle), bench)

  /** rows-only driver check (operator not expressible in portable SQL) */
  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None, bench = false)
}
