package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** chunk plan invariant (B5): chunks tile [0, len) exactly — contiguous,
  * non-overlapping, last chunk short. */
class ChunkSpec extends AnyFunSuite {

  test("chunk plan tiles [0, clen) exactly for every file on sf0.001") {
    val spark = TestSpark.spark
    val plan = SparkEntry.queries("chunk_plan")(spark, TestSpark.Sf)
    val byFile = plan.groupBy("name").agg(
      count(lit(1)).as("n_chunks"),
      sum("chunk_len").as("covered"),
      min("chunk_off").as("first_off"),
      max(col("chunk_off") + col("chunk_len")).as("end"))
    // covered == end, first_off == 0, and end == clen (reconstructed)
    val bad = byFile.filter(col("first_off") =!= 0 || col("covered") =!= col("end")).count()
    assert(bad == 0)
    // offsets are multiples of the block size
    val misaligned = plan.filter(col("chunk_off") % 20971520L =!= 0).count()
    assert(misaligned == 0)
    // every chunk is positive and at most one block
    val oob = plan.filter(col("chunk_len") <= 0 || col("chunk_len") > 20971520L).count()
    assert(oob == 0)
  }
}
