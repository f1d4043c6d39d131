package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-factor amplifier for SCALING.md evidence: replicates the driver's
  * sf0.1 tables `factor`× with key-consistent shifts, producing an sf1-shaped
  * directory WITHOUT touching /root/testdata (output goes under target/).
  *
  * Join keys shift together (o_orderkey/l_orderkey, o_custkey/c_custkey,
  * l_partkey/p_partkey, l_suppkey/s_suppkey) so every foreign-key
  * relationship — and therefore every join/agg cardinality ratio — scales
  * linearly. The two free-text/vector tables are mutated per replica so the
  * similarity operators see new content rather than 10 verbatim clones
  * (verbatim clones would synthesize a quadratic near-dup blow-up no real
  * 10× corpus has):
  *  - documents: replicas r>0 interleave the FULL replica number every 7
  *    chars (identical to a single digit for r<10, so sf1 output is
  *    unchanged; a digit alone repeats mod 10 and would clone r and r+10
  *    verbatim at factor 100) — every 8-shingle crosses an insertion, so
  *    cross-replica Jaccard collapses while within-replica relationships
  *    are preserved.
  *  - embeddings: replicas rotate the component vector by 7r positions,
  *    and replicas r ≥ 64 REVERSE the vector before rotating (rotations
  *    repeat mod 64; reversal is orthogonal, so within-replica cosines
  *    are preserved exactly while a reversed-then-rotated vector
  *    decorrelates from every pure rotation of the same base). Factors
  *    beyond 128 would need a third transform and are rejected up front.
  * Dimension tables (region, nation) and the label/lang/source vocabularies
  * stay fixed, as they would at a real 10× of the same corpus.
  */
object ScaleData {

  /** per-replica document edit: shift the key, interleave the FULL replica
    * number every 7 chars (for r<10 identical to a single digit, so sf1
    * output is unchanged; a digit alone would repeat every 10 replicas and
    * make r and r+10 verbatim clones at factor=100) */
  private[graft] def docEdit(docK: Long)(d: DataFrame, r: Long): DataFrame =
    d.withColumn("doc_id", col("doc_id") + lit(r * docK))
      .withColumn("text",
        if (r == 0L) col("text")
        else regexp_replace(col("text"), "(.{7})", "$1" + r))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** per-replica embedding edit: shift the key, rotate components by 7r
    * positions — rotations repeat mod 64, so replicas r and r+64 of the
    * same base vector would be identical (cosine 1.0 — a synthetic
    * near-dup blow-up); for r >= 64 REVERSE the vector before rotating
    * (reversal is orthogonal: within-replica cosines preserved, and a
    * reversed-then-rotated vector decorrelates from every pure rotation
    * of the same base). Factors beyond 128 would need a third transform;
    * main rejects them before writing anything. */
  private[graft] def embEdit(vecK: Long)(d: DataFrame, r: Long): DataFrame = {
    val shift = ((r * 7) % 64).toInt
    require(r < 128, "ScaleData supports factors up to 128")
    val src = if (r < 64) "embedding" else "reverse(embedding)"
    d.withColumn("vec_id", col("vec_id") + lit(r * vecK))
      .withColumn("embedding",
        if (shift == 0) expr(src)
        else expr(s"concat(slice($src, ${shift + 1}, ${64 - shift}), slice($src, 1, $shift))"))
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/target/testdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // fail BEFORE writing anything: the per-replica embedding transform
    // only decorrelates up to 128 replicas, and embeddings are the last
    // table written — a late failure would leave dst partially populated
    require(factor >= 1 && factor <= 128,
      s"ScaleData supports factors 1..128, got $factor")
    val spark = Sessions.local("16")
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = Tables.table(spark, src, name)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).first().getLong(0) + 1
    /** replica-expand: one row per (row, r) with per-replica column edits */
    def amplify(df: DataFrame, edits: (DataFrame, Long) => DataFrame): DataFrame =
      (0L until factor).map(r => edits(df, r)).reduce(_ unionByName _)

    // key strides (max+1) so shifted keys never collide across replicas
    val custK = stride(read("customer"), "c_custkey")
    val suppK = stride(read("supplier"), "s_suppkey")
    val partK = stride(read("part"), "p_partkey")
    val ordK = stride(read("orders"), "o_orderkey")
    val docK = stride(read("documents"), "doc_id")
    val vecK = stride(read("embeddings"), "vec_id")
    val evK = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val e = read("events")
      (stride(e, "event_id"), stride(e, "user_id"))
    }

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(amplify(read("customer"), (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * custK))), "customer")
    write(amplify(read("supplier"), (d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * suppK))), "supplier")
    write(amplify(read("part"), (d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * partK))), "part")
    write(amplify(read("orders"), (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * ordK))
        .withColumn("o_custkey", col("o_custkey") + lit(r * custK))), "orders")
    write(amplify(read("lineitem"), (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * ordK))
        .withColumn("l_partkey", col("l_partkey") + lit(r * partK))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppK))), "lineitem")
    write(amplify(read("events"), (d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * evK._1))
        .withColumn("user_id", col("user_id") + lit(r * evK._2))), "events")
    write(amplify(read("documents"), docEdit(docK)), "documents")
    write(amplify(read("embeddings"), embEdit(vecK)), "embeddings")

    println(s"wrote ${factor}x of $src to $dst")
    spark.stop()
  }
}
