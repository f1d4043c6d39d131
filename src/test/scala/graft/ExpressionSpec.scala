package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProduct, MinHashSigAgg, PortableHash, ShingleHashes}

/** Custom Catalyst extensions must be drop-in equivalent to the composed
  * built-in forms they replace (the DuckDB oracles are written against the
  * composed semantics). */
class ExpressionSpec extends AnyFunSuite {

  test("ShingleHashes == composed ascii/substring polynomial") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.Sf).limit(50)
    val viaExpr = docs.select(col("doc_id"),
        explode(ShingleHashes.shingleHashes(col("text"), 8)).as("h"))
      .groupBy("doc_id").agg(sum("h").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaComposed = docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 7)).as("i"))
      .select(col("doc_id"), PortableHash.h8(expr("substring(text, i, 8)")).as("h"))
      .groupBy("doc_id").agg(sum("h").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaExpr == viaComposed)
  }

  test("ShingleHashes handles short and empty strings") {
    assert(ShingleHashes.compute("", 8).numElements() == 0)
    assert(ShingleHashes.compute("1234567", 8).numElements() == 0)
    assert(ShingleHashes.compute("12345678", 8).numElements() == 1)
  }

  test("DotProduct == aggregate(zip_with(...)) fold") {
    val spark = TestSpark.spark
    val e = Tables.embeddings(spark, TestSpark.Sf).limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(col("vec_id"),
        DotProduct.dotProduct(col("v"), col("v")).as("d1"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x).as("d2"))
      .collect()
    both.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}"))
  }

  test("MinHashSig (per-row, over array) == MinHashSigAgg (grouped, over rows)") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.Sf).limit(50)
    val viaScalar = docs.select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(
          array_distinct(ShingleHashes.shingleHashes(col("text"), 8)), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = docs.select(col("doc_id"),
        explode(array_distinct(ShingleHashes.shingleHashes(col("text"), 8))).as("h"))
      .groupBy("doc_id").agg(MinHashSigAgg.minhashSig(col("h"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaScalar == viaAgg)
  }

  test("SQL-registered custom functions match the Column API forms") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, TestSpark.Sf).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .createOrReplaceTempView("emb_t")
    val viaSql = spark.sql(
      """SELECT vec_id, dot_product(v, v) AS d,
        |       hyperplane_code_word(v, 24, 2, 42) AS w,
        |       hyperplane_codes(v, 4, 2, 42) AS cs
        |FROM emb_t""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getSeq[Int](3))).toMap
    val viaApi = Tables.embeddings(spark, TestSpark.Sf).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        DotProduct.dotProduct(col("v"), col("v")).as("d"),
        graft.functions.HyperplaneCodes.hyperplaneCodeWord(col("v"), 24, 2, 42L).as("w"),
        graft.functions.HyperplaneCodes.hyperplaneCodes(col("v"), 4, 2, 42L).as("cs"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getSeq[Int](3))).toMap
    assert(viaSql == viaApi)
    // the packed word is exactly the codes array folded into bit groups
    viaApi.foreach { case (_, (_, w, _)) =>
      val codes = (0 until 24).map(t => ((w >>> (2 * t)) & 3).toInt)
      assert(codes.forall(c => c >= 0 && c <= 3))
    }
  }

  test("MinHashSigAgg == 32 separate min(perm_i) aggregates") {
    val spark = TestSpark.spark
    val sh = Tables.documents(spark, TestSpark.Sf).limit(50)
      .select(col("doc_id"),
        explode(ShingleHashes.shingleHashes(col("text"), 8)).as("h"))
    val viaAgg = sh.groupBy("doc_id")
      .agg(MinHashSigAgg.minhashSig(col("h"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val mins = (0 until 32).map(i => min(PortableHash.minhashPerm(col("h"), i)).as(s"m$i"))
    val viaMins = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong(_))).toMap
    assert(viaAgg.keySet == viaMins.keySet)
    viaAgg.foreach { case (d, sig) => assert(sig == viaMins(d), s"doc $d") }
  }

  test("CentroidArgmin == composed quantize/zip_with/aggregate argmin") {
    val spark = TestSpark.spark
    val cents = Array(
      Array.fill(64)(0L),
      Array.tabulate(64)(i => (i * 1000).toLong),
      Array.tabulate(64)(i => ((63 - i) * 1000).toLong))
    val e = Tables.embeddings(spark, TestSpark.Sf).limit(200)
    val centsSql = cents.map(_.mkString("array(", "L,", "L)")).mkString("array(", ",", ")")
    val both = e.select(col("vec_id"), col("embedding"),
        graft.functions.CentroidArgmin.centroidArgmin(col("embedding"), cents).as("c1"))
      .withColumn("c2", expr(
        s"""CAST(array_position(
           |  transform($centsSql, cc -> aggregate(cc, 0L, (a, x) -> a + x * x) -
           |    2 * aggregate(zip_with(cc,
           |          transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
           |          (x, y) -> x * y), 0L, (a, x) -> a + x)),
           |  array_min(transform($centsSql, cc -> aggregate(cc, 0L, (a, x) -> a + x * x) -
           |    2 * aggregate(zip_with(cc,
           |          transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)),
           |          (x, y) -> x * y), 0L, (a, x) -> a + x)))) - 1 AS INT)""".stripMargin))
      .collect()
    both.foreach(r => assert(r.getInt(2) == r.getInt(3), s"vec ${r.getLong(0)}"))
  }

  test("centroid_argmin is reachable from SQL and matches the Column API") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    val cents = Array(
      Array.fill(64)(0L),
      Array.tabulate(64)(i => (i * 1000).toLong))
    val centsSql = cents.map(_.mkString("array(", "L,", "L)")).mkString("array(", ",", ")")
    Tables.embeddings(spark, TestSpark.Sf).limit(100)
      .createOrReplaceTempView("emb_ca_v")
    val viaSql = spark.sql(
        s"SELECT vec_id, centroid_argmin(embedding, $centsSql) AS c FROM emb_ca_v")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCol = Tables.embeddings(spark, TestSpark.Sf).limit(100)
      .select(col("vec_id"),
        graft.functions.CentroidArgmin.centroidArgmin(col("embedding"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == viaCol)
  }

  test("CentroidArgmin ties keep the lowest cluster id; double input matches float") {
    val spark = TestSpark.spark
    import spark.implicits._
    // duplicate centroids force a tie on every row
    val cents = Array(Array.tabulate(4)(_.toLong), Array.tabulate(4)(_.toLong))
    val rows = Seq(Seq(0.5f, 1.5f, -2.5f, 3.5f), Seq(0f, 0f, 0f, 0f)).toDF("v")
    val got = rows.select(
        graft.functions.CentroidArgmin.centroidArgmin(col("v"), cents).as("c"),
        graft.functions.CentroidArgmin
          .centroidArgmin(col("v").cast("array<double>"), cents).as("cd"))
      .collect()
    got.foreach { r => assert(r.getInt(0) == 0); assert(r.getInt(1) == 0) }
  }

  test("CentroidMinDist on pre-quantized longs == n2c - 2*dot via DotProduct") {
    val spark = TestSpark.spark
    val cents = Array(
      Array.tabulate(64)(i => (i * 500 - 2000).toLong),
      Array.fill(64)(1000L))
    val q = Tables.embeddings(spark, TestSpark.Sf).limit(100)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("xq"))
    val viaExpr = q.select(col("vec_id"),
        graft.functions.CentroidArgmin.centroidMinDist(col("xq"), cents).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n2c = cents.map(c => c.map(x => x * x).sum)
    val centsSql = cents.map(_.mkString("array(", "L,", "L)"))
    val viaComposed = q.select(col("vec_id"),
        least(
          lit(n2c(0)) - lit(2L) * expr(
            s"aggregate(zip_with(xq, ${centsSql(0)}, (x, y) -> x * y), 0L, (a, x) -> a + x)"),
          lit(n2c(1)) - lit(2L) * expr(
            s"aggregate(zip_with(xq, ${centsSql(1)}, (x, y) -> x * y), 0L, (a, x) -> a + x)")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaComposed)
  }

  test("h8Digits equals the string-form H8 over lpad'ed integer keys") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.functions.PortableHash
    // boundary-heavy key set: 0, single digits, powers of 10, 1e8-1
    val keys = (Seq(0L, 1L, 9L, 10L, 99L, 100L, 12345L, 999999L, 1000000L,
      99999999L) ++ (1L to 500L).map(_ * 199999L)).distinct
    val df = spark.createDataFrame(keys.map(Tuple1(_))).toDF("k")
    val bad = df.select(
        PortableHash.h8(lpad(col("k").cast("string"), 8, "0")).as("s"),
        PortableHash.h8Digits(col("k")).as("d"))
      .filter(col("s") =!= col("d")).count()
    assert(bad == 0L, "digit-form H8 drifted from the string form")
  }
}
