package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** SQL registration for graft's custom Catalyst expressions, so the SQL
  * front door reaches them too: `shingle_hashes(text, k)`,
  * `dot_product(a, b)`, `minhash_sig(h, w)` (aggregate),
  * `minhash_sig_arr(arr, w)` (per-row), `hyperplane_codes(vec, t, b, seed)`,
  * `hyperplane_code_word(vec, t, b, seed)`,
  * `centroid_argmin(vec, array(array(...)))`,
  * `centroid_mindist(vec, array(array(...)))`. */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  /** a foldable array<array<bigint|int>> codebook literal → driver rows */
  private def codebookArg(e: Expression, name: String): Seq[Seq[Long]] = {
    require(e.foldable, s"$name expects a foldable codebook literal, got $e")
    val (elemType, rows) = e.dataType match {
      case ArrayType(ArrayType(et @ (LongType | IntegerType), _), _) =>
        (et, e.eval().asInstanceOf[ArrayData])
      case other => throw new IllegalArgumentException(
        s"$name expects array<array<bigint>>, got $other")
    }
    rows.toObjectArray(ArrayType(elemType)).toSeq.map { row =>
      val ad = row.asInstanceOf[ArrayData]
      if (elemType == LongType) ad.toLongArray().toSeq
      else ad.toIntArray().map(_.toLong).toSeq
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("shingle_hashes",
      (es: Seq[Expression]) => ShingleHashes(es.head, intArg(es(1), "shingle_hashes k")),
      "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      (es: Seq[Expression]) => DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      (es: Seq[Expression]) =>
        MinHashSigAgg(es.head, intArg(es(1), "minhash_sig w")).toAggregateExpression(),
      "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig_arr",
      (es: Seq[Expression]) =>
        MinHashSig(es.head, intArg(es(1), "minhash_sig_arr w")), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_codes",
      (es: Seq[Expression]) => HyperplaneCodes(es.head,
        intArg(es(1), "hyperplane_codes tables"), intArg(es(2), "hyperplane_codes bits"),
        longArg(es(3), "hyperplane_codes seed")), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_code_word",
      (es: Seq[Expression]) => HyperplaneCodeWord(es.head,
        intArg(es(1), "hyperplane_code_word tables"), intArg(es(2), "hyperplane_code_word bits"),
        longArg(es(3), "hyperplane_code_word seed")), "scala_udf")
    reg.createOrReplaceTempFunction("centroid_argmin",
      (es: Seq[Expression]) =>
        CentroidArgmin(es.head, codebookArg(es(1), "centroid_argmin")), "scala_udf")
    reg.createOrReplaceTempFunction("centroid_mindist",
      (es: Seq[Expression]) =>
        CentroidMinDist(es.head, codebookArg(es(1), "centroid_mindist")), "scala_udf")
    reg.createOrReplaceTempFunction("zorder2",
      (es: Seq[Expression]) => ZOrderKey(es.head, es(1)), "scala_udf")
  }
}
