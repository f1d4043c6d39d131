package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic polynomial hash computable identically in Spark and in the
  * DuckDB oracle: H8(s) = Σ_{j=0..7} ascii(substr(s, j+1, 1)) * 31^j over an
  * exactly-8-char string. Max value ≈ 3.5e12 — exact in BIGINT/Long on both
  * engines, so MinHash/SimHash built on it are bit-reproducible.
  */
object PortableHash {

  val Pow31: IndexedSeq[Long] = (0 to 7).scanLeft(1L)((a, _) => a * 31).take(8).toIndexedSeq

  /** large Mersenne prime for the (a*h + b) mod P MinHash permutations */
  val P: Long = 2147483647L

  /** Spark column: H8 over an 8-char string column. */
  def h8(c: Column): Column =
    (0 to 7).map(j => ascii(substring(c, j + 1, 1)).cast("long") * lit(Pow31(j)))
      .reduce(_ + _)

  /** the same H8 as a DuckDB SQL fragment over expression `e` */
  def h8Sql(e: String): String =
    (0 to 7).map(j => s"CAST(ascii(substr($e, ${j + 1}, 1)) AS BIGINT) * ${Pow31(j)}")
      .mkString("(", " + ", ")")

  /** H8 of lpad(CAST(key AS STRING), 8, '0') computed ARITHMETICALLY from
    * the integer key — identical value for 0 ≤ key < 1e8 (spec-pinned
    * against the string form): char j of the padded decimal is
    * '0' + (key ÷ 10^(7−j)) mod 10, so the hash needs no string at all.
    * Use this when the hash lands in a filter predicate: predicate
    * pushdown re-inlines a filter's subexpressions per conjunct (no CSE
    * across conjuncts), and the string chain evaluated 8× per row was
    * measured at ~10× a whole query's runtime; the digit form is ~100
    * integer ops even fully duplicated. Division via floor(x/p) — exact
    * for key < 2^53. */
  def h8Digits(key: Column): Column =
    (0 to 7).map { j =>
      val p = math.pow(10, (7 - j).toDouble).toLong
      (lit(48L) + (floor(key.cast("long") / lit(p)).cast("long") % 10)) * lit(Pow31(j))
    }.reduce(_ + _)

  /** MinHash permutation i: (a_i * (h mod P) + b_i) mod P, coefficients
    * fixed. h is reduced mod P first so a*h stays below 2^63 (a, h < P ≈
    * 2^31 → product < 2^62) — ANSI mode overflows otherwise. */
  def permA(i: Int): Long = (999983L * (i + 1) + 12345L) % P
  def permB(i: Int): Long = (7919L * (i + 1) + 17L) % P
  def minhashPerm(h: Column, i: Int): Column =
    (lit(permA(i)) * (h % lit(P)) + lit(permB(i))) % lit(P)
}
