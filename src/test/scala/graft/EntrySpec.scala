package graft

import org.scalatest.funsuite.AnyFunSuite

/** driver-contract smoke checks */
class EntrySpec extends AnyFunSuite {

  test("entry returns rows > 0 on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("query names are unique; every oracle key has a query") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.toSet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every registered query returns rows on sf0.001") {
    val spark = TestSpark.spark
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
