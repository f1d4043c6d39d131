package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the ACL-entry grammar "[scope:]type:id:perms"
  * (copy-acls.py:14-20): the engine's split/map/rejoin must be a total
  * function over 3- and 4-field entries, preserve empty ids, and
  * round-trip when no mapping applies. Exercised through the registered
  * scalar_acl_split query semantics replicated in pure Scala (same
  * positional logic as InventoryOps.parseEntry). */
class AclGrammarSpec extends AnyFunSuite {

  private def parse(entry: String): (String, String, String) = {
    val parts = entry.split(":", -1)
    if (parts.length == 4) (parts(1), parts(2), parts(3))
    else (parts(0), parts(1), parts(2))
  }

  private def rebuild(entry: String, mapped: String): String = {
    val parts = entry.split(":", -1)
    if (parts.length == 4) Seq(parts(0), parts(1), mapped, parts(3)).mkString(":")
    else Seq(parts(0), mapped, parts(2)).mkString(":")
  }

  private val rnd = new Random(7)
  private def randId(): String =
    if (rnd.nextInt(5) == 0) "" else "u" + rnd.nextInt(1000)
  private def randPerms(): String =
    Seq("r", "w", "x").map(c => if (rnd.nextBoolean()) c else "-").mkString

  test("3-field and 4-field entries parse to the same (type,id,perms) shape") {
    (1 to 500).foreach { _ =>
      val t = if (rnd.nextBoolean()) "user" else "group"
      val id = randId()
      val p = randPerms()
      val e3 = s"$t:$id:$p"
      val e4 = s"default:$t:$id:$p"
      assert(parse(e3) == ((t, id, p)))
      assert(parse(e4) == ((t, id, p)))
    }
  }

  test("identity rebuild round-trips the original entry") {
    (1 to 500).foreach { _ =>
      val t = if (rnd.nextBoolean()) "user" else "group"
      val id = randId()
      val e = if (rnd.nextBoolean()) s"$t:$id:${randPerms()}"
              else s"default:$t:$id:${randPerms()}"
      val (_, pid, _) = parse(e)
      assert(rebuild(e, pid) == e)
    }
  }

  test("empty-id entries (mask/other) pass through unmapped") {
    assert(parse("other::r--") == (("other", "", "r--")))
    assert(rebuild("other::r--", "") == "other::r--")
    assert(parse("default:mask::rwx") == (("mask", "", "rwx")))
  }

  test("registered acl queries agree with pure parse on sf0.001") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("scalar_acl_split")(spark, TestSpark.Sf)
      .select("entry", "atype", "aid", "aperms").distinct().collect()
    rows.foreach { r =>
      val (t, id, p) = parse(r.getString(0))
      assert((t, id, p) == ((r.getString(1), r.getString(2), r.getString(3))),
        s"entry ${r.getString(0)}")
    }
  }
}
