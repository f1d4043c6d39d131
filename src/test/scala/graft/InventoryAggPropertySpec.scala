package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (fixed-seed) differential test of the AGGREGATE pushdown:
  * for random trees × random group-by columns × random aggregate sets ×
  * random exactly-pushed filter conjunctions × random fan-out floors, the
  * pushed plan's VALUES must equal an in-memory model's, the plan must
  * actually carry PushedAggregation (a silently-unpushed plan would pass
  * the value check), and rowsEmitted must stay bounded by partials —
  * never one row per file. This is the interplay surface the fixed
  * oracle queries can't sweep: a partial merged twice, a filter applied
  * after accumulation, or a group key crossing a split-unit boundary all
  * produce wrong VALUES here with a seed to replay.
  */
class InventoryAggPropertySpec extends AnyFunSuite {

  private case class E(name: String, parent: String, isFolder: Boolean,
      length: Long, mtimeMs: Long)

  private def buildTree(rnd: scala.util.Random): (String, Seq[E]) = {
    val root = Files.createTempDirectory("graft-aprop").toString
    val entries = scala.collection.mutable.ArrayBuffer.empty[E]
    val dirMtimes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def gen(dir: String, depth: Int): Unit = {
      (0 until rnd.nextInt(5)).foreach { i =>
        val rel = (if (dir == "/") "" else dir) + s"/f$i.dat"
        val len = rnd.nextInt(101).toLong
        val mt = rnd.nextInt(9).toLong * 1000L
        Files.write(Paths.get(root + rel), new Array[Byte](len.toInt))
        Files.setLastModifiedTime(Paths.get(root + rel), FileTime.fromMillis(mt))
        entries += E(rel, dir, isFolder = false, len, mt)
      }
      if (depth < 3) {
        (0 until rnd.nextInt(3)).foreach { i =>
          val rel = (if (dir == "/") "" else dir) + s"/d$i"
          Files.createDirectories(Paths.get(root + rel))
          val mt = rnd.nextInt(9).toLong * 1000L
          entries += E(rel, dir, isFolder = true, 0L, mt)
          dirMtimes += ((rel, mt))
          gen(rel, depth + 1)
        }
      }
    }
    gen("/", 0)
    dirMtimes.sortBy(-_._1.length).foreach { case (rel, mt) =>
      Files.setLastModifiedTime(Paths.get(root + rel), FileTime.fromMillis(mt))
    }
    Files.setLastModifiedTime(Paths.get(root), FileTime.fromMillis(0L))
    (root, entries.toSeq)
  }

  /** one random exactly-pushable filter as (Column, model predicate) */
  private def genFilter(rnd: scala.util.Random,
      model: Seq[E]): (Column, E => Boolean) = rnd.nextInt(5) match {
    case 0 =>
      val want = rnd.nextBoolean()
      (if (want) col("is_folder") === true else !col("is_folder"),
        e => e.isFolder == want)
    case 1 =>
      val x = rnd.nextInt(101).toLong
      if (rnd.nextBoolean()) (col("length") >= x, e => e.length >= x)
      else (col("length") < x, e => e.length < x)
    case 2 =>
      val t = rnd.nextInt(9).toLong * 1000L
      if (rnd.nextBoolean()) (col("mtime_ms") >= t, e => e.mtimeMs >= t)
      else (col("mtime_ms") <= t, e => e.mtimeMs <= t)
    case 3 =>
      val dirs = "/" +: model.filter(_.isFolder).map(_.name)
      val p = dirs(rnd.nextInt(dirs.size)).take(1 + rnd.nextInt(6))
      (col("parent_directory").startsWith(p), e => e.parent.startsWith(p))
    case _ =>
      val names = if (model.isEmpty) Seq("/zz") else model.map(_.name)
      val p = names(rnd.nextInt(names.size)).take(1 + rnd.nextInt(8))
      (col("name").startsWith(p), e => e.name.startsWith(p))
  }

  /** one random pushable aggregate as (Column expr, model reducer) —
    * reducers fold over the FILTERED model group */
  private def genAgg(rnd: scala.util.Random, idx: Int): (Column, Seq[E] => Long) =
    rnd.nextInt(6) match {
      case 0 => (count(lit(1)).as(s"a$idx"), g => g.size.toLong)
      case 1 => (count(col("name")).as(s"a$idx"), g => g.size.toLong) // non-null
      case 2 => (sum(col("length")).as(s"a$idx"), g => g.map(_.length).sum)
      case 3 => (min(col("length")).as(s"a$idx"), g => g.map(_.length).min)
      case 4 => (max(col("mtime_ms")).as(s"a$idx"), g => g.map(_.mtimeMs).max)
      case _ => (min(col("mtime_ms")).as(s"a$idx"), g => g.map(_.mtimeMs).min)
    }

  test("grouping by an unbounded-cardinality column refuses pushdown and stays correct") {
    // the agg reader holds one accumulator per (task, group): a `name`
    // group-by would buffer a whole subtree per task, so the source
    // refuses and Spark aggregates post-scan — same answer, streaming scan
    val spark = TestSpark.spark
    val rnd = new scala.util.Random(7L)
    val (root, model) = buildTree(rnd)
    Seq("name", "length", "mtime_ms").foreach { gcol =>
      val q = spark.read.format("graft-inventory").option("root", root).load()
        .groupBy(col(gcol)).agg(count(lit(1)).as("n"))
      val got = q.collect().map(r => r.get(0) -> r.getLong(1)).toMap
      val expect = model.groupBy(e => gcol match {
        case "name" => e.name
        case "length" => e.length
        case _ => e.mtimeMs
      }).map { case (k, g) => (k: Any) -> g.size.toLong }
      assert(got == expect, s"group by $gcol drifted")
      assert(!q.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        s"group by $gcol was pushed — unbounded per-task accumulators at scale")
    }
  }

  test("random trees × random group-bys × random aggregates × random filters ≡ model, pushed, partial-bounded") {
    val spark = TestSpark.spark
    import graft.sources.InventoryDataSource
    val rnd = new scala.util.Random(20261215L)
    var pushedSeen = 0
    (1 to 15).foreach { tree =>
      val (root, model) = buildTree(rnd)
      (1 to 3).foreach { combo =>
        val (groupCol, keyOf): (String, E => Any) =
          if (rnd.nextBoolean()) ("parent_directory", _.parent)
          else ("is_folder", _.isFolder)
        val nF = rnd.nextInt(3)
        val filters = Seq.fill(nF)(genFilter(rnd, model))
        val nA = 1 + rnd.nextInt(3)
        val aggs = (0 until nA).map(genAgg(rnd, _))
        val filtered = model.filter(e => filters.forall(_._2(e)))
        val expect: Map[Any, Seq[Long]] = filtered.groupBy(keyOf)
          .map { case (k, g) => k -> aggs.map(_._2(g.toSeq)).toSeq }
        val minParts = Seq("1", "2", "7", "64")(rnd.nextInt(4))
        var df = spark.read.format("graft-inventory").option("root", root)
          .option("minPartitions", minParts).load()
        filters.foreach { case (c, _) => df = df.filter(c) }
        val q = df.groupBy(col(groupCol))
          .agg(aggs.head._1, aggs.tail.map(_._1): _*)
        InventoryDataSource.rowsEmitted.set(0L)
        val got = q.collect().map { r =>
          r.get(0) -> (1 to nA).map(i => r.getLong(i)).toSeq
        }.toMap
        val emitted = InventoryDataSource.rowsEmitted.get()
        assert(got == expect,
          s"tree=$tree combo=$combo group=$groupCol minParts=$minParts nF=$nF\n" +
            s"missing=${expect.toSet -- got.toSet}\nextra=${got.toSet -- expect.toSet}")
        // the plan must actually push (Spark only skips when a residual
        // filter blocks it — never here, every filter shape is exact)
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("PushedAggregation"),
          s"tree=$tree combo=$combo: aggregation not pushed\n${plan.take(800)}")
        pushedSeen += 1
        // partial bound: never one row per matching file. Partials are
        // per (partition-group, group-key); 64 round-robin groups over a
        // ≤ ~100-entry tree can split every key across many groups, so
        // bound by groups × keys (and the trivial all-rows bound).
        val nKeys = expect.size.toLong
        val bound = math.min(filtered.size.toLong, 64L * math.max(nKeys, 1L))
        assert(emitted <= bound,
          s"tree=$tree combo=$combo: emitted $emitted partials for " +
            s"${filtered.size} matching entries across $nKeys keys")
      }
    }
    assert(pushedSeen == 45, s"expected 45 pushed combos, saw $pushedSeen")
  }
}
