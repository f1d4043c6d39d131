package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (fixed-seed, reproducible) differential test of the
  * graft-inventory DSv2 source's EXACTNESS contract: for arbitrary trees
  * and arbitrary conjunctions of pushable filter shapes — name prefix,
  * parent_directory prefix/equality/IN, is_folder equality, length and
  * mtime ranges — composed with arbitrary minPartitions fan-out floors,
  * the scan must return EXACTLY the rows a reference evaluator computes
  * over the in-memory tree model, and `rowsEmitted` must equal that count
  * (every filter claimed exact ⇒ zero residual re-evaluation, so a single
  * leaked or dropped row is a contract violation, not a perf wobble).
  * This is the interplay surface the single-shape specs can't cover:
  * descent pruning × per-entry matching × folder-vs-file semantics ×
  * partition splitting, under 75 random combinations.
  */
class InventoryPropertySpec extends AnyFunSuite {

  private case class Entry(name: String, parent: String, isFolder: Boolean,
      length: Long, mtimeMs: Long,
      owner: String = "graft", grp: String = "graft", perms: String = "")

  /** build a random tree on disk; returns (root, model rows) */
  private def buildTree(rnd: scala.util.Random): (String, Seq[Entry]) = {
    val root = Files.createTempDirectory("graft-prop").toString
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    val dirMtimes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

    def gen(dir: String, depth: Int): Unit = {
      val nFiles = rnd.nextInt(5)
      (0 until nFiles).foreach { i =>
        val nm = s"f${rnd.nextInt(100)}-$i.${if (rnd.nextBoolean()) "dat" else "tmp"}"
        val rel = if (dir == "/") s"/$nm" else s"$dir/$nm"
        val len = rnd.nextInt(101).toLong
        val mt = rnd.nextInt(21).toLong * 1000L
        val p = Paths.get(root + rel)
        Files.write(p, new Array[Byte](len.toInt))
        Files.setLastModifiedTime(p, FileTime.fromMillis(mt))
        entries += Entry(rel, dir, isFolder = false, len, mt)
      }
      if (depth < 3) {
        val nDirs = rnd.nextInt(4)
        (0 until nDirs).foreach { i =>
          val nm = s"d${rnd.nextInt(50)}-$i"
          val rel = if (dir == "/") s"/$nm" else s"$dir/$nm"
          Files.createDirectories(Paths.get(root + rel))
          val mt = rnd.nextInt(21).toLong * 1000L
          entries += Entry(rel, dir, isFolder = true, 0L, mt)
          dirMtimes += ((rel, mt))
          gen(rel, depth + 1)
        }
      }
    }
    gen("/", 0)
    // dir mtimes LAST (child creation bumps parents), deepest-first so a
    // parent's stamp isn't re-bumped by touching its children
    dirMtimes.sortBy(-_._1.length).foreach { case (rel, mt) =>
      Files.setLastModifiedTime(Paths.get(root + rel), FileTime.fromMillis(mt))
    }
    Files.setLastModifiedTime(Paths.get(root), FileTime.fromMillis(0L))
    (root, entries.toSeq)
  }

  /** one random pushable predicate as (Column, model evaluator) */
  private def genPred(rnd: scala.util.Random,
      model: Seq[Entry]): (Column, Entry => Boolean) = {
    def anyName(): String =
      if (model.isEmpty || rnd.nextInt(4) == 0) "/zz" + rnd.nextInt(10)
      else model(rnd.nextInt(model.size)).name
    def anyDir(): String = {
      val dirs = "/" +: model.filter(_.isFolder).map(_.name)
      dirs(rnd.nextInt(dirs.size))
    }
    rnd.nextInt(8) match {
      case 0 =>
        val p = anyName().take(1 + rnd.nextInt(8))
        (col("name").startsWith(p), e => e.name.startsWith(p))
      case 1 =>
        val d = anyDir()
        (col("parent_directory") === d, e => e.parent == d)
      case 2 =>
        val ds = Seq.fill(1 + rnd.nextInt(3))(anyDir()).distinct
        (col("parent_directory").isin(ds: _*), e => ds.contains(e.parent))
      case 3 =>
        val p = anyDir().take(1 + rnd.nextInt(6))
        (col("parent_directory").startsWith(p), e => e.parent.startsWith(p))
      case 4 =>
        val want = rnd.nextBoolean()
        (if (want) col("is_folder") === true else !col("is_folder"),
          e => e.isFolder == want)
      case 5 =>
        val x = rnd.nextInt(101).toLong
        if (rnd.nextBoolean()) (col("length") >= x, e => e.length >= x)
        else (col("length") < x, e => e.length < x)
      case 6 =>
        val t = rnd.nextInt(21).toLong * 1000L
        if (rnd.nextBoolean()) (col("mtime_ms") >= t, e => e.mtimeMs >= t)
        else (col("mtime_ms") <= t, e => e.mtimeMs <= t)
      case _ =>
        val nm = anyName()
        (col("name") === nm, e => e.name == nm)
    }
  }

  test("random trees × random exact-filter conjunctions × random fan-out: scan ≡ model, zero residual rows") {
    val spark = TestSpark.spark
    import graft.sources.InventoryDataSource
    val rnd = new scala.util.Random(20260815L) // fixed seed: reproducible
    (1 to 25).foreach { tree =>
      val (root, model) = buildTree(rnd)
      (1 to 3).foreach { combo =>
        val nPreds = 1 + rnd.nextInt(3)
        val preds = Seq.fill(nPreds)(genPred(rnd, model))
        val cond = preds.map(_._1).reduce(_ && _)
        val expect = model.filter(e => preds.forall(_._2(e)))
          .map(e => (e.name, e.parent, e.isFolder, e.length, e.mtimeMs)).toSet
        val minParts = Seq("1", "2", "7", "64")(rnd.nextInt(4))
        InventoryDataSource.rowsEmitted.set(0L)
        val got = spark.read.format("graft-inventory").option("root", root)
          .option("minPartitions", minParts).load()
          // project away the ownership trio: local-FS trees surface the
          // process owner (environment-dependent), and pruning must keep
          // the walk from materializing it at all
          .select("name", "parent_directory", "is_folder", "length", "mtime_ms")
          .filter(cond)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(got == expect,
          s"tree=$tree combo=$combo minParts=$minParts cond=$cond\n" +
            s"missing=${expect -- got}\nextra=${got -- expect}")
        assert(InventoryDataSource.rowsEmitted.get() == expect.size.toLong,
          s"tree=$tree combo=$combo: exactness violated — emitted " +
            s"${InventoryDataSource.rowsEmitted.get()} for ${expect.size} " +
            s"result rows (residual re-evaluation would hide wrong rows); cond=$cond")
      }
    }
  }

  /** one random OWNERSHIP predicate (owner/grp/perms equality or IN) as
    * (Column, model evaluator) — the r11 pushdown family */
  private def genOwnerPred(rnd: scala.util.Random, owners: Seq[String],
      grps: Seq[String], perms: Seq[String]): (Column, Entry => Boolean) =
    rnd.nextInt(4) match {
      case 0 =>
        val o = owners(rnd.nextInt(owners.size))
        (col("owner") === o, e => e.owner == o)
      case 1 =>
        val os = Seq.fill(1 + rnd.nextInt(2))(owners(rnd.nextInt(owners.size))).distinct
        (col("owner").isin(os: _*), e => os.contains(e.owner))
      case 2 =>
        val g = grps(rnd.nextInt(grps.size))
        (col("grp") === g, e => e.grp == g)
      case _ =>
        val p = perms(rnd.nextInt(perms.size))
        (col("perms") === p, e => e.perms == p)
    }

  test("random graftfs trees × random ownership+path conjunctions: scan ≡ model, zero residual rows") {
    val spark = TestSpark.spark
    import graft.sources.InventoryDataSource
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.fs.permission.FsPermission
    val rnd = new scala.util.Random(20260911L) // fixed seed: reproducible
    val owners = Seq("alice", "bob", "carol", "dave")
    val grps = Seq("eng", "ops", "research")
    val permChoices = Seq("rw-r--r--", "rwxr-x---", "rw-------")
    (1 to 10).foreach { tree =>
      // a random LOCAL tree mounted as a graftfs account (the backing-dir
      // binding), so ownership lives in the store's per-directory records
      val (backing, model0) = buildTree(rnd)
      val acct = s"prop$tree" + java.lang.Long.toUnsignedString(
        backing.hashCode.toLong & 0xffffffffL)
      val hc = Map(
        "fs.graftfs.impl" -> "graft.exec.GraftFsFileSystem",
        s"fs.graftfs.root.$acct" -> backing,
        "fs.graftfs.token.provider" -> "graft.exec.CountingTokenProvider")
      val conf = new org.apache.hadoop.conf.Configuration()
      hc.foreach { case (k, v) => conf.set(k, v) }
      val rootUri = s"graftfs://$acct/"
      val fs = new Path(rootUri).getFileSystem(conf)
      // random ownership on ~half the entries; the rest keep store defaults
      val model = model0.map { e =>
        if (rnd.nextInt(2) == 0) {
          val o = owners(rnd.nextInt(owners.size))
          val g = grps(rnd.nextInt(grps.size))
          val p = permChoices(rnd.nextInt(permChoices.size))
          fs.setOwner(new Path(rootUri.stripSuffix("/") + e.name), o, g)
          fs.setPermission(new Path(rootUri.stripSuffix("/") + e.name),
            FsPermission.valueOf((if (e.isFolder) "d" else "-") + p))
          e.copy(owner = o, grp = g, perms = p)
        } else e.copy(perms = if (e.isFolder) "rwxr-xr-x" else "rw-r--r--")
      }
      // sidecar writes bumped parent-dir mtimes: re-stamp dirs from the
      // model, deepest-first (the buildTree trick), root back to 0
      model.filter(_.isFolder).sortBy(-_.name.length).foreach { d =>
        Files.setLastModifiedTime(Paths.get(backing + d.name),
          FileTime.fromMillis(d.mtimeMs))
      }
      Files.setLastModifiedTime(Paths.get(backing), FileTime.fromMillis(0L))
      (1 to 3).foreach { combo =>
        val nPreds = 1 + rnd.nextInt(3)
        val preds = Seq.fill(nPreds)(
          if (rnd.nextBoolean()) genOwnerPred(rnd, owners, grps, permChoices)
          else genPred(rnd, model))
        val cond = preds.map(_._1).reduce(_ && _)
        val expect = model.filter(e => preds.forall(_._2(e)))
          .map(e => (e.name, e.isFolder, e.length, e.mtimeMs, e.owner, e.grp, e.perms))
          .toSet
        val minParts = Seq("1", "2", "7")(rnd.nextInt(3))
        InventoryDataSource.rowsEmitted.set(0L)
        val got = hc.foldLeft(spark.read.format("graft-inventory")
          .option("root", rootUri).option("minPartitions", minParts)) {
          case (r, (k, v)) => r.option("hadoop." + k, v)
        }.load()
          .select("name", "is_folder", "length", "mtime_ms", "owner", "grp", "perms")
          .filter(cond)
          .collect()
          .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2), r.getLong(3),
            r.getString(4), r.getString(5), r.getString(6))).toSet
        assert(got == expect,
          s"tree=$tree combo=$combo minParts=$minParts cond=$cond\n" +
            s"missing=${expect -- got}\nextra=${got -- expect}")
        assert(InventoryDataSource.rowsEmitted.get() == expect.size.toLong,
          s"tree=$tree combo=$combo: ownership exactness violated — emitted " +
            s"${InventoryDataSource.rowsEmitted.get()} for ${expect.size} rows; cond=$cond")
      }
    }
  }
}
