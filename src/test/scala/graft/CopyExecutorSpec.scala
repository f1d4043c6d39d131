package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{CopyExecutor, FileOps, HadoopFileOps}
import graft.fixtures.RefFixtures
import graft.operators.PackingOps

/** Shared call recorder for [[TracingFileOps]] — static so executor-thread
  * calls (same JVM in local mode) land in one ordered queue. */
object CallTrace {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = calls.clear()
  def list: List[String] = {
    val it = calls.iterator(); val b = List.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

/** Decorator that records every FileOps verb in arrival order. */
final class TracingFileOps(inner: FileOps) extends FileOps {
  override def mkdirs(path: String): Boolean = {
    CallTrace.calls.add(s"mkdir:$path"); inner.mkdirs(path)
  }
  override def exists(path: String): Boolean = inner.exists(path)
  override def write(path: String, content: Array[Byte]): Unit =
    inner.write(path, content)
  override def read(path: String): Array[Byte] = inner.read(path)
  override def setOwnership(p: String, o: String, g: String, m: String): Unit =
    inner.setOwnership(p, o, g, m)
  override def length(path: String): Long = inner.length(path)
  override def readRange(path: String, offset: Long, len: Int): Array[Byte] = {
    CallTrace.calls.add(s"readRange:$path:$offset:$len")
    inner.readRange(path, offset, len)
  }
  override def createFile(path: String): Unit = {
    CallTrace.calls.add(s"create:$path"); inner.createFile(path)
  }
  override def append(path: String, offset: Long, data: Array[Byte]): Unit = {
    CallTrace.calls.add(s"append:$path:$offset:${data.length}")
    inner.append(path, offset, data)
  }
  override def flush(path: String, totalLen: Long): Unit = {
    CallTrace.calls.add(s"flush:$path:$totalLen"); inner.flush(path, totalLen)
  }
}

/** copy/ACL executor over local FS: phase ordering, parallel fan-out,
  * per-item quarantine (ops 9-15, 32-34). */
class CopyExecutorSpec extends AnyFunSuite with CacheDrained {

  test("copyInventory creates dirs before files, writes acl sidecars") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-copy").toString
    val inv = RefFixtures.inventory(spark, TestSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("name")
        .startsWith("/data/part=1/") or
        org.apache.spark.sql.functions.col("name") === "/data/part=1")
    val ops = new HadoopFileOps(s"file://$tmp")
    val results = CopyExecutor.copyInventory(spark, inv, ops, parallelism = 4)
    val byStatus = results.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("failed", 0L) == 0L)
    assert(byStatus("ok") == inv.count())
    // a file and its acl sidecar both exist
    val sample = inv.filter(!org.apache.spark.sql.functions.col("is_folder"))
      .select("name").first().getString(0)
    assert(ops.exists(sample))
    assert(ops.exists(sample + ".acl"))
  }

  test("chunked copy loop: ranged read -> append at offset -> flush, byte-identical (op 5)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val srcRoot = Files.createTempDirectory("graft-chunk-src").toString
    val dstRoot = Files.createTempDirectory("graft-chunk-dst").toString
    val srcOps = new HadoopFileOps(s"file://$srcRoot")
    // destination is the cloud-shaped scheme: create/append/flush flow
    // through GraftFsFileSystem exactly as an abfss:// binding would
    val conf = Map(
      "fs.graftfs.impl" -> "graft.exec.GraftFsFileSystem",
      "fs.graftfs.root.chunkacct" -> dstRoot,
      "fs.graftfs.token.provider" -> "graft.exec.CountingTokenProvider")
    val dstOps = new TracingFileOps(new HadoopFileOps("graftfs://chunkacct", conf))

    val bs = 256 * 1024L // scaled-down block, same loop as the 20 MiB production constant
    val rnd = new scala.util.Random(42)
    // ragged multi-chunk, exact-multiple, and empty files
    val sizes = Map("/big/a.bin" -> (4 * bs + 1).toInt, "/big/b.bin" -> (2 * bs).toInt,
      "/big/empty.bin" -> 0)
    val content = sizes.map { case (n, len) =>
      val buf = new Array[Byte](len); rnd.nextBytes(buf); n -> buf
    }
    content.foreach { case (n, buf) => srcOps.write(n, buf) }

    val inv = (("/big", "/", true, 0L) +: sizes.toSeq.map { case (n, len) =>
      (n, "/big", false, len.toLong)
    }).toDF("name", "parent_directory", "is_folder", "length")
      .withColumn("owner", org.apache.spark.sql.functions.lit("u"))
      .withColumn("grp", org.apache.spark.sql.functions.lit("g"))
      .withColumn("perms", org.apache.spark.sql.functions.lit("rw-r--r--"))

    CallTrace.reset()
    val results = CopyExecutor.copyInventory(spark, inv, dstOps, parallelism = 2,
      source = Some(srcOps), blockSize = bs)
    val byName = results.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byName.values.forall(_._1 == "ok"), s"failures: $byName")
    assert(byName("/big/a.bin")._2 == "file chunks=5")
    assert(byName("/big/b.bin")._2 == "file chunks=2")
    assert(byName("/big/empty.bin")._2 == "file chunks=0")

    // byte-identical content landed through the append-at-offset path
    content.foreach { case (n, buf) =>
      assert(java.util.Arrays.equals(dstOps.read(n), buf), s"content mismatch for $n")
    }

    // per-chunk call trace: create, then appends at exactly the chunk_plan
    // offsets with ragged tail, then one flush at the total length
    val trace = CallTrace.list
    val a = trace.filter(_.contains("/big/a.bin"))
    assert(a.head == "create:/big/a.bin")
    assert(a.filter(_.startsWith("append")) == Seq(
      s"append:/big/a.bin:0:${bs.toInt}", s"append:/big/a.bin:$bs:${bs.toInt}",
      s"append:/big/a.bin:${2 * bs}:${bs.toInt}", s"append:/big/a.bin:${3 * bs}:${bs.toInt}",
      s"append:/big/a.bin:${4 * bs}:1"))
    assert(a.last == s"flush:/big/a.bin:${4 * bs + 1}")
    val e = trace.filter(_.contains("/big/empty.bin"))
    assert(e == Seq("create:/big/empty.bin", "flush:/big/empty.bin:0"))
  }

  test("dirs phase is distributed per depth level: parents before children, no driver collect of dirs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-depth").toString
    val ops = new TracingFileOps(new HadoopFileOps(s"file://$tmp"))
    // 4-level tree with siblings at every level
    val dirNames = Seq("/a", "/b",
      "/a/x", "/a/y", "/b/x",
      "/a/x/1", "/a/y/1", "/b/x/1",
      "/a/x/1/deep", "/b/x/1/deep")
    val inv = dirNames.map { n =>
      val parent = n.substring(0, n.lastIndexOf('/')) match { case "" => "/"; case s => s }
      (n, parent, true, 0L)
    }.toDF("name", "parent_directory", "is_folder", "length")
      .withColumn("owner", org.apache.spark.sql.functions.lit("u"))
      .withColumn("grp", org.apache.spark.sql.functions.lit("g"))
      .withColumn("perms", org.apache.spark.sql.functions.lit("rwxr-xr-x"))
    CallTrace.reset()
    val results = CopyExecutor.copyInventory(spark, inv, ops, parallelism = 3)
    assert(results.filter(org.apache.spark.sql.functions.col("status") =!= "ok").count() == 0)
    val mkdirs = CallTrace.list.filter(_.startsWith("mkdir:")).map(_.stripPrefix("mkdir:"))
    assert(mkdirs.toSet == dirNames.toSet)
    // every child's mkdir arrives after its parent's (per-level action barrier)
    dirNames.filter(_.count(_ == '/') > 1).foreach { child =>
      val parent = child.substring(0, child.lastIndexOf('/'))
      assert(mkdirs.indexOf(parent) < mkdirs.indexOf(child),
        s"$parent not created before $child: $mkdirs")
    }
  }

  test("per-item failures are quarantined, not fatal (op 34)") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-copy2").toString
    val inner = new HadoopFileOps(s"file://$tmp")
    val flaky: FileOps = new FileOps {
      override def mkdirs(path: String): Boolean = inner.mkdirs(path)
      override def exists(path: String): Boolean = inner.exists(path)
      override def write(path: String, content: Array[Byte]): Unit = {
        if (path.endsWith("1.dat")) sys.error(s"injected failure for $path")
        inner.write(path, content)
      }
      override def read(path: String): Array[Byte] = inner.read(path)
      override def setOwnership(p: String, o: String, g: String, m: String): Unit =
        inner.setOwnership(p, o, g, m)
    }
    val inv = RefFixtures.inventory(spark, TestSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("parent_directory") === "/data/part=2" or
        org.apache.spark.sql.functions.col("name") === "/data/part=2")
    val results = CopyExecutor.copyInventory(spark, inv, flaky, parallelism = 2)
    val failed = results.filter(org.apache.spark.sql.functions.col("status") === "failed")
    assert(failed.count() > 0) // some names end in 1.dat
    assert(results.count() == inv.count()) // nothing dropped, nothing hung
  }

  test("copy pipeline runs against a cloud-shaped scheme with config-driven auth (ops 35-36)") {
    val spark = TestSpark.spark
    val backing = Files.createTempDirectory("graft-abfs").toString
    graft.exec.CountingTokenProvider.fetches.set(0)
    // per-account binding + token provider flow through the Hadoop
    // Configuration, exactly like fs.azure.account.key.<acct> /
    // fs.azure.sas.token.provider.type for a real abfss:// target
    val conf = Map(
      "fs.graftfs.impl" -> "graft.exec.GraftFsFileSystem",
      "fs.graftfs.root.testacct" -> backing,
      "fs.graftfs.token.provider" -> "graft.exec.CountingTokenProvider")
    val inv = RefFixtures.inventory(spark, TestSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("name")
        .startsWith("/data/part=3/") or
        org.apache.spark.sql.functions.col("name") === "/data/part=3")
    val ops = new HadoopFileOps("graftfs://testacct", conf)
    val results = CopyExecutor.copyInventory(spark, inv, ops, parallelism = 4)
    val byStatus = results.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("failed", 0L) == 0L)
    assert(byStatus("ok") == inv.count())
    // bytes actually landed in the account's backing store
    val sample = inv.filter(!org.apache.spark.sql.functions.col("is_folder"))
      .select("name").first().getString(0)
    assert(ops.exists(sample) && ops.exists(sample + ".acl"))
    assert(Files.exists(java.nio.file.Paths.get(backing + sample)))
    // auth amortization: many files copied, ONE token fetch (the Hadoop
    // FileSystem cache reuses the authenticated instance across all tasks
    // of this JVM — at cluster scale, one fetch per executor)
    assert(graft.exec.CountingTokenProvider.fetches.get() == 1,
      s"expected 1 token fetch, got ${graft.exec.CountingTokenProvider.fetches.get()}")
  }

  test("async per-unit fan-out keeps N unit jobs in flight concurrently (op 37)") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-async").toString
    val inner = new HadoopFileOps(s"file://$tmp")
    val slow: FileOps = new FileOps { // pace writes so overlap is observable
      override def mkdirs(path: String): Boolean = inner.mkdirs(path)
      override def exists(path: String): Boolean = inner.exists(path)
      override def write(path: String, content: Array[Byte]): Unit = {
        Thread.sleep(5); inner.write(path, content)
      }
      override def read(path: String): Array[Byte] = inner.read(path)
      override def setOwnership(p: String, o: String, g: String, m: String): Unit =
        inner.setOwnership(p, o, g, m)
    }
    val assignments = SparkEntry.queries("pack_nextfit")(spark, TestSpark.Sf)
      .filter(org.apache.spark.sql.functions.col("unit").between(1, 6))
    val runs = CopyExecutor.copyUnitsAsync(spark, assignments, slow, maxInFlight = 3)
    assert(runs.map(_.nPaths).sum == assignments.count())
    runs.foreach(r => assert(r.nPaths > 0))
    val overlaps = runs.combinations(2).count {
      case Seq(a, b) => a.startMs < b.endMs && b.startMs < a.endMs
      case _ => false
    }
    assert(overlaps > 0, s"no unit jobs overlapped: $runs")
  }

  test("partitioned filelist write: one directory per unit, no unit 0 (op 14/20)") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-filelists").toString
    val assignments = SparkEntry.queries("pack_nextfit")(spark, TestSpark.Sf)
    CopyExecutor.writeFilelists(assignments, tmp)
    val unitDirs = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("unit="))
    val expected = assignments
      .filter(org.apache.spark.sql.functions.col("unit") =!= 0)
      .select("unit").distinct().count()
    assert(unitDirs.length == expected)
    assert(!unitDirs.exists(_.getName == "unit=0"))
    val _ = PackingOps.Capacity
  }
}
