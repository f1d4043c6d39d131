package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{CopyExecutor, FileOps, HadoopFileOps}
import graft.fixtures.RefFixtures
import graft.operators.PackingOps

/** copy/ACL executor over local FS: phase ordering, parallel fan-out,
  * per-item quarantine (ops 9-15, 32-34). */
class CopyExecutorSpec extends AnyFunSuite {

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
