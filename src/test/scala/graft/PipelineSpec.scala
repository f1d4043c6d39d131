package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{CopyExecutor, HadoopFileOps}
import graft.operators.PackingOps

/** End-to-end replays of the reference's three entry points (SURVEY.md §3)
  * over the engine — what a user of the reference would actually run.
  */
class PipelineSpec extends AnyFunSuite with CacheDrained {

  test("§3.1 generate-file-list: scan → pack → partitioned filelists → validate") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-p31").toString
    // scan + allocate (exact first-fit) …
    val sizes = PackingOps.dirSizes(spark, TestSpark.Sf).orderBy("path")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val packed = PackingOps.firstFit(sizes, PackingOps.Capacity)
    import spark.implicits._
    val assignments = packed.toDF("path", "size", "unit")
    // … write one filelist per unit …
    CopyExecutor.writeFilelists(assignments, tmp)
    // … and re-read them as the distcp driver would (op 6 source)
    val unitDirs = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("unit="))
    assert(unitDirs.nonEmpty)
    val readBack = graft.sources.Sources
      .readFilelist(spark, s"$tmp/unit=*/").count()
    assert(readBack == packed.count(_._3 != 0L))
    // per-unit capacity invariant holds on what was written
    val overCap = assignments.filter(col("unit") =!= 0)
      .groupBy("unit").agg(sum("size").as("s"))
      .filter(col("s") > PackingOps.Capacity).count()
    assert(overCap == 0)
  }

  test("§3.2 copy-acls: acl scan → identity map → apply → verify applied spec") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-p32").toString
    val ops = new HadoopFileOps(s"file://$tmp")
    // mapped ACL specs from the registered operator
    val mapped = SparkEntry.queries("acl_map_entries_ho")(spark, TestSpark.Sf)
      .limit(100).collect()
    // apply phase: fan out setAccessControl per file (sidecar records)
    mapped.foreach { r =>
      ops.mkdirs(r.getString(0).reverse.dropWhile(_ != '/').reverse)
      ops.setOwnership(r.getString(0), "ignored", "ignored", r.getString(1))
    }
    // verify a sample round-trips and mapped identities were applied
    val sample = mapped.head
    val stored = new String(ops.read(sample.getString(0) + ".acl"), "UTF-8")
    assert(stored.endsWith(sample.getString(1)))
    assert(mapped.exists(_.getString(1).contains("@example.com")),
      "no identity was actually remapped")
    assert(mapped.forall(_.getString(1).split(",").length == 4))
  }

  test("pipeline_corpus_prep: funnel is monotone and stages agree with the standalone operators") {
    val spark = TestSpark.spark
    val f = SparkEntry.queries("pipeline_corpus_prep")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // monotone funnel: each gate can only drop documents
    assert(f("1_total") >= f("2_clean") && f("2_clean") >= f("3_dedup") &&
      f("3_dedup") >= f("4_decontam"),
      s"funnel not monotone: $f")
    assert(f.values.forall(_ > 0), s"a stage went to zero: $f")
    // the split partitions the decontaminated set exactly
    assert(f("5_train") + f("6_val") + f("7_test") == f("4_decontam"),
      s"split buckets do not partition the corpus: $f")
    // stage 2 equals corpus_clean's english-gate count (shared gate, no drift)
    val cc = SparkEntry.queries("corpus_clean")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("2_clean") == cc("3_english"),
      s"clean gate drifted from corpus_clean: ${f("2_clean")} vs ${cc("3_english")}")
    // packing emitted at least ceil(train_tokens / budget) sequences
    assert(f("8_sequences") > 0 && f("8_sequences") <= f("5_train"))
  }

  test("§3.3 copy-to-adls: inventory → dirs-then-files copy → chunk plan coverage") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft-p33").toString
    val ops = new HadoopFileOps(s"file://$tmp")
    val inv = graft.fixtures.RefFixtures.inventory(spark, TestSpark.Sf)
      .filter(col("parent_directory").isin("/data/part=3", "/data") &&
        (col("name").startsWith("/data/part=3") || col("name") === "/data/part=3"))
    val results = CopyExecutor.copyInventory(spark, inv, ops, parallelism = 4)
    assert(results.filter(col("status") =!= "ok").count() == 0)
    // every copied file exists with its ownership record
    inv.filter(!col("is_folder")).select("name").collect().foreach { r =>
      assert(ops.exists(r.getString(0)))
      assert(ops.exists(r.getString(0) + ".acl"))
    }
    // the chunk plan fully tiles each planned file (B5 invariant at the
    // pipeline level: Σ chunk_len == clen)
    val bad = SparkEntry.queries("chunk_plan")(spark, TestSpark.Sf)
      .groupBy("name")
      .agg(sum("chunk_len").as("covered"),
        max(col("chunk_off") + col("chunk_len")).as("end"))
      .filter(col("covered") =!= col("end")).count()
    assert(bad == 0)
  }
}
