package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the recursive file-inventory scan (§2 op 1/4 as a
  * first-class Spark SOURCE instead of a pre-built frame): every file and
  * folder under `root` as rows (name, parent_directory, is_folder,
  * length, mtime_ms), read with
  *
  *   spark.read.format("graft-inventory").option("root", dir).load()
  *
  * The V2 interfaces are where the 100 TB story lives:
  *
  *  - `SupportsPushDownFilters`: a `parent_directory STARTS WITH p`
  *    predicate prunes the TREE WALK itself — partitions whose subtree
  *    cannot intersect the prefix are never listed (the reference's
  *    "pruned recursion" usage scan, generate-file-list.py:28-31, expressed
  *    as a pushdown instead of a bespoke walker). `is_folder` equality
  *    and `length` range filters evaluate during the walk, before rows
  *    reach Spark. Remaining predicates stay in the plan (the contract:
  *    pushdown is an optimization, never a semantics change).
  *  - `SupportsPushDownRequiredColumns`: readers materialize only the
  *    projected columns (ReadSchema in the plan shows the pruned struct).
  *  - one `InputPartition` per top-level child of `root` (+ one for the
  *    root's own files): the recursive listing fans out across the
  *    cluster exactly like the reference's parallel scan, and partition
  *    planning itself lists only ONE directory on the driver.
  *
  * Hadoop-FS-backed, so file://, hdfs://, abfss:// and the test
  * graftfs:// scheme all work; `hadoop.`-prefixed options travel to the
  * executor-side Configuration (the HadoopFileOps channel).
  */
final class InventoryDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-inventory"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    InventoryDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = properties.get("root")
    require(root != null && root.nonEmpty, "graft-inventory requires .option(\"root\", dir)")
    val hadoopConf = properties.asScala.toMap
      .collect { case (k, v) if k.startsWith("hadoop.") => k.stripPrefix("hadoop.") -> v }
    new InventoryTable(root, hadoopConf)
  }
}

object InventoryDataSource {
  val Schema: StructType = new StructType()
    .add("name", StringType, nullable = false)
    .add("parent_directory", StringType, nullable = false)
    .add("is_folder", BooleanType, nullable = false)
    .add("length", LongType, nullable = false)
    .add("mtime_ms", LongType, nullable = false)

  /** directories actually listed across all readers — the observable the
    * pushdown spec pins (subtree pruning must shrink this, not just the
    * row count). Test hook only; one JVM in local mode. */
  val dirsListed = new AtomicLong(0L)
}

private final class InventoryTable(root: String, hadoopConf: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-inventory($root)"
  override def schema(): StructType = InventoryDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new InventoryScanBuilder(root, hadoopConf)

  /** the WRITE path: a frame of (name, parent_directory, is_folder,
    * length[, mtime_ms]) rows MATERIALIZES the tree under root — mkdirs
    * for folder rows, zero-filled files of `length` bytes for file rows
    * (the CopyExecutor mkdir+create phases as a V2 sink). Each task
    * writes its partition directly through the Hadoop FS (same fan-out
    * as the executor copy loop); creation is idempotent, so task retries
    * are safe and commit is a no-op. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    Seq("name", "is_folder", "length").foreach(c =>
      require(s.fieldNames.contains(c),
        s"graft-inventory write needs column $c (got ${s.fieldNames.mkString(",")})"))
    val (ni, fi, li) =
      (s.fieldIndex("name"), s.fieldIndex("is_folder"), s.fieldIndex("length"))
    val r = root; val hc = hadoopConf
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
            InventoryWriterFactory(r, hc, ni, fi, li)
          override def commit(messages: Array[WriterCommitMessage]): Unit = ()
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
  }
}

private final case class InventoryWriterFactory(root: String,
    hadoopConf: Map[String, String], nameIdx: Int, folderIdx: Int, lenIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new InventoryWriter(root, hadoopConf, nameIdx, folderIdx, lenIdx)
}

private final case class InventoryCommit() extends WriterCommitMessage

private final class InventoryWriter(root: String, hadoopConf: Map[String, String],
    nameIdx: Int, folderIdx: Int, lenIdx: Int) extends DataWriter[InternalRow] {
  private val conf = InventoryScan.configuration(hadoopConf)
  private val fs = new Path(root).getFileSystem(conf)
  private val rootPath = fs.makeQualified(new Path(root))

  private def abs(rel: String): Path = new Path(rootPath, rel.stripPrefix("/"))

  override def write(row: InternalRow): Unit = {
    val rel = row.getUTF8String(nameIdx).toString
    if (row.getBoolean(folderIdx)) { fs.mkdirs(abs(rel)); () }
    else {
      val out = fs.create(abs(rel), true)
      try {
        val n = row.getLong(lenIdx)
        val chunk = new Array[Byte](math.min(n, 65536L).toInt)
        var left = n
        while (left > 0) {
          val k = math.min(left, chunk.length.toLong).toInt
          out.write(chunk, 0, k); left -= k
        }
      } finally out.close()
    }
  }

  override def commit(): WriterCommitMessage = InventoryCommit()
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

private final class InventoryScanBuilder(root: String, hadoopConf: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = InventoryDataSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case StringStartsWith("parent_directory", _) => true
      case EqualTo("is_folder", _: java.lang.Boolean) => true
      case GreaterThan("length", _: java.lang.Long) => true
      case GreaterThanOrEqual("length", _: java.lang.Long) => true
      case LessThan("length", _: java.lang.Long) => true
      case LessThanOrEqual("length", _: java.lang.Long) => true
      case _ => false
    }
    pushed = accepted
    // hand EVERYTHING back as residual: the source prunes work with the
    // accepted filters but never claims exactness for them — Spark keeps
    // the authoritative evaluation (mirrors parquet's conservative model)
    rejected ++ accepted
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = InventoryScan(root, hadoopConf, pushed, required)
}

private final case class InventoryScan(root: String, hadoopConf: Map[String, String],
    pushed: Array[Filter], required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-inventory root=$root PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  private def prefixFilter: Option[String] = pushed.collectFirst {
    case StringStartsWith("parent_directory", p) => p
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = InventoryScan.configuration(hadoopConf)
    val fs = new Path(root).getFileSystem(conf)
    val rootPath = fs.makeQualified(new Path(root))
    InventoryDataSource.dirsListed.incrementAndGet()
    val children = fs.listStatus(rootPath)
    val prefix = prefixFilter
    // a subtree rooted at dir D can only contain parent_directory values
    // with prefix D — compatible with `starts with p` iff one of the two
    // strings is a prefix of the other
    def compatible(dir: String): Boolean = prefix.forall(p =>
      dir.startsWith(p) || p.startsWith(dir))
    val subtrees = children.filter(_.isDirectory)
      .map(st => InventoryScan.relative(rootPath, st.getPath))
      .filter(compatible)
      .map(d => InventoryPartition(d, ownFilesOnly = false))
    // the root's immediate files belong to parent_directory "/"
    val rootFiles =
      if (prefix.forall(p => "/".startsWith(p) || p.startsWith("/")))
        Array(InventoryPartition("/", ownFilesOnly = true))
      else Array.empty[InventoryPartition]
    (rootFiles ++ subtrees).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val r = root; val hc = hadoopConf; val p = pushed; val req = required
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new InventoryReader(r, hc, p, req,
          partition.asInstanceOf[InventoryPartition])
    }
  }
}

private object InventoryScan {
  def configuration(extra: Map[String, String]): Configuration = {
    val c = new Configuration()
    extra.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** path relative to the inventory root, leading slash, no trailing */
  def relative(root: Path, p: Path): String = {
    val r = root.toUri.getPath
    val full = p.toUri.getPath
    val rel = full.stripPrefix(r)
    if (rel.isEmpty) "/" else if (rel.startsWith("/")) rel else "/" + rel
  }
}

private final case class InventoryPartition(startDir: String, ownFilesOnly: Boolean)
    extends InputPartition

/** depth-first walk of one subtree, emitting rows lazily; pushed filters
  * prune descent (prefix) and drop entries (is_folder / length) before a
  * row is ever built */
private final class InventoryReader(root: String, hadoopConf: Map[String, String],
    pushed: Array[Filter], required: StructType, part: InventoryPartition)
    extends PartitionReader[InternalRow] {

  private val conf = InventoryScan.configuration(hadoopConf)
  private val fs: FileSystem = new Path(root).getFileSystem(conf)
  private val rootPath = fs.makeQualified(new Path(root))

  private val prefix = pushed.collectFirst {
    case StringStartsWith("parent_directory", p) => p
  }
  private val folderEq = pushed.collectFirst {
    case EqualTo("is_folder", b: java.lang.Boolean) => b.booleanValue()
  }
  private val lenPred: Long => Boolean = {
    val preds = pushed.collect {
      case GreaterThan("length", v: java.lang.Long) => (x: Long) => x > v
      case GreaterThanOrEqual("length", v: java.lang.Long) => (x: Long) => x >= v
      case LessThan("length", v: java.lang.Long) => (x: Long) => x < v
      case LessThanOrEqual("length", v: java.lang.Long) => (x: Long) => x <= v
    }
    x => preds.forall(_(x))
  }

  private def dirCompatible(dir: String): Boolean =
    prefix.forall(p => dir.startsWith(p) || p.startsWith(dir))
  private def dirMatches(dir: String): Boolean = prefix.forall(dir.startsWith)

  // (name, parent, isFolder, length, mtime)
  private val stack = scala.collection.mutable.Stack[String](part.startDir)
  private var queued: List[(String, String, Boolean, Long, Long)] = Nil
  private var current: (String, String, Boolean, Long, Long) = _

  private def abs(rel: String): Path =
    if (rel == "/") rootPath else new Path(rootPath, rel.stripPrefix("/"))

  private def fill(): Unit = {
    while (queued.isEmpty && stack.nonEmpty) {
      val dir = stack.pop()
      InventoryDataSource.dirsListed.incrementAndGet()
      val entries = fs.listStatus(abs(dir))
      val emitHere = dirMatches(dir)
      val rows = scala.collection.mutable.ListBuffer.empty[(String, String, Boolean, Long, Long)]
      entries.foreach { st =>
        val rel = InventoryScan.relative(rootPath, st.getPath)
        if (st.isDirectory) {
          if (!part.ownFilesOnly && dirCompatible(rel)) stack.push(rel)
          if (emitHere && folderEq.forall(_ == true) && lenPred(0L))
            rows += ((rel, dir, true, 0L, st.getModificationTime))
        } else if (emitHere && folderEq.forall(_ == false) && lenPred(st.getLen)) {
          rows += ((rel, dir, false, st.getLen, st.getModificationTime))
        }
      }
      queued = rows.toList
    }
  }

  override def next(): Boolean = {
    fill()
    queued match {
      case h :: t => current = h; queued = t; true
      case Nil => false
    }
  }

  override def get(): InternalRow = {
    val vals = required.fields.map(_.name).map[Any] {
      case "name" => UTF8String.fromString(current._1)
      case "parent_directory" => UTF8String.fromString(current._2)
      case "is_folder" => current._3
      case "length" => current._4
      case "mtime_ms" => current._5
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = ()
}
