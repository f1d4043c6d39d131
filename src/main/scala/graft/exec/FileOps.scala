package graft.exec

import java.io.Serializable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Side-effect boundary for the copy/ACL executors (SURVEY.md §7.1): the
  * reference's REST sinks (create+append+flush copy-to-adls.py:19-91,
  * setAccessControl copy-acls.py:35-46, metadata update
  * identity-mapper.py:17-33) are isolated behind this trait so the
  * relational core stays pure and oracle-checkable, and tests run against
  * the local filesystem. A production deployment binds it to ABFS via the
  * Hadoop FileSystem API — same calls, different scheme.
  */
trait FileOps extends Serializable {
  def mkdirs(path: String): Boolean
  def exists(path: String): Boolean
  /** create a file with content, overwriting (PUT + append + flush) */
  def write(path: String, content: Array[Byte]): Unit
  def read(path: String): Array[Byte]
  /** op 12 analogue: record owner/group/permissions for a path */
  def setOwnership(path: String, owner: String, group: String, perms: String): Unit
}

/** Hadoop-FileSystem-backed implementation; works for file://, hdfs://,
  * abfss:// alike. Scheme-specific settings (account keys, token
  * providers, mock-FS roots) travel as `conf` entries applied to the
  * Hadoop Configuration on each executor — the same channel
  * `fs.azure.account.key.<account>` / `fs.azure.sas.token.provider.type`
  * use for a real ADLS binding (MIGRATION.md §auth). Ownership set via
  * extended attributes would need a real ADLS endpoint, so ownership
  * records are written as sidecar files — observable by tests, same
  * fan-out shape as the REST calls. */
final class HadoopFileOps(root: String, conf: Map[String, String] = Map.empty)
    extends FileOps {
  @transient private lazy val fs: FileSystem = {
    val c = new Configuration()
    conf.foreach { case (k, v) => c.set(k, v) }
    new Path(root).getFileSystem(c)
  }

  private def p(path: String) = new Path(root + path)

  override def mkdirs(path: String): Boolean = fs.mkdirs(p(path))
  override def exists(path: String): Boolean = fs.exists(p(path))

  override def write(path: String, content: Array[Byte]): Unit = {
    val out = fs.create(p(path), true)
    try out.write(content) finally out.close()
  }

  override def read(path: String): Array[Byte] = {
    val in = fs.open(p(path))
    try {
      val len = fs.getFileStatus(p(path)).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  override def setOwnership(path: String, owner: String, group: String, perms: String): Unit =
    write(path + ".acl", s"$owner:$group:$perms".getBytes("UTF-8"))
}
