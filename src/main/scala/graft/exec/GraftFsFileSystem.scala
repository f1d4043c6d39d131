package graft.exec

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Credential source for [[GraftFsFileSystem]] — the engine-side analogue
  * of the reference's SAS/OAuth wiring (adls_copy_utils.py:56-64 builds one
  * credential per process and reuses it for every REST call; ops 35-36).
  * Production ADLS binds the same way through Hadoop's
  * `fs.azure.sas.token.provider.type` / `fs.azure.account.oauth2.*` keys —
  * see MIGRATION.md §auth. */
trait GraftTokenProvider {
  def getToken(account: String): String
}

/** Token provider that counts fetches — lets tests assert auth
  * amortization: many copy tasks, ONE token fetch per (JVM, account),
  * because Hadoop's FileSystem cache reuses the initialized instance. */
final class CountingTokenProvider extends GraftTokenProvider {
  override def getToken(account: String): String = {
    CountingTokenProvider.fetches.incrementAndGet()
    s"sas-$account-${System.identityHashCode(this)}"
  }
}

object CountingTokenProvider {
  val fetches = new AtomicInteger(0)
}

/** A cloud-store-shaped Hadoop FileSystem (`graftfs://account/...`) used to
  * exercise the copy pipeline against a NON-file:// scheme end-to-end:
  * scheme registration, per-account configuration, and credential
  * acquisition all flow through the Hadoop `Configuration`, exactly as an
  * `abfss://` binding would (`fs.azure.account.key.<account>`,
  * `fs.azure.sas.token.provider.type`, …). Data lands in a local directory
  * per account (`fs.graftfs.root.<account>`), so tests observe real bytes.
  *
  * Required configuration:
  *  - `fs.graftfs.impl` = this class (scheme registration)
  *  - `fs.graftfs.root.<account>` = local backing directory
  *  - `fs.graftfs.token.provider` = a [[GraftTokenProvider]] class; the
  *    token is fetched ONCE in initialize() and held for the instance's
  *    lifetime — the FileSystem cache turns that into once-per-executor,
  *    the reference's credential-amortization behavior (op 35/36).
  */
final class GraftFsFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var account: String = _
  private var rootDir: String = _
  private var workingDir: Path = _
  @volatile private var token: String = _
  private val local = new RawLocalFileSystem()

  override def getScheme: String = "graftfs"
  override def getUri: URI = fsUri

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"graftfs://${name.getAuthority}")
    account = name.getAuthority
    rootDir = conf.get(s"fs.graftfs.root.$account")
    require(rootDir != null,
      s"fs.graftfs.root.$account not configured (per-account binding, like fs.azure.account.key.<account>)")
    val providerCls = conf.get("fs.graftfs.token.provider")
    require(providerCls != null,
      "fs.graftfs.token.provider not configured (like fs.azure.sas.token.provider.type)")
    val provider = Class.forName(providerCls)
      .getDeclaredConstructor().newInstance().asInstanceOf[GraftTokenProvider]
    token = provider.getToken(account) // once per FileSystem instance
    local.initialize(URI.create("file:///"), conf)
    workingDir = new Path(s"graftfs://$account/")
    setConf(conf)
  }

  private def requireAuth(): Unit =
    require(token != null, "unauthenticated access to graftfs")

  /** graftfs://account/a/b → file:<root>/a/b */
  private def toLocal(f: Path): Path = {
    val rel = Path.getPathWithoutSchemeAndAuthority(
      if (f.isAbsolute) f else new Path(workingDir, f))
    new Path(s"file:$rootDir$rel")
  }

  /** file:<root>/a/b → graftfs://account/a/b (for statuses we hand back) */
  private def fromLocal(st: FileStatus): FileStatus = {
    val p = st.getPath.toUri.getPath.stripPrefix(rootDir)
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, new Path(s"graftfs://$account${if (p.isEmpty) "/" else p}"))
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    requireAuth(); local.open(toLocal(f), bufferSize)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    requireAuth()
    local.create(toLocal(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream = {
    requireAuth(); local.append(toLocal(f), bufferSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    requireAuth(); local.rename(toLocal(src), toLocal(dst))
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    requireAuth(); local.delete(toLocal(f), recursive)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    requireAuth(); local.listStatus(toLocal(f)).map(fromLocal)
  }

  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }
  override def getWorkingDirectory: Path = workingDir

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    requireAuth(); local.mkdirs(toLocal(f), permission)
  }

  override def getFileStatus(f: Path): FileStatus = {
    requireAuth(); fromLocal(local.getFileStatus(toLocal(f)))
  }
}
