package graft.io

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, Path => HadoopPath, RawLocalFileSystem}

/** A deliberately hostile "object store" for AdversarialFsSpec,
  * registered under the `advfs:` scheme and backed by the local disk
  * through [[RawLocalFileSystem]] — which natively exhibits BOTH
  * degradations the [[LogFs]] contract documents for stores without
  * its primitives:
  *
  *  - P3 broken: rename is a bare rename(2) — it silently REPLACES an
  *    existing target (no checksummed-LocalFileSystem refusal, no
  *    atomic-link path because the scheme is not `file`).
  *  - P1 weak: `create(p, overwrite = false)` is exists-then-create —
  *    a check-then-act window, not a kernel CAS.
  *
  * On top, [[AdversarialFs.hideFromListings]] simulates DELAYED
  * LISTING VISIBILITY (P2 broken): names in the set exist, open and
  * exists() see them, but listStatus omits them — the object-store
  * eventual-listing shape. */
class AdversarialFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("advfs:///")
  override def listStatus(f: HadoopPath): Array[FileStatus] = {
    val all = super.listStatus(f)
    if (AdversarialFs.hideFromListings.isEmpty) all
    else all.filterNot(st =>
      AdversarialFs.hideFromListings.contains(st.getPath.getName))
  }
  override def exists(p: HadoopPath): Boolean = {
    if (AdversarialFs.probeFaultsAlways.contains(p.getName))
      throw new java.io.IOException(s"injected persistent probe fault: $p")
    val stage = Option(AdversarialFs.probeFaults.get(p.getName))
      .map(_.incrementAndGet()).getOrElse(3)
    if (stage == 1)
      throw new java.io.IOException(s"injected transient probe fault: $p")
    else if (stage == 2) false
    else super.exists(p)
  }
  private def maybeWrap(f: HadoopPath,
                        out: org.apache.hadoop.fs.FSDataOutputStream)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    val fw = AdversarialFs.failWriteOnce.remove(f.getName) ||
      AdversarialFs.failWriteAlways.contains(f.getName)
    val fc = AdversarialFs.failCloseOnce.remove(f.getName)
    val fl = AdversarialFs.failCloseLoseOnce.remove(f.getName) ||
      AdversarialFs.failCloseLoseAlways.contains(f.getName)
    if (!fw && !fc && !fl) out
    else new org.apache.hadoop.fs.FSDataOutputStream(
      new java.io.FilterOutputStream(out) {
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          if (fw) throw new java.io.IOException(s"injected write fault: $f")
          else out.write(b, off, len)
        override def write(b: Int): Unit =
          if (fw) throw new java.io.IOException(s"injected write fault: $f")
          else out.write(b)
        override def close(): Unit = {
          out.close()
          if (fl) {
            // the object-store lost-put shape: the PUT at close fails
            // server-side, so NOTHING lands at the name
            java.nio.file.Files.deleteIfExists(
              java.nio.file.Paths.get(f.toUri.getPath))
            throw new java.io.IOException(s"injected lost put: $f")
          }
          if (fc) throw new java.io.IOException(s"injected close fault: $f")
        }
      }, null)
  }
  // the createFile() builder and the plain create(p, overwrite)
  // convenience funnel through different overloads depending on
  // Hadoop version/flags — wrap the funnels the code under test
  // actually reaches (engagement is ASSERTED per spec via the
  // consumed-flag checks, so a future funnel bypass fails loudly
  // rather than silently testing nothing)
  override def create(f: HadoopPath, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    maybeWrap(f, super.create(f, overwrite, bufferSize, replication,
      blockSize, progress))
  override def create(f: HadoopPath,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    maybeWrap(f, super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress))
  override def create(f: HadoopPath,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable,
                      checksumOpt: org.apache.hadoop.fs.Options.ChecksumOpt)
      : org.apache.hadoop.fs.FSDataOutputStream =
    maybeWrap(f, super.create(f, permission, flags, bufferSize, replication,
      blockSize, progress, checksumOpt))
  override def createNonRecursive(f: HadoopPath,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    maybeWrap(f, super.createNonRecursive(f, permission, flags, bufferSize,
      replication, blockSize, progress))
  override def createNonRecursive(f: HadoopPath,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    maybeWrap(f, super.createNonRecursive(f, permission, overwrite,
      bufferSize, replication, blockSize, progress))
}

object AdversarialFs {
  /** File NAMES currently invisible to listStatus (visible to open /
    * exists / getFileStatus — exactly the delayed-listing shape). */
  val hideFromListings: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** exists() fault injection per NAME: the first probe throws a
    * transient IOException, the immediate second probe spuriously
    * reports ABSENT, every later probe tells the truth — the exact
    * flaky-store sequence the taken-probe discriminator must survive
    * on a store whose publish is a replace-on-rename. */
  val probeFaults = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  def injectProbeFault(name: String): Unit =
    probeFaults.put(name, new java.util.concurrent.atomic.AtomicInteger(0))

  /** exists() throws on EVERY probe of these names — the broken-store
    * shape (vs the one-shot transient above). */
  val probeFaultsAlways: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** create()-stream fault injection per NAME, one-shot: the CREATE
    * itself succeeds (the file is immediately visible — the
    * create-visible HDFS shape), then the first write throws
    * (`failWriteOnce` — on-disk stays an empty partial) or the close
    * throws after writing through (`failCloseOnce` — on-disk holds
    * the full payload, the lost-ack shape). */
  val failWriteOnce: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val failCloseOnce: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** close() throws AND nothing lands at the name (the object-store
    * failed-conditional-PUT shape). */
  val failCloseLoseOnce: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** EVERY create-stream write to these names throws — the persistent
    * own-write-fault (broken store / quota) shape. */
  val failWriteAlways: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** EVERY close of these names loses the put (persistent
    * lost-conditional-PUT shape). */
  val failCloseLoseAlways: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** A store-atomic conditional put over the advfs backing disk: the
    * kernel's O_CREAT|O_EXCL arbitration stands in for the store's
    * If-None-Match — what a real S3/GCS/ABFS adapter provides. */
  object StrictConditionalPut extends LogFs.ConditionalPut {
    override def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
                             p: HadoopPath, bytes: Array[Byte]): Boolean = {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      if (nio.getParent != null) java.nio.file.Files.createDirectories(nio.getParent)
      try {
        java.nio.file.Files.write(nio, bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    }
  }
}
