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
    val stage = Option(AdversarialFs.probeFaults.get(p.getName))
      .map(_.incrementAndGet()).getOrElse(3)
    if (stage == 1)
      throw new java.io.IOException(s"injected transient probe fault: $p")
    else if (stage == 2) false
    else super.exists(p)
  }
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
