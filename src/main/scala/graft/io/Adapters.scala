package graft.io

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path => HadoopPath}

/** Shipped reference implementations of [[LogFs.ConditionalPut]] — the
  * object-store adapter seam that upgrades a scheme from the
  * documented single-writer-per-dataset mode to full multi-writer
  * safety (LogFs contract P1 + P3). A deployment registers one at
  * session start:
  *
  * {{{
  * LogFs.registerConditionalPut("hdfs", new LogFsAdapters.AtomicCreateConditionalPut())
  * LogFs.registerConditionalPut("s3a",
  *   new LogFsAdapters.AtomicCreateConditionalPut(
  *     // the connector's conditional-create option keys, if it gates
  *     // the If-None-Match behavior behind createFile() options —
  *     // see the connector's createFile/openFile documentation
  *     mustOpts = Map(/* "fs.option...": "..." */)))
  * }}}
  */
object LogFsAdapters {

  /** ConditionalPut through the filesystem's own
    * `createFile(path).overwrite(false)` builder — correct EXACTLY ON
    * STORES WHOSE NO-OVERWRITE CREATE IS STORE-ATOMIC:
    *
    *  - HDFS: create(overwrite=false) is arbitrated at the NameNode —
    *    two racing creators of one name cannot both win.
    *  - S3 (via a connector that maps no-overwrite create to a
    *    conditional `If-None-Match: *` PUT — supported server-side
    *    since late 2024): the STORE arbitrates the name at commit
    *    (close()) time.
    *  - GCS / ABFS connectors with generation/ETag-gated create.
    *
    * DO NOT register it for stores whose create is a client-side
    * exists-then-create (e.g. a bare POSIX mount through
    * RawLocalFileSystem): that re-opens exactly the check-then-act
    * window this seam exists to remove — the adapter CONTRACT
    * (LogFs.ConditionalPut scaladoc) requires store-side atomicity,
    * and this class simply routes through whatever the scheme's
    * createFile provides. Local `file:` needs no adapter at all (the
    * hard-link publish is already atomic).
    *
    * `mustOpts` are passed as MANDATORY builder options
    * (`FSDataOutputStreamBuilder.must`), for connectors that gate
    * their conditional-create behavior behind createFile options; an
    * option the connector does not understand fails loudly at
    * build() — never a silent downgrade to a racy put.
    *
    * Failure mapping, per the seam's contract: `false` ONLY when the
    * name is genuinely taken by someone else (lost race —
    * [[FileAlreadyExistsException]]/PathExists at build or at close,
    * or a build-time IOException with the target visible); any other
    * error stays loud. The object-store caveat that the data PUT
    * happens at close() is why the refusal can surface at either end.
    * CRITICAL asymmetry: an IOException AFTER a successful build() is
    * ambiguous — on a create-visible store (HDFS) we already won the
    * name and the failure is OUR partial write (mapping it to `false`
    * would make the caller treat our garbage as a competitor's
    * committed artifact: a permanently wedged ordinal), while on an
    * object store the arbitration only happens at close(), so a
    * visible target could be a COMPETITOR's commit (deleting it would
    * be a clobber). The discriminator is a content READ-BACK of the
    * target: byte-equal to our payload → our put actually committed
    * (ack lost) → `true`; empty or a strict prefix of our payload →
    * our partial create → delete it and rethrow LOUD (the name stays
    * claimable for the retry; readers already tolerate a
    * vanished-then-relisted artifact); anything else → a competitor's
    * artifact → lost race. Byte-identical content from a competitor
    * is the same logical commit (payloads embed writer-specific file
    * names/nonces), so the `true` mapping is safe. */
  final class AtomicCreateConditionalPut(
      mustOpts: Map[String, String] = Map.empty)
      extends LogFs.ConditionalPut {
    override def putIfAbsent(fs: FileSystem, p: HadoopPath,
                             bytes: Array[Byte]): Boolean = {
      var won = false
      try {
        val builder = fs.createFile(p).overwrite(false)
        mustOpts.foreach { case (k, v) => builder.must(k, v) }
        val out = builder.build()
        won = true
        try out.write(bytes)
        finally out.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.PathExistsException => false
        case e: java.io.IOException if !won =>
          // build-time refusal: connectors differ in how they surface
          // the conditional-create rejection; a visible target after a
          // failed CREATE is the lost race, anything else is a broken
          // store and must be loud. The probe is the shared
          // [[LogFs.probeVisible]] discriminator: retry once on a
          // transient fault and trust the second verdict; a REPEATING
          // fault throws the ORIGINAL refusal with both probe faults
          // suppressed (loud with the real cause — the deliberate
          // trade is that a flaky probe can crash a healthy lost race
          // rather than ever mislabel a broken store as contention).
          if (LogFs.probeVisible(fs, p, e)) false else throw e
        case e: java.io.IOException =>
          // post-build failure: read the target back and discriminate
          // (see the class doc). verdict: Some(result) to return;
          // None = our strict-prefix partial → delete it, stay loud.
          // Deliberately NO exists() pre-gate: a spurious "absent"
          // verdict there would skip the load-bearing partial cleanup
          // below (wedging the ordinal); the status call itself
          // discriminates instead — an absent target surfaces as
          // FileNotFound.
          // Some(false) = competitor's, Some(true) = ours committed
          // (ack lost), None = our strict-prefix partial; throws
          // FileNotFound when absent — the shared [[LogFs.contentVerdict]]
          def readBack(): Option[Boolean] = LogFs.contentVerdict(fs, p, bytes)
          // retried ONCE (the shared [[LogFs.retryOnce]] shape): a
          // one-shot transient fault (or spurious FileNotFound) must
          // not skip the load-bearing cleanup; a repeating failure —
          // including a genuinely absent target, which reads
          // FileNotFound both times — suppresses both faults into the
          // ORIGINAL error and rethrows it: loud, retryable, never a
          // guessed verdict
          val verdict: Option[Boolean] = LogFs.retryOnce(e)(readBack())
          verdict match {
            case Some(v) => v
            case None =>
              // the delete is load-bearing (a surviving empty partial
              // wedges the ordinal for every later reader) — a failed
              // delete must at least be DIAGNOSABLE from the error
              try fs.delete(p, false)
              catch { case de: java.io.IOException => e.addSuppressed(de) }
              throw e
          }
      }
    }

  }
}
