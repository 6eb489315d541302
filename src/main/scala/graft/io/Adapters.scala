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
    * name is taken (lost race — [[FileAlreadyExistsException]] at
    * build or at close, or an IOException with the target visible);
    * any other error stays loud. The object-store caveat that the
    * data PUT happens at close() is why the whole write is inside one
    * try — a conditional-create refusal can surface at either end. */
  final class AtomicCreateConditionalPut(
      mustOpts: Map[String, String] = Map.empty)
      extends LogFs.ConditionalPut {
    override def putIfAbsent(fs: FileSystem, p: HadoopPath,
                             bytes: Array[Byte]): Boolean =
      try {
        val builder = fs.createFile(p).overwrite(false)
        mustOpts.foreach { case (k, v) => builder.must(k, v) }
        val out = builder.build()
        try out.write(bytes)
        finally out.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.PathExistsException => false
        case e: java.io.IOException =>
          // connectors differ in how they surface the conditional
          // refusal; a visible target after the failure IS the lost
          // race, anything else is a broken store and must be loud
          if (fs.exists(p)) false else throw e
      }
  }
}
