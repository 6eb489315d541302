package graft.io

import java.util.concurrent.atomic.AtomicBoolean
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial spec for the [[LogFs]] filesystem contract (P1/P3): the
  * race windows the commit protocols worry about are FORCED here, not
  * left to sub-millisecond luck.
  *
  *  - P1: N racing claimants of one marker — exactly one wins
  *    (O_CREAT|O_EXCL arbitration, not exists-then-create).
  *  - P3 atomic path: a competitor's artifact planted in the exact
  *    publish window costs the writer a lost-race retry; the
  *    competitor's committed artifact survives byte-identical and the
  *    writer's change still lands (next ordinal). No lost commit.
  *  - P3 fallback (probe+rename, forced via the test seam): the SAME
  *    planted competitor is silently REPLACED — the residual the
  *    contract documents is real, pinned here so it can never be
  *    mistaken for hypothetical. This is why the atomic link path is
  *    the default wherever the filesystem has one, and why an
  *    object-store deployment needs a conditional-put adapter (or
  *    single-writer mode) before any multi-writer claim. */
class LogFsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def withLake(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("logfs").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      GeoParquet.packZOrderToParquet(
        Seq((1L, 0, 0), (2L, 1, 1)).toDF("id", "a", "b").coalesce(1),
        Seq("a", "b"), path, 1)
      f(path)
    } finally {
      LogFs.raceInjection = None
      LogFs.disableAtomicLink = false
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  /** One-shot injection: when the publish target is `_gen-2.json`
    * under `path`, land a competitor's VALID empty delta there first —
    * the competitor "committed inside the probe-to-publish window". */
  private def plantCompetitor(path: String): (String, () => Boolean) = {
    val competitorText = GeoParquet.renderGenDelta(GeoParquet.GenDelta(
      commit = 2, minGen = 0, rwAdd = Set.empty, rwDel = Set.empty,
      set = Map.empty, del = Set.empty))
    val fired = new AtomicBoolean(false)
    LogFs.raceInjection = Some { (dst: HadoopPath) =>
      if (dst.getName == "_gen-2.json" &&
          dst.toString.contains(path.stripPrefix("file:")) &&
          fired.compareAndSet(false, true)) {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dst.toUri.getPath),
          competitorText.getBytes("UTF-8"))
      }
    }
    (competitorText, () => fired.get)
  }

  private def genArtifact(path: String, name: String): Option[String] = {
    val f = new java.io.File(s"$path/_gen/$name")
    if (f.exists) Some(java.nio.file.Files.readString(f.toPath)) else None
  }

  test("P1: exactly one of 16 racing marker claimants wins") {
    val dir = java.nio.file.Files.createTempDirectory("logfs-p1").toFile
    try {
      val p = new HadoopPath(s"file:${dir.getAbsolutePath}/marker")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val start = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 16).map { i =>
        new Thread(() => {
          start.await()
          if (LogFs.exclusiveCreate(fs, p, s"nonce-$i".getBytes("UTF-8")))
            wins.incrementAndGet()
        })
      }
      threads.foreach(_.start()); start.countDown()
      threads.foreach(_.join())
      assert(wins.get == 1, s"${wins.get} claimants won the same marker")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("P3 atomic publish: competitor planted in the publish window survives; writer retries, no lost commit") {
    withLake { path =>
      import spark.implicits._
      val conf = spark.sessionState.newHadoopConf()
      assert(GeoParquet.readGenState(path, conf).get.commit == 1)
      val (competitorText, fired) = plantCompetitor(path)
      GeoParquet.appendNumericWithSidecar(
        Seq((10L, 5, 5), (11L, 6, 6)).toDF("id", "a", "b").coalesce(1),
        path, Seq("a", "b"))
      assert(fired(), "the race was never injected — publish path drifted")
      // the competitor's artifact is byte-identical on disk: the atomic
      // link REFUSED the ordinal instead of replacing it
      assert(genArtifact(path, "_gen-2.json").contains(competitorText))
      // and the writer's append still landed — on fresh state, at the
      // next ordinal (lost race, not lost commit)
      val st = GeoParquet.readGenState(path, conf).get
      assert(st.commit == 3, s"append did not re-land: commit ${st.commit}")
      val ids = GeoParquet.readZOrderRange(spark, path, Seq(("a", -1e9, 1e9)))
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 10L, 11L))
    }
  }

  test("P3 fallback probe+rename under the SAME forced race: Hadoop LocalFileSystem rename refuses the existing target — lost race, no clobber") {
    withLake { path =>
      import spark.implicits._
      val conf = spark.sessionState.newHadoopConf()
      LogFs.disableAtomicLink = true
      val (competitorText, fired) = plantCompetitor(path)
      GeoParquet.appendNumericWithSidecar(
        Seq((10L, 5, 5), (11L, 6, 6)).toDF("id", "a", "b").coalesce(1),
        path, Seq("a", "b"))
      assert(fired())
      // measured, not assumed: the checksummed LocalFileSystem's
      // rename REFUSES an existing destination, so even the fallback
      // degrades to a lost race on this stack — the competitor's
      // artifact survives byte-identical and the writer re-lands on
      // fresh state at the next ordinal
      assert(genArtifact(path, "_gen-2.json").contains(competitorText),
        "fallback rename REPLACED a committed artifact — this platform's " +
          "rename semantics changed; P3 now rests on the link path alone")
      val st = GeoParquet.readGenState(path, conf).get
      assert(st.commit == 3, s"append did not re-land: commit ${st.commit}")
      val ids = GeoParquet.readZOrderRange(spark, path, Seq(("a", -1e9, 1e9)))
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 10L, 11L))
    }
  }

  test("the raw POSIX rename primitive DOES replace an existing target — why P3 cannot rest on rename semantics") {
    // the clobber the contract documents lives one layer down: any FS
    // whose rename is a bare rename(2) (RawLocalFileSystem's fast
    // path, POSIX mounts) silently replaces — pinned here at the
    // primitive level so the residual stays real, measured knowledge
    // even though the Hadoop layer above happens to refuse today
    val dir = java.nio.file.Files.createTempDirectory("logfs-raw").toFile
    try {
      val committed = new java.io.File(dir, "artifact.json")
      java.nio.file.Files.write(committed.toPath, "THEIRS".getBytes("UTF-8"))
      val mine = new java.io.File(dir, "mine.tmp")
      java.nio.file.Files.write(mine.toPath, "MINE".getBytes("UTF-8"))
      assert(mine.renameTo(committed),
        "POSIX rename refused an existing target on this platform")
      assert(java.nio.file.Files.readString(committed.toPath) == "MINE",
        "rename(2) did not replace — residual doc would be stale")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("converged-change no-op: an update the log already contains commits nothing") {
    withLake { path =>
      val conf = spark.sessionState.newHadoopConf()
      val before = GeoParquet.readGenState(path, conf).get
      val artifactsBefore = Option(new java.io.File(s"$path/_gen").list())
        .map(_.toSet).getOrElse(Set.empty)
      // an update whose result equals current state (ignoring the
      // ordinal bump) — the shape a post-adoption retry re-applies
      val returned = GeoParquet.commitGenState(spark, path, cur => cur.get)
      assert(returned == before, "no-op commit altered the state")
      val after = GeoParquet.readGenState(path, conf).get
      assert(after.commit == before.commit,
        s"spurious empty delta inflated the ordinal: ${after.commit}")
      val artifactsAfter = Option(new java.io.File(s"$path/_gen").list())
        .map(_.toSet).getOrElse(Set.empty)
      assert(artifactsAfter == artifactsBefore)
    }
  }

  test("parseScDelta round-trips an empty upsert array") {
    val d = GeoParquet.ScDelta(
      ups = Map("geom" -> Map("part-0.parquet" -> Array.empty[Double])),
      del = Set.empty)
    val parsed = GeoParquet.parseScDelta(GeoParquet.renderScDelta(d), "spec")
    assert(parsed.ups("geom")("part-0.parquet").isEmpty)
    assert(parsed.del.isEmpty)
  }

  test("parseSidecar round-trips an empty bounds array (delta-side acceptance must not outrun the materialized parser)") {
    // the shape the delta parser accepts must stay parseable AFTER it
    // is applied and re-rendered into the materialized sidecar text —
    // a delta-only fix would let an empty array COMMIT and then poison
    // every later sidecar read, commit, and fold
    val text = GeoParquet.renderSidecar(
      Map("geom" -> Map("part-0.parquet" -> Array.empty[Double],
        "part-1.parquet" -> Array(1.0, 2.0, 3.0, 4.0))), 3)
    val all = GeoParquet.parseSidecarAll(text)
    assert(all("geom")("part-0.parquet").isEmpty)
    assert(all("geom")("part-1.parquet").toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }
}
