package graft.io

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** TRUE cross-process concurrency for the generation-manifest and
  * sidecar CAS protocols: two SEPARATE JVMs race appends (and the
  * folds their commits trigger) against one dataset directory. The
  * in-process 4-thread spec shares one JVM and one filesystem view;
  * only forked processes exercise the exclusive-create / rename
  * semantics the protocol actually relies on between real writers.
  *
  * Asserts, from the dataset alone after both children exit:
  *  - no lost commit and no duplicate adoption (every batch's ids
  *    present exactly once, one generation per append),
  *  - every generation re-reads exact (cumulative snapshot counts),
  *  - the sidecar's row-count block agrees after its own raced
  *    delta commits + folds,
  *  - at least one FOLD happened mid-race (the commit count crosses
  *    [[GeoParquet.DeltaFoldEvery]]), and the log is in its folded
  *    steady state. */
class CrossProcessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def childJava(mainClass: String, out: java.io.File,
                        args: String*): Process = {
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    // pass the parent's --add-opens straight through (Spark 4 on JDK
    // 17 needs them; build.sbt injects them into this forked test JVM)
    val addOpens = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala
      .zipWithIndex.collect {
        case (a, i) if a == "--add-opens" => Seq(a,
          java.lang.management.ManagementFactory.getRuntimeMXBean
            .getInputArguments.get(i + 1))
        case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      }.flatten.toSeq
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      mainClass) ++ args
    new ProcessBuilder(cmd.asJava)
      .redirectErrorStream(true)
      .redirectOutput(out)
      .start()
  }

  test("two separate JVMs racing appends and folds lose no commit and duplicate none") {
    val dir = java.nio.file.Files.createTempDirectory("xproc").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      // parent seeds the dataset: generation 0, manifest commit 1
      GeoParquet.packZOrderToParquet(
        Seq((1L, 0, 0), (2L, 1, 1)).toDF("id", "a", "b").coalesce(1),
        Seq("a", "b"), path, 1)
      // two children, 12 appends each: 24 raced commits on top of the
      // pack crosses DeltaFoldEvery (16) in BOTH logs mid-race
      val perChild = 12
      val outA = new java.io.File(dir, "childA.log")
      val outB = new java.io.File(dir, "childB.log")
      val a = childJava("graft.io.CrossProcessAppendMain", outA,
        path, "100", perChild.toString)
      val b = childJava("graft.io.CrossProcessAppendMain", outB,
        path, "200", perChild.toString)
      val deadline = System.nanoTime() + 300L * 1000000000L
      for ((p, out) <- Seq((a, outA), (b, outB))) {
        val remaining = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
        assert(p.waitFor(remaining, java.util.concurrent.TimeUnit.MILLISECONDS),
          s"child never finished; tail of ${out.getName}:\n" +
            scala.util.Try(java.nio.file.Files.readString(out.toPath)
              .takeRight(2000)).getOrElse("<unreadable>"))
        assert(p.exitValue() == 0,
          s"child failed (exit ${p.exitValue()}); tail of ${out.getName}:\n" +
            scala.util.Try(java.nio.file.Files.readString(out.toPath)
              .takeRight(2000)).getOrElse("<unreadable>"))
      }
      val totalAppends = 2 * perChild
      val st = GeoParquet.readGenState(path, conf).get
      // no lost commit, no duplicate adoption: exactly one CAS write
      // per append on top of the pack's, one generation per append
      assert(st.commit == 1 + totalAppends,
        s"manifest commit ordinal ${st.commit} != ${1 + totalAppends}")
      assert(st.currentGen == totalAppends,
        s"head generation ${st.currentGen} != $totalAppends")
      // every batch's ids exactly once (nothing lost, nothing doubled)
      val ids = GeoParquet.readZOrderRange(spark, path,
        Seq(("a", -1e9, 1e9))).select("id").as[Long].collect().sorted
      val expected = (Seq(1L, 2L) ++
        (0 until perChild).flatMap(i => Seq((100 + i) * 1000L, (100 + i) * 1000L + 1)) ++
        (0 until perChild).flatMap(i => Seq((200 + i) * 1000L, (200 + i) * 1000L + 1)))
        .sorted
      assert(ids.toSeq == expected)
      // every generation re-reads exact: appends are 2 rows each, so
      // the snapshot at g has 2*(g+1) rows regardless of which child's
      // batch landed at which generation
      (0 to st.currentGen).foreach { g =>
        assert(GeoParquet.readZOrderAtGeneration(spark, path, g).count() ==
          2L * (g + 1), s"wrong snapshot at generation $g")
      }
      // the sidecar raced its own delta commits + folds to the same end
      val counts = GeoParquet.parseSidecar(
        GeoParquet.readSidecarText(path, conf).get, "__rowcount")
      assert(counts.values.map(_(0)).sum == 2.0 * (1 + totalAppends))
      assert(GeoParquet.statsAtGeneration(spark, path, st.currentGen,
        Seq("a"))._1 == 2L * (1 + totalAppends))
      // a fold happened mid-race and left the folded steady state
      val ckpts = LogLayout.genCkpts(path).map(_._1)
      assert(ckpts.nonEmpty && ckpts.max > GeoParquet.DeltaFoldEvery,
        s"no mid-race manifest fold: checkpoints at $ckpts")
      assert(LogLayout.genDeltas(path).map(_._1).count(_ > ckpts.max) <
        GeoParquet.DeltaFoldEvery)
      val scCkpts = LogLayout.scCkpts(path).map(_._1)
      assert(scCkpts.nonEmpty && scCkpts.max > GeoParquet.DeltaFoldEvery,
        s"no mid-race sidecar fold: checkpoints at $scCkpts")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("vacuum/compaction JVM racing an appender JVM never breaks a concurrent reader") {
    val dir = java.nio.file.Files.createTempDirectory("xproc-vac").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      GeoParquet.packZOrderToParquet(
        Seq((1L, 0, 0), (2L, 1, 1)).toDF("id", "a", "b").coalesce(1),
        Seq("a", "b"), path, 1)
      val perChild = 12
      val outA = new java.io.File(dir, "appender.log")
      val outM = new java.io.File(dir, "maint.log")
      val a = childJava("graft.io.CrossProcessAppendMain", outA,
        path, "100", perChild.toString)
      val m = childJava("graft.io.CrossProcessMaintMain", outM,
        path, "6", "2")
      // the PARENT is the third process: reads the head snapshot in a
      // loop while appends, compactions and vacuums land underneath.
      // Every read must succeed (a pinned listing straddling a
      // vacuum's delete must reconcile, not throw FileNotFound), carry
      // no duplicate ids (tombstone-vs-rewrite double-count), no torn
      // append batch, and never LOSE a batch it has already seen.
      var seen = Set.empty[Long]
      var reads = 0
      val deadline = System.nanoTime() + 300L * 1000000000L
      while (a.isAlive || m.isAlive) {
        // a hung child must FAIL the test with its log, not hang the
        // suite: bound the reader loop by the same deadline the
        // waitFor below enforces
        assert(System.nanoTime() < deadline,
          "children still alive after 300s; tails:\n" +
            Seq(outA, outM).map(f => f.getName + ":\n" +
              scala.util.Try(java.nio.file.Files.readString(f.toPath)
                .takeRight(1500)).getOrElse("<unreadable>")).mkString("\n"))
        val ids = GeoParquet.readZOrderRange(spark, path,
          Seq(("a", -1e9, 1e9))).select("id").as[Long].collect().toSeq
        reads += 1
        assert(ids.distinct.size == ids.size,
          s"duplicate ids under maintenance race: ${ids.sorted}")
        val batches = ids.filter(_ >= 1000L).map(_ / 1000L).distinct
        batches.foreach { k =>
          assert(ids.contains(k * 1000L) && ids.contains(k * 1000L + 1L),
            s"torn append batch $k visible: ${ids.sorted}")
        }
        assert(ids.contains(1L) && ids.contains(2L), "seed rows vanished")
        val now = batches.toSet
        assert(seen.subsetOf(now),
          s"previously visible batches vanished: ${seen -- now}")
        seen = now
        Thread.sleep(20L)
      }
      for ((p, out) <- Seq((a, outA), (m, outM))) {
        val remaining = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
        assert(p.waitFor(remaining, java.util.concurrent.TimeUnit.MILLISECONDS))
        assert(p.exitValue() == 0,
          s"child failed (exit ${p.exitValue()}); tail of ${out.getName}:\n" +
            scala.util.Try(java.nio.file.Files.readString(out.toPath)
              .takeRight(2000)).getOrElse("<unreadable>"))
      }
      assert(reads >= 3, s"reader raced only $reads times — no real window")
      // final state exact: every batch present exactly once, all
      // maintenance notwithstanding; compaction + vacuum left a trace
      val st = GeoParquet.readGenState(path, conf).get
      val ids = GeoParquet.readZOrderRange(spark, path,
        Seq(("a", -1e9, 1e9))).select("id").as[Long].collect().sorted.toSeq
      val expected = (Seq(1L, 2L) ++ (0 until perChild)
        .flatMap(i => Seq((100 + i) * 1000L, (100 + i) * 1000L + 1L))).sorted
      assert(ids == expected)
      assert(st.rewrites.nonEmpty, "no compaction generation recorded")
      assert(st.minGen > 0, "no vacuum took effect")
      // appends never share an ordinal: at least one commit per append
      // plus the pack's (maintenance commits add more on top)
      assert(st.commit >= 1 + perChild,
        s"commit ordinal ${st.commit} lost appends")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
