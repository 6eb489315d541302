package graft.io

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The r16 single-name-per-ordinal log format: why it exists (the
  * legacy twin-name layout's cross-name shadow window, PINNED here on
  * a hand-built legacy log), why it closes the window (the same
  * interleaving FORCED through the race seam now costs the fold a
  * lost-race retry instead of shadowing the adopter's commit), and
  * how pre-r16 datasets migrate (twin-name artifacts read exactly,
  * new commits land unified beside them, the first fold sweeps the
  * legacy names — including every crash-window intermediate state). */
class LogFormatSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  import GeoParquet.{GenDelta, GenEntry, GenState}

  private def writeGen(path: String, name: String, text: String): Unit = {
    val d = new java.io.File(s"$path/_gen")
    d.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(d, name).toPath, text)
  }

  test("LEGACY twin-name layout: a stalled fold's checkpoint SHADOWS an adopter's same-ordinal delta (the residual the r16 format removes, pinned)") {
    val dir = java.nio.file.Files.createTempDirectory("shadow-legacy").toFile
    try {
      val path = s"$dir/d"
      val conf = spark.sessionState.newHadoopConf()
      // commit 1: checkpoint {f1}
      val stA = GenState(1, 0, Map("f1.parquet" -> GenEntry(0, -1)))
      writeGen(path, "_genckpt-1.json", GeoParquet.renderGenState(stA))
      // commit 2, the ADOPTER's delta: adds f2
      val d2 = GenDelta(2, 0, Set.empty, Set.empty,
        Map("f2.parquet" -> GenEntry(1, -1)), Set.empty)
      writeGen(path, "_gendelta-2.json", GeoParquet.renderGenDelta(d2))
      // commit 2 AGAIN, the stalled fold's checkpoint — folded from
      // state as of commit 1, never saw the adopter's delta. Two
      // DIFFERENT names at one ordinal: no never-replace publish can
      // referee this, and readers take the max checkpoint.
      val stStale = GenState(2, 0, Map("f1.parquet" -> GenEntry(0, -1)))
      writeGen(path, "_genckpt-2.json", GeoParquet.renderGenState(stStale))

      val st = GeoParquet.readGenState(path, conf).get
      assert(st.commit == 2)
      assert(!st.files.contains("f2.parquet"),
        "legacy layout no longer shadows — this pin is stale, " +
          "re-examine whether the migration story is still needed")
      // the pinned residual: the adopter's committed f2 is INVISIBLE
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("r16 format: the SAME fold-vs-adopter interleaving is a lost race, never a shadow — both commits land") {
    val dir = java.nio.file.Files.createTempDirectory("shadow-closed").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      GeoParquet.packZOrderToParquet(
        Seq((1L, 0, 0), (2L, 1, 1)).toDF("id", "a", "b").coalesce(1),
        Seq("a", "b"), path, 1)
      // drive to the brink of the fold: commits 2..16 are deltas, the
      // NEXT commit (17) folds (DeltaFoldEvery deltas on top)
      (2 to GeoParquet.DeltaFoldEvery).foreach { i =>
        GeoParquet.commitGenState(spark, path, cur => cur.get.copy(
          files = cur.get.files + (s"pad-$i.parquet" -> GenEntry(0, -1))))
      }
      val foldOrd = GeoParquet.DeltaFoldEvery + 1
      // the adopter's competitor delta lands at the fold's ordinal in
      // the exact publish window — at the SAME NAME the fold wants,
      // because the format has only one name per ordinal
      val competitor = GeoParquet.renderGenDelta(GenDelta(foldOrd, 0,
        Set.empty, Set.empty,
        Map("competitor.parquet" -> GenEntry(0, -1)), Set.empty))
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      LogFs.raceInjection = Some { (dst: HadoopPath) =>
        if (dst.getName == GeoParquet.genArtName(foldOrd) &&
            fired.compareAndSet(false, true))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dst.toUri.getPath),
            competitor.getBytes("UTF-8"))
      }
      // our writer walks into the fold at ordinal 17 and loses the
      // publish; the retry re-reads (the competitor's delta INCLUDED)
      // and folds at 18 on top of BOTH changes
      val st = GeoParquet.commitGenState(spark, path, cur => cur.get.copy(
        files = cur.get.files + ("mine.parquet" -> GenEntry(0, -1))))
      assert(fired.get(), "the race was never injected — fold path drifted")
      assert(st.files.contains("competitor.parquet"),
        "the fold SHADOWED the adopter's same-ordinal commit")
      assert(st.files.contains("mine.parquet"), "the writer lost its commit")
      val reread = GeoParquet.readGenState(path, conf).get
      assert(reread == st)
      // and the log is single-name-per-ordinal unified artifacts only
      val names = new java.io.File(s"$path/_gen").list().toSeq
      assert(!names.exists(n => n.startsWith(GeoParquet.DeltaPrefix) ||
        n.startsWith(GeoParquet.CkptPrefix)))
    } finally {
      LogFs.raceInjection = None
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("mixed-version duplicate ordinal: a legacy twin BESIDE the unified artifact reads (unified preferred) — never a fake torn dataset") {
    val dir = java.nio.file.Files.createTempDirectory("dup-ordinal").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def batch(lo: Int) = Seq((lo.toLong, lo % 10, (lo * 3) % 10))
        .toDF("id", "a", "b").coalesce(1)
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), path, 1)
      (1 to 2).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      val st = GeoParquet.readGenState(path, conf).get
      // a pre-r16 JVM (whose publish guard probes only the legacy twin
      // names) lands `_gendelta-3` beside the committed `_gen-3.json`;
      // same on the sidecar log. Without per-ordinal dedup the
      // duplicate fails the contiguity check forever.
      val rogue = GeoParquet.renderGenDelta(GeoParquet.GenDelta(3, 0,
        Set.empty, Set.empty,
        Map("rogue.parquet" -> GenEntry(0, -1)), Set.empty))
      writeGen(path, "_gendelta-3.json", rogue)
      val scDir = new java.io.File(s"$path/_sc")
      java.nio.file.Files.writeString(
        new java.io.File(scDir, "_scdelta-3.json").toPath,
        GeoParquet.renderScDelta(GeoParquet.ScDelta(
          Map("geom" -> Map("rogue.parquet" -> Array(0.0, 0.0, 1.0, 1.0))),
          Set.empty)))
      val reread = GeoParquet.readGenState(path, conf).get
      assert(reread == st, "duplicate ordinal changed the state — the " +
        "unified artifact must win")
      assert(!reread.files.contains("rogue.parquet"))
      assert(GeoParquet.readSidecarText(path, conf).exists(
        !_.contains("rogue.parquet")))
      // the WORST twin: a pre-r16 stalled fold's legacy CHECKPOINT at
      // the unified ordinal — if it became the read base it would
      // shadow the unified delta (the exact window this format
      // closes, re-opened through the migration seam). It must lose.
      val staleCkpt = GeoParquet.renderGenState(GenState(3, 0,
        Map("only-f0.parquet" -> GenEntry(0, -1))))
      writeGen(path, "_genckpt-3.json", staleCkpt)
      val reread2 = GeoParquet.readGenState(path, conf).get
      assert(reread2 == st,
        "a legacy checkpoint twin out-ranked the unified artifact")
      assert(new java.io.File(s"$path/_gen/_genckpt-3.json").delete())
      // and the lake keeps working past it (commits, fold, sweep)
      (3 to GeoParquet.DeltaFoldEvery + 1).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      val names = new java.io.File(s"$path/_gen").list().toSeq
      assert(!names.contains("_gendelta-3.json"), "fold did not sweep the twin")
      assert(GeoParquet.readZOrderRange(spark, path, Seq(("a", -1e9, 1e9)))
        .count() == GeoParquet.DeltaFoldEvery + 2)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("a damaged DEAD unified artifact (covered by the checkpoint) is ignored; a damaged LIVE one is a loud error (both logs)") {
    val dir = java.nio.file.Files.createTempDirectory("dead-malformed").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def batch(lo: Int) = Seq((lo.toLong, lo % 10, (lo * 3) % 10))
        .toDF("id", "a", "b").coalesce(1)
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), path, 1)
      GeoParquet.appendNumericWithSidecar(batch(1), path, Seq("a", "b"))
      val st = GeoParquet.readGenState(path, conf).get
      val sc = GeoParquet.readSidecarText(path, conf).get
      // DEAD: ordinal 0 sits below the checkpoint (ordinal 1) in both
      // logs — a 0-byte straggler there must not brick reads the
      // legacy layout (which never opened covered artifacts) survived
      writeGen(path, GeoParquet.genArtName(0), "")
      java.nio.file.Files.writeString(new java.io.File(
        s"$path/_sc/${GeoParquet.scArtName(0)}").toPath, "")
      assert(GeoParquet.readGenState(path, conf).contains(st))
      assert(GeoParquet.readSidecarText(path, conf).contains(sc))
      // LIVE: the same damage ABOVE the checkpoint would participate
      // in the state — strict-parse loud error, never a guess
      writeGen(path, GeoParquet.genArtName(3), "{broken}")
      val e = intercept[IllegalArgumentException] {
        GeoParquet.readGenState(path, conf) }
      assert(e.getMessage.contains("malformed"))
      assert(new java.io.File(s"$path/_gen/${GeoParquet.genArtName(3)}").delete())
      java.nio.file.Files.writeString(new java.io.File(
        s"$path/_sc/${GeoParquet.scArtName(3)}").toPath, "{broken}")
      val e2 = intercept[IllegalArgumentException] {
        GeoParquet.readSidecarText(path, conf) }
      assert(e2.getMessage.contains("malformed"))
      assert(new java.io.File(s"$path/_sc/${GeoParquet.scArtName(3)}").delete())
      // healthy again, and the next fold sweeps the dead stragglers
      assert(GeoParquet.readGenState(path, conf).contains(st))
      (2 to GeoParquet.DeltaFoldEvery + 1).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      assert(!new java.io.File(s"$path/_gen/${GeoParquet.genArtName(0)}").exists(),
        "fold did not sweep the dead damaged artifact")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("twin-only base: when a legacy checkpoint twin is the ONLY base, the dataset stays READABLE (colliding commit dropped) — never torn") {
    // the shape a pre-r16 fold leaves when it folds+sweeps while a
    // current JVM committed a unified delta at the same ordinal:
    // {_genckpt-5, _gen-5.json(delta)} and nothing else. Excluding
    // the twin from base selection here would leave base=None with a
    // delta present — a permanent fake torn dataset; the policy is
    // drop-the-colliding-commit, keep reading.
    val dir = java.nio.file.Files.createTempDirectory("twin-only").toFile
    try {
      val path = s"$dir/d"
      val conf = spark.sessionState.newHadoopConf()
      val legacySt = GenState(5, 0, Map("legacy.parquet" -> GenEntry(0, -1)))
      writeGen(path, "_genckpt-5.json", GeoParquet.renderGenState(legacySt))
      writeGen(path, GeoParquet.genArtName(5),
        GeoParquet.renderGenDelta(GenDelta(5, 0, Set.empty, Set.empty,
          Map("uni.parquet" -> GenEntry(1, -1)), Set.empty)))
      val st = GeoParquet.readGenState(path, conf).get
      assert(st == legacySt,
        s"twin-only base did not fall back to the legacy checkpoint: $st")
      assert(!st.files.contains("uni.parquet"),
        "the colliding unified commit must be dropped, not merged")
      // the dead/live horizon must AGREE with the fallback base: a
      // damaged unified straggler BELOW the twin-only base is dead
      // (ignored), not a brick — the classifier computes its horizon
      // from the same post-policy checkpoint set the reader bases on
      writeGen(path, GeoParquet.genArtName(3), "")
      assert(GeoParquet.readGenState(path, conf).contains(legacySt),
        "a dead straggler below a twin-only base bricked the read")
      assert(new java.io.File(s"$path/_gen/${GeoParquet.genArtName(3)}").delete())
      // a STALE unified checkpoint below a delta GAP must not defeat
      // the fallback: {_gen-1(ckpt), _gen-5(delta), _genckpt-5} is
      // what a pre-r16 fold leaves when it sweeps legacy deltas 2-4 —
      // the only consistent read bases on the twin at 5, never a
      // permanent "delta gap — torn dataset"
      val gapDir = s"$dir/gap"
      writeGen(gapDir, GeoParquet.genArtName(1),
        GeoParquet.renderGenState(
          GenState(1, 0, Map("old.parquet" -> GenEntry(0, -1)))))
      writeGen(gapDir, GeoParquet.genArtName(5),
        GeoParquet.renderGenDelta(GenDelta(5, 0, Set.empty, Set.empty,
          Map("uni.parquet" -> GenEntry(1, -1)), Set.empty)))
      writeGen(gapDir, "_genckpt-5.json", GeoParquet.renderGenState(legacySt))
      val gapSt = GeoParquet.readGenState(gapDir, conf).get
      assert(gapSt == legacySt,
        s"gap-below-twin did not fall back to the twin base: $gapSt")
      // and when the post-policy chain IS whole, the twin stays
      // ignored (the shadow must not re-open through the fallback)
      val wholeDir = s"$dir/whole"
      writeGen(wholeDir, GeoParquet.genArtName(1),
        GeoParquet.renderGenState(
          GenState(1, 0, Map("old.parquet" -> GenEntry(0, -1)))))
      writeGen(wholeDir, GeoParquet.genArtName(2),
        GeoParquet.renderGenDelta(GenDelta(2, 0, Set.empty, Set.empty,
          Map("uni.parquet" -> GenEntry(1, -1)), Set.empty)))
      writeGen(wholeDir, "_genckpt-2.json", GeoParquet.renderGenState(
        GenState(2, 0, Map("old.parquet" -> GenEntry(0, -1)))))
      val wholeSt = GeoParquet.readGenState(wholeDir, conf).get
      assert(wholeSt.files.contains("uni.parquet"),
        "a consistent unified chain lost its commit to a twin checkpoint")
      // sidecar twin of the same shape
      val scDir = new java.io.File(s"$path/_sc"); scDir.mkdirs()
      val scText = GeoParquet.renderSidecar(
        Map("geom" -> Map("legacy.parquet" -> Array(0.0, 0.0, 1.0, 1.0))), 2)
      java.nio.file.Files.writeString(
        new java.io.File(scDir, "_scckpt-2.json").toPath, scText)
      java.nio.file.Files.writeString(
        new java.io.File(scDir, GeoParquet.scArtName(2)).toPath,
        GeoParquet.renderScDelta(GeoParquet.ScDelta(
          Map("geom" -> Map("uni.parquet" -> Array(2.0, 2.0, 3.0, 3.0))),
          Set.empty)))
      assert(GeoParquet.readSidecarText(path, conf).contains(scText),
        "sidecar twin-only base did not fall back to the legacy checkpoint")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("classifyUniArts vanish policy: a DEAD artifact vanishing mid-read is ignored; a LIVE one forces a re-list") {
    // simulate the racing-fold sweep directly at the classifier seam:
    // the listing shows ordinals {1 (ckpt), 2, 3}, but ordinal 2's
    // read returns None (deleted between listStatus and open)
    val ckpt1 = GeoParquet.renderGenState(
      GenState(1, 0, Map("f.parquet" -> GenEntry(0, -1))))
    val delta3 = GeoParquet.renderGenDelta(GenDelta(3, 0, Set.empty,
      Set.empty, Map("g.parquet" -> GenEntry(1, -1)), Set.empty))
    def readOf(m: Map[String, String])(n: String): Option[String] = m.get(n)
    // dead vanish: ckpt at 3 covers ordinal 2 — classification proceeds
    val deadOk = GeoParquet.classifyUniArts(
      Seq("_gen-1.json", "_gen-2.json", "_gen-3.json"),
      GeoParquet.GenArtPrefix, GeoParquet.genArtName,
      GeoParquet.genArtKind,
      legacyCkptOrds = Nil, legacyDeltaOrds = Nil, dirWhere = "spec",
      read = readOf(Map(
        "_gen-1.json" -> ckpt1,
        "_gen-3.json" -> GeoParquet.renderGenState(
          GenState(3, 0, Map("f.parquet" -> GenEntry(0, -1)))))),
      logLabel = "generation", path = "spec")
    assert(deadOk.exists(u => u.ckptOrds == Seq(1, 3) && u.deltaOrds.isEmpty),
      s"dead vanish was not tolerated: $deadOk")
    // live vanish: ordinal 3 (above the max checkpoint 1) is missing —
    // the caller must re-list, never assemble around a live hole
    val liveGone = GeoParquet.classifyUniArts(
      Seq("_gen-1.json", "_gen-3.json"),
      GeoParquet.GenArtPrefix, GeoParquet.genArtName,
      GeoParquet.genArtKind,
      legacyCkptOrds = Nil, legacyDeltaOrds = Nil, dirWhere = "spec",
      read = readOf(Map("_gen-1.json" -> ckpt1)),
      logLabel = "generation", path = "spec")
    assert(liveGone.isEmpty, "a LIVE vanished artifact must force a re-list")
    // and the delta variant still classifies
    val both = GeoParquet.classifyUniArts(
      Seq("_gen-1.json", "_gen-3.json"),
      GeoParquet.GenArtPrefix, GeoParquet.genArtName,
      GeoParquet.genArtKind,
      legacyCkptOrds = Nil, legacyDeltaOrds = Nil, dirWhere = "spec",
      read = readOf(Map("_gen-1.json" -> ckpt1, "_gen-3.json" -> delta3)),
      logLabel = "generation", path = "spec")
    assert(both.exists(u => u.ckptOrds == Seq(1) && u.deltaOrds == Seq(3)))
  }

  test("twin fallback is NOT engaged over a vanished unified read — re-list, never memoize stale twin state") {
    // the r16-ADVICE shape: a HEALTHY unified chain {1 ckpt, 2 delta,
    // 3 delta} beside a legacy checkpoint twin at the max ordinal 3
    // (mixed-version dataset). Delta 2's read transiently fails
    // (vanish between listing and open): the gap makes
    // contiguousAbove(postMax=1) false, which WANTS the twin fallback
    // — whose expanded horizon (ckptMax=3) would then classify the
    // vanished 2 as dead and silently return the stale twin state,
    // dropping unified commits 2 AND 3. The classifier must re-list
    // (None) instead; with all reads present the unified chain wins
    // and the twin stays ignored.
    val ckpt1 = GeoParquet.renderGenState(
      GenState(1, 0, Map("f.parquet" -> GenEntry(0, -1))))
    def delta(n: Int) = GeoParquet.renderGenDelta(GenDelta(n, 0, Set.empty,
      Set.empty, Map(s"g$n.parquet" -> GenEntry(1, -1)), Set.empty))
    def readOf(m: Map[String, String])(n: String): Option[String] = m.get(n)
    val listing = Seq("_gen-1.json", "_gen-2.json", "_gen-3.json")
    val vanished = GeoParquet.classifyUniArts(
      listing, GeoParquet.GenArtPrefix, GeoParquet.genArtName,
      GeoParquet.genArtKind,
      legacyCkptOrds = Seq(3), legacyDeltaOrds = Nil, dirWhere = "spec",
      read = readOf(Map("_gen-1.json" -> ckpt1, "_gen-3.json" -> delta(3))),
      logLabel = "generation", path = "spec-vanish-twin")
    assert(vanished.isEmpty,
      "a vanished unified read engaged the twin fallback — stale twin " +
        "state would be memoized and the live unified commits dropped")
    val whole = GeoParquet.classifyUniArts(
      listing, GeoParquet.GenArtPrefix, GeoParquet.genArtName,
      GeoParquet.genArtKind,
      legacyCkptOrds = Seq(3), legacyDeltaOrds = Nil, dirWhere = "spec",
      read = readOf(Map("_gen-1.json" -> ckpt1,
        "_gen-2.json" -> delta(2), "_gen-3.json" -> delta(3))),
      logLabel = "generation", path = "spec-vanish-twin-whole")
    assert(whole.exists(u => u.ckptOrds == Seq(1) &&
        u.deltaOrds == Seq(2, 3) && u.legacyCkptOrds.isEmpty),
      s"the re-listed whole chain must classify unified (twin ignored): $whole")
  }

  test("pre-r16 twin-name datasets migrate: exact reads mixed, unified commits beside legacy names, first fold sweeps them (both logs)") {
    val dir = java.nio.file.Files.createTempDirectory("twin-migrate").toFile
    try {
      import spark.implicits._
      val path = s"$dir/z"
      val conf = spark.sessionState.newHadoopConf()
      def batch(lo: Int) = Seq((lo.toLong, lo % 10, (lo * 3) % 10))
        .toDF("id", "a", "b").coalesce(1)
      GeoParquet.packZOrderToParquet(batch(0), Seq("a", "b"), path, 1)
      (1 to 3).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      val stBefore = GeoParquet.readGenState(path, conf).get
      val scBefore = GeoParquet.readSidecarText(path, conf).get
      // time-travel the layout: rename every unified artifact to its
      // r15 twin name per kind — exactly what an r15-written dataset
      // looks like on disk
      LogLayout.genCkpts(path).foreach { case (o, f) =>
        assert(f.renameTo(new java.io.File(f.getParent, s"_genckpt-$o.json"))) }
      LogLayout.genDeltas(path).foreach { case (o, f) =>
        assert(f.renameTo(new java.io.File(f.getParent, s"_gendelta-$o.json"))) }
      LogLayout.scCkpts(path).foreach { case (o, f) =>
        assert(f.renameTo(new java.io.File(f.getParent, s"_scckpt-$o.json"))) }
      LogLayout.scDeltas(path).foreach { case (o, f) =>
        assert(f.renameTo(new java.io.File(f.getParent, s"_scdelta-$o.json"))) }
      // the rename broke the Hadoop checksum pairing; drop stale crcs
      Seq("_gen", "_sc").foreach { d =>
        Option(new java.io.File(s"$path/$d").listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".crc")).foreach(_.delete()) }

      // exact read of the pure-legacy layout
      assert(GeoParquet.readGenState(path, conf).contains(stBefore))
      assert(GeoParquet.readSidecarText(path, conf).contains(scBefore))

      // new commits land UNIFIED beside the legacy names (the
      // crash-window intermediate state: mixed namespaces, one
      // ordinal line) and still read exactly
      GeoParquet.appendNumericWithSidecar(batch(4), path, Seq("a", "b"))
      assert(LogLayout.genDeltas(path).nonEmpty, "append did not commit unified")
      val mixedNames = new java.io.File(s"$path/_gen").list().toSeq
      assert(mixedNames.exists(_.startsWith(GeoParquet.DeltaPrefix)))
      assert(GeoParquet.readGenState(path, conf).get.currentGen == 4)
      assert(GeoParquet.readZOrderRange(spark, path, Seq(("a", -1e9, 1e9)))
        .count() == 5)

      // drive past the fold: the migration sweeps every legacy name
      (5 to GeoParquet.DeltaFoldEvery + 2).foreach(i =>
        GeoParquet.appendNumericWithSidecar(batch(i), path, Seq("a", "b")))
      val genNames = new java.io.File(s"$path/_gen").list().toSeq
      assert(!genNames.exists(n => n.startsWith(GeoParquet.DeltaPrefix) ||
        n.startsWith(GeoParquet.CkptPrefix)),
        s"fold did not sweep legacy manifest names: $genNames")
      val scNames = new java.io.File(s"$path/_sc").list().toSeq
      assert(!scNames.exists(n => n.startsWith(GeoParquet.ScDeltaPrefix) ||
        n.startsWith(GeoParquet.ScCkptPrefix)),
        s"fold did not sweep legacy sidecar names: $scNames")
      val n = GeoParquet.DeltaFoldEvery + 3
      assert(GeoParquet.readZOrderRange(spark, path, Seq(("a", -1e9, 1e9)))
        .count() == n)
      assert(GeoParquet.parseSidecar(
        GeoParquet.readSidecarText(path, conf).get, "__rowcount").size == n)
      // every generation still reconstructs across the migrated seam
      (0 until n).foreach(g => assert(
        GeoParquet.readZOrderAtGeneration(spark, path, g).count() == g + 1,
        s"wrong snapshot at generation $g"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
