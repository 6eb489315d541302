package graft.io

import graft.io.GeoParquet.{GenEntry, GenState}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/**
 * Model-based tests of the generation-manifest state machine, with no
 * Spark involved:
 *
 *  - render -> parse is the IDENTITY for arbitrary states (the strict
 *    parser's round-trip check can therefore never reject a manifest
 *    the writer produced — corruption detection with zero false
 *    positives on the writer's own output);
 *  - a random sequence of append / compact / vacuum transitions keeps
 *    GenState's snapshot (`liveAt`) equal to an INDEPENDENT model that
 *    replays the history as plain set algebra, and the change windows
 *    (non-rewrite arrivals) partition exactly the appended files.
 */
object GenStateProperties extends Properties("genstate") {

  private val fileName: Gen[String] = for {
    n <- Gen.choose(4, 12)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '-' :+ '.'))
  } yield "part-" + cs.mkString

  private val genEntry: Gen[GenEntry] = for {
    added <- Gen.choose(0, 30)
    removed <- Gen.oneOf(Gen.const(-1), Gen.choose(0, 30))
  } yield GenEntry(added, removed)

  private val genState: Gen[GenState] = for {
    commit <- Gen.choose(0, 1000)
    minGen <- Gen.choose(0, 10)
    nFiles <- Gen.choose(0, 20)
    names <- Gen.listOfN(nFiles, fileName)
    entries <- Gen.listOfN(nFiles, genEntry)
    rewrites <- Gen.listOf(Gen.choose(0, 30))
  } yield GenState(commit, minGen, names.zip(entries).toMap, rewrites.toSet)

  property("render -> parse is the identity") = forAll(genState) { st =>
    val parsed = GeoParquet.parseGenState(GeoParquet.renderGenState(st), "t")
    parsed == st
  }

  property("delta render -> parse is the identity") = forAll(
    for {
      c <- Gen.choose(0, 1000); m <- Gen.choose(0, 10)
      ra <- Gen.listOf(Gen.choose(0, 30)); rd <- Gen.listOf(Gen.choose(0, 30))
      ns <- Gen.choose(0, 8); setNames <- Gen.listOfN(ns, fileName)
      setEntries <- Gen.listOfN(ns, genEntry)
      del <- Gen.listOf(fileName)
    } yield GeoParquet.GenDelta(c, m, ra.toSet, rd.toSet,
      setNames.zip(setEntries).toMap, del.toSet)) { d =>
    GeoParquet.parseGenDelta(GeoParquet.renderGenDelta(d), "t") == d
  }

  property("apply(prev, diff(prev, next)) == next for arbitrary pairs") =
    forAll(genState, genState) { (prev, next0) =>
      // the commit path always bumps the ordinal; diff/apply carry it
      val next = next0.copy(commit = prev.commit + 1)
      GeoParquet.applyGenDelta(prev,
        GeoParquet.diffGenState(prev, next)) == next
    }

  property("legacy v1 text parses to an all-live state") =
    forAll(Gen.mapOf(Gen.zip(fileName, Gen.choose(0, 9)))) { m =>
      val text = m.toSeq.sortBy(_._1)
        .map { case (f, g) => "\"" + f + "\":" + g }
        .mkString("{", ",", "}")
      val st = GeoParquet.parseGenState(text, "t")
      st.files == m.map { case (f, g) => f -> GenEntry(g, -1) } &&
        st.minGen == 0 && st.rewrites.isEmpty
    }

  // -- random op sequences vs an independent set-algebra model ---------

  private sealed trait Op
  private case class Append(n: Int) extends Op
  private case object Compact extends Op
  private case class Vacuum(retain: Int) extends Op

  private val opsGen: Gen[List[Op]] = Gen.listOfN(8,
    Gen.frequency(
      5 -> Gen.choose(1, 3).map(Append),
      2 -> Gen.const(Compact),
      2 -> Gen.choose(0, 3).map(Vacuum)))

  property("append/compact/vacuum history replays as set algebra") =
    forAll(opsGen) { ops =>
      var st = GenState(0, 0, Map.empty)
      // independent model: per generation, the batch of file names it
      // ADDED (arrivals or rewrite output) — snapshots derive from it
      // by plain set unions, never via GenState's own logic
      var arrivals = Vector.empty[Set[String]] // index = generation
      var rewriteGens = Set.empty[Int]
      var counter = 0
      def freshNames(n: Int): Set[String] = {
        counter += n
        ((counter - n) until counter).map(i => f"part-$i%05d").toSet
      }
      // model snapshot at g: every batch <= g, minus batches a rewrite
      // at r <= g superseded (a rewrite replaces everything before it)
      def modelSnapshot(g: Int): Set[String] = {
        val lastRw = rewriteGens.filter(_ <= g).maxOption
        lastRw match {
          case None => arrivals.take(g + 1).flatten.toSet
          case Some(r) =>
            arrivals(r) ++ ((r + 1) to g).flatMap(arrivals(_))
        }
      }
      ops.foreach {
        case Append(n) =>
          val names = freshNames(n)
          val g = st.currentGen + 1
          st = st.copy(files = st.files ++ names.map(_ -> GenEntry(g, -1)))
          arrivals :+= names
        case Compact =>
          val g0 = st.currentGen
          if (g0 >= 0 && st.liveAt(g0).nonEmpty) {
            val live = st.liveAt(g0).toSet
            val names = freshNames(2)
            val g = g0 + 1
            st = st.copy(files = st.files.map { case (f, e) =>
              if (e.removed < 0 && live(f)) f -> e.copy(removed = g)
              else f -> e
            } ++ names.map(_ -> GenEntry(g, -1)),
              rewrites = st.rewrites + g)
            arrivals :+= names
            rewriteGens += g
          }
        case Vacuum(retain) =>
          if (st.currentGen >= 0)
            st = st.copy(minGen =
              math.max(st.minGen, math.max(0, st.currentGen - retain)))
      }
      val head = st.currentGen
      if (head < 0) true
      else {
        val snapshotsMatch = (st.minGen to head).forall(g =>
          st.liveAt(g).toSet == modelSnapshot(g))
        // change windows: non-rewrite arrivals partition the appended
        // files — window (a, b] holds exactly the arrival batches of
        // its non-rewrite generations
        val changesMatch = (st.minGen to head).forall { b =>
          val from = st.minGen - 1
          val expected = ((from + 1) to b)
            .filterNot(rewriteGens)
            .flatMap(g => if (g < arrivals.length) arrivals(g) else Set.empty)
            .toSet
          val got = st.files.collect {
            case (f, e) if e.added > from && e.added <= b &&
              !st.rewrites(e.added) => f
          }.toSet
          got == expected
        }
        snapshotsMatch && changesMatch
      }
    }

  // -- sidecar delta log (the _sc/ twin of the manifest's _gendelta) --

  private val boundsVal: Gen[Double] = Gen.oneOf(
    Gen.const(Double.NaN), Gen.choose(-1e6, 1e6),
    Gen.choose(-50, 50).map(_.toDouble))
  private val boundsArr: Gen[Array[Double]] =
    Gen.listOfN(4, boundsVal).map(_.toArray)
  private val colName: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '_'))
  } yield cs.mkString
  private val colBlock: Gen[Map[String, Array[Double]]] =
    Gen.mapOf(Gen.zip(fileName, boundsArr))
  private val scState: Gen[Map[String, Map[String, Array[Double]]]] =
    Gen.mapOf(Gen.zip(colName, colBlock))
  private val scDelta: Gen[GeoParquet.ScDelta] = for {
    ups <- scState
    del <- Gen.listOf(fileName)
  } yield GeoParquet.ScDelta(ups, del.toSet)

  // Array[Double] breaks ==; canonical text is the equality domain
  private def canon(st: Map[String, Map[String, Array[Double]]]): String =
    GeoParquet.renderSidecar(st, 0)

  property("scdelta render -> parse -> render is the identity") =
    forAll(scDelta) { d =>
      val t = GeoParquet.renderScDelta(d)
      GeoParquet.renderScDelta(GeoParquet.parseScDelta(t, "t")) == t
    }

  property("sidecar render -> parseAll -> render is the identity") =
    forAll(scState) { st =>
      val t = canon(st)
      canon(GeoParquet.parseSidecarAll(t)) == t
    }

  property("applyScDelta: removals erase, upserts land, the rest survives") =
    forAll(scState, scDelta) { (st, d) =>
      val got = GeoParquet.applyScDelta(st, d)
      def b2s(a: Array[Double]) = a.map(_.toString).mkString(",")
      // a deleted file is gone from EVERY column unless this delta's
      // upsert re-adds it there
      val delsErase = d.del.forall(f => got.forall { case (c, m) =>
        m.contains(f) == d.ups.get(c).exists(_.contains(f)) })
      // every upsert lands with exactly its bounds
      val upsLand = d.ups.forall { case (c, files) =>
        files.forall { case (f, v) =>
          got.get(c).flatMap(_.get(f)).exists(w => b2s(w) == b2s(v)) } }
      // untouched entries (not deleted, not upserted) survive unchanged
      val restSurvives = st.forall { case (c, m) =>
        m.forall { case (f, v) =>
          d.del(f) || d.ups.get(c).exists(_.contains(f)) ||
            got.get(c).flatMap(_.get(f)).exists(w => b2s(w) == b2s(v)) } }
      delsErase && upsLand && restSurvives
    }

  // -- pinned on-disk format golden: the v2 render must never drift
  // (an old engine reading a new manifest, or vice versa, is a strict
  // ERROR by design — so the format itself must be frozen by a test)
  property("v2 render golden") = propBoolean {
    val st = GenState(7, 2, Map(
      "part-b" -> GenEntry(0, 3),
      "part-a" -> GenEntry(1, -1),
      "part-c" -> GenEntry(3, -1)), Set(3))
    GeoParquet.renderGenState(st) ==
      """{"_commit":7,"_min":2,"_rw":[3],"files":{""" +
        """"part-a":[1,-1],"part-b":[0,3],"part-c":[3,-1]}}"""
  }
}
