package graft.plans

import graft.functions.{StGeomIntersects, StIntersects}
import graft.tools.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge

/** Bounded LRU cache for plan-keyed planner state: evicts the
  * least-recently-USED entry instead of wiping wholesale, so a long
  * interactive session cycling more than `cap` distinct plans never
  * re-pays stats/detection jobs for the entries it is actively using.
  * putIfAbsent semantics (first computed value wins) to match the
  * recursion-safe get → compute-outside-the-lock → putIfAbsent
  * pattern of the callers. */
private[plans] final class LruCache[K, V](cap: Int) {
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > cap
  }
  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
  def putIfAbsent(k: K, v: V): Unit =
    m.synchronized { if (!m.containsKey(k)) { m.put(k, v); () } }
  private[plans] def size: Int = m.synchronized(m.size())
  private[plans] def contains(k: K): Boolean =
    m.synchronized(m.containsKey(k))
}

/**
 * Optimizer rule planning spatial joins automatically: a
 * `Join(left, right, condition = st_intersects(pointAttr, geomAttr))`
 * — which Catalyst would otherwise execute as a BroadcastNestedLoopJoin
 * (O(n*m) comparisons) — is rewritten into the grid-cell HASH equi-join
 * + exact-refine plan of [[SpatialJoin.gridInner]] (SURVEY §3.2's
 * target plan; the automatic version of the reference's index-
 * accelerated sjoin, tools/sjoin.py:97-133). A
 * `st_geom_intersects(aAttr, bAttr)` condition (any kind pair) is
 * planned the same way through [[SpatialJoin.geomGridInner]], with both
 * sides cell-exploded and pairs deduped by reference cell.
 *
 * JOIN TYPES: the point arm plans Inner, LeftOuter/LeftSemi/LeftAnti
 * (point side on the left — the probing/preserved side) and RightOuter
 * (point side on the right; planned as the reordered LeftOuter) — the
 * SQL-surface twins of the reference's `sjoin(how=...)`
 * (tools/sjoin.py:26-94). The non-inner variants go through
 * [[SpatialJoin.gridPointJoin]], which folds the exact predicate (and
 * any residual conjunct) INTO the join condition: a point keys exactly
 * one grid cell, so outer/semi/anti multiplicity is exact with no key
 * column. A preserved GEOMETRY side (e.g. LeftOuter with the point on
 * the right) has no keyless grid shape — the geometry side explodes —
 * so those fall through to Catalyst's BNLJ, which remains correct.
 * The geometry×geometry arm plans Inner only.
 *
 * The grid cell edge length comes from `spark.graft.sjoin.cellSize`
 * (data units) when set: any value is correct — it only shifts the
 * candidate-blowup / selectivity balance. When UNSET, the rule derives
 * it from the geometry side's bbox statistics
 * ([[SpatialJoin.autoCellSize]]: 2x the median bbox edge via one
 * approxQuantile pass), the same data-derived default as the API path
 * — so a 100x scale-up with different geometry extents needs no
 * manual retuning. The stats pass runs once per rewritten join, at
 * planning time, over the build side only — and is a BATCH action, so
 * a STREAMING geometry side with no explicit cellSize conf is left
 * untouched. Extra conjuncts in the join condition are preserved (as
 * a residual filter for inner, inside the join condition for the
 * outer variants); non-attribute operands fall through untouched
 * (BNLJ remains the correct fallback).
 *
 * Skew: `spark.graft.sjoin.salt` > 1 salts the grid keys on both
 * arms; `spark.graft.sjoin.adaptiveSalt=true` additionally runs
 * hot-cell detection (one counting pass, cached per canonicalized
 * probe-side plan so the fixed-point optimizer never re-fires it) and
 * salts ONLY the dense cells — the planner twin of
 * `pointInGeom(adaptiveSalt = true)` / `geomJoin(adaptiveSalt =
 * true)`, with the same small-input gate
 * (`spark.graft.sjoin.adaptiveSalt.minBytes`). The gate is HONEST on
 * derived (non-scan) probe sides: plan byte stats over-count there
 * (products of children), so the rule falls back to CBO rowCount when
 * available and otherwise a bounded row probe
 * ([[SpatialJoin.smallInputSide]]), cached like detection. Streaming
 * probe sides skip detection (blanket salt) — plan-time batch jobs
 * are illegal there.
 */
case class SpatialJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import SpatialJoinRewrite.MaxCached

  private def confCellSize: Option[Double] =
    spark.conf.getOption("spark.graft.sjoin.cellSize").map(_.toDouble)
  // derived sizes cache keyed by a COMPACT fingerprint of the
  // canonicalized geometry-side plan (semanticHash + schema), not the
  // plan object itself — plan trees retain relations/file listings and
  // would leak driver memory across a long interactive session. The
  // rule re-runs on every action of the same DataFrame (and per join
  // in a multi-join plan) — without the cache each would pay the
  // autoCellSize stats job again at planning time.
  private val derivedSizes = new LruCache[(Int, String), java.lang.Double](MaxCached)
  /** Conf value if set, else the data-derived size from the geometry
    * (build) side — matching `SpatialJoin.sjoin`'s cellSize <= 0 path.
    * NOT computeIfAbsent-under-the-lock: the stats job runs a Spark
    * action that re-enters this rule, so the compute happens outside
    * the cache's lock (get → compute → putIfAbsent); the worst case
    * is a rare duplicate stats job. */
  private def cellSizeFor(geomSide: LogicalPlan, geomAttr: AttributeReference): Double =
    confCellSize.getOrElse {
      val canon = geomSide.canonicalized
      val key = (canon.semanticHash(), canon.schema.catalogString)
      derivedSizes.get(key) match {
        case Some(v) => v.doubleValue()
        case None =>
          val v = SpatialJoin.autoCellSize(
            Bridge.ofRows(spark, geomSide), Bridge.column(geomAttr))
          derivedSizes.putIfAbsent(key, v)
          v
      }
    }
  private def salt: Int =
    spark.conf.get("spark.graft.sjoin.salt", "1").toInt

  // hot-cell detection results keyed like derivedSizes — a COMPACT
  // fingerprint of the canonicalized PROBE-side plan (the `kind` tag
  // separates the point detector from the exploded-cell geometry
  // detector) plus every conf the detection depends on. The cache is
  // what keeps the eager counting pass from re-firing inside the
  // fixed-point optimizer (the rule re-runs per optimizer iteration
  // and per action of the same DataFrame); same get → compute outside
  // the lock → putIfAbsent recursion-safety story as derivedSizes
  // (the detection job's own planning re-enters this rule, but its
  // plan carries no spatial join, so it cannot recurse into
  // detection).
  private val derivedHotCells = new LruCache[
    (String, Int, String, Long, String, String), Option[Seq[(Long, Long)]]](MaxCached)

  // small-input verdicts that needed the bounded row PROBE (a batch
  // job): cached so re-planning the same derived probe side never
  // re-pays it. Stats-only verdicts are cheap and not cached.
  private val derivedSmall = new LruCache[(Int, String, Long), java.lang.Boolean](MaxCached)

  /** The honest small-input gate, planner side: stats verdicts
    * (rowCount / definitive small bytes / honest scan bytes) are
    * computed directly on the mid-optimization plan; only the bounded
    * row probe materializes a DataFrame, and its verdict is cached
    * per canonicalized plan. */
  private def smallFor(side: LogicalPlan): Boolean = {
    val minBytes = SpatialJoin.adaptiveMinBytes(spark)
    if (minBytes <= 0) false
    else {
      val minRows = SpatialJoin.adaptiveMinRows(spark)
      SpatialJoin.smallPlanVerdict(side, minBytes, minRows).getOrElse {
        val canon = side.canonicalized
        val key = (canon.semanticHash(), canon.schema.catalogString, minRows)
        derivedSmall.get(key) match {
          case Some(v) => v.booleanValue()
          case None =>
            val v = SpatialJoin.probeSmall(Bridge.ofRows(spark, side), minRows)
            derivedSmall.putIfAbsent(key, java.lang.Boolean.valueOf(v))
            v
        }
      }
    }
  }

  private def adaptiveEnabled: Boolean =
    spark.conf.get("spark.graft.sjoin.adaptiveSalt", "false").toBoolean

  private def detectCached(kind: String, side: LogicalPlan, cellSize: Double,
                           run: org.apache.spark.sql.DataFrame => Option[Seq[(Long, Long)]])
      : Option[Seq[(Long, Long)]] = {
    val canon = side.canonicalized
    val key = (kind, canon.semanticHash(), canon.schema.catalogString,
      java.lang.Double.doubleToLongBits(cellSize),
      spark.conf.get("spark.graft.sjoin.hotCellFactor", "2.0"),
      spark.conf.get("spark.sql.shuffle.partitions", "200"))
    derivedHotCells.get(key) match {
      case Some(v) => v
      case None =>
        val v = run(Bridge.ofRows(spark, side))
        derivedHotCells.putIfAbsent(key, v)
        v
    }
  }

  /** Planner twin of the API paths' adaptive-salt engage logic, one
    * function for both arms: `spark.graft.sjoin.adaptiveSalt=true`
    * (with salt > 1) detects hot cells once per distinct probe-side
    * plan (`kind` separates the point detector from the exploded-cell
    * geometry detector) and salts only those; small probe sides
    * (honest verdict — [[smallFor]]) skip the counting pass and keep
    * blanket salting, and a STREAMING probe side does too (detection
    * and the probe are batch actions — illegal at plan time of a
    * streaming query). The detected→(salt, hot) mapping is
    * [[SpatialJoin.mapDetected]] — the single shared copy, so the
    * planner and API semantics cannot drift. */
  private def adaptiveSaltFor(side: LogicalPlan, kind: String,
                              cellSize: Double, s: Int,
                              detect: org.apache.spark.sql.DataFrame => Option[Seq[(Long, Long)]])
      : (Int, Option[Seq[(Long, Long)]]) =
    if (s <= 1 || !adaptiveEnabled) (s, None)
    else if (side.isStreaming) (s, None)
    else if (smallFor(side)) (s, None)
    else SpatialJoin.mapDetected(s, detectCached(kind, side, cellSize, detect))

  private def adaptiveFor(ptSide: LogicalPlan, pointAttr: AttributeReference,
                          cellSize: Double, s: Int): (Int, Option[Seq[(Long, Long)]]) =
    adaptiveSaltFor(ptSide, "pt", cellSize, s,
      df => SpatialJoin.detectHotCells(df, Bridge.column(pointAttr), cellSize))

  private def adaptiveGeomFor(aSide: LogicalPlan, aAttr: AttributeReference,
                              cellSize: Double, s: Int): (Int, Option[Seq[(Long, Long)]]) =
    adaptiveSaltFor(aSide, "geom", cellSize, s,
      df => SpatialJoin.detectHotGeomCells(df, Bridge.column(aAttr), cellSize))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** Join types the point arm can plan. */
  private def pointArmType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner, Some(cond), _)
        if conjuncts(cond).exists {
          case StGeomIntersects(_: AttributeReference, _: AttributeReference, _, _) => true
          case _ => false
        } =>
      // geometry x geometry predicate -> dual-side grid join with
      // reference-cell dedup (SpatialJoin.geomGridInner); same guards
      // and residual handling as the point-in-geom arm below
      val parts = conjuncts(cond)
      val (sg, a, b) = parts.collectFirst {
        case e @ StGeomIntersects(x: AttributeReference, y: AttributeReference, _, _) =>
          (e, x, y)
      }.get
      val rest = parts.filterNot(_ eq sg)
      val hasEquiKeys = rest.exists {
        case EqualTo(x, y) =>
          (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
          (x.references.subsetOf(r.outputSet) && y.references.subsetOf(l.outputSet))
        case _ => false
      }
      val hasTempCols = (l.output ++ r.output).exists(attr =>
        SpatialJoin.ReservedGeomGridCols.contains(attr.name))
      // (side holding a, side holding b, kinds in that order)
      val sides =
        if (hasEquiKeys || hasTempCols) None
        else if (l.outputSet.contains(a) && r.outputSet.contains(b))
          Some((l, r, sg.leftKind, sg.rightKind, a, b))
        else if (r.outputSet.contains(a) && l.outputSet.contains(b))
          Some((r, l, sg.leftKind, sg.rightKind, a, b))
        else None
      sides match {
        // autoCellSize is a plan-time batch job — a streaming build
        // side with no explicit cellSize conf cannot be rewritten
        case Some((_, bSide, _, _, _, _))
            if confCellSize.isEmpty && bSide.isStreaming => j
        case Some((aSide, bSide, aKind, bKind, aAttr, bAttr)) =>
          val cs = cellSizeFor(bSide, bAttr)
          val (effSalt, hot) = adaptiveGeomFor(aSide, aAttr, cs, salt)
          val joined = SpatialJoin.geomGridInner(
            Bridge.ofRows(spark, aSide), Bridge.ofRows(spark, bSide),
            Bridge.column(aAttr), aKind, Bridge.column(bAttr), bKind,
            cs, effSalt, hot)
          val rewritten = joined.queryExecution.analyzed
          val filtered =
            if (rest.isEmpty) rewritten
            else Filter(rest.reduce(And), rewritten)
          Project(j.output, filtered)
        case None => j
      }

    case j @ Join(l, r, jt, Some(cond), _) if pointArmType(jt) =>
      val parts = conjuncts(cond)
      parts.collectFirst {
        case si @ StIntersects(p: AttributeReference, g: AttributeReference, _) => (si, p, g)
      } match {
        case Some((si, p, g)) =>
          val rest = parts.filterNot(_ eq si)
          // Only rewrite PURE spatial theta joins. If the condition also
          // carries cross-side equi-keys, Catalyst already hash-joins on
          // them — and, crucially, our OWN output can reappear here
          // (PushDownPredicates merges the exact-refine filter back into
          // the grid equi-join), so rewriting again would corrupt the
          // __cx/__cy keys.
          val hasEquiKeys = rest.exists {
            case EqualTo(a, b) =>
              (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
              (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
            case _ => false
          }
          val hasTempCols = (l.output ++ r.output).exists(a =>
            SpatialJoin.ReservedGridOuterCols.contains(a.name))
          val ptOnLeft = l.outputSet.contains(p) && r.outputSet.contains(g)
          val ptOnRight = r.outputSet.contains(p) && l.outputSet.contains(g)
          // (point side, geometry side) — for the non-inner types the
          // point side must be the PRESERVED/probing side: LeftOuter/
          // LeftSemi/LeftAnti with the point on the left, RightOuter
          // with the point on the right (planned as the reordered
          // LeftOuter). A preserved geometry side falls through (it
          // cell-explodes, so no keyless outer shape exists).
          val sides: Option[(LogicalPlan, LogicalPlan)] =
            if (hasEquiKeys || hasTempCols) None
            else jt match {
              case Inner =>
                if (ptOnLeft) Some((l, r))
                else if (ptOnRight) Some((r, l))
                else None
              case LeftOuter | LeftSemi | LeftAnti =>
                if (ptOnLeft) Some((l, r)) else None
              case RightOuter =>
                if (ptOnRight) Some((r, l)) else None
              case _ => None
            }
          sides match {
            case Some((_, gmSide))
                if confCellSize.isEmpty && gmSide.isStreaming => j
            case Some((ptSide, gmSide)) =>
              val cs = cellSizeFor(gmSide, g)
              val (effSalt, hot) = adaptiveFor(ptSide, p, cs, salt)
              val rewritten = jt match {
                case Inner =>
                  val joined = SpatialJoin.gridInner(
                    Bridge.ofRows(spark, ptSide), Bridge.ofRows(spark, gmSide),
                    Bridge.column(p), Bridge.column(g),
                    si.rightKind, cs, effSalt, hot)
                  // child plans are embedded as-is, so every original
                  // attribute (exprId included) survives; restore the
                  // join's output order with a final Project
                  val inner = joined.queryExecution.analyzed
                  if (rest.isEmpty) inner else Filter(rest.reduce(And), inner)
                case _ =>
                  // outer/semi/anti: residual conjuncts belong INSIDE
                  // the join condition (a post-filter would drop
                  // preserved rows / flip membership verdicts)
                  val residual =
                    if (rest.isEmpty) None
                    else Some(Bridge.column(rest.reduce(And)))
                  val joinTypeStr = jt match {
                    case LeftSemi => "left_semi"
                    case LeftAnti => "left_anti"
                    case _ => "left"
                  }
                  SpatialJoin.gridPointJoin(
                    Bridge.ofRows(spark, ptSide), Bridge.ofRows(spark, gmSide),
                    Bridge.column(p), Bridge.column(g), si.rightKind, cs,
                    joinTypeStr, residual, effSalt, hot)
                    .queryExecution.analyzed
              }
              Project(j.output, rewritten)
            case None => j
          }
        case None => j
      }
  }
}

object SpatialJoinRewrite {
  private[plans] val MaxCached = 64
  /** Install on an existing session (tests / interactive use); new
    * sessions get it via `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[SpatialJoinRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialJoinRewrite(spark)
  }
}
