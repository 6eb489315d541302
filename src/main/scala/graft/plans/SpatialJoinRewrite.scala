package graft.plans

import graft.functions.{StGeomIntersects, StIntersects}
import graft.tools.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge

/**
 * Optimizer rule planning spatial joins automatically: an INNER
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
 * The grid cell edge length comes from `spark.graft.sjoin.cellSize`
 * (data units) when set: any value is correct — it only shifts the
 * candidate-blowup / selectivity balance. When UNSET, the rule derives
 * it from the geometry side's bbox statistics
 * ([[SpatialJoin.autoCellSize]]: 2x the median bbox edge via one
 * approxQuantile pass), the same data-derived default as the API path
 * — so a 100x scale-up with different geometry extents needs no
 * manual retuning. The stats pass runs once per rewritten join, at
 * planning time, over the build side only. Extra conjuncts in the
 * join condition are preserved as a residual filter; non-inner
 * spatial joins and non-attribute operands fall through untouched
 * (BNLJ remains the correct fallback).
 *
 * Skew: `spark.graft.sjoin.salt` > 1 salts the grid keys;
 * `spark.graft.sjoin.adaptiveSalt=true` additionally runs hot-cell
 * detection (one counting pass, cached per canonicalized point-side
 * plan so the fixed-point optimizer never re-fires it) and salts ONLY
 * the dense cells — the planner twin of
 * `pointInGeom(adaptiveSalt = true)`, with the same small-input gate
 * (`spark.graft.sjoin.adaptiveSalt.minBytes`).
 */
case class SpatialJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def confCellSize: Option[Double] =
    spark.conf.getOption("spark.graft.sjoin.cellSize").map(_.toDouble)
  // derived sizes cache keyed by a COMPACT fingerprint of the
  // canonicalized geometry-side plan (semanticHash + schema), not the
  // plan object itself — plan trees retain relations/file listings and
  // would leak driver memory across a long interactive session. The
  // rule re-runs on every action of the same DataFrame (and per join
  // in a multi-join plan) — without the cache each would pay the
  // autoCellSize stats job again at planning time.
  private val derivedSizes =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), java.lang.Double]
  private val MaxCachedSizes = 64
  /** Conf value if set, else the data-derived size from the geometry
    * (build) side — matching `SpatialJoin.sjoin`'s cellSize <= 0 path.
    * NOT computeIfAbsent: the stats job runs a Spark action that
    * re-enters this rule, and a nested computeIfAbsent on the same
    * ConcurrentHashMap from inside a mapping function is unspecified
    * (can throw "recursive update" or livelock). Plain get → compute
    * outside the map → putIfAbsent is recursion-safe; the worst case
    * is a rare duplicate stats job. */
  private def cellSizeFor(geomSide: LogicalPlan, geomAttr: AttributeReference): Double =
    confCellSize.getOrElse {
      val canon = geomSide.canonicalized
      val key = (canon.semanticHash(), canon.schema.catalogString)
      derivedSizes.get(key) match {
        case v: java.lang.Double => v.doubleValue()
        case null =>
          val v = SpatialJoin.autoCellSize(
            Bridge.ofRows(spark, geomSide), Bridge.column(geomAttr))
          if (derivedSizes.size >= MaxCachedSizes) derivedSizes.clear()
          derivedSizes.putIfAbsent(key, v)
          v
      }
    }
  private def salt: Int =
    spark.conf.get("spark.graft.sjoin.salt", "1").toInt

  // hot-cell detection results keyed like derivedSizes — a COMPACT
  // fingerprint of the canonicalized POINT-side plan plus every conf
  // the detection depends on. The cache is what keeps the eager
  // counting pass from re-firing inside the fixed-point optimizer
  // (the rule re-runs per optimizer iteration and per action of the
  // same DataFrame); same get → compute outside the map → putIfAbsent
  // recursion-safety story as derivedSizes (the detection job's own
  // planning re-enters this rule, but its plan carries no spatial
  // join, so it cannot recurse into detection).
  private val derivedHotCells = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, Long, String, String), Option[Seq[(Long, Long)]]]

  /** Planner twin of `pointInGeom(adaptiveSalt = true)`'s engage
    * logic: `spark.graft.sjoin.adaptiveSalt=true` (with salt > 1)
    * detects hot cells once per distinct point-side plan and salts
    * only those; point sides under
    * `spark.graft.sjoin.adaptiveSalt.minBytes` (plan-stats estimate)
    * skip the counting pass and keep blanket salting — the same gate
    * that makes the API flag safe to leave on. Returns (effective
    * salt, hot set) exactly as the API path maps them: no hot cell →
    * unsalted; cap exceeded → blanket; else hot-only. */
  private def adaptiveFor(ptSide: LogicalPlan, pointAttr: AttributeReference,
                          cellSize: Double, s: Int): (Int, Option[Seq[(Long, Long)]]) = {
    val enabled =
      spark.conf.get("spark.graft.sjoin.adaptiveSalt", "false").toBoolean
    if (s <= 1 || !enabled) (s, None)
    else if (ptSide.stats.sizeInBytes <
        BigInt(SpatialJoin.adaptiveMinBytes(spark))) (s, None)
    else {
      val canon = ptSide.canonicalized
      val key = (canon.semanticHash(), canon.schema.catalogString,
        java.lang.Double.doubleToLongBits(cellSize),
        spark.conf.get("spark.graft.sjoin.hotCellFactor", "2.0"),
        spark.conf.get("spark.sql.shuffle.partitions", "200"))
      val detected = derivedHotCells.get(key) match {
        case null =>
          val v = SpatialJoin.detectHotCells(
            Bridge.ofRows(spark, ptSide), Bridge.column(pointAttr), cellSize)
          if (derivedHotCells.size >= MaxCachedSizes) derivedHotCells.clear()
          derivedHotCells.putIfAbsent(key, v)
          v
        case v => v
      }
      detected match {
        case None => (1, None)
        case Some(cells) if cells.isEmpty => (s, None)
        case Some(cells) => (s, Some(cells))
      }
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
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
        case Some((aSide, bSide, aKind, bKind, aAttr, bAttr)) =>
          val joined = SpatialJoin.geomGridInner(
            Bridge.ofRows(spark, aSide), Bridge.ofRows(spark, bSide),
            Bridge.column(aAttr), aKind, Bridge.column(bAttr), bKind,
            cellSizeFor(bSide, bAttr))
          val rewritten = joined.queryExecution.analyzed
          val filtered =
            if (rest.isEmpty) rewritten
            else Filter(rest.reduce(And), rewritten)
          Project(j.output, filtered)
        case None => j
      }

    case j @ Join(l, r, Inner, Some(cond), _) =>
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
            SpatialJoin.ReservedGridCols.contains(a.name))
          val sides =
            if (hasEquiKeys || hasTempCols) None
            else if (l.outputSet.contains(p) && r.outputSet.contains(g)) Some((l, r))
            else if (r.outputSet.contains(p) && l.outputSet.contains(g)) Some((r, l))
            else None
          sides match {
            case Some((ptSide, gmSide)) =>
              val cs = cellSizeFor(gmSide, g)
              val (effSalt, hot) = adaptiveFor(ptSide, p, cs, salt)
              val joined = SpatialJoin.gridInner(
                Bridge.ofRows(spark, ptSide), Bridge.ofRows(spark, gmSide),
                Bridge.column(p), Bridge.column(g),
                si.rightKind, cs, effSalt, hot)
              // child plans are embedded as-is, so every original
              // attribute (exprId included) survives; restore the
              // join's output order with a final Project
              val rewritten = joined.queryExecution.analyzed
              val filtered =
                if (rest.isEmpty) rewritten
                else Filter(rest.reduce(And), rewritten)
              Project(j.output, filtered)
            case None => j
          }
        case None => j
      }
  }
}

object SpatialJoinRewrite {
  /** Install on an existing session (tests / interactive use); new
    * sessions get it via `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[SpatialJoinRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SpatialJoinRewrite(spark)
  }
}
