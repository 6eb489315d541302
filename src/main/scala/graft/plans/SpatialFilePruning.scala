package graft.plans

import graft.functions.StIntersectsBounds
import graft.io.GeoParquet
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, GetStructField, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/**
 * Optimizer rule making spatial partition pruning AUTOMATIC: a
 * `Filter(st_intersects_bounds(geom, <literal box>))` directly above a
 * parquet relation whose root directory carries a
 * `_spatial_metadata.json` sidecar gets its file list pruned to the
 * files whose stored bounds intersect the query box. The filter is kept
 * as the exact residual — only the scan shrinks.
 *
 * This is the planner-integrated version of `GeoParquet.read(bounds=…)`
 * (reference: io/parquet.py:411-446 — partition skipping on read), the
 * same way the reference's dask `cx` prunes partitions before running
 * the row predicate (dask.py:611-638). The rule is conservative: files
 * missing from the sidecar, NaN bounds, multi-root or hive-partitioned
 * relations are left untouched, and it converges because a second
 * application finds nothing more to drop.
 */
case class SpatialFilePruning(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, l: LogicalRelation)
        if l.relation.isInstanceOf[HadoopFsRelation] =>
      val fsRel = l.relation.asInstanceOf[HadoopFsRelation]
      val boxes = pruneBoxes(cond, l.output)
      if (boxes.nonEmpty && fsRel.partitionSchema.isEmpty &&
          fsRel.location.rootPaths.length == 1) {
        val root = fsRel.location.rootPaths.head
        val conf = spark.sessionState.newHadoopConf()
        // ONE sidecar read for every box (it was re-read per column).
        // A malformed/foreign manifest — or ANY read failure, e.g. the
        // exists-then-open race against a writer's delete→rename swap —
        // is treated as absent: this rule stays conservative, never a
        // planning-time crash.
        val sidecarText =
          try GeoParquet.readSidecarText(root.toString, conf)
          catch { case scala.util.control.NonFatal(_) => None }
        val stOpt =
          try GeoParquet.readGenState(root.toString, conf)
          catch { case scala.util.control.NonFatal(_) => None }
        // no graft metadata at all -> nothing this rule can do (two
        // cheap existence probes for plain parquet dirs)
        if (sidecarText.isEmpty && stOpt.isEmpty) f
        else {
          val allFiles = fsRel.location.inputFiles
          val names = allFiles.map(uri =>
            uri.substring(uri.lastIndexOf('/') + 1)).toSet
          // parity with GeoParquet.read: the plan's pinned listing is
          // reconciled against the (later-read) manifest per rewrite
          // generation — tombstones apply only when their replacements
          // are all pinned, rewrite output participates only as a
          // complete set, and unrecorded rw-* files (an in-flight or
          // aborted compaction's output) are dropped. See
          // GeoParquet.reconcileListing for the full contract.
          val keepNames = GeoParquet.reconcileListingProbed(
            root.getFileSystem(conf), root, names.toSeq.sorted, stOpt).toSet
          val current = allFiles.filter { uri =>
            keepNames(uri.substring(uri.lastIndexOf('/') + 1))
          }
          // every (column, box) pair prunes independently; keep the
          // intersection of survivors
          val kept = boxes.foldLeft(current) { case (files, (geomName, qx0, qy0, qx1, qy1)) =>
            val perFile = sidecarText
              .map(GeoParquet.parseSidecar(_, geomName))
              .getOrElse(Map.empty)
            if (perFile.isEmpty) files
            else files.filter { uri =>
              val name = uri.substring(uri.lastIndexOf('/') + 1)
              perFile.get(name) match {
                case Some(Array(x0, y0, x1, y1)) =>
                  // NaN bounds (empty file) compare false -> kept
                  !(x1 < qx0 || x0 > qx1 || y1 < qy0 || y0 > qy1)
                case _ => true // unknown file: conservative keep
              }
            }
          }
          // compare against the ORIGINAL file list: a tombstone-only
          // shrink (boxes pruned nothing further) must still rewrite
          // the scan, or the superseded files stay in it
          if (kept.length < allFiles.length) {
            val prunedIndex = new InMemoryFileIndex(spark,
              kept.toIndexedSeq.map(new Path(_)), fsRel.options,
              Some(fsRel.dataSchema))
            val newRel = fsRel.copy(location = prunedIndex)(spark)
            Filter(cond, l.copy(relation = newRel))
          } else f
        }
      } else f
  }

  /** Query boxes recoverable from the filter, per geometry column:
    *  - st_intersects_bounds(attr, 4 foldable doubles) conjuncts;
    *  - plain struct-field comparisons attr.x >= lit etc. — the shape
    *    the point-kind `cx` compiles to (codegen-friendly comparisons),
    *    combined into one (possibly half-open) box per attribute. */
  private def pruneBoxes(cond: Expression,
                         output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : Seq[(String, Double, Double, Double, Double)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    def d(e: Expression): Option[Double] =
      if (e.foldable) Option(e.eval(null)).collect { case v: Double => v }
      else None
    val parts = conjuncts(cond)

    val kernelBoxes = parts.collect {
      case StIntersectsBounds(g: AttributeReference, ex0, ey0, ex1, ey1, _)
          if output.exists(_.exprId == g.exprId) &&
             Seq(ex0, ey0, ex1, ey1).forall(e => d(e).exists(v => !v.isNaN)) =>
        val x0 = d(ex0).get; val y0 = d(ey0).get
        val x1 = d(ex1).get; val y1 = d(ey1).get
        (g.name, math.min(x0, x1), math.min(y0, y1),
          math.max(x0, x1), math.max(y0, y1))
    }

    // attr -> (xLo, yLo, xHi, yHi) accumulated from field comparisons
    val fieldBoxes = scala.collection.mutable.LinkedHashMap
      .empty[String, Array[Double]]
    def box(g: AttributeReference): Array[Double] =
      fieldBoxes.getOrElseUpdate(g.name,
        Array(Double.NegativeInfinity, Double.NegativeInfinity,
          Double.PositiveInfinity, Double.PositiveInfinity))
    def axis(name: String): Option[Int] = name match {
      case "x" => Some(0)
      case "y" => Some(1)
      case _ => None
    }
    parts.foreach {
      case GreaterThanOrEqual(GetStructField(g: AttributeReference, _, Some(fld)), v)
          if output.exists(_.exprId == g.exprId) =>
        for (a <- axis(fld); lim <- d(v)) {
          val b = box(g); b(a) = math.max(b(a), lim)
        }
      case GreaterThan(GetStructField(g: AttributeReference, _, Some(fld)), v)
          if output.exists(_.exprId == g.exprId) =>
        for (a <- axis(fld); lim <- d(v)) {
          val b = box(g); b(a) = math.max(b(a), lim)
        }
      case LessThanOrEqual(GetStructField(g: AttributeReference, _, Some(fld)), v)
          if output.exists(_.exprId == g.exprId) =>
        for (a <- axis(fld); lim <- d(v)) {
          val b = box(g); b(a + 2) = math.min(b(a + 2), lim)
        }
      case LessThan(GetStructField(g: AttributeReference, _, Some(fld)), v)
          if output.exists(_.exprId == g.exprId) =>
        for (a <- axis(fld); lim <- d(v)) {
          val b = box(g); b(a + 2) = math.min(b(a + 2), lim)
        }
      case _ =>
    }
    val pointBoxes = fieldBoxes.toSeq.collect {
      case (name, b) if b.exists(v => !v.isInfinite) =>
        (name, b(0), b(1), b(2), b(3))
    }
    kernelBoxes ++ pointBoxes
  }

}

object SpatialFilePruning {
  /** Install on an existing session (tests / interactive use). New
    * sessions get it from `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    val rule = SpatialFilePruning(spark)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[SpatialFilePruning]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}

/** Session-extension entry point — `spark.sql.extensions=
  * graft.plans.GraftExtensions` gives a session the whole engine: both
  * optimizer rules AND the SQL function surface (st_* spatial catalog +
  * the text/vector pipeline functions), no registerAll call needed. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import graft.functions._
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
  import org.apache.spark.sql.types.DoubleType

  private def fn(ext: org.apache.spark.sql.SparkSessionExtensions,
                 name: String, clazz: String,
                 builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(clazz, name), builder))

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => SpatialFilePruning(session))
    ext.injectOptimizerRule(session => SpatialJoinRewrite(session))
    ext.injectOptimizerRule(session => BloomJoinRewrite(session))

    fn(ext, "st_area", classOf[StArea].getName, es => StArea(es.head))
    fn(ext, "st_length", classOf[StLength].getName, es => StLength(es.head))
    fn(ext, "st_bounds", classOf[StBounds].getName, es => StBounds(es.head))
    fn(ext, "st_boundary", classOf[StBoundary].getName, es => StBoundary(es.head))
    fn(ext, "st_oriented", classOf[StOriented].getName, es => StOriented(es.head))
    fn(ext, "st_total_bounds", classOf[StTotalBoundsAgg].getName,
      es => StTotalBoundsAgg(es.head).toAggregateExpression())
    fn(ext, "st_collect_points", classOf[StCollectPoints].getName,
      es => StCollectPoints(Cast(es(0), DoubleType), Cast(es(1), DoubleType))
        .toAggregateExpression())
    for (kind <- Seq("point", "multipoint", "line", "multiline", "polygon", "multipolygon")) {
      fn(ext, s"st_${kind}_intersects_bounds", classOf[StIntersectsBounds].getName,
        es => StIntersectsBounds(es(0), Cast(es(1), DoubleType), Cast(es(2), DoubleType),
          Cast(es(3), DoubleType), Cast(es(4), DoubleType), kind))
      fn(ext, s"st_intersects_$kind", classOf[StIntersects].getName,
        es => StIntersects(es(0), es(1), kind))
      fn(ext, s"st_astext_$kind", classOf[StAsText].getName, es => StAsText(es.head, kind))
      fn(ext, s"st_geomfromtext_$kind", classOf[StGeomFromText].getName,
        es => StGeomFromText(es.head, kind))
      fn(ext, s"st_asgeojson_$kind", classOf[StAsGeoJson].getName,
        es => StAsGeoJson(es.head, kind))
      fn(ext, s"st_geomfromgeojson_$kind", classOf[StGeomFromGeoJson].getName,
        es => StGeomFromGeoJson(es.head, kind))
    }
    fn(ext, "simhash64", classOf[SimHash64].getName, es => SimHash64(es.head, 3, 42L))
    fn(ext, "minhash_signature", classOf[MinHashSignature].getName,
      es => MinHashSignature(es.head, 3, 64, 42L))
    fn(ext, "ngram_jaccard", classOf[NgramJaccard].getName,
      es => NgramJaccard(es(0), es(1), 3))
    fn(ext, "doc_fingerprint", classOf[DocFingerprint].getName,
      es => DocFingerprint(es.head, 42L))
    fn(ext, "cosine_similarity", classOf[CosineSimilarity].getName,
      es => CosineSimilarity(es(0), es(1)))
    fn(ext, "quantized_dot", classOf[QuantizedDot].getName,
      es => QuantizedDot(es(0), es(1), 1000.0))
    fn(ext, "srp_bits", classOf[SrpBits].getName, es => SrpBits(es.head, 16, 42L))
    fn(ext, "vector_sum", classOf[VectorSumAgg].getName,
      es => VectorSumAgg(Cast(es.head,
        org.apache.spark.sql.types.ArrayType(DoubleType))).toAggregateExpression())
    fn(ext, "lang_id", classOf[LangId].getName, es => LangId(es.head,
      Seq("es", "fr", "de", "en").map(l =>
        l -> graft.pipeline.TextAnalysis.langStopwords(l))))
  }
}
