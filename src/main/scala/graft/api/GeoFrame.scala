package graft.api

import graft.Geo._
import graft.tools.SpatialJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Active-geometry wrapper over a DataFrame — the Spark analog of the
 * reference's GeoDataFrame (reference: geodataframe.py:17-135).
 *
 * A GeoFrame is a plain DataFrame plus (geometryCol, kind); every method
 * delegates to declarative DataFrame ops so Catalyst keeps optimizing.
 * `kind` is one of point|multipoint|line|multiline|polygon|multipolygon
 * (needed because multipoint/line share a physical schema — SURVEY §1.2).
 */
final case class GeoFrame(df: DataFrame, geometryCol: String, kind: String) {

  // SURVEY §1.4: the reference's parameterized geometry subtypes
  // (polygon[int32], …) deliberately collapse to float64 here. Enforce
  // the contract at construction — a non-double coordinate column fails
  // NOW with an actionable message instead of deep inside a kernel
  // (where an unsafe getDouble on int data would read garbage).
  {
    import org.apache.spark.sql.types._
    require(GeoFrame.Kinds.contains(kind),
      s"unknown geometry kind '$kind' (expected ${GeoFrame.Kinds.mkString("|")})")
    val field = df.schema.fields.find(_.name == geometryCol).getOrElse(
      throw new IllegalArgumentException(
        s"geometry column '$geometryCol' not found in " +
          s"[${df.schema.fieldNames.mkString(", ")}]"))
    def leaf(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => leaf(e)
      case other => other
    }
    val leaves = field.dataType match {
      case st: StructType => st.fields.map(f => leaf(f.dataType)).toSeq
      case dt => Seq(leaf(dt))
    }
    require(leaves.forall(_ == DoubleType),
      s"geometry column '$geometryCol' has coordinate type(s) " +
        s"${leaves.distinct.mkString(", ")}; this engine stores all " +
        "coordinates as float64 (SURVEY §1.4) — cast the column to double")
  }

  def geometry: Column = df(geometryCol)

  /** Switch the active geometry column (reference: geodataframe.py:86-117). */
  def setGeometry(col: String, kind: String): GeoFrame = GeoFrame(df, col, kind)

  // ---- measures (reference: geoseries.py:68-117) ----------------------
  def area: DataFrame = df.withColumn("area", st_area(geometry))
  def length: DataFrame = df.withColumn("length", st_length(geometry))
  def bounds: DataFrame = {
    val b = st_bounds(geometry)
    df.withColumn("x0", b.getField("x0")).withColumn("y0", b.getField("y0"))
      .withColumn("x1", b.getField("x1")).withColumn("y1", b.getField("y1"))
  }

  /** (xmin, ymin, xmax, ymax) over the whole frame — one distributed
    * partial-aggregating job (reference: dask.py:43-51). */
  def totalBounds: (Double, Double, Double, Double) = {
    val tb = st_total_bounds(geometry)
    val row = df.agg(tb.head, tb.tail: _*).head()
    def d(i: Int): Double = if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    (d(0), d(1), d(2), d(3))
  }

  /** Row-level bbox predicate for this geometry kind. For points this is
    * plain column comparisons — fully codegen'd AND pushed down to
    * Parquet row-group stats (the Spark analog of the reference's
    * R-tree covers/overlaps split, SURVEY §3.1). */
  def intersectsBounds(x0: Double, y0: Double, x1: Double, y1: Double): Column = {
    // normalize inverted rects like the reference (base.py:684-688)
    val (lx0, lx1) = if (x1 < x0) (x1, x0) else (x0, x1)
    val (ly0, ly1) = if (y1 < y0) (y1, y0) else (y0, y1)
    kind match {
      case "point" =>
        st_x(geometry).between(lx0, lx1) && st_y(geometry).between(ly0, ly1)
      case "multipoint" =>
        st_multipoint_intersects_bounds(geometry, lit(lx0), lit(ly0), lit(lx1), lit(ly1))
      case "line" =>
        st_line_intersects_bounds(geometry, lit(lx0), lit(ly0), lit(lx1), lit(ly1))
      case "multiline" =>
        st_multiline_intersects_bounds(geometry, lit(lx0), lit(ly0), lit(lx1), lit(ly1))
      case "polygon" =>
        st_polygon_intersects_bounds(geometry, lit(lx0), lit(ly0), lit(lx1), lit(ly1))
      case "multipolygon" =>
        st_multipolygon_intersects_bounds(geometry, lit(lx0), lit(ly0), lit(lx1), lit(ly1))
      case other => throw new IllegalArgumentException(s"unknown kind $other")
    }
  }

  /** Bounding-box selection — the reference's `gdf.cx[x0:x1, y0:y1]`
    * (reference: geometry/base.py:657-729, dask.py:611-638). */
  def cx(x0: Double, y0: Double, x1: Double, y1: Double): GeoFrame =
    copy(df = df.where(intersectsBounds(x0, y0, x1, y1)))

  /** `cx` with open slice ends: a None bound defaults to the frame's
    * total bounds, like the reference's open slices `gdf.cx[:x1, y0:]`
    * (reference: geometry/base.py:661-689 — open ends resolve against
    * total_bounds). Costs one bounds aggregate when any end is open. */
  def cxOpen(x0: Option[Double] = None, y0: Option[Double] = None,
             x1: Option[Double] = None, y1: Option[Double] = None): GeoFrame = {
    if (Seq(x0, y0, x1, y1).forall(_.isDefined))
      cx(x0.get, y0.get, x1.get, y1.get)
    else {
      val (tx0, ty0, tx1, ty1) = totalBounds
      cx(x0.getOrElse(tx0), y0.getOrElse(ty0),
         x1.getOrElse(tx1), y1.getOrElse(ty1))
    }
  }

  /** Reference-parity `.sindex` (geometry/base.py:563-572,
    * geometry/sindex.py): a DRIVER-side packed Hilbert R-tree over the
    * frame's per-row bounds, keyed by `keyCol` (long-castable, unique)
    * since a distributed frame has no stable positional index. Probe
    * with [[GeoIndex.intersects]] / [[GeoIndex.coversOverlaps]] — the
    * same covered/overlapping split the reference's `cx` index path
    * uses (base.py:691-729).
    *
    * SCALE CONTRACT: this COLLECTS (key, bbox) — 40 bytes/row, guarded
    * by `spark.graft.broadcastJoin.maxRows` exactly like the broadcast
    * joins it shares machinery with. It is the interactive/driver probe
    * surface; inside queries the same index wins come for free from
    * `cx` predicate pushdown, sidecar file pruning, and the grid /
    * broadcast spatial joins. Null geometries are skipped (reference
    * sjoin semantics). */
  def sindex(keyCol: String): GeoIndex = {
    // null keys are dropped WITH their rows (a row the index cannot
    // name is a row it cannot return — same "null matches nothing"
    // contract as the broadcast joins); duplicate keys fail fast
    // instead of silently conflating distinct rows in probe results
    val keyed = graft.tools.SpatialJoin.collectCapped(
      df.where(geometry.isNotNull && df(keyCol).isNotNull)
        .select(df(keyCol).cast("long"), st_bounds(geometry)),
      "GeoFrame.sindex input", "cx / sjoin (distributed)")
    val n = keyed.length
    val keys = new Array[Long](n)
    val bounds = new Array[Double](n * 4)
    var i = 0
    while (i < n) {
      val r = keyed(i)
      require(!r.isNullAt(0),
        s"GeoFrame.sindex: key column '$keyCol' must cast to BIGINT " +
          "(a non-numeric key casts to null)")
      keys(i) = r.getLong(0)
      val b = r.getStruct(1)
      bounds(i * 4) = b.getDouble(0); bounds(i * 4 + 1) = b.getDouble(1)
      bounds(i * 4 + 2) = b.getDouble(2); bounds(i * 4 + 3) = b.getDouble(3)
      i += 1
    }
    require(keys.distinct.length == n,
      s"GeoFrame.sindex: key column '$keyCol' must be unique — " +
        "duplicate keys would conflate distinct rows in probe results")
    new GeoIndex(keys, graft.geom.HilbertRtree.build(bounds))
  }

  /** Hilbert distance column over given (or computed) total bounds
    * (reference: geometry/base.py:603-615). */
  def hilbertDistance(p: Int = 15,
                      totalBoundsOpt: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val (tx0, ty0, tx1, ty1) = totalBoundsOpt.getOrElse(totalBounds)
    df.withColumn("hilbert_distance",
      st_hilbert_distance(geometry, lit(tx0), lit(ty0), lit(tx1), lit(ty1), p))
  }

  /** Morton (z-order) distance column over given (or computed) total
    * bounds — same quantized grid as [[hilbertDistance]]. */
  def mortonDistance(p: Int = 15,
                     totalBoundsOpt: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val (tx0, ty0, tx1, ty1) = totalBoundsOpt.getOrElse(totalBounds)
    df.withColumn("morton_distance",
      st_morton_distance(geometry, lit(tx0), lit(ty0), lit(tx1), lit(ty1), p))
  }

  /** Spatially pack partitions: space-filling-curve range-repartition +
    * local sort — the Spark-native equivalent of the reference's
    * quantile/digitize shuffle machinery (reference: dask.py:207-532;
    * SURVEY §2.1: repartitionByRange replaces manual quantiles).
    * `curve` picks the ordering: "hilbert" (reference semantics, best
    * locality) or "morton" (z-order, the lakehouse-standard layout). */
  def packPartitions(numPartitions: Int, p: Int = 15,
                     curve: String = "hilbert"): GeoFrame = {
    val distCol = curve match {
      case "hilbert" => "hilbert_distance"
      case "morton"  => "morton_distance"
      case other => throw new IllegalArgumentException(
        s"curve must be 'hilbert' or 'morton', got '$other'")
    }
    val withH = if (curve == "hilbert") hilbertDistance(p) else mortonDistance(p)
    copy(df = withH.repartitionByRange(numPartitions, col(distCol))
      .sortWithinPartitions(distCol))
  }

  // ---- missing data (reference: geometry/base.py:315, 510-560) --------
  def isNa: Column = geometry.isNull
  def dropNa: GeoFrame = copy(df = df.where(geometry.isNotNull))
  def fillNa(value: Column): GeoFrame =
    copy(df = df.withColumn(geometryCol, coalesce(geometry, value)))

  /** Pad-fill nulls with the previous non-null geometry in `orderCol`
    * order — the reference's fillna(method='pad') as a window
    * (SURVEY §2.2: last(ignoreNulls) over unbounded preceding).
    *
    * NOTE: a global Window.orderBy collapses to ONE task — correct but
    * sequential; use only for frames that fit one executor. For large
    * frames use [[padNaPartitioned]]. */
  def padNa(orderCol: Column, limit: Int = -1): GeoFrame = {
    import org.apache.spark.sql.expressions.Window
    val lo = if (limit > 0) -limit.toLong else Window.unboundedPreceding
    val w = Window.orderBy(orderCol).rowsBetween(lo, 0)
    copy(df = df.withColumn(geometryCol, last(geometry, ignoreNulls = true).over(w)))
  }

  /** Backward fill: nulls take the NEXT non-null geometry in `orderCol`
    * order, at most `limit` rows ahead (reference fillna(method=
    * 'backfill'), base.py:510-560). Same single-task caveat as [[padNa]]. */
  def backfillNa(orderCol: Column, limit: Int = -1): GeoFrame = {
    import org.apache.spark.sql.expressions.Window
    val hi = if (limit > 0) limit.toLong else Window.unboundedFollowing
    val w = Window.orderBy(orderCol).rowsBetween(0, hi)
    copy(df = df.withColumn(geometryCol, first(geometry, ignoreNulls = true).over(w)))
  }

  /** Distributed pad-fill: two-pass partition-boundary carry (ADVICE r1).
    *
    * Pass 1: range-repartition on `orderCol`; fill within each partition
    * with a per-partition window (parallel across partitions). Pass 2:
    * the last non-null geometry of every partition (a numPartitions-row
    * aggregate) is carried forward to fill each partition's leading
    * nulls via a broadcast join. Same result as [[padNa]] whenever
    * `orderCol` is a total order; scales to arbitrarily large frames
    * (the only single-task step runs over numPartitions rows). */
  def padNaPartitioned(orderCol: Column, numPartitions: Int): GeoFrame =
    directionalFillPartitioned(orderCol, numPartitions, forward = true)

  /** Shared two-pass fill: range-repartition in fill direction, fill
    * within each partition with a per-partition window, then carry each
    * partition's boundary non-null geometry across partitions via a
    * broadcast (a numPartitions-row table). The bucketed frame is
    * persisted so both passes observe identical partition ids; the
    * cache stays pinned until the caller drops it
    * (spark.catalog.clearCache() or unpersist). */
  private def directionalFillPartitioned(orderCol: Column, numPartitions: Int,
                                         forward: Boolean): GeoFrame = {
    import org.apache.spark.sql.expressions.Window
    val dir = if (forward) orderCol.asc else orderCol.desc
    val bucketed = df.repartitionByRange(numPartitions, dir)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val w = Window.partitionBy(col("__pid")).orderBy(dir)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = bucketed.withColumn(geometryCol,
      last(geometry, ignoreNulls = true).over(w))
    // boundary non-null geometry per partition (last in fill direction),
    // carried to partitions later in that direction
    val boundaryAgg =
      if (forward) max_by(geometry, orderCol) else min_by(geometry, orderCol)
    val boundaries = bucketed.where(geometry.isNotNull)
      .groupBy(col("__pid")).agg(boundaryAgg.as("__edge"))
    val allPids = bucketed.select(col("__pid")).distinct()
    val carryW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allPids.join(boundaries, Seq("__pid"), "left")
      .withColumn("__carry", last(col("__edge"), ignoreNulls = true).over(carryW))
      .select(col("__pid"), col("__carry"))
    val out = filled.join(broadcast(carries), Seq("__pid"))
      .withColumn(geometryCol, coalesce(col(geometryCol), col("__carry")))
      .drop("__pid", "__carry")
    copy(df = out)
  }

  /** Distributed backward fill — the [[backfillNa]] twin of
    * [[padNaPartitioned]]: the same two-pass shape mirrored to
    * descending order (nulls take the NEXT non-null geometry). */
  def backfillNaPartitioned(orderCol: Column, numPartitions: Int): GeoFrame =
    directionalFillPartitioned(orderCol, numPartitions, forward = false)

  /** Positional row access under an EXPLICIT total order — SURVEY
    * §2.2's take/slice (the reference's iloc, geodataframe.py via the
    * pandas protocol). A distributed frame has no implicit row order,
    * so position is DEFINED relative to `orderBy` (include a unique
    * tiebreak column), materialized by the two-pass distributed row
    * number ([[graft.tools.Ranks.globalRowNumber]] — range exchange +
    * O(1) per-partition offsets, NO single-task window), then filtered.
    * 0-based, stop-exclusive: iloc[start:stop:step]. */
  def slicePositional(start: Long, stop: Long, step: Long,
                      numPartitions: Int, orderBy: Column*): GeoFrame = {
    require(start >= 0 && stop >= start && step >= 1,
      s"need 0 <= start <= stop and step >= 1, got [$start, $stop) step $step")
    copy(df = positioned(numPartitions, orderBy)
      .where(col(GeoFrame.PosCol) >= start && col(GeoFrame.PosCol) < stop &&
        (col(GeoFrame.PosCol) - start) % step === 0)
      .drop(GeoFrame.PosCol))
  }

  /** Positional take — the rows at exactly `indices` (0-based) under
    * the explicit order: iloc[[i, j, ...]]. Out-of-range indices
    * select nothing (the pandas contract raises; a distributed frame
    * can't know its length without a count, so absent rows are the
    * composable behavior — count the result to detect misses). */
  def takePositional(indices: Seq[Long], numPartitions: Int,
                     orderBy: Column*): GeoFrame = {
    require(indices.nonEmpty && indices.forall(_ >= 0),
      s"need non-empty, non-negative indices, got $indices")
    copy(df = positioned(numPartitions, orderBy)
      .where(col(GeoFrame.PosCol).isin(indices: _*))
      .drop(GeoFrame.PosCol))
  }

  private def positioned(numPartitions: Int, orderBy: Seq[Column]): DataFrame = {
    require(!df.columns.contains(GeoFrame.PosCol),
      s"input column collides with reserved name ${GeoFrame.PosCol}")
    graft.tools.Ranks.globalRowNumber(df, GeoFrame.PosCol, numPartitions,
        orderBy: _*)
      .withColumn(GeoFrame.PosCol, col(GeoFrame.PosCol) - 1) // 1-based rank -> 0-based pos
  }

  /** Lexicographic geometry sort over flat coordinates, shorter-first on
    * ties — Spark's array ordering IS the reference's comparison
    * (reference: baselist.py:249-290); nested kinds compare flattened. */
  def sortByGeometry: GeoFrame = {
    val key = kind match {
      case "point" => geometry
      case "multipoint" | "line" => geometry
      case "multiline" | "polygon" => flatten(geometry)
      case "multipolygon" => flatten(flatten(geometry))
      case other => throw new IllegalArgumentException(s"unknown kind $other")
    }
    copy(df = df.orderBy(key))
  }

  /** Spatial join on exact intersection (reference: tools/sjoin.py:26-133). */
  def sjoin(other: GeoFrame, how: String = "inner", cellSize: Double = 0,
            leftKey: String = null, rightKey: String = null): DataFrame =
    if (kind == "point")
      // the reference's support matrix (point LHS, base.py:634-651):
      // single-cell point assignment, no pair dedup needed
      SpatialJoin.pointInGeom(df, other.df, geometryCol, other.geometryCol,
        other.kind, cellSize, how, leftKey, rightKey)
    else
      // full-matrix extension: dual-side cell explode + reference-cell
      // dedup + exact st_geom_intersects refine
      SpatialJoin.geomJoin(df, other.df, geometryCol, kind,
        other.geometryCol, other.kind, cellSize, how, leftKey, rightKey)

  /** Nearest-neighbor join (the geopandas sjoin_nearest extension —
    * point frames only): each left point gets its `k` nearest right
    * rows within `maxDistance`; how="left" keeps isolated left rows.
    * Delegates to [[graft.tools.SpatialJoin.nearestJoinAdaptive]] —
    * the density-adaptive two-phase plan, result-identical to the
    * fixed-radius [[graft.tools.SpatialJoin.nearestJoin]] (same
    * certification/tie-break contract, shared oracle) but O(k) rather
    * than O(density·πR²) candidates per left point, so a 10x-denser
    * extent costs ~1x instead of ~10x. NOTE: the adaptive path runs
    * ONE small stats aggregate over `other` (count + bbox) EAGERLY at
    * call time to derive the probe radius — this method is not a pure
    * plan constructor. Call `SpatialJoin.nearestJoin` directly for the
    * lazy fixed-radius baseline. */
  def sjoinNearest(other: GeoFrame, maxDistance: Double,
                   leftKey: String, rightKey: String,
                   k: Int = 1, how: String = "inner",
                   distCol: String = "nn_dist2"): DataFrame = {
    require(kind == "point" && other.kind == "point",
      s"sjoinNearest requires point frames, got $kind x ${other.kind}")
    SpatialJoin.nearestJoinAdaptive(df, other.df, geometryCol, other.geometryCol,
      maxDistance, leftKey, rightKey, k, how, distCol)
  }
}

object GeoFrame {
  /** The six reference geometry kinds (SURVEY §1.2; multipoint/line and
    * ring/line share physical schemas, ring folds into line). */
  val Kinds: Set[String] =
    Set("point", "multipoint", "line", "multiline", "polygon", "multipolygon")

  /** Reserved internal column for positional take/slice ranks. */
  private[api] val PosCol = "__pos"
}

/** Driver-side spatial index returned by [[GeoFrame.sindex]]: a packed
  * Hilbert R-tree over per-row bounds, answering bbox probes with ROW
  * KEYS (the reference returns positions; a distributed frame keys by
  * column instead). Bbox-level candidates only — refine with the exact
  * kernels where the predicate demands it, as the reference's cx path
  * does (base.py:713-722). */
final class GeoIndex private[api] (keys: Array[Long],
                                   tree: graft.geom.HilbertRtree) {
  def size: Int = keys.length
  def isEmpty: Boolean = keys.isEmpty
  def totalBounds: (Double, Double, Double, Double) = tree.totalBounds

  /** Keys of rows whose bounds intersect the query box. */
  def intersects(x0: Double, y0: Double, x1: Double, y1: Double): Array[Long] =
    tree.intersects(x0, y0, x1, y1).map(keys(_))

  /** (fully-covered keys, overlapping-candidate keys) — the covered
    * rows need no exact refinement, the reference's cx optimization. */
  def coversOverlaps(x0: Double, y0: Double, x1: Double, y1: Double)
      : (Array[Long], Array[Long]) = {
    val (c, o) = tree.coversOverlaps(x0, y0, x1, y1)
    (c.map(keys(_)), o.map(keys(_)))
  }
}
