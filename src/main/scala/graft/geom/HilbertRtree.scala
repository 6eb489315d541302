package graft.geom

import scala.collection.mutable.ArrayBuffer

/**
 * Read-only packed Hilbert R-tree over 2-D bounding boxes, stored as an
 * array-encoded binary tree — a Scala port of the reference's read-only
 * index (reference: spatialpandas/spatialindex/rtree.py:68-359).
 *
 * `bounds` is row-major flat: 4 doubles per box (xmin, ymin, xmax, ymax).
 * Used driver-side for partition pruning and executor-side inside the
 * spatial join to bbox-prune candidate pairs.
 */
final class HilbertRtree private (
    val sortedBounds: Array[Double],   // 4 per row, hilbert-sorted
    val keys: Array[Int],              // sortedRow -> original index
    val pageSize: Int,
    val boundsTree: Array[Double],     // 4 per node, NaN = absent
    val numRows: Int) extends Serializable {

  private def treeNodes: Int = boundsTree.length / 4
  private def leafStart: Int = (treeNodes + 1) / 2 - 1

  def isEmpty: Boolean = numRows == 0

  /** (xmin, ymin, xmax, ymax) over all boxes; NaNs when empty. */
  def totalBounds: (Double, Double, Double, Double) =
    if (isEmpty) (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    else (boundsTree(0), boundsTree(1), boundsTree(2), boundsTree(3))

  private def startIndex(node0: Int): Int = {
    var node = node0
    while (true) {
      val child = 2 * node + 1
      if (child >= treeNodes) return (node - leafStart) * pageSize
      node = child
    }
    -1
  }

  private def stopIndex(node0: Int): Int = {
    var node = node0
    while (true) {
      val child = 2 * node + 2
      if (child >= treeNodes) return (node - leafStart + 1) * pageSize
      node = child
    }
    -1
  }

  /** Classify tree ranges: fully-covered ranges and maybe-intersecting page
    * ranges. Reference: rtree.py:312-359 (_maybe_intersects_ranges). */
  private def maybeIntersectsRanges(qx0: Double, qy0: Double, qx1: Double, qy1: Double)
      : (ArrayBuffer[(Int, Int)], ArrayBuffer[(Int, Int)]) = {
    val covered = ArrayBuffer.empty[(Int, Int)]
    val maybe = ArrayBuffer.empty[(Int, Int)]
    var stack = List(0)
    while (stack.nonEmpty) {
      val node = stack.head
      stack = stack.tail
      val b0 = boundsTree(node * 4)
      val b1 = boundsTree(node * 4 + 1)
      val b2 = boundsTree(node * 4 + 2)
      val b3 = boundsTree(node * 4 + 3)
      val outside = qx1 < b0 || qy1 < b1 || qx0 > b2 || qy0 > b3 || b0.isNaN
      if (!outside) {
        val inside = b0 >= qx0 && b1 >= qy0 && b2 <= qx1 && b3 <= qy1
        val start = startIndex(node)
        val stop = stopIndex(node)
        if (inside) covered += ((start, stop))
        else if (stop - start <= pageSize) maybe += ((start, stop))
        else stack = (2 * node + 2) :: (2 * node + 1) :: stack
      }
    }
    (covered, maybe)
  }

  /** Original indices of boxes intersecting the query rect.
    * Reference: rtree.py:361-415 (intersects). */
  def intersects(qx0: Double, qy0: Double, qx1: Double, qy1: Double): Array[Int] = {
    if (isEmpty) return Array.emptyIntArray
    val (covered, maybe) = maybeIntersectsRanges(qx0, qy0, qx1, qy1)
    val out = ArrayBuffer.empty[Int]
    for ((start, stop) <- covered) {
      var i = start
      val end = math.min(stop, numRows)
      while (i < end) { out += keys(i); i += 1 }
    }
    for ((start, stop) <- maybe) {
      var i = start
      val end = math.min(stop, numRows)
      while (i < end) {
        val b = i * 4
        val out2 = sortedBounds(b + 2) < qx0 || sortedBounds(b) > qx1 ||
          sortedBounds(b + 3) < qy0 || sortedBounds(b + 1) > qy1
        if (!out2) out += keys(i)
        i += 1
      }
    }
    out.toArray
  }

  /** (covered, overlapping) original indices: covered boxes lie fully inside
    * the query rect (no exact refine needed); overlapping ones need the
    * exact per-row predicate. Reference: rtree.py:417-468 (covers_overlaps). */
  def coversOverlaps(qx0: Double, qy0: Double, qx1: Double, qy1: Double)
      : (Array[Int], Array[Int]) = {
    if (isEmpty) return (Array.emptyIntArray, Array.emptyIntArray)
    val (covered, maybe) = maybeIntersectsRanges(qx0, qy0, qx1, qy1)
    val covers = ArrayBuffer.empty[Int]
    val overlaps = ArrayBuffer.empty[Int]
    for ((start, stop) <- covered) {
      var i = start
      val end = math.min(stop, numRows)
      while (i < end) { covers += keys(i); i += 1 }
    }
    for ((start, stop) <- maybe) {
      var i = start
      val end = math.min(stop, numRows)
      while (i < end) {
        val b = i * 4
        val x0 = sortedBounds(b); val y0 = sortedBounds(b + 1)
        val x1 = sortedBounds(b + 2); val y1 = sortedBounds(b + 3)
        val outside = x1 < qx0 || x0 > qx1 || y1 < qy0 || y0 > qy1
        if (!outside) {
          if (x0 >= qx0 && y0 >= qy0 && x1 <= qx1 && y1 <= qy1) covers += keys(i)
          else overlaps += keys(i)
        }
        i += 1
      }
    }
    (covers.toArray, overlaps.toArray)
  }
}

object HilbertRtree {

  /** Build from flat bounds (4 doubles per box: xmin, ymin, xmax, ymax).
    * Reference: rtree.py:87-146 (_build_hilbert_rtree). */
  def build(bounds: Array[Double], p: Int = 10, pageSize: Int = 512): HilbertRtree = {
    val n = bounds.length / 4
    val page = math.max(1, pageSize)
    if (n == 0)
      return new HilbertRtree(Array.emptyDoubleArray, Array.emptyIntArray, page,
        Array.emptyDoubleArray, 0)

    // total bounds of box mins/maxes (NaN-oblivious like the reference's
    // min/max over columns; degenerate handled in distanceFromBounds)
    var tx0 = Double.PositiveInfinity; var ty0 = Double.PositiveInfinity
    var tx1 = Double.NegativeInfinity; var ty1 = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val b = i * 4
      if (bounds(b) < tx0) tx0 = bounds(b)
      if (bounds(b + 1) < ty0) ty0 = bounds(b + 1)
      if (bounds(b + 2) > tx1) tx1 = bounds(b + 2)
      if (bounds(b + 3) > ty1) ty1 = bounds(b + 3)
      i += 1
    }

    val distances = new Array[Long](n)
    i = 0
    while (i < n) {
      val b = i * 4
      distances(i) = HilbertCurve.distanceFromBounds(p,
        bounds(b), bounds(b + 1), bounds(b + 2), bounds(b + 3), tx0, ty0, tx1, ty1)
      i += 1
    }

    val keys: Array[Int] = Array.range(0, n).sortBy(i => distances(i))
    val sorted = new Array[Double](n * 4)
    i = 0
    while (i < n) {
      System.arraycopy(bounds, keys(i) * 4, sorted, i * 4, 4)
      i += 1
    }

    val numPages = math.ceil(n.toDouble / page).toInt
    val treeDepth = math.ceil(math.log(numPages.toDouble) / math.log(2.0)).toInt
    val nextPow2 = 1 << treeDepth
    val treeLength = nextPow2 * 2 - 1
    val tree = Array.fill(treeLength * 4)(Double.NaN)
    val leafStart = treeLength - nextPow2

    var pageIdx = 0
    while (pageIdx < numPages) {
      val start = pageIdx * page
      val stop = math.min(start + page, n)
      var x0 = Double.PositiveInfinity; var y0 = Double.PositiveInfinity
      var x1 = Double.NegativeInfinity; var y1 = Double.NegativeInfinity
      var r = start
      while (r < stop) {
        val b = r * 4
        if (sorted(b) < x0) x0 = sorted(b)
        if (sorted(b + 1) < y0) y0 = sorted(b + 1)
        if (sorted(b + 2) > x1) x1 = sorted(b + 2)
        if (sorted(b + 3) > y1) y1 = sorted(b + 3)
        r += 1
      }
      val node = (leafStart + pageIdx) * 4
      tree(node) = x0; tree(node + 1) = y0; tree(node + 2) = x1; tree(node + 3) = y1
      pageIdx += 1
    }

    var node = (leafStart - 1)
    while (node >= 0) {
      val l = (2 * node + 1) * 4
      val r = (2 * node + 2) * 4
      val leftValid = !tree(l).isNaN
      val rightValid = !tree(r).isNaN
      val b = node * 4
      if (leftValid && rightValid) {
        tree(b) = math.min(tree(l), tree(r))
        tree(b + 1) = math.min(tree(l + 1), tree(r + 1))
        tree(b + 2) = math.max(tree(l + 2), tree(r + 2))
        tree(b + 3) = math.max(tree(l + 3), tree(r + 3))
      } else if (leftValid) {
        System.arraycopy(tree, l, tree, b, 4)
      } else if (rightValid) {
        System.arraycopy(tree, r, tree, b, 4)
      }
      node -= 1
    }

    new HilbertRtree(sorted, keys, page, tree, n)
  }
}
