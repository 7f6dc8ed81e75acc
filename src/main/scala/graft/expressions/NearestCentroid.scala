package graft.expressions

import org.apache.spark.sql.DoubleArrayInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Driver-built EXACT nearest-centroid index: the IVF coarse-quantizer
  * assignment kernel (`graft.ops.Similarity.assignCell` /
  * `probeCells`) as one compiled argmax-dot loop with a two-level
  * coarse→fine search — instead of the interpreted HOF flat scan over
  * every centroid, which at the 65,536-cell cap is ~4.2M interpreted
  * multiply-adds PER ROW (dim 64) on the corpus-ingest path: the last
  * ANN-family 100 TB scale-killer (VERDICT r7 top item).
  *
  * Exactness, not approximation: centroids are clustered into
  * g ≈ √k groups (deterministic driver-side k-means, seeded by lowest
  * cell ids); each group stores its mean `m` and radius
  * `r = max |c − m|`. For L2-normalized centroids the Cauchy–Schwarz
  * bound `dot(x, c) ≤ dot(x, m) + ‖x‖·r` holds for every member `c`,
  * so groups whose bound falls beyond the current best (minus a
  * rounding-slack margin, see [[CentroidIndex.assign]]) cannot contain
  * the argmax and are skipped WITHOUT being scanned. Expected per-row
  * work drops from O(k·dim) to O(√k·dim); the result is BIT-IDENTICAL
  * to the flat scan (spec-enforced, including NaN/null/∞ corruption
  * edge cases) because every dot product that decides the winner is
  * computed with the same left-fold arithmetic the declarative arm
  * uses, and pruning only ever discards provably-losing groups.
  *
  * The index rides into tasks as one broadcast-sized reference object
  * (k·dim doubles — 33.5 MB at the 65,536×64 cap, the same budget the
  * previous centroid literal already paid), via
  * `CodegenContext.addReferenceObj` — no join, no shuffle, pure
  * map-side, inside whole-stage codegen.
  */
final class CentroidIndex private (
    val dim: Int,
    val numCells: Int,
    // normalized member centroids, flattened in GROUPED order: member
    // at grouped position p occupies data[p·dim, (p+1)·dim)
    private val data: Array[Double],
    // grouped position → original cell id (ascending within a group)
    private val cellIds: Array[Int],
    // group g spans grouped positions [groupStart(g), groupStart(g+1))
    private val groupStart: Array[Int],
    // g × dim flattened coarse centers (group means, NOT re-normalized)
    private val coarse: Array[Double],
    // per-group member radius max|c − m|
    private val radius: Array[Double]
) extends Serializable {

  private def numGroups: Int = groupStart.length - 1

  /** Spark's nan-safe total order on doubles (NaN greatest, NaN = NaN,
    * ±0 equal) — the comparison semantics of the declarative struct
    * max/array_sort this kernel must reproduce.
    */
  private def cmpD(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else if (a == b) 0
    else if (java.lang.Double.isNaN(a)) { if (java.lang.Double.isNaN(b)) 0 else 1 }
    else -1

  /** Validate + copy the input vector. Returns null when the vector is
    * CORRUPT in a way that makes every cell's declarative dot the same
    * non-value (wrong length / empty → every dot NULL; a null or NaN
    * element → every dot NULL/NaN): the flat argmax then ties all
    * cells and resolves to cell 0, so callers map null → cell 0
    * (probe: cells 0..n−1) without scanning anything.
    */
  private def checkedVector(arr: ArrayData): Array[Double] = {
    val d = arr.numElements()
    if (d != dim) return null
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      val v = arr.getDouble(i)
      if (java.lang.Double.isNaN(v)) return null
      x(i) = v
      i += 1
    }
    x
  }

  private def dotAt(x: Array[Double], flat: Array[Double], pos: Int): Double = {
    var s = 0.0
    var i = 0
    val off = pos * dim
    while (i < x.length) {
      s += x(i) * flat(off + i)
      i += 1
    }
    s
  }

  /** Group scan order and bounds for a vector: upper bounds
    * `dot(x, m_g) + ‖x‖·r_g` per group, group indices sorted bound-
    * descending (NaN bounds first = never skipped). Primitive packed
    * sort — the IEEE-754 sortable-bits transform in the high 48 bits,
    * group index in the low 16 (g ≤ 256 at the 65,536-cell cap) — so
    * per-row ordering allocates no boxes. The 16 truncated mantissa
    * bits can only reorder groups whose bounds differ by far less
    * than the pruning slack; the skip test itself always reads the
    * EXACT bound from `ubOut`, so ordering precision never affects
    * correctness, only scan order.
    */
  private def orderedGroups(x: Array[Double], norm: Double,
      ubOut: Array[Double]): Array[Long] = {
    val g = numGroups
    val keys = new Array[Long](g)
    var gi = 0
    while (gi < g) {
      val ub = dotAt(x, coarse, gi) + norm * radius(gi)
      ubOut(gi) = ub
      // ascending-sortable bits: flip all for negatives, sign for
      // positives; NaN canonicalizes above +Inf (never pruned early)
      var bits = java.lang.Double.doubleToLongBits(ub)
      bits ^= (if (bits < 0L) -1L else java.lang.Long.MIN_VALUE)
      keys(gi) = (bits & 0xFFFFFFFFFFFF0000L) | gi.toLong
      gi += 1
    }
    java.util.Arrays.sort(keys)
    keys
  }

  /** Rounding-slack margin: computed bounds and dots carry ≤
    * dim·2⁻⁵³·‖x‖ relative float error (≈1.2e-10·‖x‖ even at the 2²⁰
    * dim ceiling); pruning only skips groups whose bound is below
    * best − slack, so float rounding can never skip a group the real-
    * arithmetic bound would keep. Ties within slack are scanned — a
    * few extra group scans, never a wrong answer.
    */
  private def slackFor(norm: Double): Double = 1e-8 * (1.0 + norm)

  /** Nearest cell id under (dot desc, cell asc) — bit-identical to the
    * declarative flat struct-max. Corrupt vectors → 0 (the flat arm's
    * all-ties resolution).
    */
  def assign(arr: ArrayData): Long = {
    val x = checkedVector(arr)
    if (x == null) return 0L
    var normSq = 0.0
    var i = 0
    while (i < x.length) { normSq += x(i) * x(i); i += 1 }
    val norm = math.sqrt(normSq)
    val slack = slackFor(norm)
    var bestDot = 0.0
    var bestCell = -1
    if (numGroups == 1) {
      // single group: plain flat scan, no bound arithmetic at all
      var p = 0
      while (p < numCells) {
        val s = dotAt(x, data, p)
        val c = cellIds(p)
        if (bestCell < 0 || {
          val cmp = cmpD(s, bestDot); cmp > 0 || (cmp == 0 && c < bestCell)
        }) { bestDot = s; bestCell = c }
        p += 1
      }
      return bestCell.toLong
    }
    val ub = new Array[Double](numGroups)
    val order = orderedGroups(x, norm, ub)
    var oi = order.length - 1 // descending bound order
    while (oi >= 0) {
      val gi = (order(oi) & 0xFFFFL).toInt
      // prune: a finite best strictly above the group's EXACT bound
      // (+slack) cannot be beaten or tied inside the group. NaN/∞
      // bests never prune — bound arithmetic is meaningless there.
      // Every group gets its own exact test (no early break), so the
      // packed sort's truncated ordering cannot cost correctness.
      if (!(bestCell >= 0 && !java.lang.Double.isNaN(bestDot) &&
          !java.lang.Double.isInfinite(bestDot) &&
          cmpD(ub(gi), bestDot - slack) < 0)) {
        var p = groupStart(gi)
        val end = groupStart(gi + 1)
        while (p < end) {
          val s = dotAt(x, data, p)
          val c = cellIds(p)
          if (bestCell < 0 || {
            val cmp = cmpD(s, bestDot); cmp > 0 || (cmp == 0 && c < bestCell)
          }) { bestDot = s; bestCell = c }
          p += 1
        }
      }
      oi -= 1
    }
    bestCell.toLong
  }

  /** Top-`nProbe` cells, best first under (dot desc, cell asc) — the
    * multi-probe twin, same pruning against the CURRENT nth-best.
    * Corrupt vectors → cells 0..min(nProbe,k)−1 (the flat arm's
    * all-ties order).
    */
  def probe(arr: ArrayData, nProbe: Int): ArrayData = {
    val n = math.min(nProbe, numCells)
    val x = checkedVector(arr)
    if (x == null) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = i.toLong; i += 1 }
      return new GenericArrayData(out)
    }
    var normSq = 0.0
    var i = 0
    while (i < x.length) { normSq += x(i) * x(i); i += 1 }
    val norm = math.sqrt(normSq)
    val slack = slackFor(norm)
    // best-n list, kept sorted (dot desc, cell asc); insertion sort —
    // nProbe is small (single digits in every call site)
    val topDot = new Array[Double](n)
    val topCell = new Array[Int](n)
    var filled = 0
    def offer(s: Double, c: Int): Unit = {
      var pos = filled
      while (pos > 0 && {
        val cmp = cmpD(s, topDot(pos - 1))
        cmp > 0 || (cmp == 0 && c < topCell(pos - 1))
      }) pos -= 1
      if (pos < n) {
        val last = math.min(filled, n - 1)
        var j = last
        while (j > pos) { topDot(j) = topDot(j - 1); topCell(j) = topCell(j - 1); j -= 1 }
        topDot(pos) = s
        topCell(pos) = c
        if (filled < n) filled += 1
      }
    }
    def scanGroup(gi: Int): Unit = {
      var p = groupStart(gi)
      val end = groupStart(gi + 1)
      while (p < end) { offer(dotAt(x, data, p), cellIds(p)); p += 1 }
    }
    if (numGroups == 1) scanGroup(0)
    else {
      val ub = new Array[Double](numGroups)
      val order = orderedGroups(x, norm, ub)
      var oi = order.length - 1 // descending bound order
      while (oi >= 0) {
        val gi = (order(oi) & 0xFFFFL).toInt
        if (!(filled == n && {
          val nth = topDot(filled - 1)
          !java.lang.Double.isNaN(nth) && !java.lang.Double.isInfinite(nth) &&
            cmpD(ub(gi), nth - slack) < 0
        })) scanGroup(gi)
        oi -= 1
      }
    }
    val out = new Array[Long](filled)
    var j = 0
    while (j < filled) { out(j) = topCell(j).toLong; j += 1 }
    new GenericArrayData(out)
  }
}

object CentroidIndex {
  /** Below this cell count the coarse layer costs more than it saves —
    * a single flat group is built instead (the ≥1,024-cell crossover
    * measurement lives in NOTES.md).
    */
  val TwoLevelThreshold: Int = 128

  /** Coarse-layer Lloyd iterations: the groups only need to be
    * *compact*, not optimal — pruning quality saturates fast.
    */
  private val CoarseIters = 3

  /** Process-local cache: `assignCell`/`probeCells` are called
    * repeatedly with the same trained centroid seq (corpus assign,
    * query probes, every Lloyd iteration builds ONE fresh seq). Keys
    * are held weakly; equality is the Seq's deep equals.
    */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Seq[Seq[Double]], CentroidIndex]())

  def forCentroids(centroids: Seq[Seq[Double]]): CentroidIndex = {
    val got = cache.get(centroids)
    if (got != null) got
    else {
      val built = build(centroids)
      cache.put(centroids, built)
      built
    }
  }

  /** Build the index: normalize exactly as the declarative arm does,
    * cluster into g = ⌈√k⌉ groups with deterministic driver-side
    * k-means (seeds = lowest cell ids; ties to lowest group;
    * sequential mean accumulation in cell-id order — no RNG, no
    * parallel-reduction nondeterminism), then record per-group means
    * and radii for the pruning bounds.
    */
  def build(centroids: Seq[Seq[Double]],
      forceFlat: Boolean = false): CentroidIndex = {
    require(centroids.nonEmpty, "CentroidIndex: no centroids")
    val k = centroids.size
    val dim = centroids.head.size
    // EXACT same normalization arithmetic as the declarative
    // cellScores (left-fold sum of squares, then per-element divide)
    val normed = new Array[Array[Double]](k)
    var c = 0
    while (c < k) {
      val src = centroids(c)
      require(src.size == dim, s"CentroidIndex: ragged centroid dims ($dim vs ${src.size})")
      val a = new Array[Double](dim)
      var i = 0
      var sq = 0.0
      while (i < dim) { val v = src(i); a(i) = v; sq += v * v; i += 1 }
      val n = math.sqrt(sq)
      if (n != 0.0) { i = 0; while (i < dim) { a(i) /= n; i += 1 } }
      normed(c) = a
      c += 1
    }
    // g = 2√k: scan cost is g·dim (coarse) + scanned·(k/g)·dim (fine);
    // with the ~2–4 groups typically surviving the bound, the optimum
    // g = √(scanned·k) sits near 2√k (probe-measured vs 1√k — NOTES r8)
    val g = if (forceFlat || k <= TwoLevelThreshold) 1
      else math.min(65535, math.ceil(2.0 * math.sqrt(k.toDouble)).toInt)
    val member = new Array[Int](k) // cell -> group
    val centers = new Array[Double](g * dim)
    if (g == 1) {
      java.util.Arrays.fill(member, 0)
    } else {
      // seeds: first g centroids by cell id
      var s = 0
      while (s < g) { System.arraycopy(normed(s), 0, centers, s * dim, dim); s += 1 }
      var iter = 0
      while (iter <= CoarseIters) {
        // assignment (parallel-safe: independent per centroid)
        java.util.stream.IntStream.range(0, k).parallel().forEach { ci =>
          val v = normed(ci)
          var bg = 0
          var bd = Double.PositiveInfinity
          var gi = 0
          while (gi < g) {
            var d2 = 0.0
            var i = 0
            val off = gi * dim
            while (i < dim) { val t = v(i) - centers(off + i); d2 += t * t; i += 1 }
            if (d2 < bd) { bd = d2; bg = gi }
            gi += 1
          }
          member(ci) = bg
        }
        if (iter < CoarseIters) {
          // recompute means SEQUENTIALLY in cell-id order (deterministic)
          val sums = new Array[Double](g * dim)
          val counts = new Array[Int](g)
          var ci = 0
          while (ci < k) {
            val gi = member(ci)
            val off = gi * dim
            val v = normed(ci)
            var i = 0
            while (i < dim) { sums(off + i) += v(i); i += 1 }
            counts(gi) += 1
            ci += 1
          }
          var gi = 0
          while (gi < g) {
            if (counts(gi) > 0) {
              var i = 0
              val off = gi * dim
              while (i < dim) { centers(off + i) = sums(off + i) / counts(gi); i += 1 }
            } // empty group keeps its center
            gi += 1
          }
        }
        iter += 1
      }
    }
    // grouped layout: group by group, ascending cell id within each
    val counts = new Array[Int](g)
    var ci = 0
    while (ci < k) { counts(member(ci)) += 1; ci += 1 }
    val groupStart = new Array[Int](g + 1)
    var gi = 0
    while (gi < g) { groupStart(gi + 1) = groupStart(gi) + counts(gi); gi += 1 }
    val fill = groupStart.clone()
    val data = new Array[Double](k * dim)
    val cellIds = new Array[Int](k)
    ci = 0
    while (ci < k) { // ascending ci ⇒ ascending cell ids within groups
      val p = fill(member(ci))
      fill(member(ci)) += 1
      System.arraycopy(normed(ci), 0, data, p * dim, dim)
      cellIds(p) = ci
      ci += 1
    }
    val radius = new Array[Double](g)
    ci = 0
    while (ci < k) {
      val off = member(ci) * dim
      val v = normed(ci)
      var d2 = 0.0
      var i = 0
      while (i < dim) { val t = v(i) - centers(off + i); d2 += t * t; i += 1 }
      val r = math.sqrt(d2)
      if (r > radius(member(ci))) radius(member(ci)) = r
      ci += 1
    }
    new CentroidIndex(dim, k, data, cellIds, groupStart, centers, radius)
  }
}

/** Nearest-centroid cell id (long) of a vector column against a
  * [[CentroidIndex]] — codegen'd, map-side, exact (see the index doc).
  * NULL input vector → NULL (callers coalesce to the flat arm's
  * all-ties cell 0).
  */
case class NearestCentroid(child: Expression, index: CentroidIndex)
    extends UnaryExpression with DoubleArrayInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any =
    index.assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("centroidIndex", index,
      classOf[CentroidIndex].getName)
    defineCodeGen(ctx, ev, a => s"$idx.assign($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Top-`nProbe` nearest cell ids (array<long>, best first) — the
  * multi-probe twin of [[NearestCentroid]]. NULL input vector → NULL
  * (callers coalesce to the flat arm's 0..n−1 all-ties order).
  */
case class NearestCells(child: Expression, index: CentroidIndex, nProbe: Int)
    extends UnaryExpression with DoubleArrayInputTypes {
  require(nProbe >= 1, s"nProbe must be ≥ 1, got $nProbe")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any =
    index.probe(input.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("centroidIndex", index,
      classOf[CentroidIndex].getName)
    defineCodeGen(ctx, ev, a => s"$idx.probe($a, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
