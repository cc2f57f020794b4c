package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Two-level EXACT nearest-centroid index over a trained centroid set —
  * the kill for the Lloyd/ANN family's O(n·K) assign stage (the one
  * round-10 `weak` mark). The flat form cross-joined every corpus
  * vector against all K centroids; with derived K = n/2048 that is
  * n²/2048 dot products — the third-decade wall. This index groups the
  * K fine centroids under Kc ≈ √K coarse centers (a driver-side
  * clustering of the K-row model — centroids, not corpus) and answers
  * each row's argmin by scanning the Kc coarse centers, then only the
  * member lists of groups that survive a triangle-inequality bound:
  *
  *   d(v, f) ≥ d(v, coarse(f)) − max_radius(coarse(f))
  *
  * (Euclidean distances; the engine's µ²-unit squared distances
  * compare after a guarded sqrt with conservative slack, so a group is
  * skipped ONLY when provably worse than the current best — ties
  * included.) The result is therefore BIT-IDENTICAL to the flat
  * argmin with the (dist_u, cid) tie-break: same oracles, same hashes,
  * no recall knob — typical row cost ~2·√K dot folds instead of K,
  * worst-case (adversarial geometry) the flat cost.
  *
  * The index is built once per assignment from the K-row trained model
  * (the same rows the old crossJoin broadcast shipped — no new driver
  * state) and rides the expression as a reference object, inside
  * whole-stage codegen.
  */
final class CentroidIndex(
    val cids: Array[Long],
    val vecs: Array[Array[Long]],
    val norms: Array[Long],
    coarseVecs: Array[Array[Long]],
    coarseNorms: Array[Long],
    members: Array[Array[Int]],
    radius: Array[Double]) extends Serializable {

  def k: Int = cids.length
  def kCoarse: Int = coarseVecs.length

  /** Dot folds actually performed since construction — the "assign
    * work is sub-n·K" measurement hook. A striped LongAdder, NOT an
    * AtomicLong: 32 scan threads incrementing one atomic per row is a
    * cache-line ping-pong that measurably taxed the x100 assign. */
  val probes = new java.util.concurrent.atomic.LongAdder()

  /** Per-thread scratch (coarse distances + visit order): the assign
    * runs once per corpus ROW, and per-row array allocation at 60 M
    * rows × Kc entries is pure GC churn. Expression eval is
    * single-threaded per task, so thread-locals are safe. Transient —
    * ThreadLocal is not serializable and the index rides the plan to
    * executors; each JVM lazily rebuilds its own. */
  @transient private lazy val scratch = new ThreadLocal[(Array[Long], Array[Int])] {
    override def initialValue(): (Array[Long], Array[Int]) =
      (new Array[Long](coarseVecs.length), new Array[Int](coarseVecs.length))
  }

  private def dot(a: Array[Long], b: ArrayData): Long = {
    var s = 0L; var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b.getLong(i); i += 1 }
    s
  }

  /** Exact argmin of ‖v−c‖² in µ² units over all K centroids, ties to
    * the smaller cid — identical to the flat min(struct(dist_u, cid)).
    * Returns an InternalRow(dist_u, cid) for the struct result. */
  /** Fill the per-thread scratch with coarse distances and the
    * ascending-distance visit order; returns the scratch pair. */
  private def coarsePass(eu: ArrayData, n2u: Long): (Array[Long], Array[Int]) = {
    val (cd, order) = scratch.get()
    val kc = coarseVecs.length
    var g = 0
    while (g < kc) {
      cd(g) = n2u + coarseNorms(g) - 2L * dot(coarseVecs(g), eu)
      order(g) = g
      g += 1
    }
    // Insertion sort on the index array — Kc is ~√K, tiny.
    var i = 1
    while (i < kc) {
      val x = order(i); val dx = cd(x)
      var j = i - 1
      while (j >= 0 && cd(order(j)) > dx) { order(j + 1) = order(j); j -= 1 }
      order(j + 1) = x
      i += 1
    }
    (cd, order)
  }

  def assign(eu: ArrayData, n2u: Long): InternalRow = {
    val kc = coarseVecs.length
    val (cd, order) = coarsePass(eu, n2u)
    var work = kc.toLong
    var best = Long.MaxValue
    var bestCid = Long.MaxValue
    var oi = 0
    while (oi < kc) {
      val grp = order(oi)
      val dvc2 = cd(grp)
      // Prune: every child f of grp has d(v,f) ≥ (sqrt(dvc2) − r)²
      // when sqrt(dvc2) > r. Conservative slack keeps the bound a true
      // lower bound under double rounding; equality never prunes, so
      // ties always survive to the exact compare.
      val lb = math.sqrt(math.max(0L, dvc2).toDouble) * (1.0 - 1e-12) - radius(grp)
      val skip = best != Long.MaxValue && lb > 0.0 &&
        lb * lb * (1.0 - 1e-12) - 1.0 > best.toDouble
      if (!skip) {
        val m = members(grp)
        var mi = 0
        while (mi < m.length) {
          val f = m(mi)
          val d = n2u + norms(f) - 2L * dot(vecs(f), eu)
          if (d < best || (d == best && cids(f) < bestCid)) {
            best = d; bestCid = cids(f)
          }
          mi += 1
        }
        work += m.length
      }
      oi += 1
    }
    probes.add(work)
    new GenericInternalRow(Array[Any](best, bestCid))
  }

  /** Exact TOP-M nearest centroids by (dist_u, cid) — the probe-side
    * fan-out (`keep = nprobe`). Same pruning as [[assign]] against the
    * CURRENT m-th best (equality never prunes, so a tie that could win
    * on cid is always examined); result is the first m rows of the
    * flat `row_number() OVER (ORDER BY dist_u, cid)` window, which is
    * what the DuckDB oracles compute. Returns an array of
    * struct(dist_u, cid), ascending. */
  def assignTop(eu: ArrayData, n2u: Long, m: Int): ArrayData = {
    val kc = coarseVecs.length
    val (cd, order) = coarsePass(eu, n2u)
    var work = kc.toLong
    // Bounded sorted keep-list (m is nprobe-sized — single digits).
    val keepD = new Array[Long](m)
    val keepC = new Array[Long](m)
    var size = 0
    def offer(d: Long, c: Long): Unit = {
      if (size == m && (d > keepD(m - 1) ||
          (d == keepD(m - 1) && c >= keepC(m - 1)))) return
      var p = size
      if (size < m) size += 1 else p = m - 1
      while (p > 0 && (keepD(p - 1) > d ||
          (keepD(p - 1) == d && keepC(p - 1) > c))) {
        keepD(p) = keepD(p - 1); keepC(p) = keepC(p - 1); p -= 1
      }
      keepD(p) = d; keepC(p) = c
    }
    var oi = 0
    while (oi < kc) {
      val grp = order(oi)
      val dvc2 = cd(grp)
      val lb = math.sqrt(math.max(0L, dvc2).toDouble) * (1.0 - 1e-12) - radius(grp)
      val skip = size == m && lb > 0.0 &&
        lb * lb * (1.0 - 1e-12) - 1.0 > keepD(size - 1).toDouble
      if (!skip) {
        val mem = members(grp)
        var mi = 0
        while (mi < mem.length) {
          val f = mem(mi)
          offer(n2u + norms(f) - 2L * dot(vecs(f), eu), cids(f))
          mi += 1
        }
        work += mem.length
      }
      oi += 1
    }
    probes.add(work)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](size)(p =>
        new GenericInternalRow(Array[Any](keepD(p), keepC(p)))))
  }
}

object CentroidIndex {

  /** Content-addressed memo of built indexes: repeated queries over
    * the same trained model (the ANN suite resolves one persisted
    * quantizer and then builds per consumer) reuse ONE build instead
    * of re-running the coarse k-means each time. Keyed by a digest of
    * the FULL model content, so a collision would need an MD5 break,
    * not a lucky hash. Bounded: models are K·dim longs (~15 MB at
    * 1000× sf0.1); past 8 distinct models the memo clears — the k-
    * means-iteration path builds per-iteration throwaway models and
    * must not accumulate them. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, CentroidIndex]()

  def buildCached(model: Seq[(Long, Array[Long], Long)]): CentroidIndex = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(java.lang.Long.BYTES)
    def put(x: Long): Unit = {
      bb.clear(); bb.putLong(x); md.update(bb.array())
    }
    model.foreach { case (cid, vec, c2u) =>
      put(cid); put(vec.length.toLong); vec.foreach(put); put(c2u)
    }
    val key = md.digest().map("%02x".format(_)).mkString
    if (memo.size > 8) memo.clear()
    memo.computeIfAbsent(key, _ => build(model))
  }

  /** Build the two-level index from the trained model rows
    * (cid, c_u, c2u). Grouping is a short driver-side k-means over the
    * K centroids themselves (K rows, never corpus data): Kc = ⌈√K⌉
    * seeds from the cid order, 4 refinement sweeps in double
    * arithmetic, the assign step parallel across the K rows (the one
    * driver-side O(K·√K·dim) loop in the family — single-threaded it
    * was seconds of driver stall at the 1000× model size). The
    * grouping affects ONLY pruning efficiency, never results — any
    * partition of the centroids yields the same exact argmin. */
  def build(model: Seq[(Long, Array[Long], Long)]): CentroidIndex = {
    val sorted = model.sortBy(_._1).toArray
    val k = sorted.length
    require(k > 0, "empty centroid model")
    val dim = sorted.head._2.length
    val vecs = sorted.map(_._2)
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // Driver k-means over the K centroid vectors (doubles are fine:
    // grouping quality only).
    var centers = Array.tabulate(kc)(i => vecs(i * k / kc).map(_.toDouble))
    var assign = new Array[Int](k)
    var sweep = 0
    while (sweep < 4) {
      val cs = centers
      val asn = assign
      // Parallel over the K model rows: each index writes its own
      // assign slot, reads only the (immutable this sweep) centers.
      java.util.stream.IntStream.range(0, k).parallel().forEach { i =>
        var bg = 0; var bd = Double.MaxValue
        var g = 0
        while (g < kc) {
          var d = 0.0; var p = 0
          while (p < dim) {
            val t = vecs(i)(p).toDouble - cs(g)(p); d += t * t; p += 1
          }
          if (d < bd) { bd = d; bg = g }
          g += 1
        }
        asn(i) = bg
      }
      val sums = Array.fill(kc)(new Array[Double](dim))
      val cnt = new Array[Int](kc)
      var i = 0
      while (i < k) {
        val g = assign(i); cnt(g) += 1
        var p = 0
        while (p < dim) { sums(g)(p) += vecs(i)(p).toDouble; p += 1 }
        i += 1
      }
      centers = Array.tabulate(kc)(g =>
        if (cnt(g) == 0) centers(g)
        else sums(g).map(_ / cnt(g)))
      sweep += 1
    }
    // Materialize integer coarse centers (exact long arithmetic in the
    // hot loop) + per-group members and a SAFE (rounded-up) radius.
    val groups = (0 until kc).map(g =>
      (0 until k).filter(assign(_) == g).toArray).toArray
    val live = groups.zipWithIndex.filter(_._1.nonEmpty)
    val coarseVecs = live.map { case (m, g) =>
      centers(g).map(x => math.round(x))
    }
    val coarseNorms = coarseVecs.map(c => c.map(x => x * x).sum)
    val members = live.map(_._1)
    val radius = members.zip(coarseVecs).map { case (m, c) =>
      m.map { i =>
        var d = 0L; var p = 0
        while (p < dim) { val t = vecs(i)(p) - c(p); d += t * t; p += 1 }
        math.sqrt(d.toDouble) * (1.0 + 1e-12) + 1e-9
      }.max
    }
    new CentroidIndex(sorted.map(_._1), vecs, sorted.map(_._3),
      coarseVecs, coarseNorms, members, radius)
  }

  /** Column form: struct(dist_u, cid) of the exact nearest centroid. */
  def nearest(eu: Column, n2u: Column, index: CentroidIndex): Column =
    Bridge.column(NearestCellExpr(
      Bridge.expression(eu), Bridge.expression(n2u), index))

  /** Column form: ascending array<struct(dist_u, cid)> of the exact
    * `m` nearest centroids (the probe-side `nprobe` fan-out). */
  def nearestK(eu: Column, n2u: Column, index: CentroidIndex,
               m: Int): Column =
    Bridge.column(NearestCellsExpr(
      Bridge.expression(eu), Bridge.expression(n2u), index, m))
}

/** `nearest_cell(e_u, n2u)` with the [[CentroidIndex]] riding as a
  * codegen reference object — one virtual call per row into the
  * pruned exact argmin; stays inside whole-stage codegen. */
final case class NearestCellExpr(left: Expression, right: Expression,
                                 index: CentroidIndex)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"nearest_cell requires (array<bigint>, bigint), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("dist_u", LongType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def prettyName: String = "nearest_cell"
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(l: Any, r: Any): Any =
    index.assign(l.asInstanceOf[ArrayData], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("cindex", index,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $idx.assign($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellExpr =
    copy(left = newLeft, right = newRight)
}

/** `nearest_cells(e_u, n2u)` — the top-`m` form of [[NearestCellExpr]]
  * (probe-side nprobe fan-out): exact, (dist_u, cid)-ordered, pruned. */
final case class NearestCellsExpr(left: Expression, right: Expression,
                                  index: CentroidIndex, m: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells requires (array<bigint>, bigint), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist_u", LongType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "nearest_cells"
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(l: Any, r: Any): Any =
    index.assignTop(l.asInstanceOf[ArrayData], r.asInstanceOf[Long], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("cindex", index,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $idx.assignTop($a, $b, $m);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellsExpr =
    copy(left = newLeft, right = newRight)
}
