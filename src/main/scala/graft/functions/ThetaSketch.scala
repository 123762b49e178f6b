package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable DISTINCT-SET sketch with full set algebra — the KMV/theta
  * design (Beyer et al. SIGMOD 2007 "On synopses for distinct value
  * estimation under multiset operations"; Dasgupta et al. 2016, the
  * DataSketches theta-sketch formulation, both public): keep the k
  * smallest 64-bit hashes of the distinct items in UNSIGNED order; once
  * more than k distinct hashes have been seen, θ = u(the (k+1)-th
  * smallest) and the retained set is every hash < θ, so
  * estimate = |retained| / θ. Unlike HLL (A24), two theta sketches
  * support INTERSECTION and DIFFERENCE, not just union — the audience-
  * overlap algebra — because the retained sets are uniform samples of
  * the underlying sets at a known inclusion threshold:
  *
  *   union(A,B):     θ = min(θa, θb), candidates = (Sa ∪ Sb) ∩ [0,θ),
  *                   re-trim to k if over capacity
  *   intersect(A,B): θ = min(θa, θb), retained = Sa ∩ Sb ∩ [0,θ)
  *   aNotB(A,B):     θ = min(θa, θb), retained = (Sa \ Sb) ∩ [0,θ)
  *
  * EXACT REGIME: while a sketch never exceeds k distinct hashes, θ = 1
  * EXACTLY (a flag, not the lossy (2⁶⁴−1)/2⁶⁴ double) and the retained
  * set IS the full distinct hash set — every estimate and every set
  * operation is exact, so the gate twin shares a plain COUNT(DISTINCT)
  * SQL oracle (the A96 exact-capacity discipline). Production sizes k
  * below the distinct count and pays the published ~1/√(k−2) relative
  * standard error, measured by spec rather than assumed.
  *
  * Hashing happens OUTSIDE the sketch (the operator feeds xxhash64(col),
  * a codegen'd Spark expression), so the aggregate folds bare longs.
  * Canonical serialization (hashes sorted unsigned) makes equal-content
  * sketches BYTE-EQUAL under any partitioning or merge order. */
final class ThetaSet(val k: Int) {
  require(k >= 2, s"capacity must be at least 2, got $k")
  // unsigned order via the sign-bit flip: (h ^ MinValue) sorts signed
  private[functions] val set = mutable.TreeSet.empty[Long](
    Ordering.by((h: Long) => h ^ Long.MinValue))
  private[functions] var exact: Boolean = true   // θ = 1 exactly
  private[functions] var thetaRaw: Long = -1L    // unsigned max (unused while exact)

  private def u(h: Long): Double =
    (h ^ Long.MinValue).toDouble / 1.8446744073709552E19 + 0.5 // / 2^64

  private def below(h: Long, bound: Long): Boolean =
    (h ^ Long.MinValue) < (bound ^ Long.MinValue)

  def theta: Double = if (exact) 1.0 else u(thetaRaw)

  def size: Int = set.size

  def add(h: Long): Unit = {
    if (!exact && !below(h, thetaRaw)) return
    set += h
    if (set.size > k) { // promote the (k+1)-th smallest to the new bound
      // set.last rides the tree's own (unsigned) ordering — O(log k);
      // max(explicit ordering) would LINEAR-SCAN per insert (measured as
      // the 100x-rehearsal wall at 10M rows over a saturated sketch)
      val top = set.last
      set -= top
      exact = false
      thetaRaw = top
    }
  }

  def merge(o: ThetaSet): Unit = {
    require(k == o.k, s"cannot merge theta sketches of capacity $k and ${o.k}")
    if (!o.exact && (exact || below(o.thetaRaw, thetaRaw))) {
      exact = false; thetaRaw = o.thetaRaw
      set.retain(h => below(h, thetaRaw))
    }
    o.set.foreach(add)
  }

  def estimate: Double =
    if (exact) set.size.toDouble else set.size.toDouble / u(thetaRaw)

  /** Canonical bytes: version, k, exact flag, θ bound, sorted hashes. */
  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 1 + 8 + 4 + set.size * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(k).put(if (exact) 1.toByte else 0.toByte)
      .putLong(thetaRaw).putInt(set.size)
    set.foreach(buf.putLong) // TreeSet iterates in unsigned order
    buf.array()
  }
}

object ThetaSet {
  def deserialize(bytes: Array[Byte]): ThetaSet = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val ver = buf.get()
    require(ver == 1, s"unknown theta sketch version $ver")
    val s = new ThetaSet(buf.getInt())
    s.exact = buf.get() == 1
    s.thetaRaw = buf.getLong()
    val n = buf.getInt()
    var i = 0
    while (i < n) { s.set += buf.getLong(); i += 1 }
    s
  }

  private def bound(a: ThetaSet, b: ThetaSet): (Boolean, Long) =
    if (a.exact && b.exact) (true, -1L)
    else if (a.exact) (false, b.thetaRaw)
    else if (b.exact) (false, a.thetaRaw)
    else if ((a.thetaRaw ^ Long.MinValue) <= (b.thetaRaw ^ Long.MinValue))
      (false, a.thetaRaw)
    else (false, b.thetaRaw)

  private def make(k: Int, exact: Boolean, thetaRaw: Long,
                   hashes: Iterable[Long]): ThetaSet = {
    val s = new ThetaSet(k)
    s.exact = exact
    s.thetaRaw = thetaRaw
    // keep only hashes under the bound; delegate capacity trim to add()
    val kept = if (exact) hashes
      else hashes.filter(h => (h ^ Long.MinValue) < (thetaRaw ^ Long.MinValue))
    kept.foreach { h => s.set += h }
    // over-capacity union result: tighten θ until ≤ k retained
    while (s.set.size > k) {
      val top = s.set.last // tree-order max, O(log k)
      s.set -= top
      s.exact = false
      s.thetaRaw = top
    }
    s
  }

  def union(a: ThetaSet, b: ThetaSet): ThetaSet = {
    val (ex, th) = bound(a, b)
    make(math.min(a.k, b.k), ex, th, a.set ++ b.set)
  }

  def intersect(a: ThetaSet, b: ThetaSet): ThetaSet = {
    val (ex, th) = bound(a, b)
    make(math.min(a.k, b.k), ex, th, a.set.intersect(b.set))
  }

  def aNotB(a: ThetaSet, b: ThetaSet): ThetaSet = {
    val (ex, th) = bound(a, b)
    make(math.min(a.k, b.k), ex, th, a.set.diff(b.set))
  }
}

/** theta_agg(hash, k): build a theta sketch over pre-hashed longs. */
case class ThetaAggExpr(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaSet] with UnaryLike[Expression]
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_agg"
  override def createAggregationBuffer(): ThetaSet = new ThetaSet(capacity)
  override def update(b: ThetaSet, input: InternalRow): ThetaSet = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }
  override def merge(b: ThetaSet, o: ThetaSet): ThetaSet = { b.merge(o); b }
  override def eval(b: ThetaSet): Any = b.serialize()
  override def serialize(b: ThetaSet): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): ThetaSet =
    ThetaSet.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): ThetaAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaAggExpr =
    copy(child = c)
}

/** theta_merge_agg(sketch, k): fold serialized sketches — the rollup
  * merge (persist per-day partials, serve any coarser window). */
case class ThetaMergeAggExpr(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaSet] with UnaryLike[Expression]
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_merge_agg"
  override def createAggregationBuffer(): ThetaSet = new ThetaSet(capacity)
  override def update(b: ThetaSet, input: InternalRow): ThetaSet = {
    val bytes = child.eval(input)
    if (bytes != null)
      b.merge(ThetaSet.deserialize(bytes.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: ThetaSet, o: ThetaSet): ThetaSet = { b.merge(o); b }
  override def eval(b: ThetaSet): Any = b.serialize()
  override def serialize(b: ThetaSet): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): ThetaSet =
    ThetaSet.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaMergeAggExpr =
    copy(child = c)
}

/** Row-level kernels shared by interpreted eval and codegen. */
object ThetaKernel {
  def estimate(bytes: Array[Byte]): Double =
    ThetaSet.deserialize(bytes).estimate
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaSet.union(ThetaSet.deserialize(a), ThetaSet.deserialize(b))
      .serialize()
  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaSet.intersect(ThetaSet.deserialize(a), ThetaSet.deserialize(b))
      .serialize()
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaSet.aNotB(ThetaSet.deserialize(a), ThetaSet.deserialize(b))
      .serialize()

  /** Φ(−z), the one-sided Gaussian tail, via the Abramowitz & Stegun
    * 7.1.26 erfc polynomial (public; |ε| < 1.5e-7) — ties the r = 0
    * zero-count bound to the SAME z as the Gaussian bars, instead of a
    * hardcoded 95% rule-of-three that would contradict the z column the
    * operator reports next to it. */
  private def normalUpperTail(z: Double): Double = {
    val x = math.max(0.0, z) / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
      t * (-1.453152027 + t * 1.061405429))))
    0.5 * poly * math.exp(-x * x)
  }

  /** (estimate, rse, lo, hi) — the [[ThetaCiExpr]] kernel (math there). */
  def ci(bytes: Array[Byte], z: Double): InternalRow = {
    val s = ThetaSet.deserialize(bytes)
    val est = s.estimate
    val row =
      if (s.exact) Array[Any](est, 0.0, est, est)
      else if (s.size == 0) {
        // zero retained at inclusion rate θ: exact binomial inversion
        // P(r=0 | n) = (1−θ)^n ≤ α ⟺ n ≤ ln(α)/ln(1−θ), with α the
        // one-sided tail matching the caller's z (z = 1.645 recovers the
        // classic rule-of-three 3/θ; z = 3 gives ≈ 6.6/θ)
        val alpha = math.max(normalUpperTail(z), 1e-300)
        Array[Any](0.0, 0.0, 0.0, math.log(alpha) / math.log1p(-s.theta))
      }
      else {
        val r = s.size.toDouble
        val rse = math.sqrt((1.0 - s.theta) / r)
        Array[Any](est, rse, math.max(r, est * (1.0 - z * rse)),
          est * (1.0 + z * rse))
      }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
  }
}

/** theta_ci(sketch, z): the distinct estimate WITH its error bars —
  * struct(estimate, rse, lo, hi). The published KMV error model (Beyer et
  * al. 2007; the same binomial bound the DataSketches theta library
  * quotes for post-set-operation sketches): conditioned on θ, the
  * retained count r is Binomial(n, θ), so Var(r/θ) = n(1−θ)/θ and the
  * RELATIVE standard error is √((1−θ)/r) — for a full sketch (r = k,
  * θ small) this is the familiar ~1/√k. Bounds are the Gaussian interval
  * est·(1 ± z·rse), with lo additionally clamped to r (the retained
  * hashes are REAL distinct values — the truth is never below them).
  * Special cases: exact regime → (est, 0, est, est) — the bars collapse
  * because the sketch IS the distinct set; r = 0 in estimation regime →
  * (0, 0, 0, ln(Φ(−z))/ln(1−θ)), the exact zero-count binomial inversion
  * at the same one-sided confidence as the Gaussian bars (z = 1.645
  * recovers the classic rule-of-three 3/θ). Applies unchanged to union/intersect/difference
  * results — the set-operation retained sets are still θ-inclusion
  * samples, which is exactly why the theta family can carry error bars
  * where HLL set operations cannot. */
case class ThetaCiExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] =
    Seq(BinaryType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("rse", DoubleType, nullable = false),
    StructField("lo", DoubleType, nullable = false),
    StructField("hi", DoubleType, nullable = false)))
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "theta_ci"
  override protected def nullSafeEval(bytes: Any, z: Any): Any =
    ThetaKernel.ci(bytes.asInstanceOf[Array[Byte]], z.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (b, z) => s"graft.functions.ThetaKernel$$.MODULE$$.ci($b, $z)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaCiExpr = copy(left = l, right = r)
}

/** theta_estimate(sketch): the distinct estimate — |retained|/θ. */
case class ThetaEstimateExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  // child-dependent, NOT hardcoded false: under whole-stage codegen a
  // nullable=false declaration elides the null check around the kernel
  // call, so a null sketch (outer-join slot, when() without otherwise,
  // parquet-read column) would NPE in codegen while interpreted eval
  // returned null (ADVICE r9)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(bytes: Any): Any =
    ThetaKernel.estimate(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.functions.ThetaKernel$$.MODULE$$.estimate($b)")
  override protected def withNewChildInternal(c: Expression): ThetaEstimateExpr =
    copy(child = c)
}

/** Binary scalar set-operation over two serialized sketches. */
sealed abstract class ThetaBinaryOp extends BinaryExpression
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] =
    Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  // either-side nullability propagates (see ThetaEstimateExpr.nullable)
  override def nullable: Boolean = left.nullable || right.nullable
  protected def kernel: String
  protected def apply2(a: Array[Byte], b: Array[Byte]): Array[Byte]
  override protected def nullSafeEval(a: Any, b: Any): Any =
    apply2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaKernel$$.MODULE$$.$kernel($a, $b)")
}

case class ThetaUnionExpr(left: Expression, right: Expression)
  extends ThetaBinaryOp {
  override def prettyName: String = "theta_union"
  override protected def kernel: String = "union"
  override protected def apply2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaKernel.union(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaUnionExpr = copy(left = l, right = r)
}

case class ThetaIntersectExpr(left: Expression, right: Expression)
  extends ThetaBinaryOp {
  override def prettyName: String = "theta_intersect"
  override protected def kernel: String = "intersect"
  override protected def apply2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaKernel.intersect(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectExpr =
    copy(left = l, right = r)
}

case class ThetaANotBExpr(left: Expression, right: Expression)
  extends ThetaBinaryOp {
  override def prettyName: String = "theta_a_not_b"
  override protected def kernel: String = "aNotB"
  override protected def apply2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaKernel.aNotB(a, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaANotBExpr = copy(left = l, right = r)
}

/** Column API over the theta distinct-set sketch family. */
object ThetaFunctions {
  def thetaAgg(hash: Column, capacity: Int): Column =
    GraftShims.toColumn(ThetaAggExpr(
      GraftShims.toExpression(hash), capacity).toAggregateExpression())
  def thetaMergeAgg(sketch: Column, capacity: Int): Column =
    GraftShims.toColumn(ThetaMergeAggExpr(
      GraftShims.toExpression(sketch), capacity).toAggregateExpression())
  def thetaCi(sketch: Column, z: Double): Column =
    GraftShims.toColumn(ThetaCiExpr(GraftShims.toExpression(sketch),
      GraftShims.toExpression(org.apache.spark.sql.functions.lit(z))))
  def thetaEstimate(sketch: Column): Column =
    GraftShims.toColumn(ThetaEstimateExpr(GraftShims.toExpression(sketch)))
  def thetaUnion(a: Column, b: Column): Column =
    GraftShims.toColumn(ThetaUnionExpr(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
  def thetaIntersect(a: Column, b: Column): Column =
    GraftShims.toColumn(ThetaIntersectExpr(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
  def thetaANotB(a: Column, b: Column): Column =
    GraftShims.toColumn(ThetaANotBExpr(
      GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
