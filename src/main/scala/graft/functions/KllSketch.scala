package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch over doubles — the compactor-ladder design of
  * the KLL/MRL family (Karnin, Lang & Liberty FOCS 2016; Manku, Rajagopalan
  * & Lindsay SIGMOD 1998/99, both public; Agarwal et al. PODS 2012 for
  * mergeability): level h holds items of implicit weight 2^h; when a level
  * overflows its capacity `k`, the level sorts and every other element
  * (alternating offset — the derandomized coin) promotes to level h+1,
  * discarding the rest. Two weight-w items collapsing into one weight-2w
  * item preserves total weight exactly, so Σ |level h|·2^h always equals
  * the stream length and rank queries need no correction. An odd buffer
  * leaves its minimum behind (compaction always pairs an even count — the
  * DataSketches convention), keeping the weight identity exact.
  *
  * Space is k·log₂(n/k) items for any stream length; rank error is the
  * family's O(log(n/k)/k) with the uniform-capacity (MRL-style) ladder —
  * the alternating offset replaces KLL's random coin, trading the
  * randomized guarantee for reproducibility (the A89 SpaceSaving
  * discipline; the spec MEASURES the realized rank error rather than
  * assuming the randomized bound).
  *
  * EXACT REGIME: while a buffer never overflows (stream length ≤ k at
  * every partial), no compaction fires, every item sits at level 0 with
  * weight 1, and merge is concatenation — the sketch IS the sorted stream
  * regardless of partitioning or merge order, and canonical serialization
  * (values sorted per level) makes equal-content sketches BYTE-EQUAL.
  * The gate twin runs there, sharing ev_quantiles_exact's rank-selection
  * oracle; the default-capacity path is the production form.
  *
  * quantile(q) = the smallest value whose cumulative weight (value order,
  * level-index tie-break fixed by the gather order) reaches ceil(q·n) —
  * the same discrete rank rule as ev_quantiles_exact: no interpolation,
  * no float formula to match cross-engine. */
final class KllDoubles(val k: Int) {
  require(k >= 8, s"capacity must be at least 8, got $k")
  private[functions] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  private[functions] var n: Long = 0L
  private[functions] var flips: Long = 0L

  /** Total stream length folded in (the n of the rank target). */
  def total: Long = n

  /** Per-level buffer sizes — diagnostics for the weight identity
    * Σ |level h|·2^h = n that the even-pair compaction rule preserves. */
  def levelSizes: Seq[Int] = levels.map(_.length).toSeq

  def add(v: Double): Unit = { levels(0) += v; n += 1; compress() }

  private def compress(): Unit = {
    var h = 0
    while (h < levels.length) {
      if (levels(h).length > k) {
        val sorted = levels(h).sorted
        // pair an even count; an odd buffer leaves its minimum behind
        val leftover = sorted.length % 2
        val off = (flips & 1L).toInt
        flips += 1
        if (h + 1 == levels.length) levels += ArrayBuffer.empty[Double]
        var i = leftover + off
        while (i < sorted.length) { levels(h + 1) += sorted(i); i += 2 }
        levels(h) =
          if (leftover == 1) ArrayBuffer(sorted(0)) else ArrayBuffer.empty
      }
      h += 1
    }
  }

  def merge(o: KllDoubles): Unit = {
    require(k == o.k,
      s"cannot merge KLL sketches of capacity $k and ${o.k}")
    while (levels.length < o.levels.length)
      levels += ArrayBuffer.empty[Double]
    var h = 0
    while (h < o.levels.length) { levels(h) ++= o.levels(h); h += 1 }
    n += o.n
    flips += o.flips
    compress()
  }

  /** Discrete quantile: smallest value with cumulative weight ≥ ceil(q·n). */
  def quantile(q: Double): Double = {
    require(n > 0, "quantile of an empty sketch")
    val items = ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L; var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** Canonical bytes: version, k, n, flips, levels (each sorted). */
  def serialize(): Array[Byte] = {
    val sizes = levels.map(_.length)
    val buf = ByteBuffer.allocate(1 + 4 + 8 + 8 + 4 + sizes.length * 4 +
      sizes.sum * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(k).putLong(n).putLong(flips)
      .putInt(levels.length)
    levels.foreach { lv =>
      buf.putInt(lv.length)
      lv.sorted.foreach(buf.putDouble)
    }
    buf.array()
  }
}

object KllDoubles {
  def deserialize(bytes: Array[Byte]): KllDoubles = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val ver = buf.get()
    require(ver == 1, s"unknown KLL version $ver")
    val s = new KllDoubles(buf.getInt())
    s.n = buf.getLong()
    s.flips = buf.getLong()
    val nl = buf.getInt()
    s.levels = ArrayBuffer.fill(nl)(ArrayBuffer.empty[Double])
    var h = 0
    while (h < nl) {
      val sz = buf.getInt()
      var i = 0
      while (i < sz) { s.levels(h) += buf.getDouble(); i += 1 }
      h += 1
    }
    s
  }
}

/** kll_agg(value, k): build a KLL quantile sketch over doubles. */
case class KllAggExpr(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoubles] with UnaryLike[Expression]
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg"
  override def createAggregationBuffer(): KllDoubles = new KllDoubles(capacity)
  override def update(b: KllDoubles, input: InternalRow): KllDoubles = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }
  override def merge(b: KllDoubles, o: KllDoubles): KllDoubles = {
    b.merge(o); b
  }
  override def eval(b: KllDoubles): Any = b.serialize()
  override def serialize(b: KllDoubles): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KllDoubles =
    KllDoubles.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllAggExpr =
    copy(child = c)
}

/** kll_merge_agg(sketch): fold serialized sketches — the rollup merge
  * (persist per-day partials, answer coarser windows without re-scan). */
case class KllMergeAggExpr(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoubles] with UnaryLike[Expression]
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"
  override def createAggregationBuffer(): KllDoubles = new KllDoubles(capacity)
  override def update(b: KllDoubles, input: InternalRow): KllDoubles = {
    val v = child.eval(input)
    if (v != null) b.merge(KllDoubles.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: KllDoubles, o: KllDoubles): KllDoubles = {
    b.merge(o); b
  }
  override def eval(b: KllDoubles): Any = b.serialize()
  override def serialize(b: KllDoubles): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KllDoubles =
    KllDoubles.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAggExpr =
    copy(child = c)
}

/** Row-level kernel shared by interpreted eval and codegen. */
object KllKernel {
  def quantile(bytes: Array[Byte], q: Double): Double =
    KllDoubles.deserialize(bytes).quantile(q)
  def total(bytes: Array[Byte]): Long = KllDoubles.deserialize(bytes).total
}

/** kll_quantile(sketch, q): the discrete quantile at q — a summary-sized
  * scalar kernel. */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] =
    Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(bytes: Any, q: Any): Any =
    KllKernel.quantile(bytes.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (b, q) => s"graft.functions.KllKernel$$.MODULE$$.quantile($b, $q)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantileExpr = copy(left = l, right = r)
}

/** Column API over the KLL quantile sketch family. */
object KllFunctions {
  def kllAgg(value: Column, capacity: Int): Column =
    GraftShims.toColumn(KllAggExpr(
      GraftShims.toExpression(value), capacity).toAggregateExpression())
  def kllMergeAgg(sketch: Column, capacity: Int): Column =
    GraftShims.toColumn(KllMergeAggExpr(
      GraftShims.toExpression(sketch), capacity).toAggregateExpression())
  def kllQuantile(sketch: Column, q: Column): Column =
    GraftShims.toColumn(KllQuantileExpr(
      GraftShims.toExpression(sketch), GraftShims.toExpression(q)))
}
