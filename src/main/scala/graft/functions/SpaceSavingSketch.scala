package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SpaceSaving top-k / heavy-hitter sketch over Long keys (Metwally,
  * Agrawal & El Abbadi, ICDT 2005 — the counter-based frequent-items
  * summary every streaming engine ships; merge rule per Agarwal, Cormode
  * et al., "Mergeable summaries", PODS 2012): m counters; a present key
  * increments; a new key under capacity inserts at (1, 0); a new key at
  * capacity EVICTS the minimum counter and inherits its count as both
  * estimate base and error (count = min+1, err = min). Invariants carried
  * by every counter: stored count is an UPPER bound on the key's true
  * frequency, count − err a LOWER bound, and err ≤ n/m — so any key with
  * true frequency > n/m is guaranteed present. This is the top-k
  * IDENTIFICATION sketch the A24 CMS (frequency estimation only — it
  * can't enumerate) and the A9 exact top-k (full shuffle) bracket.
  *
  * Merging sums matching counters (counts add, errors add); a key present
  * on one side only is charged the other side's minimum counter on both
  * its count and error (the other stream may have held up to that many
  * occurrences invisibly — the bound-preserving rule); the result then
  * prunes to the top m by (count desc, key asc). Both bounds and the
  * ε = 1/m guarantee survive merging, so map-side partials combine freely.
  * When every buffer stays under capacity (distinct keys ≤ m) NO eviction,
  * charge, or prune ever fires and the sketch degenerates to EXACT counts
  * regardless of merge order — the oracle twin the gate exploits.
  *
  * Serialization is canonical (entries in key order), so two sketches in
  * the exact regime over the same data are byte-equal however the rows
  * were partitioned. */
final class SpaceSaving(val capacity: Int) {
  require(capacity > 0, s"capacity must be positive, got $capacity")
  // key -> (count, err); values boxed as a 2-slot array for in-place bumps
  private[functions] val counters = new java.util.HashMap[Long, Array[Long]]
  private[functions] var n: Long = 0L

  /** Total stream length folded into this sketch (the n in err ≤ n/m). */
  def total: Long = n

  private def minEntry(): (Long, Array[Long]) = {
    var bestK = 0L; var best: Array[Long] = null
    val it = counters.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (best == null || v(0) < best(0) ||
          (v(0) == best(0) && e.getKey < bestK)) {
        bestK = e.getKey; best = v
      }
    }
    (bestK, best)
  }

  /** The charge applied to keys this sketch has never seen: 0 while under
    * capacity (absence proves absence), else the minimum counter. */
  private def minCharge: Long =
    if (counters.size < capacity) 0L else minEntry()._2(0)

  def add(k: Long): Unit = {
    n += 1
    val cur = counters.get(k)
    if (cur != null) cur(0) += 1
    else if (counters.size < capacity) counters.put(k, Array(1L, 0L))
    else {
      val (mk, mv) = minEntry()
      counters.remove(mk)
      counters.put(k, Array(mv(0) + 1, mv(0)))
    }
  }

  def merge(o: SpaceSaving): Unit = {
    require(capacity == o.capacity,
      s"cannot merge SpaceSaving sketches of capacity $capacity and ${o.capacity}")
    val chSelf = minCharge; val chO = o.minCharge
    val it = o.counters.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val cur = counters.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else counters.put(e.getKey,
        Array(e.getValue()(0) + chSelf, e.getValue()(1) + chSelf))
    }
    if (chO > 0) { // self-only keys pay the other stream's invisible mass
      val it2 = counters.entrySet.iterator
      while (it2.hasNext) {
        val e = it2.next()
        if (!o.counters.containsKey(e.getKey)) {
          e.getValue()(0) += chO; e.getValue()(1) += chO
        }
      }
    }
    n += o.n
    if (counters.size > capacity) { // prune to top m by (count desc, key asc)
      val keep = sorted().take(capacity).map(_._1).toSet
      val it3 = counters.keySet.iterator
      val drop = new java.util.ArrayList[Long]
      while (it3.hasNext) { val k = it3.next(); if (!keep(k)) drop.add(k) }
      drop.forEach(k => counters.remove(k))
    }
  }

  /** Entries as (key, count, err) ordered (count desc, key asc). */
  def sorted(): Seq[(Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    counters.entrySet.asScala.toSeq
      .map(e => (e.getKey.toLong, e.getValue()(0), e.getValue()(1)))
      .sortBy { case (k, c, _) => (-c, k) }
  }

  /** Canonical bytes: version, capacity, n, size, entries in KEY order. */
  def serialize(): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val keys = counters.keySet.asScala.toArray.sorted
    val buf = ByteBuffer.allocate(1 + 4 + 8 + 4 + keys.length * 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(capacity).putLong(n).putInt(keys.length)
    keys.foreach { k =>
      val v = counters.get(k)
      buf.putLong(k).putLong(v(0)).putLong(v(1))
    }
    buf.array()
  }
}

object SpaceSaving {
  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val ver = buf.get()
    require(ver == 1, s"unknown SpaceSaving version $ver")
    val s = new SpaceSaving(buf.getInt())
    s.n = buf.getLong()
    val size = buf.getInt()
    var i = 0
    while (i < size) {
      s.counters.put(buf.getLong(), Array(buf.getLong(), buf.getLong()))
      i += 1
    }
    s
  }
}

/** ss_agg(key, capacity): build a SpaceSaving sketch over Long keys. */
case class SpaceSavingAggExpr(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with UnaryLike[Expression]
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ss_agg"
  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)
  override def update(b: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }
  override def merge(b: SpaceSaving, o: SpaceSaving): SpaceSaving = {
    b.merge(o); b
  }
  override def eval(b: SpaceSaving): Any = b.serialize()
  override def serialize(b: SpaceSaving): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSaving =
    SpaceSaving.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SpaceSavingAggExpr =
    copy(child = c)
}

/** ss_merge_agg(sketch): fold serialized sketches — the rollup merge
  * (persist per-day partials, answer coarser windows without re-scan). */
case class SpaceSavingMergeAggExpr(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving] with UnaryLike[Expression]
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ss_merge_agg"
  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)
  override def update(b: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) b.merge(SpaceSaving.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: SpaceSaving, o: SpaceSaving): SpaceSaving = {
    b.merge(o); b
  }
  override def eval(b: SpaceSaving): Any = b.serialize()
  override def serialize(b: SpaceSaving): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSaving =
    SpaceSaving.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingMergeAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingMergeAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SpaceSavingMergeAggExpr =
    copy(child = c)
}

/** Row-level kernel shared by interpreted eval and codegen. */
object SpaceSavingKernel {
  def topK(bytes: Array[Byte], k: Int): GenericArrayData = {
    val s = SpaceSaving.deserialize(bytes)
    new GenericArrayData(s.sorted().take(k).map {
      case (key, c, e) => InternalRow(key, c, c - e)
    }.toArray[Any])
  }
}

/** ss_topk(sketch, k): the sketch's top-k as (key, est, lo) structs —
  * est the upper bound (the stored count), lo = est − err the lower;
  * ordered (est desc, key asc). A summary-sized scalar kernel. */
case class SsTopKExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] =
    Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lo", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "ss_topk"
  override protected def nullSafeEval(bytes: Any, k: Any): Any =
    SpaceSavingKernel.topK(bytes.asInstanceOf[Array[Byte]], k.asInstanceOf[Int])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (b, k) => s"graft.functions.SpaceSavingKernel$$.MODULE$$.topK($b, $k)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SsTopKExpr = copy(left = l, right = r)
}

/** Column API over the SpaceSaving sketch family. */
object SpaceSavingFunctions {
  def ssAgg(key: Column, capacity: Int): Column =
    GraftShims.toColumn(SpaceSavingAggExpr(
      GraftShims.toExpression(key), capacity).toAggregateExpression())
  def ssMergeAgg(sketch: Column, capacity: Int): Column =
    GraftShims.toColumn(SpaceSavingMergeAggExpr(
      GraftShims.toExpression(sketch), capacity).toAggregateExpression())
  def ssTopK(sketch: Column, k: Column): Column =
    GraftShims.toColumn(SsTopKExpr(
      GraftShims.toExpression(sketch), GraftShims.toExpression(k)))
}
