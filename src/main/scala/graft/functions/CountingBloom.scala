package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** COUNTING Bloom filter (Fan et al. SIGCOMM 2000 "Summary Cache", public)
  * — the deletion-capable membership screen C113's plain Bloom cannot be:
  * each of the k Kirsch–Mitzenmacher probe slots holds a COUNTER instead
  * of a bit, insert increments, delete decrements, membership = all k
  * counters positive. The filter algebra is exact integer arithmetic:
  *
  *   build(A ∪ B) = build(A) + build(B)   (element-wise — merge is ADD)
  *   build(A ∪ B) − build(B) = build(A)   BYTE-FOR-BYTE
  *
  * so a GDPR/takedown batch subtracts out with zero false negatives
  * introduced on surviving keys (deletion only removes counts the batch
  * itself added; the spec pins the round-trip byte equality). The
  * documented caveats are the published ones: deleting a key that was
  * never inserted corrupts the filter (callers take keys from the
  * authoritative store — the C30/C113 pairing), and a query may still
  * answer yes wrongly at the sized ε (false positives are inherited from
  * the Bloom design; subtraction can also clear a colliding key's last
  * probe slot at the same ε-bounded rate).
  *
  * Probe indices: i-th slot = (h1 + i·h2) mod m over the two 32-bit
  * halves of the key's xxhash64 (the double-hashing scheme Spark's own
  * BloomFilter ships) — pure integer arithmetic, deterministic across
  * partitionings, so serialized filters are byte-canonical.
  *
  * Cost shape: 4 bytes/counter vs the plain filter's 1 bit — the
  * published 32× price of deletability (production keeps C113 for
  * append-only screens and pays this only where takedown is required). */
final class CountingBloomBuf(val m: Int, val k: Int) extends Serializable {
  require(m >= 8 && k >= 1, s"bad counting-bloom geometry m=$m k=$k")
  private[functions] var counts = new Array[Int](m)

  @inline private def slot(hash: Long, i: Int): Int = {
    val h1 = (hash & 0xFFFFFFFFL).toInt
    val h2 = (hash >>> 32).toInt
    val c = (h1.toLong + i.toLong * h2.toLong) % m
    (if (c < 0) c + m else c).toInt
  }

  def add(hash: Long): Unit = {
    var i = 0
    while (i < k) { counts(slot(hash, i)) += 1; i += 1 }
  }

  def remove(hash: Long): Unit = {
    var i = 0
    while (i < k) { counts(slot(hash, i)) -= 1; i += 1 }
  }

  def contains(hash: Long): Boolean = {
    var i = 0
    while (i < k) { if (counts(slot(hash, i)) <= 0) return false; i += 1 }
    true
  }

  def merge(o: CountingBloomBuf): Unit = {
    require(m == o.m && k == o.k,
      s"cannot merge counting blooms of geometry ($m,$k) and (${o.m},${o.k})")
    var i = 0
    while (i < m) { counts(i) += o.counts(i); i += 1 }
  }

  def subtract(o: CountingBloomBuf): Unit = {
    require(m == o.m && k == o.k,
      s"cannot subtract counting blooms of geometry ($m,$k) and (${o.m},${o.k})")
    var i = 0
    while (i < m) { counts(i) -= o.counts(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(1 + 4 + 4 + m * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(m).putInt(k)
    var i = 0
    while (i < m) { buf.putInt(counts(i)); i += 1 }
    buf.array()
  }
}

object CountingBloom {
  def deserialize(bytes: Array[Byte]): CountingBloomBuf = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val ver = buf.get()
    require(ver == 1, s"unknown counting-bloom version $ver")
    val b = new CountingBloomBuf(buf.getInt(), buf.getInt())
    var i = 0
    while (i < b.m) { b.counts(i) = buf.getInt(); i += 1 }
    b
  }

  /** The largest counter count whose serialized form (1+4+4+m*4 bytes)
    * still fits a JVM byte array. Beyond this (~536M counters ≈ 700M
    * items at fpp=0.01) a single filter stops being a sane broadcast
    * value anyway — shard by key range and union the per-shard reports. */
  val MaxCounters: Int = (Int.MaxValue - 9) / 4

  /** Published sizing: m = ⌈−n·ln(ε)/ln²2⌉ counters, k = round(m/n·ln2).
    * Validated BEFORE the Int narrowing: `.toInt` on an over-large double
    * silently saturates at Int.MaxValue, and serialize()'s
    * `ByteBuffer.allocate(1+4+4+m*4)` then overflows Int into a confusing
    * negative-size failure (ADVICE r9). */
  def geometry(expectedItems: Long, fpp: Double): (Int, Int) = {
    val ln2 = math.log(2.0)
    val mReal = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2))
    require(mReal <= MaxCounters,
      s"counting-bloom geometry overflow: $expectedItems items at fpp=$fpp " +
        s"needs ${mReal.toLong} counters > $MaxCounters max (4-byte counters " +
        "in one byte[]); shard the key space and union per-shard filters")
    val m = mReal.toInt
    val k = math.max(1, math.round(m.toDouble / expectedItems * ln2).toInt)
    (math.max(8, m), k)
  }

  def add(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = deserialize(a); x.merge(deserialize(b)); x.serialize()
  }

  def subtract(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = deserialize(a); x.subtract(deserialize(b)); x.serialize()
  }
}

/** cbf_agg(hash, m, k): build a counting Bloom filter over pre-hashed
  * longs — partial filters merge by element-wise counter ADDITION
  * (order-free, byte-canonical). */
case class CbfAggExpr(
    child: Expression,
    m: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountingBloomBuf] with UnaryLike[Expression]
  with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cbf_agg"
  override def createAggregationBuffer(): CountingBloomBuf =
    new CountingBloomBuf(m, k)
  override def update(b: CountingBloomBuf, input: InternalRow): CountingBloomBuf = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }
  override def merge(b: CountingBloomBuf, o: CountingBloomBuf): CountingBloomBuf = {
    b.merge(o); b
  }
  override def eval(b: CountingBloomBuf): Any = b.serialize()
  override def serialize(b: CountingBloomBuf): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): CountingBloomBuf =
    CountingBloom.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CbfAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CbfAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CbfAggExpr =
    copy(child = c)
}

/** cbf_contains(hash): membership probe against a BROADCAST counting
  * Bloom filter — the C113 kernel discipline (no UDF, no join; the probe
  * stays inside WSCG) with the C113 transport fix: the filter rides a
  * `Broadcast` variable (one fetch + deserialize per executor, the
  * InjectRuntimeFilter mechanism) instead of a plan literal serialized
  * into every task closure, so a production-sized counter array never
  * bloats the task binary. */
case class CbfContainsExpr(
    child: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[CountingBloomBuf])
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cbf_contains"

  @transient private lazy val cbf = bcast.value

  def compute(hash: Long): Boolean = cbf.contains(hash)

  // identity = broadcast id (immutable value ⇒ equal ids mean equal
  // filters) — canonicalization/CSE still works for identical probes
  // without comparing counter-array content (ADVICE r9, adapted to the
  // broadcast transport)
  override def equals(other: Any): Boolean = other match {
    case that: CbfContainsExpr =>
      child == that.child && bcast.id == that.bcast.id
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.lang.Long.hashCode(bcast.id)

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(cbf.contains(input.asInstanceOf[Long]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cbfExpr", this,
      classOf[CbfContainsExpr].getName)
    defineCodeGen(ctx, ev, h => s"$ref.compute($h)")
  }
  override protected def withNewChildInternal(c: Expression): CbfContainsExpr =
    copy(child = c)
}

/** Column API over the counting Bloom filter. */
object CountingBloomFunctions {
  def cbfAgg(hash: Column, m: Int, k: Int): Column =
    GraftShims.toColumn(CbfAggExpr(
      GraftShims.toExpression(hash), m, k).toAggregateExpression())
  def cbfContains(hash: Column,
      bcast: org.apache.spark.broadcast.Broadcast[CountingBloomBuf]): Column =
    GraftShims.toColumn(CbfContainsExpr(
      GraftShims.toExpression(hash), bcast))
}
