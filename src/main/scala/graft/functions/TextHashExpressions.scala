package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Native text-hash kernels for dedup signatures.
  *
  * The declarative form (normalize → split → transform(hash) → k-window
  * hash → explode → n min-aggregates) walks interpreted higher-order
  * expression trees per token AND shuffles one row per shingle. These
  * kernels compute a whole document signature in one compiled pass over the
  * string — map-only, no shuffle anywhere in signature computation, which
  * is the correct 100 TB shape (the LSH band join afterwards is the only
  * exchange).
  *
  * Each expression implements doGenCode (a direct kernel call on the
  * expression reference) rather than CodegenFallback, so the scan →
  * signature projection stays inside whole-stage codegen — CodegenFallback
  * would kick the entire stage out of WSCG.
  *
  * Tokenization contract (matches TextFunctions.normalized + single-space
  * split): lowercase, runs of whitespace collapse to one separator,
  * leading/trailing whitespace ignored.
  *
  * Degenerate docs: zero-token documents get NULL signatures (a shared
  * sentinel would LSH-collide all contentless docs as perfect near-dups).
  */
object TextHash {
  /** ASCII \s — the documented contract is `regexp_replace(text, "\\s+")`
    * parity (TextFunctions.normalized), and Java's \s is ASCII-only;
    * Character.isWhitespace would also split on U+3000/U+2028/… and
    * silently diverge from the declarative tokenization. */
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Lowercased word hashes of the normalized text. Locale.ROOT: a
    * tr-TR-default executor would lowercase I→ı and hash differently than
    * Spark's own lower(), making signatures executor-locale-dependent. */
  private[graft] def wordHashes(s: UTF8String): Array[Long] = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && isSpace(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isSpace(str.charAt(i))) i += 1
      if (i > start) {
        val bytes = str.substring(start, i).getBytes("UTF-8")
        out += XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42L)
      }
    }
    out.toArray
  }

  /** Distinct k-shingle hashes: each shingle hash chains its k word hashes. */
  private[graft] def shingleHashes(wh: Array[Long], k: Int): Array[Long] = {
    if (wh.isEmpty) return Array.empty
    val nSh = math.max(wh.length - k + 1, 1)
    val set = new java.util.HashSet[Long](nSh * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](nSh)
    var i = 0
    while (i < nSh) {
      var h = 2862933555777941757L
      var j = i
      val end = math.min(i + k, wh.length)
      while (j < end) { h = XXH64.hashLong(wh(j), h); j += 1 }
      if (set.add(h)) out += h
      i += 1
    }
    out.toArray
  }
}

/** Shared codegen: emit `ref.compute(input)` — one virtual call per row into
  * the compiled kernel, keeping the surrounding stage in WSCG. `compute`
  * returns null for degenerate inputs, so the generated code re-checks. */
trait TextHashKernel { self: UnaryExpression =>
  /** Boxed result (GenericArrayData, java.lang.Long, …) or null. */
  def compute(input: UTF8String): AnyRef

  override def nullable: Boolean = true

  protected def kernelGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, classOf[TextHashKernel].getName)
    val c = child.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    val boxed = ctx.freshName("kernelOut")
    val unbox = dataType match {
      case LongType => s"((java.lang.Long) $boxed).longValue()"
      case _ => s"($jt) $boxed"
    }
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${c.isNull}) {
          Object $boxed = $ref.compute(${c.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $unbox;
          }
        }
      """)
  }
}

/** minhash_sig(text): array of `numHashes` per-family minima over the
  * document's k-shingle hashes; NULL for zero-shingle documents. */
case class MinHashSigExpr(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  require(shingleK >= 1, s"shingleK=$shingleK must be >= 1")
  require(numHashes >= 1, s"numHashes=$numHashes must be >= 1")
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "minhash_sig"

  override def compute(input: UTF8String): AnyRef = {
    val sh = TextHash.shingleHashes(TextHash.wordHashes(input), shingleK)
    if (sh.isEmpty) return null
    val sig = new Array[Long](numHashes)
    var f = 0
    while (f < numHashes) {
      var mn = Long.MaxValue
      var i = 0
      while (i < sh.length) {
        val r = XXH64.hashLong(sh(i), f)
        if (r < mn) mn = r
        i += 1
      }
      sig(f) = mn
      f += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** shingle_hashes(text): the distinct k-shingle hash set itself (for exact
  * Jaccard verification; empty array — not null — for empty docs, since a
  * set-valued result has a natural empty). */
case class ShingleHashesExpr(child: Expression, shingleK: Int)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  require(shingleK >= 1, s"shingleK=$shingleK must be >= 1")
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "shingle_hashes"

  override def compute(input: UTF8String): AnyRef =
    new GenericArrayData(TextHash.shingleHashes(TextHash.wordHashes(input), shingleK))

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** simhash64(text): 64-bit sign-sum simhash over word hashes; NULL for
  * zero-token documents. */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def compute(input: UTF8String): AnyRef = {
    val wh = TextHash.wordHashes(input)
    if (wh.isEmpty) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < wh.length) {
      val h = wh(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** winnow_fps(text): winnowing fingerprints — the standard local document
  * fingerprinting scheme (as in MOSS-style plagiarism detection): hash every
  * POSITIONAL k-shingle, slide a window of `w` consecutive shingle hashes,
  * record each window's minimum (rightmost on ties, recorded once per run).
  * Guarantee: any shared run of ≥ w+k-1 tokens between two documents yields
  * at least one shared fingerprint. Distinct fingerprints, one compiled
  * pass; NULL for zero-token docs. */
case class WinnowExpr(child: Expression, shingleK: Int, window: Int)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  require(shingleK >= 1, s"shingleK=$shingleK must be >= 1")
  require(window >= 1, s"window=$window must be >= 1")
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "winnow_fps"

  override def compute(input: UTF8String): AnyRef = {
    val wh = TextHash.wordHashes(input)
    if (wh.isEmpty) return null
    // positional k-shingle hashes (duplicates preserved — winnowing is
    // positional, unlike the distinct set in shingleHashes)
    val nSh = math.max(wh.length - shingleK + 1, 1)
    val ph = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      var h = 2862933555777941757L
      var j = i
      val end = math.min(i + shingleK, wh.length)
      while (j < end) { h = XXH64.hashLong(wh(j), h); j += 1 }
      ph(i) = h
      i += 1
    }
    val out = new java.util.LinkedHashSet[Long]()
    var lastPos = -1
    val nWin = math.max(ph.length - window + 1, 1)
    var start = 0
    while (start < nWin) {
      val end = math.min(start + window, ph.length)
      // rightmost minimum of ph[start, end)
      var mnPos = start
      var p = start
      while (p < end) { if (ph(p) <= ph(mnPos)) mnPos = p; p += 1 }
      if (mnPos != lastPos) { out.add(ph(mnPos)); lastPos = mnPos }
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** sig_agree(a, b): number of positions where two long-array signatures
  * agree — the MinHash similarity estimate numerator. The declarative form
  * (`size(filter(zip_with(...)))`) walks interpreted higher-order lambdas
  * per element; this generates a tight primitive loop inside WSCG. */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        ${ev.value} = 0;
        int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if ($a.getLong($i) == $b.getLong($i)) ${ev.value}++;
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreeExpr =
    copy(left = newLeft, right = newRight)
}

object TextHashExpressions {
  def minhashSig(text: Column, shingleK: Int = 3, numHashes: Int = 16): Column =
    GraftShims.toColumn(MinHashSigExpr(GraftShims.toExpression(text), shingleK, numHashes))
  def shingleHashes(text: Column, shingleK: Int = 3): Column =
    GraftShims.toColumn(ShingleHashesExpr(GraftShims.toExpression(text), shingleK))
  def simhash64(text: Column): Column =
    GraftShims.toColumn(SimHashExpr(GraftShims.toExpression(text)))
  def sigAgree(a: Column, b: Column): Column =
    GraftShims.toColumn(SigAgreeExpr(GraftShims.toExpression(a), GraftShims.toExpression(b)))
  def winnowFps(text: Column, shingleK: Int = 3, window: Int = 4): Column =
    GraftShims.toColumn(WinnowExpr(GraftShims.toExpression(text), shingleK, window))
}
