package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

import scala.collection.mutable.ArrayBuffer

/** Deterministic 256-entry gear table for C111 content-defined chunking
  * (48-bit positive values; derived from MD5 and FIXED FOREVER — chunk
  * boundaries are a store contract: a corpus chunked last year must
  * align with a batch chunked today). */
object GearTable {
  val table: Array[Long] = Array.tabulate(256) { i =>
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-gear-$i".getBytes("UTF-8"))
    BigInt(1, h.take(8)).longValue & 0xFFFFFFFFFFFFL
  }
}

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
      case DoubleType => s"((java.lang.Double) $boxed).doubleValue()"
      case org.apache.spark.sql.types.BooleanType =>
        s"((java.lang.Boolean) $boxed).booleanValue()"
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

/** One-pass kernel for the Gopher repetition battery (TextOps.repFractions):
  * per-doc duplicate line/paragraph census + per-n gram top/dup char sums
  * for n = 2..10, computed in a single compiled pass per document. The
  * declarative HOF-fold form is CodegenFallback (interpreted lambda per
  * array element) — measured 9.9 s at sf0.1; this kernel replaces it at
  * identical semantics: Java regex split (the engine Spark's own split
  * uses, limit −1), code-point lengths (Spark length()), and UTF-8 BINARY
  * byte order for the top-gram tie-break (Spark/DuckDB string order — NOT
  * java.lang.String's UTF-16 order, which diverges for supplementary
  * planes). */
object RepStats {
  import org.apache.spark.sql.types.{StructField, StructType}
  val schema: StructType = StructType(Seq(
    "line_total", "line_uniq", "line_chars", "line_dup",
    "para_total", "para_uniq", "para_chars", "para_dup",
    "top2", "top3", "top4",
    "dup5", "dup6", "dup7", "dup8", "dup9", "dup10")
    .map(StructField(_, LongType, nullable = false)))

  private val ParaRe = java.util.regex.Pattern.compile("\n\n")

  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  private def utf8Gt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d > 0
      i += 1
    }
    x.length > y.length
  }

  private def blockStats(blocks: Array[String], out: Array[Any], off: Int): Unit = {
    val m = new java.util.HashMap[String, java.lang.Long](blocks.length * 2)
    var chars = 0L
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      chars += cpLen(b)
      val c = m.get(b)
      m.put(b, if (c == null) 1L else c + 1L)
      i += 1
    }
    var dup = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2L) dup += (e.getValue - 1L) * cpLen(e.getKey)
    }
    out(off) = blocks.length.toLong
    out(off + 1) = m.size.toLong
    out(off + 2) = chars
    out(off + 3) = dup
  }

  def compute(input: UTF8String): AnyRef = {
    val text = input.toString
    val out = new Array[Any](17)
    blockStats(text.split("\n", -1), out, 0)
    blockStats(ParaRe.split(text, -1), out, 4)
    val words = text.split(" ", -1)
    val sb = new java.lang.StringBuilder
    var n = 2
    while (n <= 10) {
      var top = 0L
      var dup = 0L
      if (words.length >= n) {
        val m = new java.util.HashMap[String, java.lang.Long](words.length * 2)
        var i = 0
        while (i + n <= words.length) {
          sb.setLength(0)
          var j = i
          while (j < i + n) {
            if (j > i) sb.append(' ')
            sb.append(words(j))
            j += 1
          }
          val g = sb.toString
          val c = m.get(g)
          m.put(g, if (c == null) 1L else c + 1L)
          i += 1
        }
        var topC = 0L
        var topL = 0L
        var topG: String = null
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue.longValue()
          if (n <= 4) {
            val len = cpLen(e.getKey)
            if (c > topC || (c == topC && (len > topL ||
                (len == topL && (topG == null || utf8Gt(e.getKey, topG)))))) {
              topC = c; topL = len; topG = e.getKey
            }
          } else if (c >= 2L) dup += c * cpLen(e.getKey)
        }
        top = topC * topL
      }
      if (n <= 4) out(8 + (n - 2)) = top else out(11 + (n - 5)) = dup
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** One-pass kernels for DSIR (TextOps anchor: operators/Dsir.scala):
  * hashed uni+bigram bucket featurization and the λ-fold log importance
  * weight, replicating the declarative form bit-for-bit — Spark's own
  * Murmur3 (seed 42, UTF-8 bytes, the `hash()` function) with pmod, token
  * order unigrams-then-bigrams so the fold's summation order is unchanged.
  * The declarative HOF form walked interpreted lambdas per feature TWICE
  * (census + score) — measured 13.7 s at sf0.1 / 104 s at 10×. */
object DsirKernel {
  private def bucket(str: String, nBuckets: Int): Int = {
    val b = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42)
    val m = h % nBuckets
    if (m < 0) m + nBuckets else m
  }

  /** Bucket ids, unigrams then "_"-joined adjacent bigrams. */
  def buckets(s: UTF8String, nBuckets: Int): Array[Int] = {
    val words = s.toString.split(" ", -1)
    val n = words.length
    val out = new Array[Int](if (n >= 2) 2 * n - 1 else n)
    var i = 0
    while (i < n) { out(i) = bucket(words(i), nBuckets); i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = bucket(words(i) + "_" + words(i + 1), nBuckets)
      i += 1
    }
    out
  }

  /** Σ λ[bucket] in featurization order (bit-equal to the fold over the
    * literal λ array). */
  def logw(s: UTF8String, nBuckets: Int, lam: Array[Double]): Double = {
    val bs = buckets(s, nBuckets)
    var acc = 0.0
    var i = 0
    while (i < bs.length) { acc += lam(bs(i)); i += 1 }
    acc
  }
}

/** dsir_buckets(text): hashed uni+bigram feature bucket ids. */
case class DsirBucketsExpr(child: Expression, nBuckets: Int)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  require(nBuckets >= 1)
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dsir_buckets"
  override def compute(input: UTF8String): AnyRef =
    new GenericArrayData(DsirKernel.buckets(input, nBuckets))
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): DsirBucketsExpr =
    copy(child = newChild)
}

/** dsir_logw(text): log importance weight under the λ model carried as an
  * expression constant (model-as-plan-literal — no model object in any
  * task closure beyond this immutable array). */
case class DsirLogwExpr(child: Expression, nBuckets: Int, lam: Seq[Double])
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  require(lam.length == nBuckets, s"lam has ${lam.length} entries for $nBuckets buckets")
  private val lamArr = lam.toArray
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_logw"
  override def compute(input: UTF8String): AnyRef =
    java.lang.Double.valueOf(DsirKernel.logw(input, nBuckets, lamArr))
  override def nullSafeEval(input: Any): Any =
    DsirKernel.logw(input.asInstanceOf[UTF8String], nBuckets, lamArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): DsirLogwExpr =
    copy(child = newChild)
}

/** rep_stats(text): the 17 repetition-census longs for one document. */
case class RepStatsExpr(child: Expression)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = RepStats.schema
  override def prettyName: String = "rep_stats"
  override def compute(input: UTF8String): AnyRef = RepStats.compute(input)
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

/** deflate_len(text): DEFLATE-compressed byte length of the UTF-8 text
  * (raw stream, fixed level 6) — the compression-ratio quality signal:
  * highly repetitive/boilerplate text compresses far below prose, random
  * noise barely compresses at all (the RefinedWeb/Gopher-family "too
  * compressible / too incompressible" cut). Deterministic for a given
  * JDK zlib (re-run stable — spec-pinned); no SQL oracle exists, so the
  * derived operator is rows-only by design. One streaming pass over the
  * bytes with a fixed 8 KiB output buffer — O(len) time, O(1) extra
  * memory, and the expression stays inside whole-stage codegen via the
  * shared kernel call. */
case class DeflateLenExpr(child: Expression)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def compute(input: UTF8String): AnyRef = {
    val bytes = input.getBytes
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    java.lang.Long.valueOf(total)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

/** cdc_cuts(text): chunk END positions (1-based, inclusive; last = length)
  * under gear content-defined chunking — the C111 kernel. The unbounded
  * gear roll h ← h·2 + gear[c] (mod 2⁶⁴, wrapping) has low-k bits equal
  * to the windowed sum Σ_{j<k} gear[c_{i−j}]·2^j mod 2^k (higher terms
  * shift out, carries only flow up), so the (h & mask) = 0 boundary test
  * is a pure function of the trailing k characters — content-local with
  * no reset convention — while the kernel pays O(1) per character. The
  * declarative HOF form walks interpreted lambdas per character (~100×
  * slower, measured as the 10×-rehearsal ceiling); this is the §5.5
  * kernel-ization, one tight primitive loop inside WSCG. Characters are
  * UTF-16 code units masked to 8 bits (the corpus contract). */
case class CdcCutsExpr(child: Expression, maskBits: Int, minLen: Int,
                       maxLen: Int)
    extends UnaryExpression with TextHashKernel with ExpectsInputTypes {
  require(minLen >= 1 && maxLen > minLen && maskBits >= 1 && maskBits <= 14)
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType)
  override def prettyName: String = "cdc_cuts"

  override def compute(input: UTF8String): AnyRef = {
    val s = input.toString
    if (s.isEmpty) return null
    val gear = graft.functions.GearTable.table
    val mask = (1L << maskBits) - 1
    val cuts = new ArrayBuffer[Int]()
    var h = 0L; var start = 1; var i = 1
    while (i <= s.length) {
      h = h * 2 + gear(s.charAt(i - 1) & 255)
      if ((i - start + 1 >= minLen && (h & mask) == 0) ||
          i - start + 1 >= maxLen) {
        cuts += i; start = i + 1
      }
      i += 1
    }
    if (start <= s.length) cuts += s.length
    new GenericArrayData(cuts.toArray)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): CdcCutsExpr =
    copy(child = newChild)
}

/** bloom_contains(hash): membership probe against a BROADCAST Spark
  * BloomFilter over pre-hashed xxhash64 keys (the InjectRuntimeFilter
  * keying: the builder aggregates `putLong(xxhash64(k))`, the probe tests
  * `mightContainLong(xxhash64(k))` — hashing stays a codegen'd plan
  * expression on both sides). The filter rides a `Broadcast` variable —
  * the same transport Spark's own InjectRuntimeFilter uses via
  * BroadcastExchange — so the task binary carries only the broadcast
  * HANDLE (~bytes) and each executor fetches + deserializes the filter
  * ONCE into its block manager, however many tasks and stages probe it.
  * The earlier plan-literal transport (r≤10) serialized the filter bytes
  * into every task closure: fine at KB filters, a `TaskSetManager`
  * large-task warning at the gate's 2^20-key geometry, and a driver OOM
  * at the 10⁹-key corpus the store exists for. No UDF: the probe is a
  * codegen'd kernel call, so the scan → probe projection stays inside
  * WSCG. */
case class BloomContainsExpr(
    child: Expression,
    bfBcast: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(LongType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_contains"

  // block-manager-cached: one fetch + deserialize per executor, not per task
  @transient private lazy val bf = bfBcast.value

  def compute(hash: Long): Boolean = bf.mightContainLong(hash)

  // identity = broadcast id: a broadcast value is immutable, so equal ids
  // mean equal filters — identical probes canonicalize without comparing
  // (potentially huge) filter content (the r9 ADVICE discipline, adapted
  // to the broadcast transport)
  override def equals(other: Any): Boolean = other match {
    case that: BloomContainsExpr =>
      child == that.child && bfBcast.id == that.bfBcast.id
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.lang.Long.hashCode(bfBcast.id)

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bf.mightContainLong(input.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomContainsExpr].getName)
    defineCodeGen(ctx, ev, h => s"$ref.compute($h)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}

/** Row-level LCS kernel: token-level longest-common-subsequence length
  * over whitespace tokens (capped per side) — the ROUGE-L core. Two-row
  * DP, O(m·n) time / O(n) space. Tokens compare as STRINGS (interned
  * per call) — a 32-bit token hash would silently inflate the LCS on a
  * collision; exactness is the point of the metric. */
object LcsKernel {
  private def tokens(s: UTF8String, cap: Int): Array[String] = {
    val toks = s.toString.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[String](
      math.min(toks.length, cap))
    var i = 0
    while (i < toks.length && out.length < cap) {
      if (toks(i).nonEmpty) out += toks(i)
      i += 1
    }
    out.toArray
  }

  def lcsTokens(a: UTF8String, b: UTF8String, cap: Int): Int = {
    val x = tokens(a, cap); val y = tokens(b, cap)
    if (x.isEmpty || y.isEmpty) return 0
    val prev = new Array[Int](y.length + 1)
    val cur = new Array[Int](y.length + 1)
    var i = 1
    while (i <= x.length) {
      var j = 1
      while (j <= y.length) {
        cur(j) =
          if (x(i - 1) == y(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(y.length)
  }

  /** Capped token count with the same tokenization as the LCS — the
    * ROUGE denominators must count what the numerator saw. */
  def nTokens(a: UTF8String, cap: Int): Int = tokens(a, cap).length
}

/** lcs_tokens(a, b): token-level LCS length (capped) as a codegen'd
  * kernel call — no UDF, the pair scoring stays inside WSCG. */
case class LcsTokensExpr(left: Expression, right: Expression, cap: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] =
    Seq(StringType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "lcs_tokens"
  override def nullSafeEval(a: Any, b: Any): Any =
    LcsKernel.lcsTokens(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], cap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LcsKernel$$.MODULE$$.lcsTokens($a, $b, $cap)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LcsTokensExpr = copy(left = l, right = r)
}

/** n_tokens_capped(a): the LCS tokenization's capped token count. */
case class NTokensCappedExpr(child: Expression, cap: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftShims.AbstractType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "n_tokens_capped"
  override def nullSafeEval(a: Any): Any =
    LcsKernel.nTokens(a.asInstanceOf[UTF8String], cap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.LcsKernel$$.MODULE$$.nTokens($a, $cap)")
  override protected def withNewChildInternal(c: Expression): NTokensCappedExpr =
    copy(child = c)
}

object TextHashExpressions {
  def bloomContains(hash: Column,
      bf: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    GraftShims.toColumn(BloomContainsExpr(GraftShims.toExpression(hash), bf))

  /** Distributed Bloom build over pre-hashed xxhash64 keys via Spark's own
    * `BloomFilterAggregate` (a TypedImperativeAggregate: partial filters
    * are allocated EXECUTOR-SIDE and merged by bit-OR through the agg
    * exchange as data). The replaced `DataFrameStatFunctions.bloomFilter`
    * ships a PRE-ALLOCATED filter as `treeAggregate`'s zero value in every
    * task closure — the same task-binary bloat the probe transport fix
    * removed, on the build side (1.2 MB/task at the gate geometry; the
    * whole filter per task at production sizes). Geometry matches
    * `BloomFilter.create(n, fpp)` exactly (numBits = optimalNumOfBits), so
    * filters from either path merge and serialize identically.
    *
    * CAP GUARD (r11 self-review): BloomFilterAggregate Math.min's both
    * geometry args against `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems`/`maxNumBits` (4M / 64M-bit defaults) AT EVAL — a
    * request above the caps would SILENTLY build a smaller filter,
    * breaking the stated fpp and desyncing from every
    * `BloomFilter.create`-built peer (mergeInPlace then throws
    * IncompatibleMergeException). Refuse loudly instead: size the session
    * confs to the store geometry (GraftSession ships 2^26 items /
    * 2^31 bits — the ~256 MB single-filter practical ceiling; shard the
    * key space above it). */
  def bloomAgg(hash: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val spark = org.apache.spark.sql.SparkSession.active
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    require(expectedItems <= maxItems && bits <= maxBits,
      s"bloom geometry ($expectedItems items / $bits bits) exceeds the session caps " +
        s"($maxItems items / $maxBits bits) — BloomFilterAggregate would silently " +
        "truncate it; raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems/" +
        "maxNumBits or shard the key space")
    GraftShims.toColumn(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        GraftShims.toExpression(hash),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(bits))
        .toAggregateExpression())
  }
  def lcsTokens(a: Column, b: Column, cap: Int = 256): Column =
    GraftShims.toColumn(LcsTokensExpr(GraftShims.toExpression(a),
      GraftShims.toExpression(b), cap))
  def nTokensCapped(a: Column, cap: Int = 256): Column =
    GraftShims.toColumn(NTokensCappedExpr(GraftShims.toExpression(a), cap))
  def cdcCuts(text: Column, maskBits: Int, minLen: Int, maxLen: Int): Column =
    GraftShims.toColumn(CdcCutsExpr(GraftShims.toExpression(text),
      maskBits, minLen, maxLen))
  def deflateLen(text: Column): Column =
    GraftShims.toColumn(DeflateLenExpr(GraftShims.toExpression(text)))
  def repStats(text: Column): Column =
    GraftShims.toColumn(RepStatsExpr(GraftShims.toExpression(text)))
  def dsirBuckets(text: Column, nBuckets: Int): Column =
    GraftShims.toColumn(DsirBucketsExpr(GraftShims.toExpression(text), nBuckets))
  def dsirLogw(text: Column, nBuckets: Int, lam: Seq[Double]): Column =
    GraftShims.toColumn(DsirLogwExpr(GraftShims.toExpression(text), nBuckets, lam))
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
