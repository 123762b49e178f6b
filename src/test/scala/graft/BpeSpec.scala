package graft

import org.apache.spark.sql.DataFrame
import graft.operators.TextOps

/** BPE training/encoding (C53) against an exact in-memory reference of the
  * public algorithm (Sennrich et al. 2016): greedy most-frequent adjacent
  * pair, every occurrence counted (overlaps included), leftmost
  * non-overlapping replacement, (freq desc, left, right) tie-break —
  * the same rules the Spark fold implements, checked merge-for-merge. */
class BpeSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  /** Exact single-node BPE trainer over a word-frequency table. */
  private def refTrain(words: Map[String, Long], nMerges: Int,
                       minFreq: Long): Seq[(Int, String, String, Long)] = {
    var syms = words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val stats = collection.mutable.Map.empty[(String, String), Long]
      for ((ss, f) <- syms; i <- 0 until ss.size - 1)
        stats((ss(i), ss(i + 1))) = stats.getOrElse((ss(i), ss(i + 1)), 0L) + f
      if (stats.isEmpty) done = true
      else {
        val ((a, b), n) = stats.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < minFreq) done = true
        else {
          rank += 1
          out += ((rank, a, b, n))
          syms = syms.map { case (ss, f) => (refMerge(ss, a, b), f) }
        }
      }
    }
    out.result()
  }

  /** Leftmost non-overlapping replacement of adjacent (a, b) with a+b. */
  private def refMerge(ss: Vector[String], a: String, b: String): Vector[String] = {
    val buf = collection.mutable.ArrayBuffer.empty[String]
    for (x <- ss) {
      if (buf.nonEmpty && buf.last == a && x == b) buf(buf.size - 1) = a + b
      else buf += x
    }
    buf.toVector
  }

  private def refEncodeLen(w: String, merges: Seq[(String, String)]): Int =
    merges.foldLeft(w.map(_.toString).toVector) {
      case (ss, (a, b)) => refMerge(ss, a, b)
    }.size

  private def wordFreq(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def docsOf(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def trained(docs: DataFrame, nMerges: Int, minFreq: Long) =
    TextOps.bpeTrainOf(docs, nMerges, minFreq).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("bpeTrain matches the exact reference on the classic corpus") {
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val got = trained(docsOf(texts), 10, 1L)
    val want = refTrain(wordFreq(texts), 10, 1L)
    assert(got == want)
    // hand-checked head: "es" and "st" tie at 9 (newest 6 + widest 3);
    // the (left, right) tie-break picks ("e","s") first, then ("es","t")
    assert(got.take(2) == Seq((1, "e", "s", 9L), (2, "es", "t", 9L)))
  }

  test("bpeTrain handles overlapping pairs like the reference (aaa -> aa+a)") {
    // "aaaa" has 3 adjacent (a,a) occurrences but only 2 non-overlapping
    // merge sites; the NEXT iteration must see [aa, aa] -> (aa, aa)
    val texts = Seq.fill(4)("aaaa") ++ Seq.fill(2)("aaa ab")
    val got = trained(docsOf(texts), 6, 1L)
    val want = refTrain(wordFreq(texts), 6, 1L)
    assert(got == want)
    assert(got.head._2 == "a" && got.head._3 == "a")
  }

  test("bpeTrain == reference on a seeded random ab-alphabet corpus") {
    val rnd = new scala.util.Random(42)
    val texts = Seq.fill(40)(
      Seq.fill(1 + rnd.nextInt(3))(
        Seq.fill(1 + rnd.nextInt(6))(if (rnd.nextBoolean()) "a" else "b")
          .mkString).mkString(" "))
    val got = trained(docsOf(texts), 12, 1L)
    val want = refTrain(wordFreq(texts), 12, 1L)
    assert(got == want)
  }

  test("bpeTrain stops at minFreq and at pair exhaustion") {
    val texts = Seq("ab", "ab", "cd")
    // (a,b) freq 2 admitted at minFreq=2; (c,d) freq 1 is not
    assert(trained(docsOf(texts), 10, 2L) == Seq((1, "a", "b", 2L)))
    // single-char words produce no pairs at all
    assert(trained(docsOf(Seq("a b", "c")), 10, 1L).isEmpty)
  }

  test("bpeEncode token counts match the reference encoder per doc") {
    val texts = Seq("low lower", "newest newest widest", "low widest newest")
    val docs = docsOf(texts)
    val merges = trained(docs, 8, 1L).map(m => (m._2, m._3))
    val got = TextOps.bpeEncodeWith(docs, merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))
    val want = texts.map { t =>
      val ws = t.split(" ").filter(_.nonEmpty)
      (ws.length.toLong, ws.map(refEncodeLen(_, merges).toLong).sum)
    }
    assert(got.toSeq == want)
  }

  /** Exact in-memory mirror of the BATCHED trainer's selection rule:
    * top-batchCap candidates in (freq desc, left, right) order, maximal
    * symbol-disjoint prefix (cut at the first candidate whose left, right,
    * or produced string was already used), batch applied sequentially
    * (order irrelevant under disjointness), then re-count. */
  private def refTrainBatched(words: Map[String, Long], nMerges: Int,
                              minFreq: Long, batchCap: Int): Seq[(Int, String, String, Long)] = {
    var syms = words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val stats = collection.mutable.Map.empty[(String, String), Long]
      for ((ss, f) <- syms; i <- 0 until ss.size - 1)
        stats((ss(i), ss(i + 1))) = stats.getOrElse((ss(i), ss(i + 1)), 0L) + f
      val cands = stats.toSeq.filter(_._2 >= minFreq)
        .sortBy { case ((a, b), n) => (-n, a, b) }
        .take(math.min(batchCap, nMerges - rank))
      if (cands.isEmpty) done = true
      else {
        var used = Set.empty[String]
        var open = true
        for (((a, b), n) <- cands if open) {
          if (Seq(a, b, a + b).exists(used)) open = false
          else {
            rank += 1
            out += ((rank, a, b, n))
            used ++= Seq(a, b, a + b)
            syms = syms.map { case (ss, f) => (refMerge(ss, a, b), f) }
          }
        }
      }
    }
    out.result()
  }

  private def trainedBatched(docs: DataFrame, nMerges: Int, minFreq: Long,
                             batchCap: Int) =
    TextOps.bpeTrainBatchedOf(docs, nMerges, minFreq, batchCap)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("batched trainer with batchCap=1 is bit-identical to the sequential trainer") {
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    assert(trainedBatched(docsOf(texts), 10, 1L, 1) == trained(docsOf(texts), 10, 1L))
  }

  test("batched trainer == its exact in-memory mirror at caps 4 and 32") {
    val classic = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val rnd = new scala.util.Random(7)
    val random = Seq.fill(40)(
      Seq.fill(1 + rnd.nextInt(3))(
        Seq.fill(1 + rnd.nextInt(6))("abcd" (rnd.nextInt(4)).toString)
          .mkString).mkString(" "))
    for (texts <- Seq(classic, random); cap <- Seq(4, 32)) {
      val got = trainedBatched(docsOf(texts), 16, 1L, cap)
      val want = refTrainBatched(wordFreq(texts), 16, 1L, cap)
      assert(got == want, s"cap=$cap texts=${texts.take(2)}…")
    }
  }

  test("batch selection cuts at the first conflicting candidate (prefix rule)") {
    // iteration-1 candidates: (a,b) 6, (b,c) 5, (x,y) 4. (b,c) shares b
    // with (a,b) → the batch CUTS there, deferring (x,y) too — which is
    // exactly sequential-greedy order: after (a,b) applies, (ab,c) at 5
    // outranks (x,y) at 4. A skip-and-continue rule would have promoted
    // (x,y) to rank 2; this pins that it doesn't.
    val texts = Seq.fill(5)("abc") ++ Seq("ab") ++ Seq.fill(4)("xy")
    val got = trainedBatched(docsOf(texts), 3, 1L, 8)
    assert(got == Seq((1, "a", "b", 6L), (2, "ab", "c", 5L), (3, "x", "y", 4L)),
      s"got $got")
    // and the whole run equals the sequential trainer on this corpus
    assert(got == trained(docsOf(texts), 3, 1L))
  }

  test("chunked encode equals the per-merge reference across chunk cuts") {
    // trained on aaaa-style corpus: rank 2 consumes rank 1's output, so
    // the chunker must cut between them; counts must still match the
    // strictly sequential reference encoder
    val texts = Seq.fill(4)("aaaa aab") ++ Seq.fill(2)("aaa ab ba")
    val docs = docsOf(texts)
    val merges = trained(docs, 6, 1L).map(m => (m._2, m._3))
    val got = TextOps.bpeEncodeWith(docs, merges)
      .orderBy("doc_id").collect()
      .map(_.getAs[Long]("n_bpe_tokens")).toSeq
    val want = texts.map(_.split(" ").filter(_.nonEmpty)
      .map(refEncodeLen(_, merges).toLong).sum)
    assert(got == want)
  }

  test("bpeEncode with zero merges counts characters; merges only shrink it") {
    val texts = Seq("abab abab", "bb a")
    val docs = docsOf(texts)
    val zero = TextOps.bpeEncodeWith(docs, Seq.empty).orderBy("doc_id")
      .collect().map(_.getAs[Long]("n_bpe_tokens")).toSeq
    assert(zero == Seq(8L, 3L)) // whitespace is not a symbol
    val merges = trained(docs, 4, 1L).map(m => (m._2, m._3))
    val enc = TextOps.bpeEncodeWith(docs, merges).orderBy("doc_id")
      .collect().map(_.getAs[Long]("n_bpe_tokens")).toSeq
    assert(enc.zip(zero).forall { case (e, z) => e <= z })
  }

  test("C53d store: fast-store-served encode is bit-equal to direct batched train+encode; batchCap=1 store equals the sequential table") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpes-spec")
    try {
      TextOps.writeBpeStoreFast(Tables.documents(spark, sf), s"$tmp/fast",
        nMerges = 64)
      val stored = TextOps.bpeEncodeFromStore(spark, sf, s"$tmp/fast")
        .collect().map(_.toSeq).toSet
      val docs = Tables.documents(spark, sf)
      val ms = TextOps.bpeTrainBatchedOf(docs, 64, 2, 32).collect()
        .sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
      val direct = TextOps.bpeEncodeWith(docs, ms).collect().map(_.toSeq).toSet
      assert(stored == direct && stored.nonEmpty)
      // batchCap=1 degenerates to the sequential trainer's table bit-for-bit
      TextOps.writeBpeStoreFast(docs, s"$tmp/seq1", nMerges = 8, batchCap = 1)
      TextOps.writeBpeStore(docs, s"$tmp/seq2", nMerges = 8)
      val t1 = spark.read.parquet(s"$tmp/seq1/merges.parquet")
        .collect().map(_.toSeq).toSet
      val t2 = spark.read.parquet(s"$tmp/seq2/merges.parquet")
        .collect().map(_.toSeq).toSet
      assert(t1 == t2 && t1.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }
}
