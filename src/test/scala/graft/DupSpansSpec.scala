package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Dedup

/** Duplicated-span detection/removal (C54) on planted corpora: a
  * boilerplate token run shared by ≥ minDf docs is recovered EXACTLY —
  * span edges to the token — regardless of where it sits in each doc
  * (start, middle, end, different offset per doc), and the cleaned text
  * is the doc with precisely that run excised. */
class DupSpansSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private val K = 20

  /** Unique filler: n tokens no two docs share. */
  private def filler(doc: Int, tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"u${doc}${tag}$i")

  private val block: Seq[String] = (0 until 30).map(i => s"boiler$i")

  private def df(rows: Seq[(Long, Seq[String])]): DataFrame =
    rows.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")

  private def spans(docs: DataFrame, minDf: Int = 3) =
    Dedup.dupSpansOf(docs, K, minDf).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("a shared 30-token block is cut exactly, at any per-doc offset") {
    // offsets 0 (start), 7 (middle), 25 (end) — mutually misaligned
    val docs = df(Seq(
      1L -> (block ++ filler(1, "a", 40)),
      2L -> (filler(2, "a", 7) ++ block ++ filler(2, "b", 33)),
      3L -> (filler(3, "a", 25) ++ block)))
    assert(spans(docs).toSeq == Seq(
      (1L, 70L, 1L, 30L), (2L, 70L, 1L, 30L), (3L, 55L, 1L, 30L)))
    val clean = Dedup.dupSpansCleanOf(docs, K, 3).orderBy("doc_id")
      .collect().map(_.getString(1))
    assert(clean(0) == filler(1, "a", 40).mkString(" "))
    assert(clean(1) == (filler(2, "a", 7) ++ filler(2, "b", 33)).mkString(" "))
    assert(clean(2) == filler(3, "a", 25).mkString(" "))
  }

  test("below minDf nothing is cut; docs pass through verbatim") {
    val docs = df(Seq(
      1L -> (block ++ filler(1, "a", 10)),
      2L -> (filler(2, "a", 10) ++ block),
      3L -> filler(3, "a", 40)))
    assert(spans(docs, minDf = 3).forall(_._3 == 0L))
    val clean = Dedup.dupSpansCleanOf(docs, K, 3).orderBy("doc_id")
      .collect().map(_.getString(1))
    assert(clean(0) == (block ++ filler(1, "a", 10)).mkString(" "))
    // with minDf=2 the same corpus cuts the block from both carriers
    assert(spans(docs, minDf = 2).toSeq == Seq(
      (1L, 40L, 1L, 30L), (2L, 40L, 1L, 30L), (3L, 40L, 0L, 0L)))
  }

  test("two adjacent duplicated runs merge into one span") {
    val b2: Seq[String] = (0 until 25).map(i => s"plate$i")
    // doc 1 carries block+b2 back-to-back; 2 and 3 carry them separately —
    // in doc 1 the joined region is one 55-token cut (islands merge),
    // PLUS the straddling grams are themselves shared nowhere, so the
    // merged span still ends exactly at the b2 boundary
    val docs = df(Seq(
      1L -> (filler(1, "a", 5) ++ block ++ b2 ++ filler(1, "b", 5)),
      2L -> (filler(2, "a", 11) ++ block ++ filler(2, "b", 13)),
      3L -> (filler(3, "a", 3) ++ block ++ filler(3, "b", 21)),
      4L -> (filler(4, "a", 17) ++ b2 ++ filler(4, "b", 9)),
      5L -> (filler(5, "a", 23) ++ b2 ++ filler(5, "b", 2))))
    val got = spans(docs, minDf = 3).toMap2
    assert(got(1L) == (65L, 1L, 55L)) // one merged span covering both runs
    assert(got(2L) == (54L, 1L, 30L))
    assert(got(4L) == (51L, 1L, 25L))
  }

  test("whole-doc duplication cleans to the empty string") {
    val docs = df(Seq(1L -> block, 2L -> block, 3L -> block))
    assert(spans(docs).toSeq == Seq(
      (1L, 30L, 1L, 30L), (2L, 30L, 1L, 30L), (3L, 30L, 1L, 30L)))
    val clean = Dedup.dupSpansCleanOf(docs, K, 3).orderBy("doc_id")
      .collect().map(_.getString(1))
    assert(clean.forall(_ == ""))
  }

  test("docs shorter than k tokens never produce windows or spans") {
    val short = (0 until K - 1).map(i => s"s$i")
    val docs = df(Seq(1L -> short, 2L -> short, 3L -> short, 4L -> short))
    assert(spans(docs).forall(r => r._3 == 0L && r._4 == 0L))
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  private def collect4(d: DataFrame) = d.orderBy("doc_id").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("incremental ingest equals the full run restricted to the batch") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("graft-gramstore").toString
    // the block is hot ONLY across store+batch: 1 store carrier + 2 batch
    // carriers = minDf 3 — neither side alone reaches it
    val corpusA = df(Seq(1L -> (filler(1, "a", 11) ++ block ++ filler(1, "b", 4))))
    val batchB = df(Seq(
      10L -> (block ++ filler(10, "a", 25)),
      11L -> (filler(11, "a", 7) ++ block),
      12L -> filler(12, "a", 30)))
    Dedup.writeGramStore(corpusA, store, K)
    val inc = collect4(Dedup.dupSpansIncremental(batchB, store, batchId = 1L))
    val full = collect4(Dedup.dupSpansOf(
      corpusA.unionByName(batchB), K, 3).filter($"doc_id" >= 10L))
    assert(inc == full, s"inc $inc != full $full")
    assert(inc.map(r => (r._1, r._4)) == Seq((10L, 30L), (11L, 30L), (12L, 0L)))
  }

  test("retried ingest is idempotent; df accumulates across batches") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("graft-gramstore2").toString
    val corpusA = df(Seq(1L -> (filler(1, "a", 11) ++ block)))
    val batchB = df(Seq(
      10L -> (block ++ filler(10, "a", 9)),
      11L -> (filler(11, "a", 3) ++ block)))
    Dedup.writeGramStore(corpusA, store, K)
    val first = collect4(Dedup.dupSpansIncremental(batchB, store, 1L))
    // a crashed-and-retried ingest must reproduce the same verdicts and
    // leave the store as if run once (its own partition is excluded on
    // read and dynamically overwritten on land)
    val retry = collect4(Dedup.dupSpansIncremental(batchB, store, 1L))
    assert(first == retry, s"$first != $retry")
    // cross-batch accumulation: a LATER single-carrier batch sees the
    // block's df already at 3 (1 store + 2 batch-1), so its lone carrier
    // crosses minDf even though nothing in batch 2 repeats
    val batchC = df(Seq(20L -> (filler(20, "a", 5) ++ block ++ filler(20, "b", 2))))
    val third = collect4(Dedup.dupSpansIncremental(batchC, store, 2L))
    assert(third == Seq((20L, 37L, 1L, 30L)), s"got $third")
  }

  test("a doc re-submitted under a NEW batch_id neither inflates df nor re-emits") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("graft-gramstore3").toString
    val spark = SparkSuite.spark
    // block carriers: doc 1 (store) + doc 10 (batch 1) → df 2 < minDf 3
    val corpusA = df(Seq(1L -> (filler(1, "a", 11) ++ block)))
    val doc10 = 10L -> (block ++ filler(10, "a", 9))
    Dedup.writeGramStore(corpusA, store, K)
    collect4(Dedup.dupSpansIncremental(df(Seq(doc10)), store, 1L))
    // batch 2 RE-SUBMITS doc 10 alongside a fresh non-carrier: counting
    // doc 10's grams again would push the block to a phantom df of 3 and
    // over-cut it — the admitted-doc anti-join must skip doc 10 entirely
    val second = collect4(Dedup.dupSpansIncremental(
      df(Seq(doc10, 20L -> filler(20, "a", 30))), store, 2L))
    assert(second == Seq((20L, 30L, 0L, 0L)), s"got $second")
    // the store still counts doc 10 exactly once: a later third genuine
    // carrier is what crosses minDf, not the re-submission
    val blockDf = spark.read.parquet(s"$store/dfs.parquet")
      .filter($"fp" === org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.lit(block.take(K).mkString(" "))
          .cast("binary")))
      .agg(org.apache.spark.sql.functions.sum($"df")).head().getLong(0)
    assert(blockDf == 2L, s"store df for the block's first gram = $blockDf, want 2")
    val third = collect4(Dedup.dupSpansIncremental(
      df(Seq(30L -> (filler(30, "a", 4) ++ block))), store, 3L))
    assert(third == Seq((30L, 34L, 1L, 30L)), s"got $third")
  }
}
