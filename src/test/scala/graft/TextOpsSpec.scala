package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Planted-input tests for the round-4 corpus-prep operators (PII scrub,
  * stratified sampling, BPE pair counts). The sf-level end-to-end results
  * are oracle-gated in SparkEntry; these specs pin the semantics on inputs
  * the synthetic corpus doesn't contain (real PII, tie-broken pair counts).
  */
class TextOpsSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  test("gopherRules: each published rule trips on its planted violator alone") {
    val d = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    val good = (Seq("the", "and", "of") ++ (1 to 57).map(i => s"word$i")).mkString(" ")
    val docs = Seq(
      0L -> good,                                              // passes all 7
      1L -> (Seq("the", "and") ++ (1 to 8).map(i => s"word$i")).mkString(" "), // 10 words
      2L -> (Seq("the", "and") ++ Seq.fill(58)("xy")).mkString(" "),           // mean len ~2
      3L -> (good + " " + Seq.fill(10)("#").mkString(" ")),                    // 10/70 symbols
      4L -> (1 to 8).map(_ => "- the and of alpha bravo charlie delta").mkString("\n"), // all bullets
      5L -> (1 to 5).map(i => (Seq("the", "and") ++ (1 to 9).map(j => s"w$i$j"))
        .mkString(" ") + " ending...").mkString("\n"),                         // all ellipsis lines
      6L -> (good + " " + Seq.fill(20)("123").mkString(" ")),                  // alpha 60/80
      7L -> (1 to 60).map(i => s"word$i").mkString(" ")                        // zero stopwords
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.gopherRules(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"), "clean doc rejected")
    (1L to 7L).foreach(id => assert(!out(id).getAs[Boolean]("keep"), s"doc $id kept"))
    // each violator fails for ITS rule (not a side effect of another)
    assert(out(1L).getAs[Long]("n_words") == 10L)
    assert(out(2L).getAs[Double]("mean_word_len") < 3.0)
    assert(out(3L).getAs[Double]("symbol_ratio") > 0.1 &&
      out(3L).getAs[Double]("alpha_ratio") > 0.8)
    assert(out(4L).getAs[Double]("bullet_ratio") == 1.0)
    assert(out(5L).getAs[Double]("ellipsis_ratio") == 1.0 &&
      out(5L).getAs[Double]("symbol_ratio") < 0.1)
    assert(out(6L).getAs[Double]("alpha_ratio") == 0.75)
    assert(out(7L).getAs[Long]("stop_hits") == 0L)
  }

  test("repFractions: planted dup lines / hot 2-gram trip their signals; clean doc passes") {
    val d = java.nio.file.Files.createTempDirectory("graft-rep").toString
    val docs = Seq(
      0L -> "aa bb cc.\naa bb cc.\ndd ee ff.",          // 1 of 3 lines duplicated
      1L -> "x y x y x y x y",                            // "x y" ×4 dominates
      2L -> (1 to 60).map(i => s"word$i").mkString(" ")   // no repetition at all
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.repFractions(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Double]("dup_line_frac") == 1.0 / 3)
    assert(out(0L).getAs[Double]("dup_line_char_frac") == 9.0 / 27)
    assert(!out(0L).getAs[Boolean]("keep"))
    // 7 two-grams, "x y" ×4, len 3; doc chars 15
    assert(out(1L).getAs[Double]("top2_char_frac") == 12.0 / 15)
    assert(!out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[Double]("dup_line_frac") == 0.0)
    Seq(5, 6, 7, 8, 9, 10).foreach(n =>
      assert(out(2L).getAs[Double](s"dup${n}_char_frac") == 0.0))
    assert(out(2L).getAs[Double]("top2_char_frac") < 0.2)
  }

  test("fineWebRules: each published filter trips on its planted violator alone") {
    val d = java.nio.file.Files.createTempDirectory("graft-fineweb").toString
    val longLine = (i: Int) => s"This is a sufficiently long sentence number $i okay."
    val noPunct = (i: Int) => s"This is a sufficiently long sentence number $i okay"
    val docs = Seq(
      0L -> (1 to 5).map(longLine).mkString("\n"),          // passes all 3
      1L -> (1 to 9).map(i => s"Tiny line $i.").mkString("\n"), // all short
      2L -> (1 to 5).map(noPunct).mkString("\n"),           // no terminal punct
      3L -> (Seq.fill(3)(longLine(1)) ++ Seq(longLine(2), longLine(3)))
        .mkString("\n")                                     // one line ×3
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.fineWebRules(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"), "clean doc rejected")
    (1L to 3L).foreach(id => assert(!out(id).getAs[Boolean]("keep"), s"doc $id kept"))
    // each violator trips ITS filter, with the exact measured fraction
    assert(out(1L).getAs[Double]("short_line_frac") == 1.0 &&
      out(1L).getAs[Double]("punct_line_ratio") == 1.0)
    assert(out(2L).getAs[Double]("punct_line_ratio") == 0.0 &&
      out(2L).getAs[Double]("short_line_frac") == 0.0)
    val lineLen = longLine(1).length.toDouble
    assert(out(3L).getAs[Double]("dup_line_char_frac") == 2 * lineLen / (5 * lineLen) &&
      out(3L).getAs[Double]("punct_line_ratio") == 1.0)
    assert(out(0L).getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("bigramLl separates word order where the unigram model is blind") {
    val d = java.nio.file.Files.createTempDirectory("graft-bigram").toString
    val docs = Seq(
      0L -> "c c d d",   // equal multiset to doc 1, different order
      1L -> "c d c d",
      2L -> "c d c d c d c d", // the corpus-typical phrasing
      3L -> "solo"             // single token: no bigram positions
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val uni = graft.operators.TextOps.unigramLlOf(
      spark.read.parquet(s"$d/documents.parquet")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll")).toMap
    assert(uni(0L) == uni(1L), "unigram model must be order-blind")
    val bi = TextOps.bigramLl(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll2")).toMap
    assert(bi(0L) != bi(1L), "bigram model must see order")
    // the doc written in the corpus's dominant bigram is more typical
    assert(bi(2L) < bi(0L))
    assert(!bi.contains(3L), "a 1-token doc has no bigram positions")
  }

  test("knLl: continuation backoff separates docs the add-one bigram model scores identically") {
    val d = java.nio.file.Files.createTempDirectory("graft-kn").toString
    val docs = (Seq(
      0L -> "x the",        // (x,the): c=1 — same surface stats as doc 1
      1L -> "x francisco",  // (x,francisco): c=1
      7L -> "san francisco" // francisco is frequent but context-bound
    ) ++ (2L to 6L).map(i => i -> s"a$i the")) // "the" follows 6 distinct contexts
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    // add-one bigram: both pairs have c(a,b)=1, c(x,·)=2, same V ⇒ equal nll
    val bi = TextOps.bigramLl(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("nll2")).toMap
    assert(bi(0L) == bi(1L), "add-one bigram is blind to continuation diversity")
    // KN: r("the")=6 contexts vs r("francisco")=2 ⇒ doc 0 is more typical
    val kn = TextOps.knLl(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("kn_nll")).toMap
    assert(kn(0L) < kn(1L), "KN continuation probability must see context diversity")
    // hand-computed: T=8 distinct pairs, n_x=2, t_x=2;
    // P(the|x) = (1-.75)/2 + (.75*2/2)*(6/8); P(francisco|x) = .25/2 + .75*(2/8)
    val pThe = 0.25 / 2 + (0.75 * 2 / 2) * (6.0 / 8)
    val pFra = 0.25 / 2 + (0.75 * 2 / 2) * (2.0 / 8)
    assert(math.abs(kn(0L) - BigDecimal(-math.log(pThe))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
    assert(math.abs(kn(1L) - BigDecimal(-math.log(pFra))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
    // every probability is valid: P in (0,1] ⇒ kn_nll >= 0 on the real table
    val real = TextOps.knLl(spark, sf)
    assert(real.filter(col("kn_nll") < 0).count() == 0)
    assert(real.count() > 0)
  }

  test("fertility: exact ratios from planted token counts; keyed by (source, lang)") {
    val d = java.nio.file.Files.createTempDirectory("graft-fert").toString
    val docs = Seq(
      (0L, "ab cd", "en", "web", 5L),   // 2 words, 2 re-tokens, 5 chars
      (1L, "a,b", "en", "web", 3L),     // 1 word, 3 re-tokens (a , b), 3 chars
      (2L, "xyz", "de", "web", 3L)      // separate group
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.fertility(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r).toMap
    val en = out(("web", "en"))
    assert(en.getAs[Long]("n_docs") == 2 && en.getAs[Long]("n_words") == 3 &&
      en.getAs[Long]("n_tokens") == 5 && en.getAs[Long]("n_chars") == 8)
    assert(en.getAs[Double]("fertility") == BigDecimal(5.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(en.getAs[Double]("chars_per_token") == 1.6)
    val de = out(("web", "de"))
    assert(de.getAs[Long]("n_words") == 1 && de.getAs[Long]("n_tokens") == 1 &&
      de.getAs[Double]("fertility") == 1.0)
  }

  test("spanCorrupt: coverage near the T5 regime, disjoint in-bounds spans, deterministic") {
    import graft.operators.TextOps
    val out = TextOps.spanCorrupt(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // spans sit inside their doc and are non-empty
    assert(rows.forall { r =>
      val s = r.getAs[Long]("start_pos"); val e = r.getAs[Long]("end_pos")
      s >= 0 && s < e && e <= r.getAs[Long]("n_tokens") &&
        r.getAs[Long]("n_masked") == e - s
    })
    // merged islands are STRICTLY separated (an adjacent span would have merged)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { spans =>
      val sorted = spans.toSeq.sortBy(_.getAs[Long]("start_pos"))
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(1).getAs[Long]("start_pos") > pair(0).getAs[Long]("end_pos"))
      }
    }
    // corpus-wide masked fraction ≈ 1 − (1−p)^L = 14.3% at the defaults
    val masked = rows.map(_.getAs[Long]("n_masked")).sum.toDouble
    val total = out.select("doc_id", "n_tokens").distinct()
      .agg(sum(col("n_tokens"))).head().getLong(0).toDouble
    val frac = masked / total
    assert(frac > 0.10 && frac < 0.19, s"masked fraction $frac")
    // derandomized: a re-run emits the identical manifest
    assert(out.except(TextOps.spanCorrupt(spark, sf)).count() == 0)
  }

  test("c4Clean: line filters, reassembly, and page-level drops on the original page") {
    val d = java.nio.file.Files.createTempDirectory("graft-c4").toString
    val docs = Seq(
      // 4 good sentence lines + droppable junk: short line, no terminal
      // punct, a javascript mention — junk vanishes, page survives
      0L -> "This is a good sentence.\nAnother full sentence here!\nshort.\nno terminal punct line\nthis line mentions JavaScript widgets.\nIs this a question?\nA final quoted line.\"",
      // only 2 lines survive -> page dropped by the 3-line floor
      1L -> "One good sentence here.\nA second good sentence.\njunk",
      // clean lines but the PAGE contains a brace on a dropped line
      2L -> "Good sentence number one.\nGood sentence number two.\nGood sentence number three.\nfunction() {",
      // lorem ipsum anywhere kills the page, case-insensitively
      3L -> "Lorem Ipsum dolor sit amet.\nGood sentence number two.\nGood sentence number three.\nGood sentence number four."
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.c4Clean(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"))
    assert(out(0L).getAs[Long]("n_kept_lines") == 4L)
    assert(out(0L).getAs[String]("clean_text") ==
      "This is a good sentence.\nAnother full sentence here!\nIs this a question?\nA final quoted line.\"")
    assert(!out(1L).getAs[Boolean]("keep") && out(1L).getAs[Long]("n_kept_lines") == 2L)
    assert(!out(2L).getAs[Boolean]("keep") && out(2L).getAs[Long]("n_kept_lines") == 3L)
    assert(!out(3L).getAs[Boolean]("keep"))
  }

  test("piiScrub: planted email+phone are counted and redacted") {
    val docs = Seq(
      (1L, "contact bob.smith+x@mail.example.org or 555-867-5309 now"),
      (2L, "no pii here at all"),
      (3L, "a@b.co and c.d@e-f.org twice, 111-222-3333 and 444-555-6666")
    ).toDF("doc_id", "text")
    val r = TextOps.piiScrubOf(docs).orderBy("doc_id").collect()

    assert(r(0).getAs[Long]("n_emails") == 1L)
    assert(r(0).getAs[Long]("n_phones") == 1L)
    assert(r(1).getAs[Long]("n_emails") == 0L)
    assert(r(1).getAs[Long]("n_phones") == 0L)
    assert(r(2).getAs[Long]("n_emails") == 2L)
    assert(r(2).getAs[Long]("n_phones") == 2L)

    // the fingerprint must verify the REDACTED text, not the original
    val expected = Seq(
      "contact <EMAIL> or <PHONE> now",
      "no pii here at all",
      "<EMAIL> and <EMAIL> twice, <PHONE> and <PHONE>")
    val expFp = expected.toDF("s")
      .select(md5(col("s").cast("binary"))).collect().map(_.getString(0))
    assert(r.map(_.getAs[String]("scrubbed_fp")).toSeq == expFp.toSeq)
  }

  test("piiScrub: clean doc fingerprint equals the original text's md5") {
    val docs = Seq((7L, "plain words only")).toDF("doc_id", "text")
    val fp = TextOps.piiScrubOf(docs).head().getAs[String]("scrubbed_fp")
    val orig = Seq("plain words only").toDF("s")
      .select(md5(col("s").cast("binary"))).head().getString(0)
    assert(fp == orig)
  }

  test("stratifiedSample: majority downsampled below minority keep rate; deterministic") {
    val kept = TextOps.stratifiedSample(spark, sf)
    val keptRates = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val enRate = keptRates.getOrElse("en", 0L).toDouble / total("en")
    // md5 buckets: '40'/256 ≈ 25% for en, 'cd'/256 ≈ 80% for the rest
    assert(enRate > 0.05 && enRate < 0.50, s"en keep rate $enRate")
    val minorityLangs = total.keys.filter(_ != "en")
    val minRate = minorityLangs.map(l =>
      keptRates.getOrElse(l, 0L).toDouble).sum /
      minorityLangs.map(total(_).toDouble).sum
    assert(minRate > enRate, s"minority rate $minRate !> en rate $enRate")

    // pure function of doc_id: a second run returns the identical id set
    val ids1 = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = TextOps.stratifiedSample(spark, sf)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("bpePairs: adjacent-pair counts with deterministic tie-break") {
    val docs = Seq((1L, "abab ab x"), (2L, "ba")).toDF("doc_id", "text")
    // words >=2 chars: abab -> ab,ba,ab ; ab -> ab ; ba -> ba
    val r = TextOps.bpePairsOf(docs, 10).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("ab", 3L), ("ba", 2L)))
  }

  test("bpePairs: top-k cut is stable under count ties (pair asc)") {
    val docs = Seq((1L, "xy yz zx")).toDF("doc_id", "text")
    val r = TextOps.bpePairsOf(docs, 2).collect().map(_.getString(0)).toSeq
    assert(r == Seq("xy", "yz"))
  }

  test("vocab: grouped ranking equals the naive global row_number; minCount filters") {
    import org.apache.spark.sql.expressions.Window
    // counts: apple=3 ant=3 bee=3 cat=2 dog=1 → minCount 2 drops dog;
    // ties on count 3 rank lexicographically (ant < apple < bee)
    val docs = Seq(
      (1L, "apple ant bee cat"), (2L, "apple ant bee cat"),
      (3L, "apple ant bee dog")).toDF("doc_id", "text")
    val got = TextOps.vocabOf(docs, minCount = 2)
      .collect().map(r => (r.getString(0), r.getAs[Long]("vocab_id"))).toMap
    assert(got == Map("ant" -> 1L, "apple" -> 2L, "bee" -> 3L, "cat" -> 4L))

    // corpus-level: identical to a single global window at this SF
    val corpus = graft.Tables.documents(spark, sf)
    val naive = corpus.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5)
      .withColumn("naive_id", row_number().over(
        Window.orderBy(col("n").desc, col("term"))))
      .select(col("term"), col("naive_id"))
    val out = TextOps.vocab(spark, sf)
    val joined = out.join(naive, "term").cache()
    assert(joined.count() == out.count() && out.count() > 0)
    assert(joined.filter(col("vocab_id") =!= col("naive_id")).count() == 0)
  }

  test("curate: each gate fires with first-failing precedence; survivors get splits") {
    val d = java.nio.file.Files.createTempDirectory("graft-curate").toString
    val good = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (1L, good),                                  // keeps
      (2L, good.toUpperCase),                      // duplicate of 1 (normalized)
      (3L, "4512 9983 1177 5550 8822 3311 99 12"), // policy: digit ratio
      (4L, "the a an of to in is it for and the a an of to in is it"), // quality: all stopwords
      (5L, good + " uniform")                      // keeps
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.curate(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reason"),
          r.getAs[String]("split"))).toMap
    assert(out(1L)._1 && out(1L)._2 == null && out(1L)._3 != null)
    assert(out(2L) == (false, "duplicate", null))
    assert(out(3L) == (false, "policy", null))
    assert(out(4L) == (false, "quality", null))
    assert(out(5L)._1 && Set("train", "val", "test").contains(out(5L)._3))
  }

  test("curateNearDup: near-dup copy dropped with reason neardup; best-quality copy survives; counts conserved") {
    val d = java.nio.file.Files.createTempDirectory("graft-curate-nd").toString
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      (1L, base),                // near-dup loser: fewer tokens → lower quality
      (2L, base + " uniform victor"), // near-dup winner (more non-stopword tokens)
      (3L, base.toUpperCase),    // exact duplicate of 1 (normalized fp) — exact gate wins precedence
      (4L, "zulu yankee xray whiskey victor unicorn tangerine sombrero " +
        "quince plum orange nectarine mango lemon kiwi jackfruit " +
        "grape fig elderberry date cherry banana apple")  // unrelated: keeps
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.curateNearDup(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reason"))).toMap
    assert(out(2L) == (true, null), "best-quality near-dup copy must survive")
    assert(out(1L) == (false, "neardup"), "lower-quality near-dup copy must drop as neardup")
    assert(out(3L) == (false, "duplicate"), "exact gate takes precedence over neardup")
    assert(out(4L)._1, "unrelated doc must keep")
    // gate counts conserve: every doc gets exactly one verdict
    assert(out.size == 4 && out.values.count(_._1) == 2)
  }

  test("curateIncremental: batch gated against the store with curate's verdict schema; store grows across cycles") {
    val goodA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val goodB = "apple banana cherry date elderberry fig grape honeydew iceberg " +
      "jackfruit kiwi lemon mango nectarine orange papaya quince raspberry strawberry tomato"
    val freshC = "zinc yttrium xenon tungsten titanium sodium silver radium potassium " +
      "platinum osmium nickel mercury lithium iron iodine helium gold copper cobalt"
    val freshD = "violet indigo maroon crimson scarlet amber teal turquoise lavender " +
      "magenta cyan olive beige coral salmon ivory ebony slate pewter bronze"
    val store = java.nio.file.Files.createTempDirectory("graft-curstore").toString
    TextOps.writeCurateStore(Seq((1L, goodA), (2L, goodB)).toDF("doc_id", "text"), store)
    val batch1 = Seq(
      (10L, goodA.toUpperCase),            // exact dup of EXISTING (normalized fp)
      (11L, freshC),                       // keeps
      (12L, freshC),                       // batch-internal exact dup of 11
      (13L, goodB + " uniform victor"),    // near-dup of EXISTING → corpus copy wins
      (14L, freshD),                       // batch-internal near-dup loser (lower quality)
      (15L, freshD + " whiskey xylophone"), // its higher-quality winner
      (16L, "111222333444555666777888 999000 111 222") // digit junk → policy
    ).toDF("doc_id", "text")
    val out1 = TextOps.curateIncremental(batch1, store).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reason"),
          r.getAs[String]("split"))).toMap
    assert(out1.size == 7, "one verdict per batch doc")
    assert(out1(10L)._2 == "duplicate", "dup-of-existing must drop as duplicate")
    assert(out1(11L) == (true, null, out1(11L)._3) && out1(11L)._3 != null, "fresh doc keeps with a split")
    assert(out1(12L)._2 == "duplicate", "batch-internal dup must drop")
    assert(out1(13L)._2 == "neardup", "near-dup of existing must lose to the corpus copy")
    assert(out1(14L)._2 == "neardup", "batch-internal near-dup loser must drop")
    assert(out1(15L)._1 && out1(15L)._3 != null, "best-quality batch copy survives")
    assert(out1(16L)._2 == "policy")
    // cycle 2: the store saw batch 1, so a near-copy of 11's text now loses
    // to it; a re-submitted doc id is a retry and emits no verdict
    val out2 = TextOps.curateIncremental(
      Seq((20L, freshC + " argon neon"), (11L, freshC)).toDF("doc_id", "text"), store)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason")).toMap
    assert(out2.size == 1, s"retried doc 11 must be skipped: $out2")
    assert(out2(20L) == "neardup", s"near-copy of a cycle-1 doc must drop: $out2")
  }

  test("curateIncremental crash-retry: near-dup gate survives a crash between the signature append and the digest marker") {
    val goodA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val freshD = "violet indigo maroon crimson scarlet amber teal turquoise lavender " +
      "magenta cyan olive beige coral salmon ivory ebony slate pewter bronze"
    val store = java.nio.file.Files.createTempDirectory("graft-curcrash").toString
    TextOps.writeCurateStore(Seq((1L, goodA)).toDF("doc_id", "text"), store)
    val batch = Seq(
      (10L, goodA + " uniform victor"),      // near-dup of EXISTING doc 1
      (11L, freshD),                         // batch-internal near-dup loser
      (12L, freshD + " whiskey xylophone"),  // its higher-quality winner
      (13L, "granite basalt marble quartz slate limestone sandstone shale " +
        "obsidian pumice gypsum flint chalk gneiss schist dolomite feldspar mica talc jade")
    ).toDF("doc_id", "text")
    // simulate the crashed first attempt: signatures + bands appended, but
    // the run died BEFORE the fps.parquet admission marker landed
    graft.operators.Dedup.ingestSignatures(batch, store)
    val sigRows = spark.read.parquet(s"$store/sigs.parquet")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(sigRows == 0, "crashed append must not duplicate signature rows")
    // the RETRY must still see every near-dup — this is exactly the path
    // where in-flight ingest pairs come back empty
    val out = TextOps.curateIncremental(batch, store).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reason"))).toMap
    assert(out.size == 4, "retry re-admits the whole batch (no fps marker landed)")
    assert(out(10L)._2 == "neardup", s"external near-dup must still drop on retry: $out")
    assert(out(11L)._2 == "neardup", s"batch-internal near-dup loser must still drop on retry: $out")
    assert(out(12L)._1, s"batch-internal winner must keep: $out")
    assert(out(13L)._1, s"unrelated doc must keep: $out")
    // the retry's own ingest is a no-op: still no duplicated signature rows
    val sigRows2 = spark.read.parquet(s"$store/sigs.parquet")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(sigRows2 == 0, "retry ingest must be idempotent on the signature store")
  }

  test("pack: token conservation, full interior sequences, boundary docs split") {
    val seqLen = 512L
    val out = TextOps.pack(spark, sf, seqLen = seqLen).collect()
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    // conservation: every token lands in exactly one span
    assert(out.map(_.getAs[Long]("n_tokens")).sum == docs.values.sum)
    val perDoc = out.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(perDoc == docs, "per-doc span tokens must equal the doc's token count")
    // every sequence except the last is exactly full
    val perSeq = out.groupBy(_.getAs[Long]("seq_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (s, n) =>
      if (s != lastSeq) assert(n == seqLen, s"sequence $s holds $n tokens, not $seqLen")
      else assert(n <= seqLen)
    }
    // offsets: chunks within a sequence tile it without gaps or overlaps
    out.groupBy(_.getAs[Long]("seq_id")).foreach { case (_, rows) =>
      val spans = rows.map(r => (r.getAs[Long]("seq_offset"), r.getAs[Long]("n_tokens")))
        .sortBy(_._1)
      spans.foldLeft(0L) { case (pos, (off, n)) =>
        assert(off == pos, s"gap/overlap at offset $off, expected $pos"); off + n
      }
    }
    // boundary docs exist at this corpus size and split across sequences
    assert(out.groupBy(_.getAs[Long]("doc_id")).exists(_._2.length > 1),
      "expected at least one straddling doc")
  }

  test("packIncremental: append-only growth equals re-packing the whole corpus; retries skipped") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val store = java.nio.file.Files.createTempDirectory("graft-pack-sf").toString
    TextOps.writePackStore(docs.filter(col("doc_id") < 300), store)
    val batch = docs.filter(col("doc_id") >= 300)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_offset"), r.getAs[Long]("n_tokens"))).toSet
    val incr = key(TextOps.packIncremental(batch, store).collect())
    // bit-identical to the full run restricted to batch docs — the batch's
    // first tokens must continue the store's trailing partial sequence
    val full = key(TextOps.pack(spark, sf).collect())
    assert(incr == full.filter(_._1 >= 300L),
      s"only-incr=${incr -- full} only-full=${full.filter(_._1 >= 300L) -- incr}")
    // the store now holds exactly the full manifest
    assert(key(spark.read.parquet(s"$store/manifest.parquet").collect()) == full)
    // re-submitting the same batch is a no-op: no spans, store unchanged
    assert(TextOps.packIncremental(batch, store).count() == 0L)
    assert(key(spark.read.parquet(s"$store/manifest.parquet").collect()) == full)
    // the packing params persist with the store (its identity, like the LSH
    // signature store) — an ingest can only ever use the writer's values
    val p = spark.read.parquet(s"$store/params.parquet").head()
    assert(p.getAs[Long]("seq_len") == 512L && p.getAs[Long]("bucket_size") == 64L)
  }

  test("mixture: uniform target hits exact per-source copy counts, deterministically") {
    // source a: 10 docs x 10 tokens = 100; source b: 30 docs x 10 = 300.
    // total 400, uniform target 200 each -> weight_a = 2.0 (everyone 2
    // copies, 0 extra), weight_b = 2/3 (base 0, exactly round(2/3*30)=20
    // docs get the single copy)
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = ((0L until 10L).map(i => ("a", i, ten)) ++
      (100L until 130L).map(i => ("b", i, ten))).toDF("source", "doc_id", "text")
    val out = TextOps.mixtureOf(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_copies")))
    assert(out.length == 40, "one row per doc")
    val a = out.filter(_._1 == "a")
    assert(a.forall(_._3 == 2L), s"integer weight 2.0 -> every source-a doc twice: ${a.toSeq}")
    val b = out.filter(_._1 == "b")
    assert(b.count(_._3 == 1L) == 20 && b.count(_._3 == 0L) == 10,
      s"frac 2/3 of 30 docs -> exactly 20 singles: ${b.toSeq}")
    // both sources land exactly on the 200-token target
    assert(a.map(_._3).sum * 10 == 200 && b.map(_._3).sum * 10 == 200)
    // pure function of the corpus: re-run bit-equal
    assert(TextOps.mixtureOf(docs).collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2))).toSet == out.toSet)
  }

  test("mixture with explicit shares: targets honored; unlisted sources drop") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // a: 100 tokens, b: 300, c: 100 -> total 500
    val docs = ((0L until 10L).map(i => ("a", i, ten)) ++
      (100L until 130L).map(i => ("b", i, ten)) ++
      (200L until 210L).map(i => ("c", i, ten))).toDF("source", "doc_id", "text")
    val out = TextOps.mixtureOf(docs, Map("a" -> 0.8, "b" -> 0.2)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_copies")))
    // a: w = 500*0.8/100 = 4.0 -> every doc 4 copies
    assert(out.filter(_._1 == "a").forall(_._2 == 4L))
    // b: w = 500*0.2/300 = 1/3 -> exactly round(10) = 10 docs get 1 copy
    assert(out.filter(_._1 == "b").count(_._2 == 1L) == 10 &&
      out.filter(_._1 == "b").count(_._2 == 0L) == 20)
    // c unlisted -> share 0, all copies 0
    assert(out.filter(_._1 == "c").forall(_._2 == 0L))
  }

  test("chunk: overlapping windows cover every token, tail clamps, text slices exact") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "solo"),                                   // 1 token
      (3L, null.asInstanceOf[String])                 // excluded
    ).toDF("doc_id", "text")
    val out = TextOps.chunkOf(docs, chunkSize = 4, stride = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("chunk_text")))
    // doc 1: starts 0,2,4,6,8 -> 5 chunks; doc 2: 1 chunk; doc 3: none
    assert(out.count(_._1 == 1L) == 5 && out.count(_._1 == 2L) == 1 &&
      !out.exists(_._1 == 3L))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._3, c._4)).toSeq ==
      Seq((0L, 4L), (2L, 4L), (4L, 4L), (6L, 4L), (8L, 2L)))
    assert(d1.head._5 == "t1 t2 t3 t4" && d1(1)._5 == "t3 t4 t5 t6" &&
      d1.last._5 == "t9 t10", "slice contents must match the declared windows")
    // every token appears in ceil(chunkSize/stride)-ish windows; in
    // particular the union of [tok_start, tok_start+n_tokens) covers 0..9
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 10L).toSet)
    assert(out.find(_._1 == 2L).get._5 == "solo")
  }

  test("epoch: equals packing the manually repeated corpus; reps match the mixture plan") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = ((0L until 10L).map(i => ("a", i, ten)) ++
      (100L until 130L).map(i => ("b", i, ten))).toDF("source", "doc_id", "text")
    val copies = TextOps.mixtureOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    val k = copies.values.max + 1
    val out = TextOps.epochOf(docs, seqLen = 16L, bucketSize = 4L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"), r.getAs[Long]("n_tokens")))
    // reps per doc = the mixture plan (docs with 0 copies absent entirely)
    val repsPerDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    copies.foreach { case (id, n) =>
      assert(repsPerDoc.getOrElse(id, Set.empty) == (1L to n).toSet,
        s"doc $id: reps ${repsPerDoc.get(id)} != 1..$n")
    }
    // the composition is literally pack() of the repeated corpus under
    // pk = doc_id*k + rep-1
    val repeatedRows = copies.toSeq.flatMap { case (id, n) =>
      (1L to n).map(rep => (id * k + rep - 1, ten))
    }
    val expected = TextOps.packOf(repeatedRows.toDF("doc_id", "text"),
        seqLen = 16L, bucketSize = 4L * k).collect()
      .map(r => (r.getLong(0) / k, r.getLong(0) % k + 1,
        r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out.toSet == expected,
      s"only-epoch=${out.toSet -- expected} only-expected=${expected -- out.toSet}")
  }

  test("epochBudget: the full epoch cut to the leading whole instances that fit; spans bit-identical") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = ((0L until 10L).map(i => ("a", i, ten)) ++
      (100L until 130L).map(i => ("b", i, ten))).toDF("source", "doc_id", "text")
    val budget = 123L // deliberately not a multiple of any doc/seq length
    def key(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"), r.getAs[Long]("n_tokens")))
    val full = key(TextOps.epochOf(docs, seqLen = 16L, bucketSize = 4L).collect())
    val got = key(TextOps.epochOf(docs, seqLen = 16L, bucketSize = 4L,
      budget = Some(budget)).collect())
    // manual chain: each instance's stream END is the max span end across
    // its spans; the budget keeps exactly the instances ending <= budget
    val endOf = full.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(r => r._3 * 16L + r._4 + r._5).max).toMap
    val expected = full.filter(r => endOf((r._1, r._2)) <= budget).toSet
    assert(got.toSet == expected,
      s"only-got=${got.toSet -- expected} only-expected=${expected -- got.toSet}")
    // whole-instance semantics: total kept tokens <= budget, and adding the
    // FIRST dropped instance would overflow it
    val kept = got.map(_._5).sum
    assert(kept <= budget, s"kept $kept tokens > budget $budget")
    val dropped = endOf.filter(_._2 > budget)
    if (dropped.nonEmpty) {
      val firstDropped = dropped.keys.minBy(i => endOf(i))
      val instTokens = full.filter(r => (r._1, r._2) == firstDropped).map(_._5).sum
      assert(kept + instTokens > budget,
        s"budget cut dropped an instance ($firstDropped, $instTokens tokens) that still fits")
    }
    // spans of kept instances are bit-identical to the uncut epoch's
    assert(got.toSet.subsetOf(full.toSet))
  }

  test("epochShuffled: same units and spans budget as epoch, genuinely de-ordered, deterministic") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = ((0L until 10L).map(i => ("a", i, ten)) ++
      (100L until 130L).map(i => ("b", i, ten))).toDF("source", "doc_id", "text")
    val shuf = TextOps.epochShuffledOf(docs, seqLen = 16L, prefixLen = 1).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"), r.getAs[Long]("n_tokens")))
    val plain = TextOps.epochOf(docs, seqLen = 16L, bucketSize = 4L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"), r.getAs[Long]("n_tokens")))
    // identical (doc, rep) units with identical per-unit token budgets
    def units(rows: Array[(Long, Long, Long, Long, Long)]) =
      rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._5).sum).toMap
    assert(units(shuf) == units(plain), "shuffling must not change what gets packed")
    // interior sequences still exactly full
    val perSeq = shuf.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (s, n) =>
      if (s != lastSeq) assert(n == 16L, s"sequence $s holds $n tokens") else assert(n <= 16L)
    }
    // genuinely de-ordered: unit stream positions are not monotone in
    // (doc_id, rep) — doc-id order would keep source a entirely first
    val posOf = shuf.groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(r => r._3 * 16L + r._4).min).toMap
    val byPos = posOf.toSeq.sortBy(_._2).map(_._1)
    assert(byPos != byPos.sorted, "hash order must not degenerate to id order")
    // deterministic: re-run bit-equal
    assert(TextOps.epochShuffledOf(docs, 16L, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet == shuf.toSet)
  }

  test("curateIncremental on the sf corpus: one verdict per admitted batch doc; survivors split-labeled") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val store = java.nio.file.Files.createTempDirectory("graft-ci-sf").toString
    TextOps.writeCurateStore(docs.filter(col("doc_id") < 400), store)
    val batch = docs.filter(col("doc_id") >= 400 && col("text").isNotNull)
    val out = TextOps.curateIncremental(batch, store).collect()
    assert(out.length == batch.dropDuplicates("doc_id").count(),
      "conservation: exactly one verdict per admitted batch doc")
    out.foreach { r =>
      val kept = r.getAs[Boolean]("keep")
      assert(kept == (r.getAs[String]("drop_reason") == null))
      assert(kept == (r.getAs[String]("split") != null), "split iff kept")
    }
  }

  test("curateObserved: gate counters from the single pass equal a direct aggregation") {
    val (out, obs) = TextOps.curateObserved(spark, sf)
    val rows = out.collect()
    val m = obs.get
    assert(m("n_docs") == rows.length.toLong)
    assert(m("n_kept") == rows.count(_.getAs[Boolean]("keep")).toLong)
    def reasons(r: String) = rows.count(_.getAs[String]("drop_reason") == r).toLong
    assert(m("n_duplicate") == reasons("duplicate"))
    assert(m("n_policy") == reasons("policy"))
    assert(m("n_quality") == reasons("quality"))
    assert(m("n_kept").asInstanceOf[Long] + m("n_duplicate").asInstanceOf[Long] +
      m("n_policy").asInstanceOf[Long] + m("n_quality").asInstanceOf[Long] ==
      m("n_docs").asInstanceOf[Long])
  }

  test("lenDeciles: grouped ranking equals the naive global row_number; deciles balanced") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sf)
    val naive = docs
      .withColumn("naive_rank", row_number().over(
        Window.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("naive_rank"))
    val out = TextOps.lenDeciles(spark, sf)
    val joined = out.join(naive, "doc_id").cache()
    assert(joined.count() == docs.count())
    assert(joined.filter(col("rank") =!= col("naive_rank")).count() == 0)
    // deciles partition the corpus into near-equal tenths
    val sizes = out.groupBy("decile").count().collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == (0L to 9L).toSet)
    val n = docs.count()
    sizes.values.foreach(c => assert(math.abs(c - n / 10) <= 1, s"sizes $sizes"))
  }

  test("shardAssign: two-level prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, sf)
    val out = TextOps.shardAssignOf(docs, budget = 500, bucketSize = 8)
    val naive = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), expr("(cum - n_tokens) div 500").as("naive_shard"))
    val joined = out.join(naive, "doc_id").cache()
    assert(joined.count() == docs.count())
    assert(joined.filter(col("shard") =!= col("naive_shard")).count() == 0)
    // packing is non-trivial: more than one shard, shards are contiguous
    val shards = out.select("shard").distinct().as[Long].collect().sorted
    assert(shards.length > 1)
    assert(shards.toSeq == (shards.min to shards.max).toSeq)
  }

  test("shardAssign: every full shard lands within one max-doc of the budget") {
    val budget = 500L
    val out = TextOps.shardAssignOf(graft.Tables.documents(spark, sf), budget, 8)
      .groupBy("shard").agg(sum(col("n_tokens")).as("shard_tokens"))
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("shard_tokens")).toMap
    val maxDoc = TextOps.shardAssignOf(graft.Tables.documents(spark, sf), budget, 8)
      .agg(max(col("n_tokens"))).head().getLong(0)
    val lastShard = out.keys.max
    out.foreach { case (s, tokens) =>
      if (s != lastShard) {
        // shard boundaries are offsets in [s·b, s·b + maxDoc), so a closed
        // shard's width is within one max-document of the budget either way
        assert(tokens > budget - maxDoc && tokens < budget + maxDoc,
          s"shard $s has $tokens tokens (budget $budget, maxDoc $maxDoc)")
      }
    }
  }

  test("tokenBudget two-level cumsum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.{qualityScore, wsTokens}
    val docs = graft.Tables.documents(spark, sf)
    val budget = 20000L
    val naive = docs.select(col("doc_id"),
        wsTokens(col("text")).cast("long").as("n_tokens"),
        qualityScore(col("text")).as("quality"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.orderBy(col("quality").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("kept"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum_tokens"), r.getAs[Boolean]("kept")))).toMap
    val fast = TextOps.tokenBudgetOf(docs, budget, idBucket = 16)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cum_tokens"), r.getAs[Boolean]("kept")))).toMap
    assert(fast == naive)
    // budget actually bites: something kept, something cut
    assert(fast.values.exists(_._2) && fast.values.exists(!_._2))
  }

  test("pplBuckets: closed-form bucket equals a plain ntile window exactly") {
    // the scalable two-level rank + closed-form ntile must reproduce
    // Spark's own ntile() on the real sf corpus, doc for doc
    val docs = Tables.documents(spark, sf)
    val got = TextOps.pplBucketsOf(docs, nBuckets = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("tier"), r.getAs[Long]("bucket")))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("nll", "doc_id")
    val naive = graft.operators.TextOps.unigramLlOf(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bucket")).toMap
    assert(got.size == naive.size && got.nonEmpty)
    naive.foreach { case (id, b) => assert(got(id)._2 == b, s"doc $id") }
    // tier naming is positional
    got.values.foreach { case (tier, b) =>
      assert(if (b == 1L) tier == "head"
             else if (b == 3L) tier == "tail" else tier == "middle")
    }
  }

  test("pplBuckets: uneven and sub-k language sizes follow SQL ntile sizing") {
    // 7 docs in one lang -> buckets of 3,2,2; 2 docs in another -> 1,1 (no
    // third bucket); distinct word-multisets give strict nll ordering by
    // doc_id construction
    val docs = (1L to 7L).map(i =>
      (i, ("rare" + i + " ") * i.toInt + "common", "en", "s"))
      .++(Seq((8L, "uno", "es", "s"), (9L, "uno dos", "es", "s")))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextOps.pplBucketsOf(docs, nBuckets = 3).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    val enSizes = byLang("en").groupBy(_.getAs[Long]("bucket"))
      .view.mapValues(_.length).toMap
    assert(enSizes == Map(1L -> 3, 2L -> 2, 3L -> 2))
    val esBuckets = byLang("es").map(_.getAs[Long]("bucket")).toSet
    assert(esBuckets == Set(1L, 2L))
  }

  test("mixtureTemp: alpha=0.5 shares follow sqrt(src_tokens) weighting") {
    // src A: 4 docs x 25 tokens = 100; src B: 4 docs x 100 tokens = 400.
    // sqrt weights 10 vs 20 -> shares 1/3, 2/3 of the 500-token total.
    // weight_A = 500*(1/3)/100 = 5/3 -> base 1, extras round(2/3*4) = 3
    // weight_B = 500*(2/3)/400 = 5/6 -> base 0, extras round(5/6*4) = 3
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = (1L to 4L).map(i => (i, words(25, s"a${i}_"), "en", "A"))
      .++((5L to 8L).map(i => (i, words(100, s"b${i}_"), "en", "B")))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextOps.mixtureTempOf(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_copies")))
    val aCopies = out.filter(_._1 == "A").map(_._2).sorted.toSeq
    val bCopies = out.filter(_._1 == "B").map(_._2).sorted.toSeq
    assert(aCopies == Seq(1L, 2L, 2L, 2L), s"A got $aCopies")
    assert(bCopies == Seq(0L, 1L, 1L, 1L), s"B got $bCopies")
  }

  test("bm25: length normalization, idf discount, tie-break, exact cell") {
    // avgdl = (2 + 8 + 2 + 2) / 4 = 3.5
    val docs = Seq(
      1L -> "apple banana",
      2L -> "apple apple filler filler filler filler filler filler",
      3L -> "banana filler",
      4L -> "filler filler").toDF("doc_id", "text")
    val queries = Seq(
      ("qa", "apple"), ("qb", "banana"), ("qf", "filler")).toDF("query_id", "term")
    val out = TextOps.bm25Of(docs, queries).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Double]("score"), r.getAs[Long]("rank"))).toMap
    // length normalization: d1 (tf=1, dl=2) outranks d2 (tf=2, dl=8)
    assert(out(("qa", 1L))._2 == 1L && out(("qa", 2L))._2 == 2L)
    assert(!out.contains(("qa", 3L)) && !out.contains(("qa", 4L)))
    // idf: same (tf, dl) cell scores higher for the rarer term
    // (banana df=2 vs filler df=3 on doc 3)
    assert(out(("qb", 3L))._1 > out(("qf", 3L))._1)
    // exact cell: score(qa, d1) = quantize9(idf * 2.2/(1 + 1.2*(0.25+0.75*2/3.5)))
    val idf = math.log(1.0 + (4L - 2L + 0.5) / (2L + 0.5))
    val raw = idf * (1L * 2.2) / (1L + 1.2 * (0.25 + 0.75 * 2L / 3.5))
    val expect = BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(("qa", 1L))._1 - expect) < 1e-9,
      s"got ${out(("qa", 1L))._1}, expected $expect")
  }

  test("bm25: identical docs tie on exact decimal score, rank by doc_id") {
    val docs = Seq(7L -> "apple pie", 3L -> "apple pie", 9L -> "other words")
      .toDF("doc_id", "text")
    val q = Seq(("q", "apple")).toDF("query_id", "term")
    val out = TextOps.bm25Of(docs, q).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((1L, 3L), (2L, 7L)))
    assert(out(0)._3 == out(1)._3)
  }

  test("bm25 store: split ingest equals direct; forget nets out; compact re-admits") {
    import org.apache.spark.sql.functions.col
    def collectEq(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Double]("score"),
        r.getAs[Long]("rank"))).sorted.toSeq
    val docs = Tables.documents(spark, sf)
    val direct = collectEq(TextOps.bm25Search(spark, sf))
    val store = java.nio.file.Files.createTempDirectory("graft-bm25store").toString
    val cut = 400L
    TextOps.writeBm25Store(docs.filter(col("doc_id") < cut), store)
    assert(TextOps.bm25Ingest(docs.filter(col("doc_id") >= cut), store, batchId = 1L)
      .count() > 0)
    // split build+ingest serves bit-equal to the direct single-pass path
    assert(collectEq(TextOps.bm25FromStore(spark, store)) == direct)
    // a same-batchId retry re-lands its identical partition (state net-once)…
    assert(TextOps.bm25Ingest(docs.filter(col("doc_id") >= cut), store, 1L)
      .count() > 0)
    assert(collectEq(TextOps.bm25FromStore(spark, store)) == direct)
    // …while a re-submission under a NEW batch id is skipped entirely
    assert(TextOps.bm25Ingest(docs.filter(col("doc_id") >= cut), store, 2L)
      .collect().isEmpty)
    // forget the top common-query doc: store must now serve exactly like a
    // corpus that never contained it
    val victim = direct.filter(t => t._1 == "common" && t._5 == 1L).head._2
    val d2 = java.nio.file.Files.createTempDirectory("graft-bm25minus").toString
    docs.filter(col("doc_id") =!= victim)
      .write.parquet(s"$d2/documents.parquet")
    import SparkSuite.spark.implicits._
    assert(TextOps.bm25StoreForget(Seq(victim).toDF("doc_id"), store, forgetId = 1L)
      .collect().map(_.getLong(0)).toSeq == Seq(victim))
    val served = collectEq(TextOps.bm25FromStore(spark, store))
    assert(served == collectEq(TextOps.bm25Search(spark, d2)))
    assert(!served.exists(_._2 == victim))
    // re-forget under a new id nets nothing; pre-compact re-ingest blocked
    assert(TextOps.bm25StoreForget(Seq(victim).toDF("doc_id"), store, 2L)
      .collect().isEmpty)
    assert(TextOps.bm25Ingest(docs.filter(col("doc_id") === victim), store, 3L)
      .collect().isEmpty)
    // compact folds the negation away and the doc may return
    assert(TextOps.bm25Compact(spark, store) > 0)
    assert(TextOps.bm25Ingest(docs.filter(col("doc_id") === victim), store, 4L)
      .collect().map(_.getLong(0)).toSeq == Seq(victim))
    assert(collectEq(TextOps.bm25FromStore(spark, store)) == direct)
  }

  test("bm25Search: derived queries rank the sf corpus deterministically") {
    val a = TextOps.bm25Search(spark, sf).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    val b = TextOps.bm25Search(spark, sf).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(a.sorted.toSeq == b.sorted.toSeq)
    val byQ = a.groupBy(_._1)
    assert(byQ.keySet == Set("common", "rare"))
    for ((_, rows) <- byQ) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.length).toSeq)
      // scores non-increasing down the ranking
      assert(sorted.sliding(2).forall(p =>
        p.length < 2 || p(0)._4 >= p(1)._4))
    }
  }

  test("docDrift: per-source base/new means; tail-less sources drop; null text excluded") {
    import SparkSuite.spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // max id 4 -> cut 3: base = 0..3, new = 4; no stopwords => q = toks/100
    val docs = Seq(
      (0L, words(10), "en", "a", 1L), (1L, words(10), "en", "a", 1L),
      (2L, words(5), "en", "b", 1L), (3L, words(5), "en", "b", 1L),
      (4L, words(30), "en", "a", 1L))
    val d = java.nio.file.Files.createTempDirectory("graft-ddrift").toString
    (docs :+ ((5L, null.asInstanceOf[String], "en", "a", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.docDrift(spark, d).collect()
    assert(got.length == 1) // source b has no tail rows -> dropped
    val r = got.head
    // null-text id 5 excluded everywhere (cut stays 3, n_new stays 1)
    assert((r.getAs[String]("source"), r.getAs[Long]("n_base"),
      r.getAs[Long]("n_new")) == ("a", 2L, 1L))
    assert(r.getAs[Double]("mean_toks_base") == 10.0)
    assert(r.getAs[Double]("mean_toks_new") == 30.0)
    assert(r.getAs[Double]("toks_delta") == 20.0)
    assert(r.getAs[Double]("mean_q_base") == 0.1)   // 10 tokens, 0 stopwords
    assert(r.getAs[Double]("mean_q_new") == 0.3)
    assert(r.getAs[Double]("q_delta") == 0.3 - 0.1)
  }

  test("dupRate: corpus-wide fingerprint census, cross-source copies count both sides") {
    import SparkSuite.spark.implicits._
    val docs = Seq(
      (0L, "hello world", "en", "a", 1L),
      (1L, "Hello   world ", "en", "a", 1L),   // normalizes to the same fp
      (2L, "unique a", "en", "a", 1L),
      (3L, "hello world", "en", "b", 1L),      // cross-source copy
      (4L, "unique b", "en", "b", 1L),
      (5L, null.asInstanceOf[String], "en", "b", 1L)) // excluded
    val d = java.nio.file.Files.createTempDirectory("graft-dupr").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.dupRate(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_docs"),
          r.getAs[Double]("dup_rate"))).toMap
    assert(got == Map("a" -> (3L, 2L, 2.0 / 3.0), "b" -> (2L, 1L, 0.5)))
  }

  test("compressRatio: repetition compresses below prose below noise; deterministic re-run") {
    import SparkSuite.spark.implicits._
    val rng = new scala.util.Random(7)
    val docs = Seq(
      (0L, "spam " * 400, "en", "a", 1L),                      // pure repetition
      (1L, (1 to 300).map(i => s"w${i * 7919 % 1000}x$i").mkString(" "),
        "en", "a", 1L), // varied tokens: compresses, but nowhere near rep
      (2L, Array.fill(2000)(rng.nextPrintableChar()).mkString, "en", "a", 1L),
      (3L, "", "en", "a", 1L))                                 // empty excluded
    val d = java.nio.file.Files.createTempDirectory("graft-cmp").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.compressRatio(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("n_deflate"),
          r.getAs[Double]("ratio"), r.getAs[Boolean]("keep"))).toMap
    assert(got.keySet == Set(0L, 1L, 2L)) // empty doc excluded
    val (rep, prose, noise) = (got(0L)._3, got(1L)._3, got(2L)._3)
    assert(rep < prose && prose < noise, s"$rep $prose $noise")
    assert(rep < 0.1 && !got(0L)._4)      // repetition fails the lo cut
    assert(got(1L)._4)                    // prose keeps
    assert(got(2L)._3 > 0.5)              // noise barely compresses
    // deterministic re-run: identical lengths
    val again = TextOps.compressRatio(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_deflate")).toMap
    assert(again == got.map { case (k, v) => k -> v._2 })
  }

  test("langConfusion: off-diagonal cells and label shares from the C10 predictor") {
    import SparkSuite.spark.implicits._
    val docs = Seq(
      (0L, "the cat and the dog", "en", "a", 1L),   // en predicted en
      (1L, "el perro y la casa", "en", "a", 1L),    // mislabeled: predicts es
      (2L, "der hund ist ein tier", "de", "a", 1L), // de predicted de
      (3L, "zzz qqq", "de", "a", 1L))               // no hits -> unknown
    val d = java.nio.file.Files.createTempDirectory("graft-lconf").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = TextOps.langConfusion(spark, d).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("label_share"))).toMap
    assert(got == Map(
      ("en", "en") -> (1L, 0.5), ("en", "es") -> (1L, 0.5),
      ("de", "de") -> (1L, 0.5), ("de", "unknown") -> (1L, 0.5)))
  }

  test("aucOf: exact Mann-Whitney AUC with ties, brute-force pair reference, degenerate NULL") {
    // hand fixture with a tie ON a positive/negative pair and a tied
    // negative pair: brute-force over all pos x neg pairs is the ground
    // truth (win 1, tie 0.5)
    val rows = Seq(
      ("s", 0.9, true), ("s", 0.8, false), ("s", 0.8, true),
      ("s", 0.5, false), ("s", 0.5, false), ("s", 0.3, true))
      .toDF("source", "score", "keep")
    def brute(data: Seq[(Double, Boolean)]): Double = {
      val pos = data.filter(_._2).map(_._1)
      val neg = data.filterNot(_._2).map(_._1)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      wins / (pos.size * neg.size)
    }
    val want = brute(Seq((0.9, true), (0.8, false), (0.8, true),
      (0.5, false), (0.5, false), (0.3, true)))
    val got = TextOps.aucOf(rows, Seq("source"), "score", "keep").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_pos") == 3L && got.head.getAs[Long]("n_neg") == 3L)
    assert(got.head.getAs[Double]("auc") == want,
      s"got ${got.head.getAs[Double]("auc")}, brute $want")
    // perfectly separated = 1.0; reversed = 0.0; single-class = NULL —
    // three groups through one call (the per-group independence check)
    val multi = Seq(
      ("hi", 0.9, true), ("hi", 0.8, true), ("hi", 0.2, false),
      ("lo", 0.1, true), ("lo", 0.9, false),
      ("one", 0.5, true), ("one", 0.6, true))
      .toDF("source", "score", "keep")
    val m = TextOps.aucOf(multi, Seq("source"), "score", "keep").collect()
      .map(r => r.getAs[String]("source") ->
        Option(r.getAs[java.lang.Double]("auc"))).toMap
    assert(m("hi").contains(1.0))
    assert(m("lo").contains(0.0))
    assert(m("one").isEmpty, s"single-class AUC must be NULL: $m")
    // the gate composition is non-degenerate on the real corpus: every
    // source has both classes and the score carries real signal
    val real = TextOps.qualityAuc(spark, sf)
    val aucs = real.collect().flatMap(r => Option(r.getAs[java.lang.Double]("auc")))
    assert(aucs.nonEmpty && aucs.forall(a => a >= 0.0 && a <= 1.0))
  }

  test("vocabCoverage: hand-planted top-V, per-source OOV rates exact") {
    val d = java.nio.file.Files.createTempDirectory("graft-vcov").toString
    // global counts: "a" x5, "b" x3, "c" x2, "d" x1 -> top-2 = {a, b}
    Seq(
      (0L, "a a a b b", "en", "s1", 9L),
      (1L, "a a b c", "en", "s1", 7L),
      (2L, "c d", "en", "s2", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.vocabCoverage(spark, d, topV = 2).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_covered"),
          r.getAs[Long]("n_oov_terms"), r.getAs[Double]("coverage")))).toMap
    // s1: 9 tokens, covered a(5)+b(3)=8, oov terms {c}; s2: 2 tokens,
    // covered 0, oov terms {c, d}
    assert(out("s1") == ((9L, 8L, 1L, 8.0 / 9.0)), s"got $out")
    assert(out("s2") == ((2L, 0L, 2L, 0.0)), s"got $out")
    // V >= vocabulary size: full coverage everywhere
    val full = TextOps.vocabCoverage(spark, d, topV = 100).collect()
    assert(full.forall(_.getAs[Double]("coverage") == 1.0))
  }

  test("qualityCalibration: bins partition the corpus, means stay inside their bin, top bin owns 1.0") {
    val out = TextOps.qualityCalibration(spark, sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Double]("mean_score"),
        r.getAs[Double]("pos_rate")))
    assert(out.nonEmpty && out.forall(b => b._1 >= 0 && b._1 <= 9))
    // bins partition: doc and positive counts reconcile with the inputs
    val docs = graft.Tables.documents(spark, sf).count()
    assert(out.map(_._2).sum == docs)
    val keeps = TextOps.gopherRules(spark, sf)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(out.map(_._3).sum == keeps)
    // each bin's mean score lies inside the bin (top bin closed at 1.0)
    out.foreach { case (bin, _, _, m, p) =>
      val lo = bin / 10.0
      val hi = if (bin == 9) 1.0 + 1e-12 else (bin + 1) / 10.0
      assert(m >= lo - 1e-9 && m < hi, s"bin $bin mean $m outside [$lo, $hi)")
      assert(p >= 0.0 && p <= 1.0)
    }
    // a score of exactly 1.0 lands in bin 9, not a phantom bin 10
    val planted = Seq((0L, 1.0, true), (1L, 0.0, false)).toDF("doc_id", "quality", "keep")
    // reuse the operator's binning expression shape directly
    val bins = planted.withColumn("bin",
      org.apache.spark.sql.functions.least(
        org.apache.spark.sql.functions.floor(org.apache.spark.sql.functions.col("quality") * 10)
          .cast("long"), org.apache.spark.sql.functions.lit(9L)))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(bins(0L) == 9L && bins(1L) == 0L)
  }

  test("qualityQuantiles: two-level rank equals Spark's own per-source window quantile doc-for-doc") {
    import org.apache.spark.sql.expressions.Window
    // naive reference: plain window rank per source on the sf corpus
    val scored = TextOps.quality(spark, sf).select(col("doc_id"), col("quality"))
      .join(graft.Tables.documents(spark, sf).select(col("doc_id"), col("source")), "doc_id")
    val w = Window.partitionBy("source").orderBy(col("quality"), col("doc_id"))
    val naive = scored
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(max(when(col("rnk") === ceil(col("n") * 0.1), col("quality"))).as("p10"),
        max(when(col("rnk") === ceil(col("n") * 0.5), col("quality"))).as("p50"),
        max(when(col("rnk") === ceil(col("n") * 0.9), col("quality"))).as("p90"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("p10"), r.getAs[Double]("p50"), r.getAs[Double]("p90")))).toMap
    val got = TextOps.qualityQuantiles(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("p10"), r.getAs[Double]("p50"), r.getAs[Double]("p90")))).toMap
    assert(got == naive)
    // quantiles are ordered and non-vacuous
    got.values.foreach { case (a, b, c) => assert(a <= b && b <= c) }
    assert(got.values.exists { case (a, _, c) => a < c })
  }

  test("boilerTrim: flagged ends removed verbatim, all-chrome docs come back empty") {
    val hdr = "welcome to acme corp site"
    def pad(tag: String) = (0 until 6).map(j => s"u$tag$j").mkString(" ")
    val rows = Seq(
      (0L, s"$hdr ${pad("a")}"), (1L, s"$hdr ${pad("b")}"),
      (2L, s"$hdr ${pad("c")}"),
      // doc 3 is exactly the shared header twice: prefix AND suffix both
      // flag (each shared by doc 4's ends too) -> fully trimmed to empty
      (3L, s"$hdr $hdr"), (4L, s"$hdr $hdr")
    ).map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
    val d = java.nio.file.Files.createTempDirectory("graft-btrim").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.boilerTrim(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("trimmed_text"), r.getAs[Long]("n_words_removed")))).toMap
    assert(out(0L) == ((pad("a"), 5L)), s"got $out")
    assert(out(1L) == ((pad("b"), 5L)))
    // all-chrome doc: both ends flagged, 10 words, k=5 each -> empty
    assert(out(3L) == (("", 10L)) && out(4L) == (("", 10L)), s"got $out")
  }

  test("boilerplate: shared source headers/footers flagged, unique ends clean, short docs handled") {
    val hdr = "welcome to acme corp site"
    val ftr = "copyright acme all rights reserved"
    def pad(tag: String) = (0 until 6).map(j => s"u$tag$j").mkString(" ")
    val rows = Seq(
      // s1: 3/5 docs share the 5-word header (share 0.6 >= 0.2); docs 3+4
      // share the 5-word footer (share 0.4)
      (0L, s"$hdr ${pad("a")}"), (1L, s"$hdr ${pad("b")}"),
      (2L, s"$hdr ${pad("c")}"),
      (3L, s"${pad("d")} $ftr"), (4L, s"${pad("e")} $ftr"),
      // s2: all-unique docs -> nothing flagged, plus a SHORT doc pair whose
      // whole text is both prefix and suffix (min(k, words))
      (10L, pad("x")), (11L, pad("y")), (12L, "tiny doc"), (13L, "tiny doc")
    ).map { case (id, t) =>
      (id, t, "en", if (id < 10) "s1" else "s2", t.length.toLong) }
    val d = java.nio.file.Files.createTempDirectory("graft-boiler").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.boilerplate(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("boiler_prefix"), r.getAs[Boolean]("boiler_suffix")))).toMap
    assert(out(0L)._1 && out(1L)._1 && out(2L)._1, s"shared header not flagged: $out")
    assert(!out(0L)._2 && !out(1L)._2, "unique tails must stay clean")
    assert(out(3L)._2 && out(4L)._2, s"shared footer not flagged: $out")
    assert(!out(3L)._1 && !out(4L)._1)
    assert(!out(10L)._1 && !out(10L)._2 && !out(11L)._1)
    // identical short docs: whole-text prefix AND suffix both flagged
    assert(out(12L) == ((true, true)) && out(13L) == ((true, true)), s"$out")
  }

  test("novelty: unique docs at 1.0, exact copies at 0.0, partial sharing exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-novel").toString
    // doc 0 fully unique; docs 1+2 identical (every gram df>=2 -> 0.0);
    // doc 3 = 6 words, shares its LAST 3 words with doc 0's first 3
    val u = (0 until 6).map(i => s"a$i").mkString(" ")   // grams a0..a3 starts
    Seq(
      (0L, u, "en", "s", 10L),
      (1L, "b1 b2 b3 b4", "en", "s", 8L), (2L, "b1 b2 b3 b4", "en", "s", 8L),
      (3L, s"c1 c2 c3 a0 a1 a2", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.novelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    // doc 0: grams (a0 a1 a2)(a1 a2 a3)(a2 a3 a4)(a3 a4 a5); the first is
    // shared with doc 3 -> 3 of 4 novel
    assert(out(0L) == ((4L, 3L, 0.75)), s"got $out")
    assert(out(1L) == ((2L, 0L, 0.0)) && out(2L) == ((2L, 0L, 0.0)))
    // doc 3: 4 grams, only (a0 a1 a2) shared -> 3 of 4 novel
    assert(out(3L) == ((4L, 3L, 0.75)))
  }

  // ---- C97 query-likelihood retrieval ------------------------------------

  private def q9(v: Double): BigDecimal =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
  private def r6(v: BigDecimal): Double =
    v.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("qlm: exact Dirichlet cell, length prior, tf monotonicity") {
    // C = 16 tokens; occ(apple)=5, occ(banana)=2, occ(filler)=9
    val docs = Seq(
      1L -> "apple banana",
      2L -> "apple apple filler filler filler filler filler filler",
      3L -> "banana filler",
      4L -> "filler filler",
      5L -> "apple apple").toDF("doc_id", "text")
    val q = Seq(("qa", "apple")).toDF("query_id", "term")
    val out = TextOps.qlmOf(docs, q).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Long]("rank")))).toMap
    // only matching docs are candidates
    assert(out.keySet == Set(1L, 2L, 5L))
    // exact cell (d5): q9(ln(1 + 2*16/(300*5))) + q9(ln(300/(2+300)))
    val expect5 = r6(q9(math.log(1.0 + 2.0 * 16.0 / (300.0 * 5.0))) +
      q9(math.log(300.0 / 302.0)))
    assert(out(5L)._1 == expect5, s"got ${out(5L)._1}, expected $expect5")
    // length prior: same matched tf (=2), shorter doc wins (d5 dl=2, d2 dl=8)
    assert(out(5L)._1 > out(2L)._1 && out(5L)._2 < out(2L)._2)
    // tf monotonicity at equal dl: d5 (tf=2, dl=2) > d1 (tf=1, dl=2)
    assert(out(5L)._1 > out(1L)._1)
  }

  test("qlm: multi-term query — every query term's prior counts, n_q scales it") {
    val docs = Seq(
      1L -> "apple banana",
      2L -> "apple cherry cherry").toDF("doc_id", "text")
    val qm = Seq(("qm", "apple"), ("qm", "banana")).toDF("query_id", "term")
    val out = TextOps.qlmOf(docs, qm).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Double]("score")))).toMap
    // C = 5; occ: apple 2, banana 1, cherry 2
    // d1 matches both terms; d2 matches apple only but still pays BOTH
    // priors (|q| = 2) — the rank-equivalent decomposition's contract
    val e1 = r6(q9(math.log(1.0 + 1.0 * 5.0 / (300.0 * 2.0))) +
      q9(math.log(1.0 + 1.0 * 5.0 / (300.0 * 1.0))) +
      q9(math.log(300.0 / 302.0)) * 2)
    val e2 = r6(q9(math.log(1.0 + 1.0 * 5.0 / (300.0 * 2.0))) +
      q9(math.log(300.0 / 303.0)) * 2)
    assert(out(1L) == ((2L, e1)), s"got ${out(1L)}, expected (2, $e1)")
    assert(out(2L) == ((1L, e2)), s"got ${out(2L)}, expected (1, $e2)")
  }

  // ---- C98 reciprocal-rank fusion -----------------------------------------

  test("rrf: hand-computed fusion — both-systems doc wins, exact scores, doc_id ties") {
    val r1 = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq(("q", 2L, 1L), ("q", 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = TextOps.rrfOf(Seq(r1, r2)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_systems"), r.getAs[Double]("rrf_score"),
          r.getAs[Long]("rrf_rank")))).toMap
    val c = (r: Long) => q9(1.0 / (60.0 + r))
    // doc 2 in both systems: 1/61 + 1/62, quantized per term
    assert(out(2L) == ((2L, r6(c(1) + c(2)), 1L)), s"got ${out(2L)}")
    assert(out(1L) == ((1L, r6(c(1)), 2L)))
    assert(out(3L) == ((1L, r6(c(2)), 3L)))
    // exact-score tie breaks on doc_id
    val t1 = Seq(("t", 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val t2 = Seq(("t", 4L, 1L)).toDF("query_id", "doc_id", "rank")
    val tie = TextOps.rrfOf(Seq(t1, t2)).collect()
      .map(r => (r.getAs[Long]("rrf_rank"), r.getAs[Long]("doc_id"))).sorted
    assert(tie.toSeq == Seq((1L, 4L), (2L, 5L)))
  }

  test("rrf hybrid on the sf corpus: fused set ⊆ union of the two top-10s") {
    val bm = TextOps.bm25Search(spark, sf).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id"))).toSet
    val ql = TextOps.qlmSearch(spark, sf).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id"))).toSet
    val fused = TextOps.hybridRrf(spark, sf).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getAs[String]("query_id"), r.getAs[Long]("doc_id"))
      val n = r.getAs[Long]("n_systems")
      assert(bm.contains(key) || ql.contains(key))
      assert((n == 2L) == (bm.contains(key) && ql.contains(key)),
        s"$key n_systems=$n")
    }
    // ranks are 1..k consecutive per query
    fused.groupBy(_.getAs[String]("query_id")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rrf_rank")).sorted.toSeq
      assert(ranks == (1L to ranks.size).toSeq)
    }
  }

  // ---- C101 Kendall τ-b rank agreement -------------------------------------

  test("rank tau: identical lists read 1.0, reversed lists read -1.0") {
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val same = TextOps.tauOf(a, a, topK = 3).collect().head
    assert(same.getAs[Long]("n_union") == 3L)
    assert(same.getAs[Long]("overlap") == 3L)
    assert(same.getAs[Long]("concordant") == 3L)
    assert(same.getAs[Long]("discordant") == 0L)
    assert(same.getAs[Double]("tau_b") == 1.0)
    val rev = Seq(("q", 1L, 3L), ("q", 2L, 2L), ("q", 3L, 1L))
      .toDF("query_id", "doc_id", "rank")
    assert(TextOps.tauOf(a, rev, topK = 3).collect().head
      .getAs[Double]("tau_b") == -1.0)
  }

  test("rank tau: hand-computed partial overlap and disjoint-with-ties cases") {
    // a ranks 1,2,3; b ranks 2,3,4 — union {1,2,3,4}, absent rank = 4:
    // pairs (1,*) all discordant, pairs among {2,3,4} all concordant
    val a = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq(("q", 2L, 1L), ("q", 3L, 2L), ("q", 4L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val r = TextOps.tauOf(a, b, topK = 3).collect().head
    assert(r.getAs[Long]("n_union") == 4L && r.getAs[Long]("overlap") == 2L)
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("concordant") == 3L)
    assert(r.getAs[Long]("discordant") == 3L)
    assert(r.getAs[Long]("ties_a") == 0L && r.getAs[Long]("ties_b") == 0L)
    assert(r.getAs[Double]("tau_b") == 0.0)
    // disjoint top-2 lists: both absent-pairs tie (one per side),
    // τ_b = (0 − 4) / √((6−1)(6−1)) = −0.8 exactly
    val c = Seq(("t", 1L, 1L), ("t", 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val d = Seq(("t", 3L, 1L), ("t", 4L, 2L)).toDF("query_id", "doc_id", "rank")
    val s = TextOps.tauOf(c, d, topK = 2).collect().head
    assert(s.getAs[Long]("overlap") == 0L)
    assert(s.getAs[Long]("concordant") == 0L)
    assert(s.getAs[Long]("discordant") == 4L)
    assert(s.getAs[Long]("ties_a") == 1L && s.getAs[Long]("ties_b") == 1L)
    assert(s.getAs[Double]("tau_b") == -0.8)
  }

  test("rank tau on the sf corpus: one row per query, internally consistent") {
    val rows = TextOps.rankTau(spark, sf).collect()
    assert(rows.map(_.getAs[String]("query_id")).sorted.toSeq ==
      Seq("common", "rare"))
    rows.foreach { r =>
      val nu = r.getAs[Long]("n_union")
      assert(nu >= 10L && nu <= 20L) // k ≤ |union| ≤ 2k
      assert(r.getAs[Long]("overlap") <= 10L)
      assert(r.getAs[Long]("n_pairs") == nu * (nu - 1) / 2)
      assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant")
        <= r.getAs[Long]("n_pairs"))
      val t = r.getAs[Double]("tau_b")
      assert(t >= -1.0 && t <= 1.0, s"tau $t")
    }
  }

  // ---- C102 weighted sampling (Efraimidis–Spirakis) ------------------------

  test("weighted sample: selection, order, and keys match an independent reference; zero weights excluded") {
    val d = java.nio.file.Files.createTempDirectory("graft-wsample").toString
    val docs = (1L to 30L).map(i => (i, (i * 137 % 97) + 1)) :+ (31L, 0L)
    docs.toDF("doc_id", "n_chars").write.parquet(s"$d/documents.parquet")
    val got = TextOps.weightedSample(spark, d, k = 10)
      .collect().sortBy(_.getAs[Long]("sample_rank"))

    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def key(id: Long, w: Long): Double = {
      val h = java.lang.Long.parseLong(md5hex(s"ws1:$id").substring(0, 13), 16)
      val u = (h.toDouble + 0.5) / 4503599627370496.0
      BigDecimal(math.log(u))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble / w.toDouble
    }
    val expected = docs.filter(_._2 > 0)
      .map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(10)
    assert(got.length == 10)
    got.zip(expected).foreach { case (row, (id, w, k)) =>
      assert(row.getAs[Long]("doc_id") == id, s"got $row, expected doc $id")
      assert(row.getAs[Long]("weight") == w)
      assert(row.getAs[Double]("es_key") == k) // bit-exact, no tolerance
    }
  }

  test("weighted sample: weights dominate selection; k past n returns everything") {
    val d = java.nio.file.Files.createTempDirectory("graft-wsample2").toString
    // 25 heavy docs (100k chars) vs 25 light docs (1 char), interleaved ids:
    // a light doc only beats a heavy one on a u > ~1-1e-5 draw
    val docs = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) 100000L else 1L))
    docs.toDF("doc_id", "n_chars").write.parquet(s"$d/documents.parquet")
    val top = TextOps.weightedSample(spark, d, k = 10).collect()
    assert(top.length == 10)
    assert(top.forall(_.getAs[Long]("weight") == 100000L),
      top.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"))).mkString(","))
    // k ≥ n: the whole (positive-weight) corpus comes back
    assert(TextOps.weightedSample(spark, d, k = 500).count() == 50L)
  }

  // ---- C109 filter agreement --------------------------------------------------------

  test("filter agreement: cells reconcile with the three batteries; null text drops everywhere") {
    val d = java.nio.file.Files.createTempDirectory("graft-fagree").toString
    Seq((1L, Option("some plain words " * 20)), (2L, Option.empty[String]))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val tiny = TextOps.filterAgreement(spark, d).collect()
    assert(tiny.length == 3)
    tiny.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2L) // the null-text doc still counts
      val cells = Seq("both_keep", "only_a", "only_b", "both_drop")
        .map(r.getAs[Long](_))
      assert(cells.sum == 2L && cells.forall(_ >= 0L), s"$r")
      assert(r.getAs[Long]("both_drop") >= 1L) // null text is a drop in all
    }
    // sf corpus: marginals reconcile against the batteries run directly
    def keeps(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (!r.isNullAt(r.fieldIndex("keep")) && r.getAs[Boolean]("keep"))).toMap
    val kg = keeps(TextOps.gopherRules(spark, sf))
    val kc = keeps(TextOps.c4Clean(spark, sf))
    val kf = keeps(TextOps.fineWebRules(spark, sf))
    val out = TextOps.filterAgreement(spark, sf).collect()
      .map(r => (r.getAs[String]("filter_a"), r.getAs[String]("filter_b")) -> r)
      .toMap
    val ids = kg.keySet
    def check(a: Map[Long, Boolean], b: Map[Long, Boolean], key: (String, String)): Unit = {
      val r = out(key)
      assert(r.getAs[Long]("n_docs") == ids.size.toLong)
      assert(r.getAs[Long]("both_keep") == ids.count(i => a(i) && b(i)).toLong, s"$key")
      assert(r.getAs[Long]("only_a") == ids.count(i => a(i) && !b(i)).toLong)
      assert(r.getAs[Long]("only_b") == ids.count(i => !a(i) && b(i)).toLong)
      assert(r.getAs[Long]("both_drop") == ids.count(i => !a(i) && !b(i)).toLong)
      val agree = r.getAs[Double]("agreement")
      assert(agree >= 0.0 && agree <= 1.0)
    }
    check(kg, kc, ("gopher", "c4"))
    check(kg, kf, ("gopher", "fineweb"))
    check(kc, kf, ("c4", "fineweb"))
  }

  // ---- C108 tokenizer bake-off ----------------------------------------------------

  test("tok compare: per-source fertilities reconcile with the two encoders; winner is the argmin") {
    val out = TextOps.tokCompare(spark, sf).collect()
    assert(out.nonEmpty)
    val bpe = TextOps.bpeEncode(spark, sf, nMerges = 64).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))).toMap
    val uni = TextOps.unigramEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_uni_tokens")).toMap
    val srcOf = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byId = bpe.keySet.intersect(uni.keySet)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val ids = byId.filter(id => srcOf.get(id).contains(src))
      assert(r.getAs[Long]("n_docs") == ids.size.toLong, s"$src")
      assert(r.getAs[Long]("n_words") == ids.toSeq.map(bpe(_)._1).sum)
      assert(r.getAs[Long]("bpe_tokens") == ids.toSeq.map(bpe(_)._2).sum)
      assert(r.getAs[Long]("uni_tokens") == ids.toSeq.map(uni(_)).sum)
      val bf = r.getAs[Double]("bpe_fertility")
      val uf = r.getAs[Double]("uni_fertility")
      assert(bf >= 1.0 - 1e-9 && uf >= 0.0) // a word is >= one subword
      assert(r.getAs[String]("winner") ==
        (if (bf <= uf) "bpe" else "unigram"))
    }
  }

  // ---- C111 content-defined chunking ------------------------------------

  /** Deterministic pseudo-random text: seeded LCG over a given alphabet. */
  private def lcgText(seed: Long, n: Int, alpha: String): String = {
    var s = seed; val sb = new StringBuilder
    for (_ <- 0 until n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      sb.append(alpha.charAt(((s >>> 33) % alpha.length).toInt))
    }
    sb.toString
  }

  test("cdc chunks: spans tile the document, bounds hold, cuts match an independent reference, and a prefix edit re-aligns") {
    import SparkSuite.spark.implicits._
    val common = lcgText(7L, 4000, "abcdefghijklmnop")
    val docs = Seq((1L, common), (2L, "XYZ" + common)).toDF("doc_id", "text")
    val ch = TextOps.cdcChunksOf(docs, maskBits = 5, minLen = 8, maxLen = 128)
      .collect()
    val byDoc = ch.groupBy(_.getLong(0)).map { case (id, rows) =>
      id -> rows.sortBy(_.getAs[Long]("chunk_idx")) }
    for ((id, rows) <- byDoc) {
      val txtLen = if (id == 1L) common.length else common.length + 3
      var pos = 1
      rows.foreach { r =>
        assert(r.getAs[Int]("start") == pos, s"doc $id gap at $pos")
        pos += r.getAs[Int]("len")
      }
      assert(pos == txtLen + 1, s"doc $id does not tile")
      rows.init.foreach(r =>
        assert(r.getAs[Int]("len") >= 8 && r.getAs[Int]("len") <= 128))
      assert(rows.last.getAs[Int]("len") >= 1 &&
        rows.last.getAs[Int]("len") <= 128)
    }
    // independent reference: the same windowed candidate + greedy walk in
    // plain Scala must yield doc 1's exact cut positions
    def refEnds(text: String): Seq[Int] = {
      val g = graft.functions.GearTable.table
      val cand = (1 to text.length).map { i =>
        var sum = 0L
        for (j <- 0 until 5; if i > j)
          sum += g(text.charAt(i - 1 - j) & 255) << j
        (sum & 31L) == 0L
      }
      val ends = Seq.newBuilder[Int]; var start = 1
      for (i <- 1 to text.length)
        if ((i - start + 1 >= 8 && cand(i - 1)) || i - start + 1 >= 128) {
          ends += i; start = i + 1
        }
      if (start <= text.length) ends += text.length
      ends.result()
    }
    val gotEnds = byDoc(1L).map(r =>
      r.getAs[Int]("start") + r.getAs[Int]("len") - 1).toSeq
    assert(gotEnds == refEnds(common))
    // edit locality: the 3-char prefix edit leaves a long IDENTICAL chunk
    // hash suffix (boundaries are functions of trailing content only)
    val h1 = byDoc(1L).map(_.getAs[String]("chunk_md5"))
    val h2 = byDoc(2L).map(_.getAs[String]("chunk_md5"))
    val shared = h1.reverse.zip(h2.reverse).takeWhile(p => p._1 == p._2).length
    assert(shared >= h1.length / 2, s"re-aligned only $shared of ${h1.length}")
  }

  test("cdc dedup census: a planted exact duplicate halves its source's unique bytes; first-owner accounting adds up") {
    import SparkSuite.spark.implicits._
    val t1 = lcgText(11L, 3000, "abcdefghijklmnop")
    val t2 = lcgText(13L, 2500, "qrstuvwxyz")
    val d = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    Seq((1L, t1, "en", "dup", t1.length.toLong),
        (2L, t1, "en", "dup", t1.length.toLong),
        (3L, t2, "en", "uniq", t2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = TextOps.cdcDedup(spark, d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val dup = out("dup")
    assert(dup.getAs[Long]("total_bytes") == 2L * t1.length)
    assert(dup.getAs[Long]("unique_bytes") == t1.length.toLong)
    assert(dup.getAs[Double]("dedup_ratio") == 0.5)
    val un = out("uniq") // disjoint alphabet: nothing shared with "dup"
    assert(un.getAs[Long]("total_bytes") == t2.length.toLong)
    assert(un.getAs[Long]("unique_bytes") == t2.length.toLong)
    assert(un.getAs[Double]("dedup_ratio") == 0.0)
    // corpus invariant on the real corpus: unique ≤ total, ratio ∈ [0, 1)
    TextOps.cdcDedup(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("unique_bytes") <= r.getAs[Long]("total_bytes"))
      val ratio = r.getAs[Double]("dedup_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
    }
  }

  test("cdc stats: profile reconciles with a direct recomputation over the chunk table") {
    val chunks = TextOps.cdcChunks(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Int]("len")))
    val srcOf = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.cdcStats(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    chunks.groupBy(c => srcOf(c._1)).foreach { case (src, cs) =>
      val r = got(src)
      assert(r.getAs[Long]("n_chunks") == cs.length.toLong)
      assert(r.getAs[Long]("total_len") == cs.map(_._3.toLong).sum)
      assert(r.getAs[Double]("mean_len") ==
        cs.map(_._3.toLong).sum.toDouble / cs.length.toDouble)
      val sorted = cs.sortBy(c => (c._3, c._1, c._2)).map(_._3)
      assert(r.getAs[Int]("len_p50") ==
        sorted((math.ceil(sorted.length * 0.5) - 1).toInt), src)
      assert(r.getAs[Int]("len_p95") ==
        sorted((math.ceil(sorted.length * 0.95) - 1).toInt), src)
      val forced = cs.count(_._3 == 256)
      assert(r.getAs[Double]("forced_rate") ==
        forced.toDouble / cs.length.toDouble)
    }
    assert(got.nonEmpty)
  }

  test("cdc store: exact known/new byte accounting across two ingests; appended hashes are visible to the next batch") {
    import SparkSuite.spark.implicits._
    val tA = lcgText(17L, 3000, "abcdefghijklmnop")
    val tB = lcgText(19L, 2500, "qrstuvwxyz") // disjoint alphabet: no overlap
    def docsOf(rows: (Long, String)*) = rows.toSeq
      .map { case (id, t) => (id, t, "en", "crawl", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdcs-spec")
    try {
      TextOps.writeCdcStore(docsOf(1L -> tA), tmp.toString)
      // batch 1: an exact re-crawl of A plus the brand-new B
      val out1 = TextOps.cdcIngest(docsOf(10L -> tA, 11L -> tB), tmp.toString)
        .collect().head
      assert(out1.getAs[Long]("total_bytes") == (tA.length + tB.length).toLong)
      assert(out1.getAs[Long]("known_bytes") == tA.length.toLong)
      assert(out1.getAs[Long]("new_bytes") == tB.length.toLong)
      // batch 2: B again — batch 1's append must make it fully known
      val out2 = TextOps.cdcIngest(docsOf(20L -> tB), tmp.toString).collect().head
      assert(out2.getAs[Long]("known_bytes") == tB.length.toLong)
      assert(out2.getAs[Long]("new_bytes") == 0L)
      assert(out2.getAs[Double]("novelty") == 0.0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("cdc forget/compact: tombstone masks immediately, re-ingest resurrects, compact equals a never-held store and clears the tombstone") {
    import SparkSuite.spark.implicits._
    val tA = lcgText(17L, 3000, "abcdefghijklmnop")
    val tB = lcgText(19L, 2500, "qrstuvwxyz") // disjoint alphabet: no overlap
    def docsOf(rows: (Long, String)*) = rows.toSeq
      .map { case (id, t) => (id, t, "en", "crawl", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def chunkSet(store: String): Set[(String, Int)] =
      spark.read.parquet(s"$store/chunks.parquet").collect()
        .map(r => (r.getAs[String]("chunk_md5"), r.getAs[Int]("len"))).toSet
    def tombExists(store: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$store/tombstones.parquet"))
    val t1 = java.nio.file.Files.createTempDirectory("graft-cdcf-a")
    val t2 = java.nio.file.Files.createTempDirectory("graft-cdcf-b")
    val t3 = java.nio.file.Files.createTempDirectory("graft-cdcf-c")
    try {
      // mask-now: forgotten content reads NOVEL under the standing
      // tombstone, and the re-ingest RESURRECTS it
      TextOps.writeCdcStore(docsOf(1L -> tA, 2L -> tB), t1.toString)
      val fr = TextOps.cdcForget(docsOf(1L -> tA), t1.toString).collect().head
      assert(fr.getAs[Long]("n_chunks_tombstoned") > 0)
      assert(tombExists(t1.toString))
      val re = TextOps.cdcIngest(docsOf(10L -> tA), t1.toString).collect().head
      assert(re.getAs[Long]("known_bytes") == 0L &&
        re.getAs[Long]("new_bytes") == tA.length.toLong,
        s"tombstoned content must read novel: $re")
      val again = TextOps.cdcIngest(docsOf(11L -> tA), t1.toString).collect().head
      assert(again.getAs[Long]("new_bytes") == 0L,
        s"re-ingested content must be resurrected: $again")
      // EXACT byte accounting survives the resurrection (r11 self-review:
      // the resurrected hash's pre-forget rows are still in the store, so
      // an un-deduplicated join side would DOUBLE total/known here)
      assert(again.getAs[Long]("total_bytes") == tA.length.toLong &&
        again.getAs[Long]("known_bytes") == tA.length.toLong,
        s"duplicate store rows inflated the accounting: $again")
      // B was never forgotten: still known throughout
      val bStill = TextOps.cdcIngest(docsOf(12L -> tB), t1.toString).collect().head
      assert(bStill.getAs[Long]("new_bytes") == 0L, s"$bStill")

      // rewrite-later: compact folds the tombstone — the rewritten store
      // EQUALS one that never held the forgotten content (disjoint
      // alphabets ⇒ no shared chunks; boundaries are content-local), the
      // tombstone clears, and the file count collapses
      TextOps.writeCdcStore(docsOf(1L -> tA, 2L -> tB), t2.toString)
      TextOps.cdcIngest(docsOf(20L -> tB), t2.toString) // append fragmentation
      def nFiles(store: String): Long =
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$store/chunks.parquet"))
          .filter(p => p.getFileName.toString.startsWith("part-")).count()
      val filesBefore = nFiles(t2.toString)
      TextOps.cdcForget(docsOf(2L -> tB), t2.toString)
      TextOps.cdcCompact(spark, t2.toString)
      assert(!tombExists(t2.toString), "compact must clear the tombstone")
      assert(nFiles(t2.toString) <= filesBefore, "compact must not fragment further")
      TextOps.writeCdcStore(docsOf(1L -> tA), t3.toString)
      assert(chunkSet(t2.toString) == chunkSet(t3.toString),
        "compacted store must equal a store that never held the forgotten content")
      // post-compact: the forgotten content is fully novel again
      val post = TextOps.cdcIngest(docsOf(30L -> tB), t2.toString).collect().head
      assert(post.getAs[Double]("novelty") == 1.0, s"$post")
    } finally {
      import scala.reflect.io.Directory
      Seq(t1, t2, t3).foreach(t => new Directory(t.toFile).deleteRecursively())
    }
  }

  test("tok compare from stores: bit-equal to the retraining path under the same parameters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-toks-spec")
    try {
      val docs = Tables.documents(spark, sf)
      TextOps.writeBpeStore(docs, s"$tmp/bpe", nMerges = 64)
      TextOps.writeUnigramStore(docs, s"$tmp/uni")
      val stored = TextOps.tokCompareFromStores(spark, sf, s"$tmp/bpe", s"$tmp/uni")
        .collect().map(_.toSeq).toSet
      val direct = TextOps.tokCompare(spark, sf).collect().map(_.toSeq).toSet
      assert(stored == direct)
      assert(stored.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  // ---- C107 held-out bigram NLL -------------------------------------------------

  test("heldout ppl: unseen pairs and words pay the smoothed price; hand-computed cells") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = (1L to 200L)
    val trainIds = ids.filter(i => md5hex(i.toString).substring(0, 2) < "cd").take(3)
    val heldIds = ids.filter(i => md5hex(i.toString).substring(0, 2) >= "cd").take(2)
    val docs = trainIds.map(i => (i, "a b a c")) ++
      Seq((heldIds(0), "a b z"), (heldIds(1), "z q"))
    val dir = java.nio.file.Files.createTempDirectory("graft-hop").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextOps.heldoutPpl(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("heldout_nll")))).toMap
    assert(out.keySet == heldIds.toSet) // train docs never score
    def q9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(b: BigDecimal) = b.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // train model (3 copies of "a b a c"): c(a,b)=3, c(b,a)=3, c(a,c)=3,
    // c(a,.)=6, c(b,.)=3; V = |{a,b,c}| = 3
    // held "a b z": -ln(4/9) (seen) + -ln(1/(3+3)) (unseen pair, seen a=b? b:3)
    val d1 = r6((q9(-math.log(4.0 / 9.0)) + q9(-math.log(1.0 / 6.0))) / 2)
    assert(out(heldIds(0)) == ((2L, d1)), s"${out(heldIds(0))} vs $d1")
    // held "z q": z unseen entirely: -ln((0+1)/(0+3))
    val d2 = r6(q9(-math.log(1.0 / 3.0)))
    assert(out(heldIds(1)) == ((1L, d2)))
    // real corpus: held docs only, every nll positive
    val real = TextOps.heldoutPpl(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getAs[Double]("heldout_nll") > 0.0))
  }

  // ---- C106 PMI collocations ---------------------------------------------------

  test("pmi: hand-computed window pairs; low-count pairs drop; ranking is on the quantized score") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    // "a b a b": adjacent (a,b) x2, (b,a) x1; skip-1 (a,a), (b,b).
    // N = 4 tokens, P = 3 + 2 = 5 pair positions.
    Seq((1L, "a b a b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextOps.pmiPairs(spark, dir, minCount = 1, k = 10).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        ((r.getAs[Long]("n_ab"), r.getAs[Double]("pmi"),
          r.getAs[Long]("rank")))).toMap
    def ref(nab: Long, na: Long, nb: Long) = {
      val v = (nab.toDouble * 4.0 * 4.0) / (5.0 * na.toDouble * nb.toDouble)
      BigDecimal(math.log(v)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")))
    assert(out(("a", "b"))._1 == 2L && out(("a", "b"))._2 == ref(2, 2, 2))
    assert(out(("b", "a"))._1 == 1L && out(("b", "a"))._2 == ref(1, 2, 2))
    // (a,b) outranks the count-1 pairs; equal scores tie on (a, b)
    assert(out(("a", "b"))._3 == 1L)
    assert(Seq(out(("a", "a"))._3, out(("b", "a"))._3, out(("b", "b"))._3)
      .sorted == Seq(2L, 3L, 4L))
    // the default minCount=5 gate drops everything in this tiny corpus
    assert(TextOps.pmiPairs(spark, dir).count() == 0)
    // real corpus: k rows, ranks consecutive, every pair above the count gate
    val real = TextOps.pmiPairs(spark, sf).collect()
    assert(real.nonEmpty)
    assert(real.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to real.length).toSeq)
    real.foreach(r => assert(r.getAs[Long]("n_ab") >= 5L))
  }

  // ---- C105 readability -------------------------------------------------------

  test("readability: hand-computed Flesch cell; unpunctuated text is one sentence; vowelless words read one syllable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-read").toString
    Seq((1L, "Hello world. It works!"),
        (2L, "no punctuation here"),
        (3L, "xyz tsk"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = TextOps.readability(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = out(1L)
    // sentences: "." and "!" runs = 2; words 4; syllables: he-llo(2: e,o),
    // world.(1: o), it(1), works!(1) = 5
    assert(d1.getAs[Long]("n_sentences") == 2L)
    assert(d1.getAs[Long]("n_words") == 4L)
    assert(d1.getAs[Long]("n_syllables") == 5L)
    assert(d1.getAs[Double]("flesch_ease") ==
      r6(206.835 - 1.015 * (4.0 / 2.0) - 84.6 * (5.0 / 4.0)))
    assert(d1.getAs[Double]("fk_grade") ==
      r6(0.39 * (4.0 / 2.0) + 11.8 * (5.0 / 4.0) - 15.59))
    assert(out(2L).getAs[Long]("n_sentences") == 1L)
    // vowelless words still count one syllable each (the standard floor)
    assert(out(3L).getAs[Long]("n_syllables") == 2L)
    // real corpus: every doc emits, ease bounded sanely for word text
    val real = TextOps.readability(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getAs[Long]("n_syllables") >=
      r.getAs[Long]("n_words") - 1, s"$r")) // phantom empty token at most
  }

  // ---- C104 metric correlation audit ----------------------------------------

  test("metricCorr: planted linear relations read ±1; a constant metric reads NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mcorr").toString
    // k words of text; n_chars planted exactly linear in k
    (1 to 20).map(k => (k.toLong, Seq.fill(k)("w").mkString(" "), 7L * k + 3))
      .toDF("doc_id", "text", "n_chars").write.parquet(s"$dir/documents.parquet")
    val up = TextOps.metricCorr(spark, dir).collect()
      .map(r => r.getAs[String]("pair") -> r).toMap
    assert(up("chars_tokens").getAs[Double]("corr") == 1.0)
    // anti-correlated chars: corr flips sign exactly
    val dir2 = java.nio.file.Files.createTempDirectory("graft-mcorr2").toString
    (1 to 20).map(k => (k.toLong, Seq.fill(k)("w").mkString(" "), 500L - 7 * k))
      .toDF("doc_id", "text", "n_chars").write.parquet(s"$dir2/documents.parquet")
    assert(TextOps.metricCorr(spark, dir2).collect()
      .find(_.getAs[String]("pair") == "chars_tokens").get
      .getAs[Double]("corr") == -1.0)
    // constant tokens (same text everywhere): zero variance ⇒ NULL
    val dir3 = java.nio.file.Files.createTempDirectory("graft-mcorr3").toString
    (1 to 10).map(k => (k.toLong, "a b c", k.toLong * 11))
      .toDF("doc_id", "text", "n_chars").write.parquet(s"$dir3/documents.parquet")
    val c3 = TextOps.metricCorr(spark, dir3).collect()
      .find(_.getAs[String]("pair") == "chars_tokens").get
    assert(c3.isNullAt(c3.fieldIndex("corr")))
    // real corpus: three rows, every corr inside [-1, 1]
    val real = TextOps.metricCorr(spark, sf).collect()
    assert(real.length == 3)
    real.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("corr"))) {
        val c = r.getAs[Double]("corr"); assert(c >= -1.0 && c <= 1.0, s"$r") }
    }
  }

  // ---- C103 unigram-LM tokenizer -------------------------------------------

  private def uniPieces(ps: (String, Double)*) = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 9)
    ps.toSeq.toDF("piece", "sc0")
      .select(col("piece"), col("sc0").cast(dec).as("sc"))
  }

  test("unigram viterbi: picks the max-likelihood segmentation; score tie prefers the longer last piece") {
    val words = Seq(("abab", 1L)).toDF("w", "freq")
    // ab+ab = -3.0 beats a+b+a+b = -4.4 and ab+a+b / a+b+ab = -3.7
    val seg = TextOps.uniSegment(words,
      uniPieces("a" -> -1.0, "b" -> -1.2, "ab" -> -1.5), 8).collect().head
    assert(seg.getAs[scala.collection.Seq[String]]("pieces").toSeq == Seq("ab", "ab"))
    assert(seg.getDecimal(3).doubleValue == -3.0)
    // exact tie: a+b = -3.0 = ab — the longer-last-piece rule wins
    val tie = TextOps.uniSegment(Seq(("ab", 1L)).toDF("w", "freq"),
      uniPieces("a" -> -1.0, "b" -> -2.0, "ab" -> -3.0), 8).collect().head
    assert(tie.getAs[scala.collection.Seq[String]]("pieces").toSeq == Seq("ab"))
    // maxPieceLen caps candidates: with len 1 the same vocab must fall
    // back to characters
    val chars = TextOps.uniSegment(Seq(("abab", 1L)).toDF("w", "freq"),
      uniPieces("a" -> -1.0, "b" -> -1.2, "ab" -> -1.5), 1).collect().head
    assert(chars.getAs[scala.collection.Seq[String]]("pieces").toSeq == Seq("a", "b", "a", "b"))
  }

  test("unigram hard-EM: the objective is non-decreasing round over round on a planted census") {
    val words = Seq(
      ("international", 20L), ("internal", 15L), ("intern", 10L),
      ("nation", 12L), ("national", 8L), ("ration", 5L), ("rational", 4L),
      ("relation", 6L), ("relational", 3L), ("inter", 2L))
      .toDF("w", "freq")
    var pieces = TextOps.uniScored(TextOps.uniSeed(words, 8, 500))
    var lls = Vector.empty[java.math.BigDecimal]
    for (_ <- 1 to 3) {
      val (p, ll) = TextOps.uniRound(words, pieces, 8, 100000)
      pieces = p; lls :+= ll
    }
    assert(lls.size == 3 && lls.forall(_ != null))
    lls.zip(lls.tail).foreach { case (a, b) =>
      assert(b.compareTo(a) >= 0, s"objective decreased: $a -> $b ($lls)") }
  }

  test("unigram: every corpus word segments and the pieces concatenate back exactly") {
    val docs = Tables.documents(spark, sf)
    val dec = org.apache.spark.sql.types.DecimalType(18, 9)
    val pieces = TextOps.unigramTrainOf(docs, 512, 2048, 8, 2)
      .select(col("piece"), col("score").cast(dec).as("sc"))
    val words = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val seg = TextOps.uniSegment(words, pieces, 8)
    assert(seg.count() == words.count()) // coverage: nothing unsegmentable
    assert(seg.filter(concat_ws("", col("pieces")) =!= col("w")).count() == 0)
    assert(seg.filter(size(col("pieces")) < 1).count() == 0)
  }

  test("unigram store: encode-from-store reproduces the direct encode bit-for-bit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-unistore").toString
    TextOps.writeUnigramStore(Tables.documents(spark, sf), tmp)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_uni_tokens"), r.getAs[Double]("ll")))
      .sortBy(_._1).toSeq
    val fromStore = key(TextOps.unigramEncodeFromStore(spark, sf, tmp).collect())
    val direct = key(TextOps.unigramEncode(spark, sf).collect())
    assert(fromStore == direct && fromStore.nonEmpty)
  }

  test("unigram train is deterministic and encode reconciles with the census") {
    val a = TextOps.unigramTrain(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val b = TextOps.unigramTrain(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(a == b && a.nonEmpty)
    // encode: per doc, words <= pieces <= characters, ll strictly negative
    val enc = TextOps.unigramEncode(spark, sf).collect()
    assert(enc.nonEmpty)
    val chars = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("doc_id"), expr(
        "CAST(aggregate(filter(split(text, ' '), w -> length(w) > 0), 0L, (a, w) -> a + length(w)) AS BIGINT)").as("nc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    enc.foreach { r =>
      val nw = r.getAs[Long]("n_words"); val np = r.getAs[Long]("n_uni_tokens")
      assert(nw >= 1 && np >= nw, s"$r")
      assert(np <= chars(r.getAs[Long]("doc_id")), s"$r")
      assert(r.getAs[Double]("ll") < 0.0)
    }
  }

  // ---- C99 Zipf fit / C100 Heaps curve ------------------------------------

  test("zipf: exact planted power law fits slope -1, r2 ~ 1; degenerate source null") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    // freqs 2520/i for ranks i = 1..5: ln(freq) = ln 2520 - ln(rank)
    val text = (1 to 5).flatMap(i => Seq.fill(2520 / i)(s"t$i")).mkString(" ")
    Seq((0L, text, "en", "z", 1L), (1L, "solo", "en", "u", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.zipfFit(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val z = out("z")
    assert(z.getAs[Long]("n_terms") == 5L)
    assert(math.abs(z.getAs[Double]("slope") + 1.0) < 1e-6, s"slope ${z.getAs[Double]("slope")}")
    assert(z.getAs[Double]("r2") > 0.999999)
    assert(math.abs(z.getAs[Double]("intercept") - math.log(2520.0)) < 1e-5)
    // single-term source: zero rank variance -> null fit, not NaN/Inf
    val u = out("u")
    assert(u.getAs[Long]("n_terms") == 1L)
    assert(u.isNullAt(u.fieldIndex("slope")) && u.isNullAt(u.fieldIndex("r2")))
  }

  test("heaps: per-checkpoint vocabulary growth, exact counts, sparse id ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    // doc ids 0..9 (bucket = id): doc i = "base w<i>" -> vocab(k) = k + 1
    (0 to 9).map(i => (i.toLong, s"base w$i", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.heapsCurve(spark, dir).collect()
      .map(r => r.getAs[Long]("checkpoint") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("vocab")))).toMap
    assert(out.size == 10)
    (1 to 10).foreach { k =>
      assert(out(k.toLong) == ((k.toLong, 2L * k, k + 1L)), s"checkpoint $k: ${out(k.toLong)}")
    }
    // sparse ids: 0..4 and 95..99 with range deciles -> buckets 0 and 9 only
    val dir2 = java.nio.file.Files.createTempDirectory("graft-heaps2").toString
    ((0 to 4) ++ (95 to 99)).map(i => (i.toLong, s"base x$i", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out2 = TextOps.heapsCurve(spark, dir2).collect()
      .map(r => r.getAs[Long]("checkpoint") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("vocab")))).toMap
    assert(out2.keySet == Set(1L, 10L), s"got ${out2.keySet}")
    assert(out2(1L) == ((5L, 10L, 6L)))
    assert(out2(10L) == ((10L, 20L, 11L)))
  }

  test("lexical diversity: hand-counted census reads exact TTR/K/D; a repetitive source spikes K and collapses TTR") {
    import SparkSuite.spark.implicits._
    // "rich": 10 distinct tokens once each (V=10, N=10, s2=10);
    // "spam": one token 9 times + one once (V=2, N=10, s2=82)
    val dir = java.nio.file.Files.createTempDirectory("graft-lex").toString
    Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" "), "en", "rich", 60L),
      (2L, (Seq.fill(9)("buy") :+ "now").mkString(" "), "en", "spam", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.lexicalDiversity(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val rich = got("rich")
    assert(rich.getAs[Long]("vocab") == 10L &&
      rich.getAs[Long]("n_tokens") == 10L)
    assert(rich.getAs[Double]("ttr") == 1.0)
    assert(rich.getAs[Double]("yule_k") == 0.0)   // no repeats at all
    assert(rich.getAs[Double]("simpson_d") == 0.0)
    val spam = got("spam")
    assert(spam.getAs[Long]("vocab") == 2L &&
      spam.getAs[Long]("n_tokens") == 10L)
    assert(spam.getAs[Double]("ttr") == 0.2)
    // s2 = 81 + 1 = 82: K = 1e4*(82-10)/100 = 7200; D = 72/90 = 0.8
    assert(spam.getAs[Double]("yule_k") == 7200.0)
    assert(spam.getAs[Double]("simpson_d") == 0.8)
    // corpus: D in [0,1], K >= 0, TTR in (0,1]
    val corpus = TextOps.lexicalDiversity(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val d = r.getAs[Double]("simpson_d")
      assert(d >= 0.0 && d <= 1.0)
      assert(r.getAs[Double]("yule_k") >= 0.0)
      val t = r.getAs[Double]("ttr")
      assert(t > 0.0 && t <= 1.0)
    }
  }
}
