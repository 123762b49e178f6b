package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.functions._
import graft.streaming.EventPipeline.Event

/** Property-style invariants over randomly generated event sets (scalacheck
  * generators sampled with fixed seeds — deterministic across runs). */
class PropertySpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private val eventGen: Gen[Event] = for {
    id <- Gen.choose(0L, 500L)
    minute <- Gen.choose(0, 59)
    hour <- Gen.choose(0, 23)
    user <- Gen.choose(0L, 5L)
    tpe <- Gen.oneOf("click", "view", "error", "signup", "purchase")
    value <- Gen.choose(0, 20000).map(_ / 100.0)
  } yield Event(id, Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00"), user, tpe, value)

  private def samples(n: Int): Seq[List[Event]] =
    (1 to n).map { seed =>
      Gen.listOfN(60, eventGen)
        .apply(Gen.Parameters.default, rng.Seed(seed.toLong)).get
    }

  test("rate-limit accounting: allowed+dropped == total, allowed <= limit, over random event sets") {
    samples(5).foreach { events =>
      val out = events.toDF()
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd HH").as("win"))
        .groupBy("user_id", "win").agg(count(lit(1)).as("n"))
        .select(least(col("n"), lit(5L)).as("allowed"),
          greatest(col("n") - 5, lit(0L)).as("dropped"), col("n"))
        .collect()
      assert(out.map(_.getAs[Long]("n")).sum == events.length)
      assert(out.forall(r => r.getAs[Long]("allowed") + r.getAs[Long]("dropped") == r.getAs[Long]("n")))
      assert(out.forall(_.getAs[Long]("allowed") <= 5))
    }
  }

  test("dedup-first keeps exactly one row per key and is idempotent, over random event sets") {
    samples(5).foreach { events =>
      val df = events.toDF()
      def dedup(d: org.apache.spark.sql.DataFrame) = d
        .groupBy("user_id", "event_type")
        .agg(min(struct(col("ts"), col("event_id"))).as("first"))
        .select(col("user_id"), col("event_type"),
          col("first.ts").as("ts"), col("first.event_id").as("event_id"))
      val once = dedup(df)
      val keys = once.select("user_id", "event_type").distinct().count()
      assert(once.count() == keys)
      val twice = dedup(once.join(df, Seq("user_id", "event_type", "ts", "event_id")))
      assert(twice.count() == once.count())
    }
  }

  test("minhash: identical docs get identical signatures for random vocabularies") {
    (1 to 5).foreach { seed =>
      val words = Gen.listOfN(6, Gen.alphaLowerStr.suchThat(_.nonEmpty))
        .apply(Gen.Parameters.default, rng.Seed(seed.toLong)).get
      val text = words.mkString(" ")
      val docs = Seq((0L, text, "en", "s", text.length.toLong),
        (1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val sigs = graft.operators.Dedup.minhashSigs(docs, 2, 8).collect()
      assert(sigs.length == 2)
      val s0 = sigs.find(_.getAs[Long]("doc_id") == 0L).get.getAs[scala.collection.Seq[Long]]("sig")
      val s1 = sigs.find(_.getAs[Long]("doc_id") == 1L).get.getAs[scala.collection.Seq[Long]]("sig")
      assert(s0.toSeq == s1.toSeq)
    }
  }

  // random word-bag corpora for the two-level global-order operators
  private def randomDocs(seed: Int, n: Int = 40) = {
    val docGen = for {
      nw <- Gen.choose(1, 30)
      ws <- Gen.listOfN(nw, Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox"))
    } yield ws.mkString(" ")
    Gen.listOfN(n, docGen).apply(Gen.Parameters.default, rng.Seed(seed.toLong)).get
      .zipWithIndex.map { case (t, i) => (i.toLong * 7 % 1000, t) } // gappy ids
      .toDF("doc_id", "text")
  }

  test("shardAssign equals the naive global cumsum over random corpora and budgets") {
    import org.apache.spark.sql.expressions.Window
    (1 to 5).foreach { seed =>
      val docs = randomDocs(seed)
      val budget = 20L + seed * 13
      val out = graft.operators.TextOps.shardAssignOf(docs, budget, bucketSize = 8)
      val naive = docs
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("doc_id"), expr(s"(cum - n_tokens) div $budget").as("naive_shard"))
      val joined = out.join(naive, "doc_id")
      assert(joined.count() == docs.count())
      assert(joined.filter(col("shard") =!= col("naive_shard")).count() == 0,
        s"seed $seed budget $budget diverged")
    }
  }

  test("packIncremental equals the full pack over random corpora and split points") {
    (1 to 4).foreach { seed =>
      val docs = randomDocs(seed, n = 40)
      val cut = 30L + seed * 31 // random-ish id cut inside the gappy range
      val store = java.nio.file.Files
        .createTempDirectory(s"graft-packprop$seed").toString
      graft.operators.TextOps.writePackStore(
        docs.filter(col("doc_id") < cut), store, seqLen = 16, bucketSize = 4)
      // no seqLen/bucketSize args: packIncremental reads them from the
      // store's params.parquet (16/4 as written above)
      val incr = graft.operators.TextOps.packIncremental(
        docs.filter(col("doc_id") >= cut), store)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val full = graft.operators.TextOps.packOf(docs, seqLen = 16, bucketSize = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(incr == full.filter(s => docs.filter(col("doc_id") >= cut)
          .collect().map(_.getLong(0)).toSet.contains(s._1)),
        s"seed $seed cut $cut: incremental diverged from the full pack")
      // and the store as a whole equals the full manifest
      val manifest = spark.read.parquet(s"$store/manifest.parquet")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(manifest == full, s"seed $seed cut $cut: store != full manifest")
    }
  }

  test("mixture over random multi-source corpora: copy counts are floor(w)/floor(w)+1 with the exact extra census") {
    (1 to 4).foreach { seed =>
      val docGen = for {
        src <- Gen.oneOf("s1", "s2", "s3")
        nw <- Gen.choose(1, 25)
        ws <- Gen.listOfN(nw, Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox"))
      } yield (src, ws.mkString(" "))
      val rows = Gen.listOfN(50, docGen)
        .apply(Gen.Parameters.default, rng.Seed(seed.toLong)).get
        .zipWithIndex.map { case ((s, t), i) => (s, i.toLong, t) }
      val docs = rows.toDF("source", "doc_id", "text")
      val out = graft.operators.TextOps.mixtureOf(docs).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_copies")))
      assert(out.length == rows.length, s"seed $seed: one row per doc")
      // naive per-source recompute
      val bySrc = rows.groupBy(_._1)
      val total = rows.map(_._3.split(" ").length.toLong).sum
      bySrc.foreach { case (src, rs) =>
        val srcToks = rs.map(_._3.split(" ").length.toLong).sum
        val w = total.toDouble * (1.0 / bySrc.size) / srcToks
        val base = math.floor(w).toLong
        val nExtra = math.round((w - math.floor(w)) * rs.length)
        val copies = out.filter(_._1 == src).map(_._3)
        assert(copies.forall(c => c == base || c == base + 1),
          s"seed $seed $src: copies outside {floor(w), floor(w)+1}: ${copies.toSeq}")
        assert(copies.count(_ == base + 1) == nExtra,
          s"seed $seed $src: extra census ${copies.count(_ == base + 1)} != $nExtra")
      }
    }
  }

  test("curate over random corpora: one verdict per doc, first-failing-gate precedence") {
    (1 to 3).foreach { seed =>
      val docGen = for {
        kind <- Gen.choose(0, 9)
        nw <- Gen.choose(5, 120)
        ws <- Gen.listOfN(nw,
          Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox", "the", "of", "to", "42"))
      } yield kind match {
        case 0 => ws.mkString(" ") + " " + "x" * 30          // long-token policy trip
        case 1 => "111222333444555666777888 " + ws.take(4).mkString(" ") // digit-heavy
        case _ => ws.mkString(" ")
      }
      val texts = Gen.listOfN(60, docGen)
        .apply(Gen.Parameters.default, rng.Seed(seed.toLong)).get
      val all = texts ++ texts.take(10) // planted exact duplicates
      val d = java.nio.file.Files.createTempDirectory(s"graft-curate-prop$seed").toString
      all.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      val out = graft.operators.TextOps.curate(spark, d).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reason"),
            r.getAs[String]("split"))).toMap
      assert(out.size == all.length, s"seed $seed: one verdict per doc")
      // naive single-doc recompute of the gate chain, first failure wins
      val stop = Set("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")
      val keepId = all.zipWithIndex
        .groupBy(_._1.trim.toLowerCase.replaceAll("\\s+", " "))
        .map { case (k, vs) => k -> vs.map(_._2.toLong).min }
      all.zipWithIndex.foreach { case (t, i) =>
        val expected =
          if (keepId(t.trim.toLowerCase.replaceAll("\\s+", " ")) != i.toLong) "duplicate"
          else {
            val dr = if (t.nonEmpty) t.count(_.isDigit).toDouble / t.length else 0.0
            val toks = t.split("\\s+")
            if (!(dr < 0.3 && toks.map(_.length).max <= 25)) "policy"
            else {
              val q = math.min(toks.length / 100.0, 1.0) *
                (1.0 - t.split(" ").count(stop).toDouble / toks.length)
              if (q < 0.2) "quality" else null
            }
          }
        assert(out(i.toLong)._2 == expected,
          s"seed $seed doc $i: got ${out(i.toLong)._2}, want $expected")
        assert(out(i.toLong)._1 == (expected == null))
        assert((out(i.toLong)._3 != null) == (expected == null), "split iff kept")
      }
    }
  }

  test("curate split fractions on the sf corpus stay near the declared 80/10/10") {
    val rows = graft.operators.TextOps.curate(spark, sf).collect()
    val kept = rows.filter(_.getAs[Boolean]("keep")).map(_.getAs[String]("split"))
    assert(kept.length > 50, "enough survivors for a fraction check")
    val train = kept.count(_ == "train").toDouble / kept.length
    val valF = kept.count(_ == "val").toDouble / kept.length
    val test = kept.count(_ == "test").toDouble / kept.length
    assert(train > 0.70 && train < 0.90, s"train fraction $train")
    assert(valF > 0.03 && valF < 0.17, s"val fraction $valF")
    assert(test > 0.03 && test < 0.17, s"test fraction $test")
  }

  test("vocab equals the naive global row_number over random corpora and min counts") {
    import org.apache.spark.sql.expressions.Window
    (1 to 5).foreach { seed =>
      val docs = randomDocs(seed)
      val minCount = 1L + seed % 3
      val out = graft.operators.TextOps.vocabOf(docs, minCount)
      val naive = docs.select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)
        .withColumn("naive_id", row_number().over(
          Window.orderBy(col("n").desc, col("term"))).cast("long"))
        .select(col("term"), col("naive_id"))
      val joined = out.join(naive, "term")
      assert(joined.count() == naive.count())
      assert(joined.filter(col("vocab_id") =!= col("naive_id")).count() == 0,
        s"seed $seed minCount $minCount diverged")
    }
  }

  test("theta sketch invariants over random streams: canonical bytes, exact regime, monotone algebra, bounded error") {
    import graft.functions.ThetaSet
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val nDistinct = 10 + rnd.nextInt(4000)
      val k = Seq(64, 256, 1024, 1 << 14)(rnd.nextInt(4))
      val hashes = (1 to nDistinct)
        .map(i => scala.util.hashing.byteswap64(trial * 1000003L + i))
      // duplicates folded in must never change the sketch
      val stream = rnd.shuffle(hashes ++ hashes.take(nDistinct / 2))
      val s = new ThetaSet(k)
      stream.foreach(s.add)
      // 1) canonical bytes: any split/merge order is byte-equal
      val parts = stream.grouped(math.max(1, stream.length / 5)).toSeq
      val merged = new ThetaSet(k)
      rnd.shuffle(parts).foreach { p =>
        val part = new ThetaSet(k); p.foreach(part.add); merged.merge(part)
      }
      assert(java.util.Arrays.equals(s.serialize(), merged.serialize()),
        s"trial $trial k=$k non-canonical")
      // 2) exact regime iff under capacity
      if (nDistinct <= k) assert(s.estimate == nDistinct.toDouble)
      else {
        // 3) bounded error: 6 sigma of the published 1/sqrt(k-2) rse
        val err = math.abs(s.estimate - nDistinct) / nDistinct
        assert(err <= 6.0 / math.sqrt(k - 2.0),
          s"trial $trial k=$k n=$nDistinct est=${s.estimate} err=$err")
      }
      // 4) algebra vs an exact reference on two random subsets
      val setA = hashes.filter(_ => rnd.nextBoolean()).toSet
      val setB = hashes.filter(_ => rnd.nextBoolean()).toSet
      val (sa, sb) = (new ThetaSet(1 << 15), new ThetaSet(1 << 15))
      setA.foreach(sa.add); setB.foreach(sb.add)
      assert(ThetaSet.union(sa, sb).estimate == (setA ++ setB).size.toDouble)
      assert(ThetaSet.intersect(sa, sb).estimate == (setA & setB).size.toDouble)
      assert(ThetaSet.aNotB(sa, sb).estimate == (setA -- setB).size.toDouble)
      // 5) serialization round trip preserves bytes
      val rt = ThetaSet.deserialize(s.serialize())
      assert(java.util.Arrays.equals(rt.serialize(), s.serialize()))
    }
  }

  test("counting bloom invariants over random key sets: subtraction identity, membership, merge commutativity") {
    import graft.functions.{CountingBloom, CountingBloomBuf}
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val (m, k) = CountingBloom.geometry(2048, 0.01)
      val keysA = (1 to 500 + rnd.nextInt(1000))
        .map(i => scala.util.hashing.byteswap64(trial * 7919L + i))
      val keysB = (1 to 300 + rnd.nextInt(700))
        .map(i => scala.util.hashing.byteswap64(trial * 104729L + 500000 + i))
      def build(keys: Seq[Long]): CountingBloomBuf = {
        val b = new CountingBloomBuf(m, k); keys.foreach(b.add); b
      }
      // build(A ++ B) - build(B) == build(A), byte-for-byte, any order
      val ab = build(rnd.shuffle(keysA ++ keysB))
      ab.subtract(build(keysB))
      assert(java.util.Arrays.equals(ab.serialize(),
        build(keysA).serialize()), s"trial $trial subtraction identity")
      // no false negatives ever
      val a = build(keysA)
      assert(keysA.forall(a.contains), s"trial $trial false negative")
      // false-positive rate within ~4x the sized fpp on fresh keys
      val fresh = (1 to 2000).map(i =>
        scala.util.hashing.byteswap64(trial * 15485863L + 900000 + i))
      val fp = fresh.count(a.contains).toDouble / fresh.length
      assert(fp <= 0.04, s"trial $trial fp rate $fp")
      // merge commutes byte-for-byte
      val m1 = build(keysA); m1.merge(build(keysB))
      val m2 = build(keysB); m2.merge(build(keysA))
      assert(java.util.Arrays.equals(m1.serialize(), m2.serialize()))
    }
  }
}
