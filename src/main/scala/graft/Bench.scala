package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is fully materialized
  * via count() after a shared session warm-up. The same line is also written
  * to BENCH_LAST.json so the result survives log truncation.
  *
  * Failed queries are reported as null (never as their short elapsed time)
  * and excluded from the total, with an "errors" list naming them. */
object Bench {
  private val headline = Seq(
    "q1_pricing", "q3_shipping", "q5_local", "q_window_running", "q_topk_parts",
    "q17_small_qty", "q7_volume_shipping", "q13_custdist",
    "ev_dedup_first", "ev_rate_limit", "ev_sessionize", "ev_enrich_join",
    "ev_asof_join", "ev_counts_salted", "ev_quantiles_exact", "ev_bloom_join", "ev_hll_rollup",
    "doc_dedup_exact", "doc_dedup_minhash", "doc_dedup_simhash",
    "doc_ngram_jaccard",
    "doc_token_count", "doc_quality", "doc_tfidf_top", "doc_sample",
    "doc_entropy",
    "emb_cosine_topk", "emb_neardup_pairs", "emb_ivf_topk", "emb_lsh_pairs",
  )

  /** Streaming throughput: the reference topology (dedup → stateful per-user
    * rate limit → admitted filter) over the staged events table as a bounded
    * file-source stream; reports end-to-end rows/sec and per-batch latency
    * from the progress metrics. */
  private def streamingBench(spark: SparkSession, sfDir: String): String = {
    import spark.implicits._
    import graft.streaming.EventPipeline
    val stage = Files.createTempDirectory("graft-stream-bench").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val nRows = ev.count()
    // 8 staged files × maxFilesPerTrigger=1 → 8 micro-batches, so the
    // duration metrics reflect per-trigger latency, not one giant batch
    ev.repartition(8).write.mode("overwrite").parquet(stage)
    val in = spark.readStream.schema(EventPipeline.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val limited = EventPipeline
      .rateLimited(EventPipeline.deduped(in, "2 hours").as[EventPipeline.Event], limit = 1000)
      .filter(_.admitted)
    val name = s"bench_stream_${System.nanoTime()}"
    val t0 = System.nanoTime()
    val q = limited.toDF().writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.toSeq
    val trigMs = progress.flatMap(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toLong))
      .filter(_ > 0).sorted
    // state-store footprint across the dedup + rate-limit operators
    val stateRows = progress.lastOption.toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    q.stop()
    val outRows = spark.table(name).count()
    val rps = if (wallSec > 0) nRows / wallSec else 0.0
    val p50 = if (trigMs.nonEmpty) trigMs(trigMs.length / 2) else 0L
    val maxTrig = if (trigMs.nonEmpty) trigMs.max else 0L
    f"""{"input_rows":$nRows,"output_rows":$outRows,"wall_sec":$wallSec%.3f,"rows_per_sec":$rps%.0f,"n_batches":${trigMs.length},"p50_batch_ms":$p50,"max_batch_ms":$maxTrig,"state_rows":$stateRows}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // GraftSession: AQE + shuffle partitions = cores + graft extensions
    // (AutoBarrierExplode etc.) — benches the session a user would run.
    val spark = GraftSession.local(cpus, Map("spark.driver.maxResultSize" -> "4g"))

    // JVM + whole-stage-codegen warm-up per query shape on the smallest SF
    // (not timed): measures steady-state throughput, not Janino compilation.
    headline.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try { fn(spark, "/root/testdata/sf0.001").count() }
        catch { case _: Throwable => }
      }
      spark.catalog.clearCache()
    }

    // timed reps per query, min taken: steady-state throughput robust to
    // host-noise spikes (cache cleared between reps — no result reuse).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results: Seq[(String, Option[Double])] = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
        }
        // a query only counts as timed if every rep succeeded
        name -> (if (times.forall(_.isDefined)) Some(times.flatten.min) else None)
      }
    }
    val streaming =
      try streamingBench(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] streaming failed: ${e.getMessage}")
        "null"
      }
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + f"""\":$v%.3f"""
      case (k, None)    => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"streaming":$streaming,"sf":"$sfDir"}"""
    println(line)
    try Files.writeString(Paths.get("BENCH_LAST.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
