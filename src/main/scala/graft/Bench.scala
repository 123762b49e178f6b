package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Analytics

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is fully materialized
  * via count() after a shared session warm-up. */
object Bench {
  private val headline = Seq(
    "q1_pricing", "q3_shipping", "q5_local", "q_window_running", "q_topk_parts",
    "q17_small_qty",
    "ev_dedup_first", "ev_rate_limit", "ev_sessionize", "ev_enrich_join",
    "ev_asof_join", "ev_counts_salted",
    "doc_dedup_exact", "doc_dedup_minhash", "doc_dedup_simhash",
    "doc_token_count", "doc_quality", "doc_tfidf_top", "doc_sample",
    "emb_cosine_topk", "emb_neardup_pairs", "emb_ivf_topk",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
