package graft.streaming

/** Declarative pipeline configuration mirroring the reference's config.yaml
  * surface (auto_kafka_redis.py:43-53: topic/brokers, dedup TTL, rate-limit
  * count + window, alert threshold, dashboard window).
  *
  * Durations that map to Spark watermarks/windows are kept as Spark
  * interval strings; the rate-limit window is millis because it feeds the
  * stateful processor directly. */
final case class PipelineConfig(
    brokers: String = "localhost:9092",
    topics: Seq[String] = Seq("events"),
    startingOffsets: String = "latest",
    dedupTtl: String = "10 minutes",
    rateLimitCount: Int = 5,
    rateLimitWindowMs: Long = 60L * 60 * 1000,
    alertThreshold: Double = 150.0,
    windowDuration: String = "1 hour")

object PipelineConfig {

  /** Parse the flat `key: value` YAML subset the reference uses (comments,
    * blank lines, a `[a, b]` or comma list for topics). Unknown keys are
    * ignored so configs can carry producer-side settings too. */
  def fromYaml(text: String): PipelineConfig = {
    val kv = text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val i = l.indexOf(':')
        l.take(i).trim -> l.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
      }
      .toMap
    def topics(v: String): Seq[String] =
      v.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
    var c = PipelineConfig()
    kv.get("brokers").orElse(kv.get("bootstrap_servers")).foreach(v => c = c.copy(brokers = v))
    kv.get("topics").orElse(kv.get("topic")).foreach(v => c = c.copy(topics = topics(v)))
    kv.get("starting_offsets").foreach(v => c = c.copy(startingOffsets = v))
    kv.get("dedup_ttl").foreach(v => c = c.copy(dedupTtl = v))
    kv.get("rate_limit_count").foreach(v => c = c.copy(rateLimitCount = v.toInt))
    kv.get("rate_limit_window_ms").foreach(v => c = c.copy(rateLimitWindowMs = v.toLong))
    kv.get("alert_threshold").foreach(v => c = c.copy(alertThreshold = v.toDouble))
    kv.get("window_duration").foreach(v => c = c.copy(windowDuration = v))
    c
  }
}
