package graft.streaming

/** Named process-local key-value stores — the Redis `SET key value` target
  * of the reference's consumer (auto_kafka_redis.py: `SET event:{id}` and
  * per-user latest-value keys), as a test/demo stand-in.
  *
  * Sinks reference stores BY NAME and resolve them on the executor inside
  * `foreachPartition`, never by capturing a client in the closure: a
  * closure-captured connection (or map) would be serialized per task and
  * the driver's copy would never see executor writes. In local mode the
  * registry IS the shared map; a cluster deployment swaps `mapFor` for a
  * factory that opens one real client per executor/partition. */
object StoreRegistry {
  private val maps =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[Long, Double]]()

  /** The named store, created on first use (idempotent, thread-safe). */
  def mapFor(name: String): java.util.concurrent.ConcurrentHashMap[Long, Double] =
    maps.computeIfAbsent(name, _ => new java.util.concurrent.ConcurrentHashMap[Long, Double]())

  /** Drop a named store (test isolation). */
  def clear(name: String): Unit = maps.remove(name)
}
