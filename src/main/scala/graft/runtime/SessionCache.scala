package graft.runtime

import org.apache.spark.sql.SparkSession

/** Session-keyed memo that evicts entries of STOPPED sessions on every
  * access. Session-scoped values (broadcasts, cached plans) must not
  * outlive their session: a long-lived multi-session process (the bench
  * harness alone builds ~9 sessions per run) would otherwise retain every
  * stopped session's broadcast value and cached DataFrames forever.
  */
final class SessionCache[V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[SparkSession, V]()

  def getOrUpdate(s: SparkSession)(f: SparkSession => V): V = {
    val it = m.keySet.iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    m.computeIfAbsent(s, k => f(k))
  }
}
