package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Bench-only accessor: drain the async listener bus so per-query
  * metric snapshots (shuffle write bytes in graft.Bench) are exact
  * rather than racing event delivery. `listenerBus` is private[spark],
  * hence this one-method shim under org.apache.spark — same pattern and
  * justification as sql.graftbridge.Bridge; no Spark internals are
  * modified. */
object BenchBridge {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
