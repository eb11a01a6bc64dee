// Same org.apache.spark.sql subpackage convention as
// SkippingScanBuilder.scala / GraftFanoutCommitProtocol.scala: the
// StateStore companion is `private[sql]` by package convention, and
// unloading finished replays' providers is only reachable from inside
// that package. This object holds NO logic beyond the forwarder.
package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Unload every streaming state-store provider currently loaded in this
  * JVM (local mode: the driver doubles as the executor, so providers —
  * and the recent state versions they pin as in-memory UnsafeRow maps —
  * live here). Spark's maintenance thread does this on its own ~60 s
  * cadence once the coordinator reports a query inactive; a harness that
  * runs many short bounded replays back-to-back wants it NOW, between
  * replays. Safe by construction: a provider that is still needed is
  * simply reloaded from its checkpoint on next access. */
object StateHygiene {
  def unloadAllStateStores(): Unit = StateStore.unloadAll()
}
