package org.apache.spark.sql.execution.streaming.state

/** `StateStore.unloadAll` is `private[state]`; this bridge (compiled
  * into the owning package, same pattern as GraftRegistryBridge)
  * exposes exactly one capability: eagerly unloading the loaded state
  * store providers after a finite replayed stream terminates, instead
  * of waiting for the 60 s maintenance cycle. Nothing else leaks
  * through.
  */
object GraftStateBridge {
  def unloadAll(): Unit = StateStore.unloadAll()
}
