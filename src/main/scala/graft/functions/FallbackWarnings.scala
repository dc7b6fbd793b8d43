package graft.functions

/** One-time (per JVM, per site) WARN logging for the no-extension
  * fallback branches. The fallbacks are value-identical by spec-pinned
  * contract, but they are SILENT slow paths — a session that forgot
  * `SparkSession.builder.withExtensions(GraftFunctions.register)` pays
  * the full shingle shuffle (batch) or the interpreted-HOF chain
  * (stream) with nothing in the logs to say why (VERDICT r11 item 6).
  * One line once, not per-call: the branches sit inside per-batch
  * query construction and must not spam structured-streaming restarts.
  */
object FallbackWarnings extends org.apache.spark.internal.Logging {
  private val fired = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Log `msg` at WARN the first time `key` fires in this JVM; no-op
    * afterwards. Returns whether this call logged.
    */
  def warnOnce(key: String, msg: String): Boolean =
    if (fired.add(key)) { logWarning(msg); true } else false

  /** Visible for specs: has `key` fired in this JVM? */
  private[graft] def hasFired(key: String): Boolean = fired.contains(key)
}
