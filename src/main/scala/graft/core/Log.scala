package graft.core

/**
 * dmsg/verbosity shim (reference: utils.py:83-253 trace/debug/info/warn
 * with `*_once` dedup; `extend_inherit_message` breadcrumbs threaded
 * through every method, utils.py:684-702). Driver-side logging only —
 * never on the data path.
 */
object Log {
  @volatile var level: Int = 2 // 0=trace 1=debug 2=info 3=warn 4=off
  private val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def trace(msg: => String): Unit = if (level <= 0) println(s"[trace] $msg")
  def debug(msg: => String): Unit = if (level <= 1) println(s"[debug] $msg")
  def info(msg: => String): Unit = if (level <= 2) println(s"[info] $msg")
  def warn(msg: => String): Unit = if (level <= 3) System.err.println(s"[warn] $msg")

  /** warn_once dedup (utils.py:199-213). */
  def warnOnce(msg: String): Unit = if (seen.add(msg)) warn(msg)

  /** Breadcrumb composition (extend_inherit_message). */
  def extend(inherited: String, msg: String): String =
    if (inherited.isEmpty) msg else s"$inherited: $msg"
}
