package graft.core

import java.nio.file.{Files, Path}

/**
 * Per-JVM scratch space for gate queries and specs that stage data on
 * local disk (TSV/CSV/JSON round-trips, file-source streams, date
 * partitions, checkpoints). Every scratch dir lives under ONE per-JVM
 * root that a shutdown hook removes — bare `Files.createTempDirectory`
 * call sites had accumulated ~650 orphaned /tmp dirs across bench and
 * verify runs, a copy of staged fixture data per invocation.
 *
 * Within a JVM, repeated calls still get fresh dirs (an invocation must
 * never read a previous pass's files); the bound is the run, not the
 * call.
 */
object TempDirs {

  private lazy val root: Path = {
    val d = Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(d)))
    d
  }

  /** A fresh scratch directory under the per-JVM root, as a path string
    * (what write APIs take). */
  def scratch(prefix: String): String = scratchPath(prefix).toString

  /** A fresh scratch directory under the per-JVM root. */
  def scratchPath(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Best-effort recursive delete (depth-first); used by the exit hook
    * and by call sites that can free their staging early. */
  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    // Files.walk holds a directory-stream fd until closed — per-query
    // cleanups in a long bench run would otherwise accumulate them
    try {
      val st = Files.walk(p)
      try st.iterator().asScala.toSeq.reverse.foreach(q => Files.deleteIfExists(q))
      finally st.close()
    } catch { case _: Exception => }
  }
}
