package graft.core

import java.nio.file.{Files, Path, Paths}

/** Scratch directories for queries that persist intermediate parquet
  * (the q55/q56/q59/st23 sketch-partial lifecycle). All scratch lives
  * under ONE per-JVM root that a shutdown hook deletes recursively —
  * repeated gate/bench runs no longer accumulate partials in /tmp
  * (ADVICE r8: st23's append-only index grew across runs).
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the JVM-lifetime scratch root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRecursively(c))
      finally s.close()
    }
    try Files.deleteIfExists(p)
    catch { case _: java.io.IOException => () } // best-effort at JVM exit
  }
}
