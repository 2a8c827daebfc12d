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

  private val cached = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A PER-KEY directory built once per JVM: the first caller runs
    * `build` against a fresh dir, later callers get the same path with
    * the fixture already in place. For registry entries whose query is
    * a READ PATH over a derived layout (q69–q74's z-ordered /
    * partitioned / bucketed fixtures): the bench times each entry
    * several times, and rebuilding a fixture inside the timed query
    * overstates the read path it is named for by ~5× (VERDICT r10 ask
    * #7) — with the cache, iterations after the first measure the
    * probe. Keys must embed every input the fixture derives from
    * (the sf dir), so distinct inputs never share a fixture. Correct-
    * ness is unchanged: the build is deterministic, so first-run and
    * cached-run probes see byte-identical layouts.
    */
  def cachedDir(key: String)(build: String => Unit): String =
    cached.computeIfAbsent(key, _ => {
      val d = dir(key.replaceAll("[^A-Za-z0-9_.-]", "_").take(60))
      build(d)
      d
    })

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
