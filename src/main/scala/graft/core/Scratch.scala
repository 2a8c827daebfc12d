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

  private val memoized = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** A PER-KEY driver-side VALUE built once per JVM — [[cachedDir]]'s
    * twin for collected fixture rows (VERDICT r11 ask #8): every st*
    * registry entry derives its MemoryStream feed by collecting a
    * small deterministic projection of the batch tables, and the
    * bench re-paid that batch job on every iteration of every entry —
    * ~13 s of the sf0.1 streaming wall was fixture derivation, not
    * stream execution. Keys must embed the sf dir; the computed rows
    * are deterministic per key, so first-run and cached-run streams
    * feed byte-identical data (answers unchanged — Verify's first run
    * still exercises the full derivation).
    */
  def cachedValue[T <: AnyRef](key: String)(compute: => T): T =
    memoized.computeIfAbsent(key, _ => compute).asInstanceOf[T]

  /** [[cachedValue]] for a DRIVER-SIZED DataFrame fixture: the first
    * call computes and collects it (schema + rows), later calls
    * rebuild a local relation from the memo — no recomputation, no
    * session coupling (collected rows are plain JVM data). Only for
    * frames bounded by construction (sketch relations, exact-count
    * comparison frames); the rebuilt frame plans as a LocalRelation.
    */
  def cachedFrame(spark: org.apache.spark.sql.SparkSession, key: String)(
      compute: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val (schema, rows) = cachedValue(key) {
      val df = compute
      (df.schema, df.collect().toSeq)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

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
