package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: how does the dedup pipeline behave at N× the largest
  * local testdata? Builds a synthetic corpus by unioning the sf
  * documents table `mult` times with doc_id offsets (each copy's ids
  * shifted into its own range, so every near-dup cluster recurs in
  * every copy AND cross-copy exact duplicates exist — a harder dedup
  * instance than the base table, with a known structure), writes it
  * as parquet, then times the three heaviest x-family stages:
  * candidate generation (x02's core), clustering (x20's core), and
  * the near-dup drop (x35's core step).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          tools/run.sh graft.tools.ScaleSmoke [mult]
  *
  * This is measurement tooling, not a correctness gate (the oracle
  * queries cover that at sf0.01) — it exists to answer "does the
  * shape hold when the input grows 10×" with a number instead of an
  * argument: candidate pairs grow ~linearly in copies (bucket joins,
  * not all-pairs), CC rounds stay O(log d), and nothing collects an
  * unbounded structure on the driver.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("scale-smoke", "32")
    val out = s"/tmp/graft_scale_smoke_x$mult"

    val base = graft.queries.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val nBase = base.count()
    // per-copy id stride derived from the MEASURED max id (ADVICE r7:
    // a fixed 10M stride silently collides once the base corpus holds
    // ids >= 10M, corrupting the known dedup structure being measured)
    val stride = base.agg(max("doc_id")).head().getLong(0) + 1L
    val big = (0 until mult).map { c =>
      base.select((col("doc_id") + lit(c.toLong * stride)).as("doc_id"),
        col("text"))
    }.reduce(_ union _)
    big.repartition(32).write.mode("overwrite").parquet(out)
    val docs = spark.read.parquet(out)
    println(s"corpus: ${docs.count()} docs ($mult x $nBase), written to $out")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cand = timed("minhash candidates") {
      val c = graft.llm.Dedup.minhashCandidates(docs, "text", "doc_id")
        .localCheckpoint(true)
      println(s"  pairs: ${c.count()}")
      c
    }
    timed("connected components") {
      val l = graft.llm.Dedup.connectedComponents(cand, "doc_a", "doc_b")
      println(s"  labeled nodes: ${l.count()}, " +
        s"clusters: ${l.select("label").distinct().count()}")
    }
    timed("drop near-duplicates") {
      println(s"  kept: ${graft.llm.Dedup.dropNearDuplicates(docs, "text", "doc_id").count()}")
    }
    spark.stop()
  }
}
