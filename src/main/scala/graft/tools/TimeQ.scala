package graft.tools

/** Dev harness: warm + time individual queries at SPARK_GRAFT_SF_DIR. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("timeq", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val fn = (graft.SparkEntry.queries ++ graft.queries.ReferenceQueries.benchOnly)(name)
      fn(spark, sfDir).count() // warm
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(s"$name rows=$n secs=${(System.nanoTime() - t0) / 1e9}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
