package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** Optimization-round measurement harness (guide §1): for each named
  * query, one warm run, then a timed run with a job/stage/task counter
  * attached — fixed per-job overhead is the dominant cost at the local
  * bench's data sizes, so the JOB COUNT is the first thing to read —
  * plus the formatted physical plan written to a file for the
  * before/after evidence trail.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.Probe \
  *     [--plans plans/r16 --suffix _before] <query ...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    var plansDir: Option[String] = None
    var suffix = ""
    val confs = scala.collection.mutable.ArrayBuffer.empty[String]
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--suffix" => suffix = args(i + 1); i += 2
        case "--conf" => confs += args(i + 1); i += 2
        case n => names += n; i += 1
      }
    }
    val spark = graft.core.GraftSession.local("probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // surface the operators' own INFO diagnostics (CC path + rounds)
    org.apache.logging.log4j.core.config.Configurator.setLevel("graft",
      org.apache.logging.log4j.Level.INFO)
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val trace = sys.env.contains("PROBE_TRACE_JOBS")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val t00 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          println(f"JOB ${(System.nanoTime() - t00) / 1e9}%8.2f $d")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
      }
    })

    val all = graft.SparkEntry.queries ++ graft.queries.ReferenceQueries.benchOnly
    names.foreach { name =>
      val fn = all(name)
      fn(spark, sfDir).count() // warm (codegen, fixture caches)
      spark.catalog.clearCache()
      jobs.set(0); stages.set(0); tasks.set(0)
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener delivery is async — settle before reading counters
      Thread.sleep(300)
      println(f"$name%-36s rows=$n%-7d secs=$secs%7.2f " +
        s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      spark.sparkContext.setJobDescription(null)
      plansDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/$name$suffix.txt"), plan)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
