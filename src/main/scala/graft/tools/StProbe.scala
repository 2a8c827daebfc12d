package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: where does a streaming entry's fixed harness cost go?
  * Times the lifecycle phases of a minimal stateful MemoryStream query
  * (start / feed+processAllAvailable / stop) across repetitions in one
  * warm session — the decomposition behind VERDICT r11 ask #8.
  */
object StProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("st-probe", "8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ms[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e6)
    }

    // how much of a feed is DRIVER-SIDE ENCODING? addData serializes
    // every element through the encoder before the engine sees it
    val big = (1 to 100000).map(i => (i.toLong % 97, i.toLong)).toSeq
    (1 to 3).foreach { rep =>
      val in0 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val (_, tAdd) = ms { in0.addData(big) }
      println(f"rep $rep: addData(100k tuples) alone = $tAdd%.0f ms")
    }

    if (args.contains("--fastpoll"))
      spark.conf.set("spark.sql.streaming.pollingDelay", "1ms")

    (1 to 6).foreach { rep =>
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val agg = in.toDF().toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s"))
      val (q, tStart) = ms {
        agg.writeStream.format("memory").queryName(s"probe_$rep")
          .outputMode("complete").start()
      }
      val (_, tFeed1) = ms { in.addData((1L, 1L)); q.processAllAvailable() }
      val (_, tFeed2) = ms { in.addData((2L, 1L)); q.processAllAvailable() }
      val (_, tFeed3) = ms { in.addData((3L, 1L)); q.processAllAvailable() }
      val (_, tStop) = ms { q.stop() }
      val (_, tDrop) = ms { spark.sql(s"DROP TABLE IF EXISTS probe_$rep") }
      val exec = q.recentProgress.map(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)).sum
      val batches = q.recentProgress.length
      println(f"rep $rep: start=$tStart%.0f feed1=$tFeed1%.0f feed2=$tFeed2%.0f " +
        f"feed3=$tFeed3%.0f stop=$tStop%.0f drop=$tDrop%.0f ms " +
        f"| $batches batches, triggerExecution sum=$exec ms")
    }
    spark.stop()
  }
}
