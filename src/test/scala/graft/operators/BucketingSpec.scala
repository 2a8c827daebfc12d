package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Bucketed co-located joins (builder brief "partitioning & shuffle"):
  * both sides pre-bucketed on the join key join WITHOUT a shuffle —
  * at 100 TB this converts the dominant fact-fact exchange into a
  * local per-bucket merge. Asserted on the physical plan, not just
  * the answer.
  */
class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("join of two tables bucketed on the key runs without an exchange") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("buckets")
    val left = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i % 5)).toDF("k", "rv")

    left.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/left").saveAsTable("bkt_left")
    right.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/right").saveAsTable("bkt_right")
    try {
      // hint("merge") pins SortMergeJoin in both cases so the only
      // difference is who provides the hash distribution
      val joined = s.table("bkt_left").hint("merge")
        .join(s.table("bkt_right"), "k")
      assert(joined.count() === 1000L)

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle; plan:\n$plan")

      // control: the same merge join over unbucketed frames shuffles
      val unbucketed = left.hint("merge").join(right, "k")
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      s.sql("DROP TABLE IF EXISTS bkt_left")
      s.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("one file per bucket + sortBy skips the merge join's sorts too") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("buckets_sorted")
    val left = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i % 5)).toDF("k", "rv")
    // repartition by the key into numBuckets partitions uses the SAME
    // hash the bucketizer does, so each task holds exactly one bucket
    // and writes exactly one file — the precondition for Spark to
    // trust the on-disk sortBy order and elide SortExec entirely
    left.repartition(8, col("k")).write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/left").saveAsTable("bkt_sl")
    right.repartition(8, col("k")).write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/right").saveAsTable("bkt_sr")
    // Spark 3 stopped TRUSTING on-disk bucket order by default
    // (SPARK-28632: multiple files per bucket would break it); the
    // legacy flag re-enables the sorted-scan claim, which Spark then
    // honors ONLY when every bucket is one file — the layout above.
    // Plan + count run EAGERLY inside the conf scope (a lazily-run
    // plan would compile after the conf is restored).
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val old = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val joined = s.table("bkt_sl").hint("merge")
        .join(s.table("bkt_sr"), "k")
      assert(joined.count() === 1000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"merge hint ignored:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(!plan.contains("Sort ["),
        s"sorted one-file-per-bucket sides should not re-sort — at " +
          s"100 TB this is the whole sort phase of a fact-fact SMJ:\n$plan")
    } finally {
      old match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
      s.sql("DROP TABLE IF EXISTS bkt_sl")
      s.sql("DROP TABLE IF EXISTS bkt_sr")
    }
  }
}
