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
}
