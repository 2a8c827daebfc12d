package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Tables.splitForCpu must repartition ONLY under-split input: the
  * one-split local parquet gets spread across cores (the cpu-bound
  * hashing pipelines would otherwise serialize), but a pre-split frame
  * passes through untouched — no exchange of the document payloads on
  * a cluster-scale input that already arrives well-partitioned
  * (VERDICT r3: an unconditional repartition is a gratuitous full
  * exchange there).
  */
class SplitForCpuSpec extends AnyFunSuite with SparkTestSession {

  test("single-split parquet scan is spread to defaultParallelism") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val split = Tables.splitForCpu(spark, docs, "doc_id")
    assert(split.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(split.queryExecution.analyzed.toString.toLowerCase.contains("repartition"))
  }

  test("pre-split input passes through with no added exchange") {
    val s = spark; import s.implicits._
    val pre = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val out = Tables.splitForCpu(s, pre, "doc_id")
    // the same DataFrame instance: splitForCpu added NOTHING
    assert(out eq pre)
  }

  test("x02 and x06 still produce rows through the conditional split") {
    assert(graft.SparkEntry.queries("x02_minhash_lsh")(spark, "/root/testdata/sf0.001").count() > 0)
    assert(graft.SparkEntry.queries("x06_lang_id")(spark, "/root/testdata/sf0.001").count() > 0)
  }
}
