package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import graft.SparkTestSession

/** Operators that materialize intermediate frames must not leak
  * CacheManager entries (VERDICT r4 ask #3): a `.cache()` inside an
  * operator that returns a lazy DataFrame has no after-the-action
  * unpersist hook, so every invocation leaked one pinned cache entry
  * for the life of the session — a real-deployment memory leak that
  * Bench masked with clearCache(). The operators now use eager
  * localCheckpoint (ContextCleaner-owned blocks, freed on GC); this
  * spec pins the manager staying empty across repeated calls.
  */
class CacheHygieneSpec extends AnyFunSuite with SparkTestSession {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "aa bb cc dd ee ff gg ii"),
      (3L, "zz yy xx ww vv uu tt ss"),
      (4L, "aa bb cc dd ee ff gg hh")
    ).toDF("doc_id", "text")
  }

  test("repeated minhashCandidates calls leave the CacheManager empty") {
    spark.catalog.clearCache() // isolate from other suites
    assert(GraftSqlBridge.cacheManagerIsEmpty(spark))
    (1 to 3).foreach { _ =>
      Dedup.minhashCandidates(docs, "text", "doc_id").count()
      assert(GraftSqlBridge.cacheManagerIsEmpty(spark),
        "minhashCandidates must not pin CacheManager entries")
    }
  }

  test("repeated tokenJaccardPairs calls leave the CacheManager empty") {
    spark.catalog.clearCache()
    (1 to 3).foreach { _ =>
      Dedup.tokenJaccardPairs(docs, "text", "doc_id",
        probeFilter = col("doc_id") === 1L, minJaccardE6 = 100000L).count()
      assert(GraftSqlBridge.cacheManagerIsEmpty(spark),
        "tokenJaccardPairs must not pin CacheManager entries")
    }
  }

  test("dropNearDuplicates (candidates + components) stays cache-clean") {
    spark.catalog.clearCache()
    val kept = Dedup.dropNearDuplicates(docs, "text", "doc_id")
    assert(kept.count() >= 2) // 1 and 4 are near-identical; one survives
    assert(GraftSqlBridge.cacheManagerIsEmpty(spark))
  }

  test("the winnowing family (pairs + containment) stays cache-clean") {
    spark.catalog.clearCache()
    (1 to 3).foreach { _ =>
      Dedup.winnowingPairs(docs, "text", "doc_id", minShared = 1L).count()
      Dedup.winnowingContainment(docs, "text", "doc_id", minContE6 = 0L).count()
      assert(GraftSqlBridge.cacheManagerIsEmpty(spark),
        "winnowing operators must not pin CacheManager entries")
    }
  }
}
