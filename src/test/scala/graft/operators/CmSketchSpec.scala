package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** [[CmSketch]]: the counter relation must be a pure function of the
  * key multiset (partitioning-invariant), point estimates and the
  * join-size inner product must never underestimate (the one-sided CM
  * guarantee — collisions only add), and counters must be exactly
  * linear under input duplication (the merge IS addition).
  */
class CmSketchSpec extends AnyFunSuite with SparkTestSession {

  // small width so collisions actually occur and the >= bound is
  // non-trivially exercised
  private val W = 64L
  private val D = 4

  /** Skewed keys: key k appears k times, k = 1..40 (820 rows). */
  private def skewed = {
    val s = spark
    import s.implicits._
    (1 to 40).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
  }

  test("sketch is partitioning- and order-invariant") {
    val a = CmSketch.sketch(skewed.repartition(1), col("k"), "cnt", D, W)
      .orderBy("d", "w").collect().toSeq
    val b = CmSketch.sketch(skewed.orderBy(rand(7)).repartition(16),
        col("k"), "cnt", D, W)
      .orderBy("d", "w").collect().toSeq
    assert(a == b)
  }

  test("point estimates never underestimate any key's true frequency") {
    val sk = CmSketch.sketch(skewed, col("k"), "cnt", D, W)
    // probe relation: every key with its (d, w) buckets and true freq
    val probes = skewed.groupBy("k").agg(count(lit(1)).as("freq"))
      .select(col("k"), col("freq"), CmSketch.buckets(col("k"), D, W).as("b"))
      .select(col("k"), col("freq"), col("b.d").as("d"), col("b.w").as("w"))
    val est = probes.join(sk, Seq("d", "w"))
      .groupBy("k", "freq").agg(min("cnt").as("est"))
    assert(est.filter(col("est") < col("freq")).count() == 0)
    // and with W=64 over 40 keys, at least one estimate must actually
    // exceed its true frequency — otherwise the bound test is vacuous
    assert(est.filter(col("est") > col("freq")).count() > 0)
  }

  test("join-size inner product upper-bounds the true join size") {
    val s = spark
    import s.implicits._
    val left = skewed
    val right = (1 to 60).map(_.toLong).toDF("k") // keys 41..60 unmatched
    val inner = CmSketch.innerProducts(
      CmSketch.sketch(left, col("k"), "cnt_a", D, W),
      CmSketch.sketch(right, col("k"), "cnt_b", D, W))
    val est = inner.agg(min("inner_e")).head().getLong(0)
    val exact = left.join(right, "k").count()
    assert(exact == (1 to 40).map(_.toLong).sum)
    assert(est >= exact, s"CM estimate $est under exact $exact")
  }

  test("counters are exactly linear under input duplication") {
    val once = CmSketch.sketch(skewed, col("k"), "cnt", D, W)
    val thrice = CmSketch.sketch(
      skewed.union(skewed).union(skewed), col("k"), "cnt3", D, W)
    val mismatches = once.join(thrice, Seq("d", "w"), "full")
      .filter(coalesce(col("cnt"), lit(0L)) * 3 =!=
        coalesce(col("cnt3"), lit(0L)))
      .count()
    assert(mismatches == 0)
  }
}
