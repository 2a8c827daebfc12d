package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class DdSketchSpec extends AnyFunSuite with SparkTestSession {

  private val Gamma = 1.04

  test("merged partials are bit-identical to the single-pass sketch") {
    val s = spark; import s.implicits._
    val df = (1L to 5000L).map(v => (s"k${v % 3}", v % 7, v)).toDF("k", "part", "v")
    val merged = DdSketch.merge(
        DdSketch.sketch(df, Seq("k", "part"), "v", Gamma), Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = DdSketch.sketch(df, Seq("k"), "v", Gamma)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === direct)
  }

  test("identity-relation walk returns exact discrete quantiles") {
    val s = spark; import s.implicits._
    // 1..100 once each: rank ceil(q*100) = the value itself
    val idty = (1L to 100L).map(v => ("a", v)).toDF("k", "bucket")
      .groupBy("k", "bucket").agg(count(lit(1)).as("cnt"))
    val got = DdSketch.quantiles(idty, Seq("k"), Seq(500000L, 950000L, 990000L))
      .orderBy("qe6").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    assert(got === Seq((500000L, 50L), (950000L, 95L), (990000L, 99L)))
  }

  test("sketch estimate stays within alpha of every discrete quantile") {
    val s = spark; import s.implicits._
    // adversarial: value 1 (bucket 0 boundary), all-equal group,
    // single-element group, long-tailed group
    val rows = (1L to 2000L).map(v => ("tail", v * v)) ++
      Seq.fill(50)(("equal", 77L)) ++ Seq(("one", 12345L)) ++
      (1L to 9L).map(_ => ("unit", 1L))
    val df = rows.toDF("k", "v")
    val qs = Seq(500000L, 950000L, 990000L)
    val est = DdSketch.quantiles(DdSketch.sketch(df, Seq("k"), "v", Gamma),
        Seq("k"), qs)
      .select(col("k"), col("qe6"), DdSketch.bucketValue(col("bucket"), Gamma).as("est"))
    val exact = DdSketch.quantiles(
        df.groupBy(col("k"), col("v").as("bucket")).agg(count(lit(1)).as("cnt")),
        Seq("k"), qs)
      .select(col("k"), col("qe6"), col("bucket").as("exact"))
    val alpha = (Gamma - 1) / (Gamma + 1)
    est.join(exact, Seq("k", "qe6")).collect().foreach { r =>
      val e = r.getDouble(2); val x = r.getLong(3).toDouble
      assert(math.abs(e - x) <= x * (alpha + 1e-9),
        s"k=${r.getString(0)} q=${r.getLong(1)}: est=$e exact=$x")
    }
  }

  test("sketch row count is bucket-bounded regardless of input size") {
    val s = spark; import s.implicits._
    val df = (1L to 50000L).map(v => ("k", v)).toDF("k", "v")
    val nBuckets = DdSketch.sketch(df, Seq("k"), "v", Gamma).count()
    val bound = math.ceil(math.log(50000.0) / math.log(Gamma)).toLong + 2
    assert(nBuckets <= bound, s"$nBuckets buckets > bound $bound")
  }
}
