package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.operators.{CmSketch, DdSketch}

/** The SQL-registered sketch algebra (SketchSqlFunctions, injected via
  * GraftExtensions) must agree EXACTLY with the Scala Column API it
  * delegates to — one implementation, two surfaces. q61 additionally
  * puts the SQL theta matrix under the cross-engine oracle.
  */
class SketchSqlSpec extends AnyFunSuite with SparkTestSession {

  private val K = 64

  test("SQL kmv_sketch/kmv_estimate equal the Scala aggregator and estimator") {
    val s = spark
    import s.implicits._
    (0 until 5000).map(i => (i % 7, i.toLong)).toDF("g", "key")
      .createOrReplaceTempView("sq_keys")
    val viaSql = s.sql(
      s"""SELECT g, kmv_sketch(hash63(key), $K) AS sk FROM sq_keys GROUP BY g""")
    val kmv = udaf(new KmvSketchAggregator(K))
    val viaScala = s.table("sq_keys")
      .select(col("g"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("sk"))
    val a = viaSql.orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
    val b = viaScala.orderBy("g").collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
    assert(a.toSeq == b.toSeq)

    val estSql = s.sql(
      s"""SELECT g, kmv_estimate(kmv_sketch(hash63(key), $K), $K) AS est
         |FROM sq_keys GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(_.getDouble(1))
    val estScala = viaScala
      .select(col("g"), KmvSketch.estimate(col("sk"), K).as("est"))
      .orderBy("g").collect().map(_.getDouble(1))
    assert(estSql.toSeq == estScala.toSeq)
  }

  test("SQL kmv_merge over stored partials equals the one-shot SQL sketch") {
    val s = spark
    import s.implicits._
    (0 until 3000).map(i => (i % 11, i.toLong)).toDF("p", "key")
      .createOrReplaceTempView("sq_parts")
    val merged = s.sql(
      s"""WITH partial AS (
         |  SELECT p, kmv_sketch(hash63(key), $K) AS sk FROM sq_parts GROUP BY p)
         |SELECT kmv_merge(sk, $K) AS sk FROM partial""".stripMargin)
      .head().getSeq[Long](0)
    val oneShot = s.sql(
      s"""SELECT kmv_sketch(hash63(key), $K) AS sk FROM sq_parts""")
      .head().getSeq[Long](0)
    assert(merged.toSeq == oneShot.toSeq)
  }

  test("SQL set-op estimators equal the Scala column forms") {
    val s = spark
    import s.implicits._
    // A = 0..1999, B = 1000..3999 → |A∩B| = 1000, |A∪B| = 4000
    val rows = (0 until 2000).map(("a", _)) ++ (1000 until 4000).map(("b", _))
    rows.map { case (g, k) => (g, k.toLong) }.toDF("g", "key")
      .createOrReplaceTempView("sq_ab")
    val sqlRow = s.sql(
      s"""WITH sk AS (SELECT g, kmv_sketch(hash63(key), $K) AS sk FROM sq_ab GROUP BY g),
         |p AS (SELECT (SELECT sk FROM sk WHERE g = 'a') AS ska,
         |             (SELECT sk FROM sk WHERE g = 'b') AS skb)
         |SELECT kmv_intersect(ska, skb, $K) AS ei,
         |       kmv_union_estimate(ska, skb, $K) AS eu,
         |       kmv_except(ska, skb, $K) AS ed
         |FROM p""".stripMargin).head()
    val kmv = udaf(new KmvSketchAggregator(K))
    val scalaRow = s.table("sq_ab")
      .select(col("g"), KmvSketch.hash63(col("key")).as("h"))
      .groupBy("g").agg(kmv(col("h")).as("sk"))
      .groupBy().pivot("g", Seq("a", "b")).agg(first("sk"))
      .select(
        KmvSketch.intersectEstimate(col("a"), col("b"), K).as("ei"),
        KmvSketch.unionEstimate(col("a"), col("b"), K).as("eu"),
        KmvSketch.exceptEstimate(col("a"), col("b"), K).as("ed"))
      .head()
    assert(sqlRow.getDouble(0) == scalaRow.getDouble(0))
    assert(sqlRow.getDouble(1) == scalaRow.getDouble(1))
    assert(sqlRow.getDouble(2) == scalaRow.getDouble(2))
  }

  test("SQL dd_bucket / dd_bucket_value / cm_bucket equal the Scala operators") {
    val s = spark
    import s.implicits._
    (1 until 500).map(i => (i.toLong * 7 % 4003 + 1, i.toLong)).toDF("v", "key")
      .createOrReplaceTempView("sq_vals")
    val sqlDf = s.sql(
      """SELECT v, key,
        |       dd_bucket(v, 1.04D) AS b,
        |       dd_bucket_value(dd_bucket(v, 1.04D), 1.04D) AS bv,
        |       cm_bucket(key, CAST(1 AS BIGINT), 65536) AS cmw
        |FROM sq_vals ORDER BY key""".stripMargin).collect()
    val scalaDf = s.table("sq_vals")
      .select(col("v"), col("key"),
        DdSketch.bucketIdx(col("v"), 1.04).as("b"),
        DdSketch.bucketValue(DdSketch.bucketIdx(col("v"), 1.04), 1.04).as("bv"),
        CmSketch.buckets(col("key"), depths = 2).as("bk"))
      .filter(col("bk.d") === 1L)
      .select(col("v"), col("key"), col("b"), col("bv"), col("bk.w").as("cmw"))
      .orderBy("key").collect()
    assert(sqlDf.length == scalaDf.length)
    sqlDf.zip(scalaDf).foreach { case (x, y) =>
      assert(x.getLong(2) == y.getLong(2), s"dd_bucket at key ${x.getLong(1)}")
      assert(x.getDouble(3) == y.getDouble(3), s"dd_bucket_value at key ${x.getLong(1)}")
      assert(x.getLong(4) == y.getLong(4), s"cm_bucket at key ${x.getLong(1)}")
    }
  }

  test("SQL cm_buckets equals the Scala bucketsArray, depth by depth") {
    val s = spark
    import s.implicits._
    (1 until 300).map(_.toLong).toDF("key").createOrReplaceTempView("sq_cmb")
    val sqlRows = s.sql(
      """SELECT key, b.d AS d, b.w AS w
        |FROM (SELECT key, explode(cm_buckets(key, 65536L)) AS b FROM sq_cmb)
        |ORDER BY key, d""".stripMargin).collect()
    val scalaRows = s.table("sq_cmb")
      .select(col("key"), CmSketch.buckets(col("key")).as("b"))
      .select(col("key"), col("b.d").as("d"), col("b.w").as("w"))
      .orderBy("key", "d").collect()
    assert(sqlRows.length == scalaRows.length && sqlRows.length == 299 * 4)
    sqlRows.zip(scalaRows).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1) &&
        x.getLong(2) == y.getLong(2), s"mismatch at key ${x.getLong(0)} d ${x.getLong(1)}")
    }
  }

  test("gamma accepts plain decimal literals (SQL decimals fold to double)") {
    val b = spark.sql("SELECT dd_bucket(100, 1.04) AS b").head().getLong(0)
    val bd = spark.sql("SELECT dd_bucket(100, 1.04D) AS b").head().getLong(0)
    assert(b == bd)
  }

  test("misuse fails at analysis with a named, readable error") {
    def msg(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(msg("SELECT kmv_estimate(array(1L))")
      .contains("kmv_estimate expects exactly 2 arguments"))
    assert(msg("SELECT dd_bucket(100, 'x')")
      .contains("gamma must be a numeric literal"))
    // k must be plan-time constant — a column reference is rejected,
    // not silently mis-planned
    val s = spark
    import s.implicits._
    Seq((1L, 2)).toDF("h", "kk").createOrReplaceTempView("sq_bad")
    assert(msg("SELECT kmv_sketch(h, kk) FROM sq_bad GROUP BY 1")
      .contains("integer literal"))
    // a BIGINT k past Int range must fail loudly, not truncate to a
    // valid-looking tiny k (ADVICE r9)
    assert(msg("SELECT kmv_sketch(h, 4294967298) FROM sq_bad GROUP BY 1")
      .contains("must fit in an INT"))
  }
}
