package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Schema-on-read canonicalization + the startup drift guard.
  *
  * Round 6 lost 28 registry entries when the driver regenerated the
  * testdata and events.ts silently moved from TIMESTAMP(NANOS) (read
  * as Long nanos) to TIMESTAMP(µs) → TIMESTAMP_NTZ. These tests pin
  * the fix: every encoding normalizes to the same Long-nanoseconds
  * column, and Tables.validate turns the NEXT drift into one readable
  * failure before query one.
  */
class TablesSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"

  test("normalizeTs canonicalizes Long, TIMESTAMP and TIMESTAMP_NTZ to the same nanos") {
    val s = spark
    import s.implicits._
    // 2021-01-02T03:04:05.123456 UTC = 1609556645.123456s since epoch
    val micros = 1609556645123456L

    val fromLong = Tables.normalizeTs(
      Seq(micros * 1000L).toDF("ts"))
    val fromTs = Tables.normalizeTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))
    val fromNtz = Tables.normalizeTs(
      Seq(micros).toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))

    for (df <- Seq(fromLong, fromTs, fromNtz)) {
      assert(df.schema("ts").dataType === LongType)
      assert(df.select("ts").as[Long].head() === micros * 1000L)
    }
    // and tsSec resolves on the canonical form to floor epoch seconds
    assert(fromNtz.select(Tables.tsSec.as("s")).as[Long].head() === 1609556645L)
  }

  test("events loader yields Long-nanos ts on the CURRENT testdata (whatever it carries)") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === LongType)
    // sanity: values land in a plausible epoch-nanos range (year > 2000)
    val sec = ev.select(Tables.tsSec.as("s")).agg(min("s"), max("s")).head()
    assert(sec.getLong(0) > 946684800L && sec.getLong(1) < 4102444800L)
  }

  test("validate passes on driver testdata and names the column on a drifted type") {
    Tables.validate(spark, sf) // current data must be accepted

    // clone the sf dir, then re-type events.ts to STRING — the next
    // "silent" drift shape — and expect one readable message
    val tmp = Files.createTempDirectory("graft_drift").toString
    for (t <- Tables.names)
      Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$tmp/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("string"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val e = intercept[IllegalStateException](Tables.validate(spark, tmp))
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("string"))
    assert(e.getMessage.contains("schema drift"))
  }

  test("validate reports a missing column, not a stack trace") {
    val tmp = Files.createTempDirectory("graft_missing").toString
    for (t <- Tables.names)
      Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$tmp/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    spark.read.parquet(s"$sf/documents.parquet").drop("lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val e = intercept[IllegalStateException](Tables.validate(spark, tmp))
    assert(e.getMessage.contains("documents.lang: missing"))
  }
}
