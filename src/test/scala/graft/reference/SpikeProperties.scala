package graft.reference

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions.col
import graft.SparkTestSession

/** ScalaCheck properties of the spike pipeline (SURVEY.md §5.4).
  *
  * Fixture shape keeps the algebra exact: one row per key per window
  * (so the truncating avg is the identity), every key in its own /24
  * (so the net roll-up mirrors the ip branch), values ≤ LimitNewData
  * (so no clamp path triggers).
  */
object SpikeProperties extends Properties("SpikeDetector") with SparkTestSession {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each trial runs a full Spark job

  private val P = SpikeParams()

  private val keyGen = Gen.chooseNum(1, 2500).flatMap(cur =>
    Gen.chooseNum(1, 2500).map(prev => (cur.toLong, prev.toLong)))
  private val casesGen = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, keyGen))

  property("alert iff cur > Q*prev; alerts carry the baseline; net mirrors ip; " +
    "detectFused agrees") =
    Prop.forAll(casesGen) { cases =>
      val rows = cases.zipWithIndex.flatMap { case ((cur, prev), i) =>
        val ip = 3232235520L + i * 256L // one /24 per key
        Seq((1000L, 1L, i, cur, 11, ip), (100L, 1L, i, prev, 11, ip))
      }
      val hist = histDf(rows: _*)
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getInt(0), r.getLong(3), r.getInt(2).toLong)).toSet
      val alerts = collect(SpikeDetector.detect(hist,
        col("timestamp") > 500, col("timestamp") < 500, P)) // (key, addr, baseline)
      val fused = collect(SpikeDetector.detectFused(hist,
        col("timestamp") > 500, col("timestamp") < 500, P))

      val expected = cases.zipWithIndex.collect {
        case ((cur, prev), i) if cur.toDouble / prev > P.quotientAmplification =>
          val ip = 3232235520L + i * 256L
          Seq((i, ip, prev), (i, ip & 0xFFFFFF00L, prev))
      }.flatten.toSet

      alerts == expected && fused == expected
    }
}
