package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** One shared local session for the whole forked test JVM (suites
  * share it — Spark startup is ~5 s, once).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.local("graft-test", cores = "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.spark

  def df(schemaDdl: String, rows: Row*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType.fromDDL(schemaDdl))

  /** The reference's histogram schema (FIXTURES.md A1). */
  def histDf(rows: (Long, Long, Int, Long, Int, Long)*): DataFrame = {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    rows.toDF("timestamp", "subagent_id", "num_protocol", "CountPkt", "type_proto", "dst_ip")
      .select(col("timestamp"), col("subagent_id"), col("num_protocol"),
        col("CountPkt"), col("type_proto"), col("dst_ip"))
  }
}
