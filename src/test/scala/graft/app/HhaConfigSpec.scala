package graft.app

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class HhaConfigSpec extends AnyFunSuite {

  private val sample =
    """[hdfs]
      |host = 2.2.2.2
      |port = 9001
      |file_dir = histo
      |hdfsusername = hd
      |
      |[spark]
      |spark_host = 3.3.3.3
      |spark_port = 7078
      |cluster_gbmemmory = 32
      |cluster_countproc = 24
      |app_name = test app
      |
      |[consul]
      |consul_host = 4.4.4.4
      |consul_port = 8501
      |consul_dir = /cfg/
      |
      |[logs]
      |log_dir = /tmp/logs
      |log_file_name = x.log
      |
      |[other]
      |sleepInterval = 5
      |LimitNewData  = 100
      |LimitNewDataNet  = 200
      |quotientAmplification = 4
      |LimitDetectTimeSec = 60
      |""".stripMargin

  test("parses every hha.conf key (hha.py:78-105)") {
    val f = Files.createTempFile("hha", ".conf")
    Files.writeString(f, sample)
    val c = HhaConfig.load(f)
    assert(c.hdfsHost === "2.2.2.2" && c.hdfsPort === "9001" &&
      c.hdfsFileDir === "histo" && c.hdfsUsername === "hd")
    assert(c.sparkHost === "3.3.3.3" && c.sparkPort === "7078" &&
      c.clusterGbMemory === 32 && c.clusterCountProc === 24 && c.appName === "test app")
    assert(c.consulHost === "4.4.4.4" && c.consulPort === "8501" && c.consulDir === "/cfg/")
    assert(c.logPath === "/tmp/logs/x.log")
    assert(c.sleepInterval === 5 && c.limitNewData === 100 &&
      c.limitNewDataNet === 200 && c.quotientAmplification === 4 &&
      c.limitDetectTimeSec === 60)
    assert(c.spikeParams === graft.reference.SpikeParams(4.0, 100, 200))
  }

  test("missing keys fall back to hha.conf defaults") {
    val c = HhaConfig.fromMap(Map("other.sleepInterval" -> "99"))
    assert(c.sleepInterval === 99)
    assert(c.limitNewData === 2500 && c.limitNewDataNet === 3500 &&
      c.quotientAmplification === 3 && c.limitDetectTimeSec === 300)
  }
}
