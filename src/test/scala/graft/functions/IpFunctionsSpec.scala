package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** /24 mask vs the reference's Python `ipaddress` oracle on edge IPs
  * (SURVEY.md §5.1). Expected values precomputed with
  * `int(IPv4Network(f"{ip}/24", strict=False).network_address)`.
  */
class IpFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private def net24(ip: Long): Long = {
    val s = spark
    import s.implicits._
    Seq(ip).toDF("ip").select(IpFunctions.ipToNet24(col("ip"))).head.getLong(0)
  }

  test("/24 mask matches ipaddress oracle on edge IPs") {
    assert(net24(0L) === 0L)                             // 0.0.0.0
    assert(net24(255L) === 0L)                           // 0.0.0.255
    assert(net24(256L) === 256L)                         // 0.0.1.0
    assert(net24(4294967295L) === 4294967040L)           // 255.255.255.255
    assert(net24(174327308L) === 174327296L)             // README 10.100.67.12
    assert(net24(3232235777L) === 3232235776L)           // 192.168.1.1
  }

  test("generic prefix masks") {
    val s = spark
    import s.implicits._
    val ip = 3232235777L // 192.168.1.1
    def mask(p: Int): Long =
      Seq(ip).toDF("ip").select(IpFunctions.ipToNet(col("ip"), p)).head.getLong(0)
    assert(mask(32) === ip)
    assert(mask(24) === 3232235776L) // 192.168.1.0
    assert(mask(16) === 3232235520L) // 192.168.0.0
    assert(mask(8) === 3221225472L)  // 192.0.0.0
    assert(mask(0) === 0L)
    assertThrows[IllegalArgumentException](IpFunctions.ipToNet(col("ip"), 33))
  }

  test("dotted-quad rendering") {
    val s = spark
    import s.implicits._
    val got = Seq(174327308L, 0L, 4294967295L).toDF("ip")
      .select(IpFunctions.ipv4String(col("ip"))).collect().map(_.getString(0))
    // 174327308 = 0x0A64060C (README example IP) = 10.100.6.12
    assert(got === Array("10.100.6.12", "0.0.0.0", "255.255.255.255"))
  }
}
