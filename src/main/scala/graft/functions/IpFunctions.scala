package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 helpers as native (codegen'd) column expressions.
  *
  * The reference derives the /24 network of an int-encoded IPv4 with a
  * Python UDF (`IpToNetwork`, hha.py:20) returning the decimal network
  * address as a *string*. That UDF blocks predicate pushdown and
  * whole-stage codegen and forces executor↔Python IPC. Here the same
  * value is a pure bitmask on the numeric column — fully native,
  * join keys stay numeric (SURVEY.md §2.1 #8).
  */
object IpFunctions {

  /** 0xFFFFFF00 — mask selecting the /24 network of an IPv4-as-Long. */
  val Net24Mask: Long = 0xFFFFFF00L

  /** /24 network address of an int-encoded IPv4 (numeric, not string). */
  def ipToNet24(ip: Column): Column = ip.bitwiseAND(lit(Net24Mask))

  /** Generic /prefix network mask. */
  def ipToNet(ip: Column, prefixLen: Int): Column = {
    require(prefixLen >= 0 && prefixLen <= 32, s"bad prefix length $prefixLen")
    val mask = if (prefixLen == 0) 0L else (0xFFFFFFFFL << (32 - prefixLen)) & 0xFFFFFFFFL
    ip.bitwiseAND(lit(mask))
  }

  /** Plain-Scala dotted-quad rendering (driver-side alert logging). */
  def ipv4Render(ip: Long): String =
    s"${(ip >> 24) & 255}.${(ip >> 16) & 255}.${(ip >> 8) & 255}.${ip & 255}"

  /** Dotted-quad rendering of an int-encoded IPv4 ("10.100.67.139"). */
  def ipv4String(ip: Column): Column = concat_ws(
    ".",
    shiftrightunsigned(ip, 24).bitwiseAND(lit(255L)),
    shiftrightunsigned(ip, 16).bitwiseAND(lit(255L)),
    shiftrightunsigned(ip, 8).bitwiseAND(lit(255L)),
    ip.bitwiseAND(lit(255L))
  )
}
