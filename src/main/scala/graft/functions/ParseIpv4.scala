package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Branch-free-ish dotted-quad parser shared by the interpreted and
  * generated code paths. Returns -1 for malformed input (null at the
  * expression layer). Single pass over the bytes, no regex, no split
  * allocations — this is the hot loop a 100 TB watch-list/log ingest
  * would run per row.
  */
object ParseIpv4Helper {
  def parse(s: UTF8String): Long = {
    if (s == null) return -1L
    val n = s.numBytes()
    var i = 0
    var octet = -1L // -1 = no digit seen yet in this octet
    var acc = 0L
    var dots = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= '0' && b <= '9') {
        octet = (if (octet < 0) 0L else octet) * 10 + (b - '0')
        if (octet > 255) return -1L
      } else if (b == '.') {
        if (octet < 0 || dots == 3) return -1L
        acc = (acc << 8) | octet
        octet = -1L
        dots += 1
      } else return -1L
      i += 1
    }
    if (dots != 3 || octet < 0) -1L
    else (acc << 8) | octet
  }
}

/** `parse_ipv4(string) -> long` as a native Catalyst expression with
  * whole-stage codegen (SURVEY.md §2.2 UDF/UDAF row: a codegen'd
  * Expression beats a Scala udf — no closure serialization, no
  * InternalRow boxing, stays inside the generated loop). Registered
  * as a SQL function by [[graft.core.GraftExtensions]]; malformed
  * input yields NULL (the reference logs-and-skips these,
  * hha.py:65–66 — filter `IS NULL` to observe them).
  */
case class ParseIpv4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_ipv4 expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_ipv4"

  override protected def nullSafeEval(input: Any): Any = {
    val r = ParseIpv4Helper.parse(input.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long ${ev.value}_r = graft.functions.ParseIpv4Helper.parse($c);
         |if (${ev.value}_r < 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ParseIpv4 =
    copy(child = newChild)
}
