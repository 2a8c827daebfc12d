package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_gen(text, w)` — a native Catalyst GENERATOR (UDTF): emits
  * one (pos, shingle) row per word w-shingle of `text`, fusing
  * tokenize → shingle → posexplode into a single per-row pass with no
  * intermediate token/shingle ARRAYS in the plan (the composed
  * `posexplode(wordShingles(tokens(text)))` materializes both).
  * Completes the extension-surface trio next to [[ParseIpv4]] (scalar
  * expression) and TopKAggregator (aggregate): scalar / agg /
  * generator, all injected through `SparkSessionExtensions`
  * ([[graft.core.GraftExtensions]]), SQL-reachable via
  * `LATERAL VIEW shingle_gen(text, 2)`.
  *
  * Semantics match TextFunctions.wordShingles exactly: tokens =
  * split(text, " ") INCLUDING empties from doubled separators,
  * shingle = the w tokens joined by a single space, pos 0-based in
  * posexplode's convention, no rows below w tokens. Spark's
  * GenerateExec runs custom generators on the interpreted path
  * (codegen is reserved for the explode family) — the win here is
  * allocation shape, not codegen.
  */
case class ShingleGen(child: Expression, w: Int)
    extends Generator with CodegenFallback {

  require(w >= 2, "shingle_gen needs w >= 2; w=1 is plain tokenization")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleGen =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_gen expects a string argument, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    new StructType().add("pos", LongType, nullable = false)
      .add("shingle", StringType, nullable = false)

  override def prettyName: String = "shingle_gen"

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) return Nil
    val toks = t.split(space, -1)
    val n = toks.length - w + 1
    if (n <= 0) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < n
      override def next(): InternalRow = {
        val sh = UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(toks, i, i + w): _*)
        val row = InternalRow(i.toLong, sh)
        i += 1
        row
      }
    }
  }
}

object ShingleGen {
  /** Builder for the function registry: second argument must be a
    * foldable integer literal (the shingle width is a plan-time
    * constant, like explode's absence of one).
    */
  def fromArgs(args: Seq[Expression]): ShingleGen = {
    require(args.length == 2, "shingle_gen expects (text, w)")
    val wExpr = args(1)
    require(wExpr.foldable && (wExpr.dataType == IntegerType || wExpr.dataType == LongType),
      "shingle_gen's width must be an integer literal")
    val w = wExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"bad shingle width: $other")
    }
    ShingleGen(args.head, w)
  }
}
