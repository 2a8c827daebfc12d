package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-fold dot-product kernel shared by the interpreted and
  * generated code paths — the per-pair hot loop of the whole cosine
  * family (x10/x11/x13/x14/x16–x18/x51/x58 and every norm
  * materialization feeding them).
  *
  * Semantics are EXACTLY the HOF chain it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0,
  * (acc, v) => acc + v)`), so every oracle hash is unchanged:
  *   - accumulate `(double)a(i) * (double)b(i)` in index order from
  *     0.0 — the same IEEE addition sequence as the fold and as the
  *     DuckDB oracle's `list_reduce(list_prepend(0.0, ...))`;
  *   - length mismatch → null (zip_with pads the short side with
  *     nulls; a null product nulls the fold);
  *   - any null element → null (same propagation);
  *   - empty × empty → 0.0 (the fold's seed).
  *
  * The HOF form allocates an intermediate product array and walks it
  * through two interpreted lambda dispatches per element; this kernel
  * is one primitive loop per pair — pure per-row CPU constant, no plan
  * change.
  */
object VecDotHelper {
  /** aFloat/bFloat select the element accessor (float vs double
    * input arrays); the arithmetic is double either way, matching
    * `x.cast("double")` in the lambda.
    */
  def dot(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** `vec_dot(array<float|double>, array<float|double>) -> double` as a
  * native Catalyst expression with whole-stage codegen (the ParseIpv4 /
  * MinHashSig pattern: SURVEY.md §2.2 UDF/UDAF row). Registered as a
  * SQL function by [[graft.core.GraftExtensions]]; the DataFrame-side
  * entry point is [[graft.llm.Similarity.dot]].
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two array<float>/array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDotHelper.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VecDotHelper.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
