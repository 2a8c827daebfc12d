package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing-fingerprint kernel: char k-gram md5 hashes +
  * sliding w-window minima + first-occurrence dedup in ONE pass over
  * the raw text.
  *
  * Value-identical to the HOF specification it replaces
  * (`array_distinct(transform(sequence(1, |gh|-(w-1)), i =>
  * array_min(slice(gh, i, w))))` over
  * [[graft.llm.TextFunctions.charGramHashes]]):
  *
  *   gh(i)  = first 15 md5 hex digits of substr(text, i, k), as long
  *   fp set = distinct over i of min(gh(i..i+w-1)), first-occurrence
  *            order
  *
  * `substr` is CHARACTER-based (Spark's substring semantics via
  * UTF8String.substringSQL), so multi-byte text grams match the
  * Column form exactly. The HOF chain ran two interpreted lambda
  * passes and materialized the full per-gram hash array per row; this
  * kernel hashes each gram once, folds window minima inline, and
  * keeps only the (much smaller, ~2/(w+1) density) fingerprint set —
  * and being codegen-capable it keeps the whole projection inside
  * WholeStageCodegen (the MinHashSigText argument, applied to the
  * winnowing family: x50/x53/x54/x56/st12).
  *
  * Texts shorter than k+w-1 chars yield an empty array (the callers'
  * documented guard; the HOF form is undefined below the guard
  * because sequence(1, negative) turns descending).
  */
object WinnowFpsHelper {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def hash60(d: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
    (v << 4) | ((d(7) & 0xFFL) >>> 4)
  }

  def fps(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val nChars = text.numChars()
    val nGrams = nChars - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val gh = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      // substringSQL is 1-based and char-counted — the exact semantics
      // of the Column substr() the HOF specification uses
      gh(i) = hash60(md.digest(text.substringSQL(i + 1, k).getBytes))
      i += 1
    }
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](nWins.min(64))
    i = 0
    while (i < nWins) {
      var m = gh(i)
      var j = i + 1
      while (j < i + w) { if (gh(j) < m) m = gh(j); j += 1 }
      if (seen.add(m)) out += m
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow_fps(text, k, w) -> array<long>` as a native codegen'd
  * expression; registered by [[graft.core.GraftExtensions]]. k and w
  * are plan-time literals.
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow_fps needs k >= 1 and w >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFpsHelper.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFpsHelper.fps($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  /** Registry builder: k and w must be foldable integer literals. */
  def fromArgs(args: Seq[Expression]): WinnowFps = {
    require(args.length == 3, "winnow_fps expects (text, k, w)")
    def lit(e: Expression, name: String): Int = {
      require(e.foldable && (e.dataType == IntegerType || e.dataType == LongType),
        s"winnow_fps's $name must be an integer literal")
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"bad $name: $other")
      }
    }
    WinnowFps(args.head, lit(args(1), "k"), lit(args(2), "w"))
  }
}
