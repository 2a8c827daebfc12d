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

  /** All char k-gram hashes of `text` in position order — the fused
    * form of [[graft.llm.TextFunctions.charGramHashes]]' interpreted
    * `transform(sequence(...), i => hash60(substr(text, i, k)))`.
    * Same values; one pass, codegen-capable. Below k chars: empty
    * (the callers' documented guard — the HOF form's sequence turns
    * descending there).
    */
  def gramHashes(text: UTF8String, k: Int): GenericArrayData = {
    val n = text.numChars() - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      md.reset()
      out(i) = hash60(md.digest(text.substringSQL(i + 1, k).getBytes))
      i += 1
    }
    new GenericArrayData(out)
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

/** `char_gram_hashes(text, k) -> array<long>`: every char k-gram's
  * 60-bit md5 hash, position order — the building block x08
  * (fingerprint summaries) and x57 (n-gram novelty) consume, fused
  * into one codegen'd pass (the interpreted HOF it replaces paid a
  * lambda dispatch plus a Column substring per gram).
  */
case class CharGramHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "char_gram_hashes needs k >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects a string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFpsHelper.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFpsHelper.gramHashes($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashes {
  /** Registry builder: k must be a foldable integer literal. */
  def fromArgs(args: Seq[Expression]): CharGramHashes = {
    require(args.length == 2, "char_gram_hashes expects (text, k)")
    val kExpr = args(1)
    require(kExpr.foldable &&
      (kExpr.dataType == IntegerType || kExpr.dataType == LongType),
      "char_gram_hashes's k must be an integer literal")
    val k = kExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"bad k: $other")
    }
    CharGramHashes(args.head, k)
  }
}
