package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass minhash signature kernel shared by the interpreted and
  * generated code paths (the hot loop of the dedup family: x02, x19,
  * x20, st04 all pay it once per document).
  *
  * Semantics are EXACTLY the interpreted HOF pipeline it replaces
  * ([[graft.llm.TextFunctions.shingleHashes]] +
  * [[graft.llm.TextFunctions.minhashSigFromHashes]]), so every oracle
  * hash is unchanged:
  *
  *   h(t)   = (first 15 md5 hex digits of t, as a long) mod P
  *   sig[i] = min over shingles t of (A(i)*h(t) + B(i)) mod P
  *
  * with P/A/B the constants the DuckDB oracle SQL interpolates
  * ([[graft.llm.TextFunctions.HashPrime]]/MinHashA/MinHashB). The HOF
  * chain evaluates md5 through an interpreted lambda and then runs 24
  * interpreted affine+array_min passes per row; this kernel hashes
  * each shingle once and folds all 24 mins in the same tight JVM loop
  * — the difference is pure per-row CPU constant, not plan shape.
  *
  * Null/empty contract (mirrors array_min-over-transform): a null
  * element is skipped; an empty (or all-null) shingle array yields a
  * signature of K nulls; a null input array yields a null signature.
  * The band keys downstream hash identically for "null sig" vs
  * "K-null sig" (element_at of either is null and concat_ws skips
  * nulls), and n_match over a null signature dies at the est-jaccard
  * threshold exactly like the all-zero row the HOF pipeline produced —
  * so candidate outputs are identical row-for-row.
  */
object MinHashSigHelper {
  import graft.llm.{TextFunctions => TF}

  private val P: Long = TF.HashPrime
  private val K: Int = TF.MinHashK
  private val A: Array[Long] = TF.MinHashA.toArray
  private val B: Array[Long] = TF.MinHashB.toArray

  // MessageDigest is stateful; one instance per executor thread.
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 (== first 15 hex digits as a long):
    * bytes 0..6 fully plus the high nibble of byte 7.
    */
  private def hash60(d: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xFFL); j += 1 }
    (v << 4) | ((d(7) & 0xFFL) >>> 4)
  }

  /** K-wide signature in one pass: md5 once per shingle, all K affine
    * mins folded inline. A(i) and h are both < P < 2^30 so the product
    * stays < 2^60 — no overflow under ANSI semantics (the same bound
    * the SQL/HOF forms rely on).
    */
  def sig(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = digests.get()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        md.reset()
        val h = hash60(md.digest(shingles.getUTF8String(i).getBytes)) % P
        var k = 0
        while (k < K) {
          val x = (A(k) * h + B(k)) % P
          if (x < mins(k)) mins(k) = x
          k += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](K)) // K nulls
    else new GenericArrayData(mins)
  }

  private val spaceSep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val spaceByte = Array[Byte](' ')

  /** Fused tokenize → w-shingle → signature over the RAW text.
    *
    * Value-identical to `sig(wordShingles(tokens(text)))` — the shingle
    * is the w consecutive space-split tokens joined by one space, and
    * md5 streams the exact bytes that joined string would contain (UTF-8
    * concatenation is byte concatenation) — but the shingle STRINGS are
    * never materialized, and the text is split exactly once. The HOF
    * form this replaces re-evaluated `split(text)` inside the transform
    * lambda for every element (O(tokens²) per document) and, being a
    * higher-order function, knocked the whole projection out of
    * whole-stage codegen (VERDICT r06 ask #5 — the x02 residual).
    */
  def sigOfText(text: org.apache.spark.unsafe.types.UTF8String, w: Int): ArrayData = {
    val toks = text.split(spaceSep, -1)
    val n = toks.length - w + 1
    if (n <= 0) return new GenericArrayData(new Array[Any](K)) // K nulls
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digests.get()
    var i = 0
    while (i < n) {
      md.reset()
      var j = i
      while (j < i + w) {
        if (j > i) md.update(spaceByte)
        md.update(toks(j).getBytes)
        j += 1
      }
      val h = hash60(md.digest()) % P
      var k = 0
      while (k < K) {
        val x = (A(k) * h + B(k)) % P
        if (x < mins(k)) mins(k) = x
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_sig(array<string>) -> array<long>` as a native Catalyst
  * expression with whole-stage codegen (the ParseIpv4 pattern:
  * SURVEY.md §2.2 UDF/UDAF row — a codegen'd Expression beats a Scala
  * udf beats an interpreted HOF chain). Registered as a SQL function
  * by [[graft.core.GraftExtensions]]; the DataFrame-side entry point
  * is [[graft.llm.TextFunctions.minhashSig]].
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigHelper.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigHelper.sig($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `minhash_sig_text(text, w) -> array<long>` — the fused form: one
  * codegen'd expression from raw text to signature, no intermediate
  * token/shingle arrays in the plan and no higher-order functions to
  * force an interpreted projection. `w` is a plan-time literal (like
  * shingle_gen's width). Semantics are exactly
  * `minhash_sig(wordShingles(tokens(text), w))`, asserted bit-for-bit
  * in MinHashSigSpec, so every oracle hash is unchanged.
  */
case class MinHashSigText(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 2, "minhash_sig_text needs w >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_text expects a string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig_text"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigHelper.sigOfText(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigHelper.sigOfText($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigText =
    copy(child = newChild)
}

object MinHashSigText {
  /** Registry builder: width must be a foldable integer literal. */
  def fromArgs(args: Seq[Expression]): MinHashSigText = {
    require(args.length == 2, "minhash_sig_text expects (text, w)")
    val wExpr = args(1)
    require(wExpr.foldable &&
      (wExpr.dataType == org.apache.spark.sql.types.IntegerType ||
        wExpr.dataType == LongType),
      "minhash_sig_text's width must be an integer literal")
    val w = wExpr.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"bad shingle width: $other")
    }
    MinHashSigText(args.head, w)
  }
}
