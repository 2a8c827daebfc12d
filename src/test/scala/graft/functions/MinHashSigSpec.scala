package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestSession
import graft.llm.{TextFunctions => TF}

/** The native minhash-signature expression must be bit-identical to
  * the interpreted HOF specification it replaces (same oracle hashes
  * for x02/x19/x20/st04) AND must actually take the codegen path —
  * the whole point of VERDICT r4 ask #1 is removing the interpreted
  * per-row constant, so a silent CodegenFallback would be a quiet
  * regression to exactly what it replaces.
  */
class MinHashSigSpec extends AnyFunSuite with SparkTestSession {

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "one",                       // < 2 tokens -> empty shingle array
    "",                          // tokens == [""] -> empty shingles
    "alpha beta gamma delta alpha beta", // repeated shingles
    "a  b",                      // doubled separator -> empty middle token
    " lead trail ",              // edge empties from boundary spaces
    "héllo wörld ünïcode"        // multi-byte UTF-8 through the md5 stream
  )

  test("native signature == interpreted HOF pipeline, incl. degenerate docs") {
    val s = spark; import s.implicits._
    val base = docs.toDF("text")
      .select(TF.wordShingles(TF.tokens(col("text"))).as("sh"))
    val hof = base
      .select(TF.shingleHashes(col("sh")).as("hs"))
      .select(TF.minhashSigFromHashes(col("hs")).as("sig"))
      .collect().map(_.getSeq[Any](0))
    val native = base
      .select(TF.minhashSig(col("sh")).as("sig"))
      .collect().map(_.getSeq[Any](0))
    assert(native.toSeq === hof.toSeq)
    // degenerate doc really exercises the all-null path
    assert(native(2).forall(_ == null))
  }

  test("fused text form == composed shingle form on every doc shape, null in, null out") {
    val s = spark; import s.implicits._
    val base = docs.toDF("text")
    val composed = base
      .select(TF.minhashSig(TF.wordShingles(TF.tokens(col("text")))).as("sig"))
      .collect().map(_.getSeq[Any](0))
    val fused = base
      .select(TF.minhashSigText(col("text")).as("sig"))
      .collect().map(_.getSeq[Any](0))
    assert(fused.toSeq === composed.toSeq)
    // w=3 agreement too (the width is a plan-time literal)
    val c3 = base.select(TF.minhashSig(TF.wordShingles(TF.tokens(col("text")), 3)).as("s"))
      .collect().map(_.getSeq[Any](0))
    val f3 = base.select(TF.minhashSigText(col("text"), 3).as("s"))
      .collect().map(_.getSeq[Any](0))
    assert(f3.toSeq === c3.toSeq)
    // null text -> null signature (not K nulls)
    val nullRow = Seq[Option[String]](None).toDF("text")
      .select(TF.minhashSigText(col("text")).as("sig")).head()
    assert(nullRow.isNullAt(0))
  }

  test("doGenCode emits the native kernel call — not a CodegenFallback") {
    val bound = MinHashSig(BoundReference(0, ArrayType(StringType), nullable = true))
    assert(!bound.isInstanceOf[CodegenFallback])
    val ctx = new CodegenContext
    val code = bound.genCode(ctx).code.toString
    assert(code.contains("MinHashSigHelper.sig"),
      s"generated code should call the native kernel, got:\n$code")
  }

  test("interpreted eval matches the kernel and honors null semantics") {
    val bound = MinHashSig(BoundReference(0, ArrayType(StringType), nullable = true))
    val arr: ArrayData = new GenericArrayData(
      Array[Any](UTF8String.fromString("a b"), null, UTF8String.fromString("b c")))
    val viaEval = bound.eval(org.apache.spark.sql.catalyst.InternalRow(arr))
      .asInstanceOf[ArrayData].toArray[Any](org.apache.spark.sql.types.LongType)
    val viaHelper = MinHashSigHelper.sig(arr)
      .toArray[Any](org.apache.spark.sql.types.LongType)
    assert(viaEval.toSeq === viaHelper.toSeq)
    assert(viaEval.length === TF.MinHashK)
    // null input array -> null signature
    assert(bound.eval(org.apache.spark.sql.catalyst.InternalRow(null)) === null)
    // empty array -> K nulls (array_min-over-empty contract)
    val empty = bound.eval(org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(Array.empty[Any]))).asInstanceOf[ArrayData]
    assert((0 until empty.numElements()).forall(empty.isNullAt))
    assert(empty.numElements() === TF.MinHashK)
  }

  test("registered SQL function resolves through the session extensions") {
    val n = spark.sql(
      "SELECT minhash_sig(array('x y', 'y z')) AS sig")
      .selectExpr("size(sig) AS k").head.getInt(0)
    assert(n === TF.MinHashK)
  }
}
