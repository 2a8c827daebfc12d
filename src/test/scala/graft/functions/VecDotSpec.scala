package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.SparkTestSession

/** The native dot-product expression must be bit-identical to the
  * interpreted `aggregate(zip_with(...))` fold it replaces (same
  * cosine-family oracle hashes) AND must actually take the codegen
  * path — the same contract MinHashSigSpec pins for the dedup family.
  */
class VecDotSpec extends AnyFunSuite with SparkTestSession {

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("native dot == interpreted HOF fold on adversarial random vectors") {
    val s = spark; import s.implicits._
    // values chosen to make summation-order differences visible:
    // wide magnitude spread means a different fold order changes bits
    val rnd = new scala.util.Random(4242)
    val rows = Seq.tabulate(200) { i =>
      val d = 1 + rnd.nextInt(16)
      (i.toLong, Seq.fill(d)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat),
        Seq.fill(d)((rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"), graft.llm.Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(_.getDouble(1))
    val want = df.select(col("id"), hofDot(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(_.getDouble(1))
    // exact bit equality, not tolerance — the whole oracle gate rests on it
    assert(got.map(java.lang.Double.doubleToLongBits).toSeq ===
      want.map(java.lang.Double.doubleToLongBits).toSeq)
  }

  test("null contract matches zip_with padding: mismatch/null-elem/empty/null") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)), // 11.0
      (2L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f)),     // len mismatch -> null
      (3L, Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)), // null elem -> null
      (4L, Seq.empty[java.lang.Float], Seq.empty[java.lang.Float])      // empty -> 0.0
    ).toDF("id", "a", "b")
    val native = df.select(col("id"), graft.llm.Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1))
    val hof = df.select(col("id"), hofDot(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1))
    assert(native.toSeq === hof.toSeq)
    assert(native.toSeq === Seq(11.0, null, null, 0.0))
    // null input array -> null
    val bound = VecDot(
      BoundReference(0, ArrayType(FloatType), nullable = true),
      BoundReference(1, ArrayType(FloatType), nullable = true))
    assert(bound.eval(InternalRow(null,
      new GenericArrayData(Array[Any](1f)))) === null)
  }

  test("doGenCode emits the native kernel call — not a CodegenFallback") {
    val bound = VecDot(
      BoundReference(0, ArrayType(FloatType), nullable = true),
      BoundReference(1, ArrayType(FloatType), nullable = true))
    assert(!bound.isInstanceOf[CodegenFallback])
    val ctx = new CodegenContext
    val code = bound.genCode(ctx).code.toString
    assert(code.contains("VecDotHelper.dot"),
      s"generated code should call the native kernel, got:\n$code")
  }

  test("registered SQL function resolves through the session extensions") {
    val d = spark.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as double), cast(4.0 as double))) AS d")
      .head.getDouble(0)
    assert(d === 11.0)
  }
}
