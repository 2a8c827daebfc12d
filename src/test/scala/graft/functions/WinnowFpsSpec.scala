package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.SparkTestSession
import graft.llm.{TextFunctions => TF}

/** The fused winnowing-fingerprint expression must be value-identical
  * to the HOF specification it replaces (same fingerprints -> same
  * oracle hashes for x50/x53/x54/x56/st12) and must stay on the
  * codegen path.
  */
class WinnowFpsSpec extends AnyFunSuite with SparkTestSession {

  private def hofFps(k: Int, w: Int) = {
    val gh = TF.charGramHashes(col("text"), k)
    array_distinct(
      transform(sequence(lit(1), size(gh) - (w - 1)),
        i => array_min(slice(gh, i, lit(w)))))
  }

  test("fused == HOF specification over adversarial strings, k=8 w=4 and k=3 w=2") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abc ", "αβγ ", "日本語はも ", "aA  \t")
    val docs = ((1 to 300).map { i =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until rnd.nextInt(60)).map(_ => a(rnd.nextInt(a.length))).mkString
    } ++ Seq("abcdefghijk", "aaaaaaaaaaaaaa", "the quick brown fox"))
      .toDF("text")
    for ((k, w) <- Seq((8, 4), (3, 2))) {
      val guarded = docs.filter(length(col("text")) >= k + w - 1)
      val hof = guarded.select(hofFps(k, w).as("fps"))
        .collect().map(_.getSeq[Long](0))
      val fused = guarded
        .select(call_function("winnow_fps", col("text"), lit(k), lit(w)).as("fps"))
        .collect().map(_.getSeq[Long](0))
      assert(fused.toSeq === hof.toSeq, s"k=$k w=$w")
    }
  }

  test("below the k+w-1 guard the fused form is empty; null in, null out") {
    val s = spark; import s.implicits._
    val short = Seq("", "abcdefghij").toDF("text") // 10 chars < 8+4-1
      .select(call_function("winnow_fps", col("text"), lit(8), lit(4)).as("fps"))
      .collect().map(_.getSeq[Long](0))
    assert(short.forall(_.isEmpty))
    val n = Seq[Option[String]](None).toDF("text")
      .select(call_function("winnow_fps", col("text"), lit(8), lit(4)).as("fps"))
      .head()
    assert(n.isNullAt(0))
  }

  test("char_gram_hashes fused == HOF charGramHashes on adversarial strings") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val alphabets = Seq("ab", "abc ", "αβγ ", "日本語はも ")
    val docs = ((1 to 200).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until (8 + rnd.nextInt(40))).map(_ => a(rnd.nextInt(a.length))).mkString
    } :+ "abcdefgh").toDF("text")
    for (k <- Seq(3, 8)) {
      val guarded = docs.filter(length(col("text")) >= k)
      val hof = guarded.select(TF.charGramHashes(col("text"), k).as("gh"))
        .collect().map(_.getSeq[Long](0))
      val fused = guarded.select(TF.charGramHashesNative(col("text"), k).as("gh"))
        .collect().map(_.getSeq[Long](0))
      assert(fused.toSeq === hof.toSeq, s"k=$k")
    }
    // below k chars: empty; null in, null out
    val short = Seq("ab").toDF("text")
      .select(TF.charGramHashesNative(col("text"), 8).as("gh")).head()
    assert(short.getSeq[Long](0).isEmpty)
    assert(Seq[Option[String]](None).toDF("text")
      .select(TF.charGramHashesNative(col("text"), 8).as("gh")).head().isNullAt(0))
  }

  test("doGenCode emits the native kernel call — not a CodegenFallback") {
    val bound = WinnowFps(BoundReference(0, StringType, nullable = true), 8, 4)
    assert(!bound.isInstanceOf[CodegenFallback])
    val ctx = new CodegenContext
    val code = bound.genCode(ctx).code.toString
    assert(code.contains("WinnowFpsHelper.fps"),
      s"generated code should call the native kernel, got:\n$code")
  }
}
