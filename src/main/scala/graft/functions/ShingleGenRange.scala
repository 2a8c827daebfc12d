package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_gen_range(text, wMin, wMax)` — [[ShingleGen]] for a whole
  * RANGE of widths in one native pass: emits (n, pos, shingle) for
  * every word n-shingle of `text`, n = wMin..wMax. Built for the
  * Gopher repetition suite (x84, llm/Repetition), whose 9 widths
  * previously ran as `explode(sequence(2,10))` + an interpreted
  * higher-order `transform(slice → array_join)` — per-gram lambda
  * interpretation over 9·tokens rows; the generator tokenizes ONCE
  * per row and emits every width's shingles from that one token
  * array (measured 9.9 → ~6 s steady on the 50k-doc smoke corpus at
  * width 2..10 — the win is allocation/interpretation shape, like
  * ShingleGen's).
  *
  * Semantics match ShingleGen width-by-width exactly (same
  * tokenization, same space join, pos 0-based per width, no rows for
  * widths above the token count); RepetitionSpec's fixtures and x84's
  * DuckDB oracle pin the arithmetic built on top.
  */
case class ShingleGenRange(child: Expression, wMin: Int, wMax: Int)
    extends Generator with CodegenFallback {

  require(wMin >= 2, "shingle_gen_range needs wMin >= 2")
  require(wMax >= wMin, s"empty width range [$wMin, $wMax]")

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleGenRange =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_gen_range expects a string argument, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    new StructType().add("n", IntegerType, nullable = false)
      .add("pos", LongType, nullable = false)
      .add("shingle", StringType, nullable = false)

  override def prettyName: String = "shingle_gen_range"

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) return Nil
    val toks = t.split(space, -1)
    if (toks.length < wMin) return Nil
    new Iterator[InternalRow] {
      private var w = wMin
      private var i = 0
      override def hasNext: Boolean = {
        while (w <= wMax && i + w > toks.length) { w += 1; i = 0 }
        w <= wMax
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException("shingle range drained")
        val sh = UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(toks, i, i + w): _*)
        val row = InternalRow(w, i.toLong, sh)
        i += 1
        row
      }
    }
  }
}

object ShingleGenRange {
  /** Builder for the function registry: widths must be foldable
    * integer literals (plan-time constants).
    */
  def fromArgs(args: Seq[Expression]): ShingleGenRange = {
    require(args.length == 3, "shingle_gen_range expects (text, wMin, wMax)")
    def intOf(e: Expression, what: String): Int = {
      require(e.foldable && (e.dataType == IntegerType || e.dataType == LongType),
        s"shingle_gen_range's $what must be an integer literal")
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"bad $what: $other")
      }
    }
    ShingleGenRange(args.head, intOf(args(1), "wMin"), intOf(args(2), "wMax"))
  }
}
