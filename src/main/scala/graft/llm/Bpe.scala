package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale BPE (byte-pair-encoding) tokenizer training — the
  * map-reduce half of GPT-style vocabulary learning (Sennrich et al.
  * 2016): each round counts adjacent-symbol pairs across the word
  * frequency table and greedily merges the most frequent pair.
  *
  * Scale shape (the reason this belongs in a 100 TB engine):
  *   - the corpus is first compressed to its WORD-FREQUENCY table
  *     (|vocab| rows, not |corpus| tokens) — one shuffle, after which
  *     every training round touches only the vocabulary;
  *   - a round is one explode + hash aggregate on the pair key (one
  *     shuffle) plus a driver-side head(1) of a single row — the same
  *     rounds-on-the-driver, data-on-the-cluster loop as
  *     [[Dedup.connectedComponents]];
  *   - merge application is a per-row left fold (codegen'd HOF), no
  *     shuffle; lineage is flattened per round with an eager
  *     localCheckpoint, exactly like the CC loop.
  *
  * Symbols must match `[A-Za-z]+` (callers pre-filter words): merge
  * application splices symbol literals into HOF SQL, and the
  * alphabetic precondition is what makes that safe and keeps the
  * DuckDB oracle's char arithmetic aligned with Spark's.
  */
object Bpe {

  /** A word's initial symbol array: its characters, 1 per symbol. */
  def initialSymbols(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Adjacent-pair counts over `(syms: array<string>, freq: long)`
    * rows, weighted by word frequency: one explode + one hash
    * aggregate, |vocab| input rows.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      // guard BEFORE sequence(): Spark's sequence(0, -1) is the
      // DESCENDING [0, -1], not empty — a fully-merged 1-symbol word
      // would index syms[1] out of bounds
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i+1] AS b))"))
        .as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Greedy left-to-right application of merge (a, b) → ab to a symbol
    * array, as a codegen'd fold: a symbol equal to `b` fuses with a
    * preceding un-fused `a` (standard BPE scan order — after fusing,
    * the new `ab` symbol does not re-fuse with the next `b`).
    */
  def applyMerge(symsCol: String, a: String, b: String): Column = {
    val ab = a + b
    expr(
      s"""aggregate($symsCol, CAST(array() AS ARRAY<STRING>),
         |  (acc, x) -> CASE WHEN size(acc) > 0
         |                    AND element_at(acc, -1) = '$a' AND x = '$b'
         |              THEN concat(slice(acc, 1, size(acc) - 1), array('$ab'))
         |              ELSE concat(acc, array(x)) END)""".stripMargin)
  }

  /** Apply a learned merge list to a `(w, freq)` word table: the
    * initial character symbols folded through every merge in learned
    * order. |vocab| rows, ZERO shuffles — each merge is one nested
    * codegen'd fold, and the whole chain fuses into a single
    * projection. This is the tokenizer-application half of the x65
    * trainer: encode the vocabulary once, then broadcast the tiny
    * word→token-count table over the corpus instead of re-folding
    * every corpus token occurrence.
    */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.select(col("w"), col("freq"), initialSymbols(col("w")).as("syms"))) {
      case (df, (a, b)) =>
        df.select(col("w"), col("freq"), applyMerge("syms", a, b).as("syms"))
    }

  /** Learn `rounds` merges from a `(w: string, freq: long)` word
    * table. Returns the merge list in learned order; ties on count
    * break by (a, b) ascending so the result is deterministic under
    * any partitioning. Stops early when no adjacent pairs remain.
    */
  def learn(words: DataFrame, rounds: Int): Seq[(String, String)] = {
    var syms = words
      .select(initialSymbols(col("w")).as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < rounds && !done) {
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .head(1)
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        // per-round localCheckpoint flattens lineage; the blocks are
        // ContextCleaner-owned (freed on GC), same as the CC loop —
        // see CacheHygieneSpec's note on checkpoint blocks
        syms = syms
          .select(applyMerge("syms", a, b).as("syms"), col("freq"))
          .localCheckpoint(true)
      }
      round += 1
    }
    merges.result()
  }
}
