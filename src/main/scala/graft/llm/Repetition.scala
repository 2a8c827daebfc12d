package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llm.{TextFunctions => TF}

/** The Gopher repetition-rule suite (Rae et al. 2021 §A1.1, Table A1)
  * over a (doc_id, text) frame: per document, the fraction of
  * characters in the MOST FREQUENT word n-gram for n=2..4 and the
  * fraction of characters covered by ANY duplicated word n-gram
  * (count ≥ 2) for n=5..10 — coverage is a position-SET union, so
  * overlapping occurrences count a token once (RepetitionSpec pins
  * union-vs-sum on an all-same-token doc, where a sum would read
  * 15/7). Character weight = token characters (separators excluded),
  * keeping every fraction exact integer arithmetic that hashes
  * cross-engine.
  *
  * Scale shape: ONE corpus scan feeds a single 9-way windowed explode
  * (rows ∝ 9·tokens, no joins to build grams); counts are one hash
  * agg keyed (doc, n, gram) with map-side combine; the top-gram pick
  * is a (doc, n)-partitioned row_number over the count relation;
  * coverage re-explodes ONLY duplicated grams' positions, distincts
  * the covered index set, and joins it to the token-length relation —
  * every shuffle keys on doc-local grams, nothing quadratic, no
  * driver state.
  */
object Repetition {

  /** Published thresholds: top-n-gram char fraction for n=2..4. */
  val TopThresholdsE6: Map[Int, Long] =
    Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L)

  /** Published thresholds: duplicate-n-gram char coverage for n=5..10. */
  val DupThresholdsE6: Map[Int, Long] =
    Map(5 -> 150000L, 6 -> 140000L, 7 -> 130000L,
      8 -> 120000L, 9 -> 110000L, 10 -> 100000L)

  /** Per-doc fractions (e6 integers), per-rule flags, and the
    * conjunctive `pass` over `docs(doc_id, text)`.
    */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("w"))
      .withColumn("nw", size(col("w")))
      .withColumn("wc",
        aggregate(col("w"), lit(0L), (a, x) => a + length(x)))
      .localCheckpoint(true) // three consumers: grams, token lens, doc list
    val grams = base
      .select(col("doc_id"), col("wc"), col("w"), col("nw"),
        explode(sequence(lit(2), lit(10))).as("n"))
      .filter(col("nw") >= col("n"))
      .select(col("doc_id"), col("n"), col("wc"),
        posexplode(transform(sequence(lit(1), col("nw") - col("n") + 1),
          i => array_join(slice(col("w"), i, col("n")), " "))))
      .toDF("doc_id", "n", "wc", "pos", "g")
    val counted = grams.groupBy("doc_id", "n", "g")
      .agg(count(lit(1)).as("cnt"), collect_list("pos").as("ps"),
        first("wc").as("wc"))
    val tops = counted.filter(col("n") <= 4)
      .withColumn("gchars", (length(col("g")) - (col("n") - 1)).cast("long"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id", "n").orderBy(col("cnt").desc, col("g"))))
      .filter(col("rk") === 1)
      .withColumn("frac", expr("CAST(cnt * gchars * 1000000 DIV wc AS BIGINT)"))
      .groupBy("doc_id").agg(
        coalesce(max(when(col("n") === 2, col("frac"))), lit(0L)).as("top2_e6"),
        TopThresholdsE6.keys.toSeq.sorted.drop(1).map(n =>
          coalesce(max(when(col("n") === n, col("frac"))), lit(0L))
            .as(s"top${n}_e6")): _*)
    val toks = base
      .select(col("doc_id"), posexplode(col("w")))
      .toDF("doc_id", "idx", "t")
      .select(col("doc_id"), col("idx"), length(col("t")).cast("long").as("tl"))
    val covs = counted.filter(col("n") >= 5 && col("cnt") >= 2)
      .select(col("doc_id"), col("n"), col("wc"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("n"), col("wc"),
        explode(sequence(col("p"), col("p") + col("n") - 1)).as("idx"))
      .distinct() // overlapping duplicate grams cover a position once
      .join(toks, Seq("doc_id", "idx"))
      .groupBy("doc_id", "n").agg(sum("tl").as("cchars"), first("wc").as("wc"))
      .withColumn("frac", expr("CAST(cchars * 1000000 DIV wc AS BIGINT)"))
      .groupBy("doc_id").agg(
        coalesce(max(when(col("n") === 5, col("frac"))), lit(0L)).as("dup5_e6"),
        DupThresholdsE6.keys.toSeq.sorted.drop(1).map(n =>
          coalesce(max(when(col("n") === n, col("frac"))), lit(0L))
            .as(s"dup${n}_e6")): _*)
    val flags = TopThresholdsE6.toSeq.sortBy(_._1).map { case (n, t) =>
      (col(s"top${n}_e6") <= t).cast("long").as(s"r_top$n")
    } ++ DupThresholdsE6.toSeq.sortBy(_._1).map { case (n, t) =>
      (col(s"dup${n}_e6") <= t).cast("long").as(s"r_dup$n")
    }
    val flagNames = TopThresholdsE6.keys.toSeq.sorted.map(n => s"r_top$n") ++
      DupThresholdsE6.keys.toSeq.sorted.map(n => s"r_dup$n")
    base.select("doc_id")
      .join(tops, Seq("doc_id"), "left")
      .join(covs, Seq("doc_id"), "left")
      .na.fill(0L)
      .select(col("doc_id") +: (col("top2_e6") :: col("top3_e6") ::
        col("top4_e6") :: col("dup5_e6") :: col("dup6_e6") ::
        col("dup7_e6") :: col("dup8_e6") :: col("dup9_e6") ::
        col("dup10_e6") :: Nil) ++: flags: _*)
      .withColumn("pass",
        flagNames.map(col).reduce(_ * _).cast("long"))
      .orderBy("doc_id")
  }
}
