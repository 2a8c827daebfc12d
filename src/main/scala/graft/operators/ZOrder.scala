package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout optimizer: interleaves the bits of several
  * dimension columns into one key, so that sorting by the key clusters
  * rows that are close in EVERY dimension into the same files and
  * parquet row-groups. A multi-dimensional box predicate then touches
  * a handful of files instead of all of them — min/max skipping works
  * on each dimension at once, which no single-column sort can give.
  *
  * This matters only at scale: on one laptop-sized file the scan reads
  * everything anyway, but at 100 TB the difference between "all files"
  * and "the files whose z-range intersects the query box" is the whole
  * query. The key is pure codegen'd bit arithmetic (shift/and/or) —
  * no UDF, no shuffle beyond the one range-partitioning sort the
  * layout write needs anyway.
  *
  * Reference scope note: the reference engine has no layout optimizer;
  * this is extension surface (SURVEY.md §2.2 "sources"), the standard
  * technique for multi-dim pruning on columnar lakes.
  */
object ZOrder {

  /** The z-order key: interleave the low `bits` bits of each column,
    * column i contributing bit j to output position `j * n + i`.
    * Inputs are clamped to [0, 2^bits) so out-of-range values degrade
    * to edge cells instead of corrupting high bits. With n·bits ≤ 63
    * the key fits a long.
    */
  def zkey(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, "z-ordering needs at least two dimensions")
    require(n * bits <= 63, s"key would overflow a long: $n cols x $bits bits")
    val top = (1L << bits) - 1
    val clamped = cols.map(c => greatest(lit(0L), least(c.cast("long"), lit(top))))
    val terms = for {
      (c, i) <- clamped.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB rendering of [[zkey]] over pre-range-reduced expressions
    * (caller guarantees [0, 2^bits), e.g. via `% 2^bits` on
    * non-negative inputs — the clamp is then a no-op on both engines).
    * Shared with the oracle SQL the same way the simhash/minhash
    * constants are.
    */
  def zkeySql(exprs: Seq[String], bits: Int = 16): String = {
    val n = exprs.size
    val terms = for {
      (e, i) <- exprs.zipWithIndex
      j <- 0 until bits
    } yield s"((($e >> $j) & 1) << ${j * n + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Rewrite `df` into a z-ordered layout: range-partition by the
    * z-key into `files` output files and sort within each partition,
    * so every file owns a contiguous z-range (tight per-file min/max
    * on all dimensions at once). The sort is the write's only shuffle;
    * the key column does not survive into the output.
    */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    bits: Int = 16, files: Int = 0): Unit = {
    require(!df.columns.contains("__zkey"),
      "input already has a '__zkey' column — rename it before z-ordering")
    val keyed = df.withColumn("__zkey", zkey(dims.map(col), bits))
    val parts = if (files > 0) files else df.sparkSession.sessionState.conf.numShufflePartitions
    keyed
      .repartitionByRange(parts, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
