package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting — the join-side companion of
  * [[SaltedAgg]]: when one join key carries a disproportionate share
  * of the LEFT side's rows (the classic hot-user / hot-document key)
  * and the right side is too large to broadcast, a plain shuffle join
  * sends the whole hot key to one task. Salting splits it: left rows
  * get a deterministic salt in [0, salts), the right side replicates
  * each row `salts` times, and the join runs on (key, salt) — the hot
  * key's rows spread across `salts` tasks at the cost of a
  * `salts`-times-larger right shuffle. Result ≡ the unsalted join
  * (asserted in SaltedJoinSpec).
  *
  * AQE's skew-join split covers many of these cases at runtime; the
  * explicit operator exists for plans AQE can't rewrite (custom
  * partitioning downstream, skew known a priori, non-sort-merge
  * contexts) and as the documented technique.
  */
object SaltedJoin {

  /** Inner equi-join of `left` and `right` on `keys`, left side salted
    * `salts` ways. The salt hashes ALL left columns, so duplicate rows
    * of a hot key still spread (key-derived salts would not); any salt
    * assignment in range yields the same result because the right side
    * is fully replicated.
    */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
            salts: Int): DataFrame =
    salted(left, right, keys, salts, "inner")

  /** LEFT OUTER under the same salting — the skew-safe enrichment
    * join (hot fact keys left-joining a dimension that may lack
    * some keys). Correct because every left row carries exactly ONE
    * salt value: a matched row joins its replicas under its own
    * salt, and an unmatched row survives the (key, salt) left join
    * exactly once with nulled right columns — result ≡ the unsalted
    * left join (SaltedJoinSpec pins it, nulls included).
    */
  def left(left: DataFrame, right: DataFrame, keys: Seq[String],
           salts: Int): DataFrame =
    salted(left, right, keys, salts, "left")

  private def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
                     salts: Int, how: String): DataFrame = {
    require(salts >= 1, "salts must be positive")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "input already has a '__salt' column — rename it before salting")
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, keys :+ "__salt", how).drop("__salt")
  }
}
