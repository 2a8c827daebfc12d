package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative row-quality expectations — the validation gate every
  * production ingest runs between "landed" and "consumable" (the
  * dbt-test / Delta-expectations shape, as plain Spark):
  *
  *   - [[audit]]: per-rule violation counts in ONE scan + ONE
  *     single-row reduce (each rule compiles to a conditional sum in
  *     the same aggregate — adding rules never adds passes), melted
  *     to (rule, n_bad, n_rows) rows via unpivot;
  *   - [[flag]] / [[split]]: per-row violation lists and the
  *     valid/quarantine split — a projection, no shuffle, so gating
  *     composes with any downstream write at scan cost.
  *
  * NULL discipline: a rule holds only when its predicate is TRUE —
  * NULL (the three-valued trap that silently passes bad rows in
  * WHERE-based checks) counts as a violation.
  */
object QualityGate {

  /** An expectation: `holds` must evaluate TRUE for a valid row. */
  final case class Rule(name: String, holds: Column)

  private def violated(r: Rule): Column =
    when(coalesce(r.holds, lit(false)), lit(0L)).otherwise(lit(1L))

  private val ReservedNames = Set("rule", "n_bad", "n_rows", "violations")

  private def checkRuleNames(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "need at least one rule")
    val dup = rules.groupBy(_.name).collectFirst { case (n, rs) if rs.size > 1 => n }
    require(dup.isEmpty, s"duplicate rule name: ${dup.get}")
    val clash = rules.map(_.name).find(ReservedNames)
    require(clash.isEmpty, s"rule name '${clash.get}' collides with an output column")
  }

  /** (rule, n_bad, n_rows) per rule, rule-name ordered. An empty
    * input audits as 0 violations per rule (coalesce'd — sum over
    * zero rows is NULL, and an empty ingest partition is a normal
    * thing to audit).
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    checkRuleNames(rules)
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r => coalesce(sum(violated(r)), lit(0L)).as(r.name))
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array(col("n_rows")), rules.map(r => col(r.name)).toArray,
        "rule", "n_bad")
      .select(col("rule"), col("n_bad"), col("n_rows"))
      .orderBy("rule")
  }

  /** [[audit]]'s counters collected DURING the caller's own action
    * (write, count, collect) via the Observation API — zero extra
    * scans, which is the difference between "we audit every batch"
    * and "we audit when someone pays for it" at 100 TB. Use:
    * `val (out, obs) = auditDuring(df, rules); out.write.parquet(p);
    * obs.get` → n_rows + per-rule violation counts of exactly the
    * rows the action processed.
    */
  def auditDuring(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    checkRuleNames(rules)
    val obs = org.apache.spark.sql.Observation()
    val metrics = count(lit(1)).as("n_rows") +:
      rules.map(r => coalesce(sum(violated(r)), lit(0L)).as(r.name))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** The input plus a `violations` array<string> of failed rule names
    * (empty = valid row). Pure projection. Refuses a frame that
    * already has a `violations` column rather than clobbering it.
    */
  def flag(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    checkRuleNames(rules)
    require(!df.columns.contains("violations"),
      "input already has a 'violations' column — rename it before flagging")
    val marks = array(rules.map { r =>
      when(coalesce(r.holds, lit(false)), lit(null).cast("string"))
        .otherwise(lit(r.name))
    }: _*)
    df.withColumn("violations", filter(marks, _.isNotNull))
  }

  /** (valid rows without the marker column, quarantined rows WITH
    * their violation list) — write the second somewhere auditable.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = flag(df, rules)
    (flagged.filter(size(col("violations")) === 0).drop("violations"),
      flagged.filter(size(col("violations")) > 0))
  }
}
