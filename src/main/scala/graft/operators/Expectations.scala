package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the rule-engine gate every
  * production ingest runs before data reaches training (the
  * Great-Expectations / Deequ pattern, re-expressed Spark-first; the
  * reference assumes its ingest rows are clean —
  * `/root/reference/ingest_hotels.py:16-31` loads a curated CSV — so
  * this is the operator that makes that assumption checkable at scale).
  *
  * Two rule shapes, two cost classes:
  *   - row-local rules (`check`): ALL rules evaluate in ONE aggregate
  *     pass over the table — each rule is a `sum(violated)` alongside a
  *     shared `count(*)`, map-side partials, one tiny result row,
  *     unpivoted to a row per rule. Adding a rule adds a column to the
  *     partial aggregate, never a pass over the data.
  *   - referential rules (`refCheck`): child keys that resolve nowhere
  *     in the parent — a left-anti join on the key (Spark broadcasts
  *     the parent when small; key-shuffle co-partitions otherwise).
  *     The parent side is deduplicated to keys first, so the join
  *     carries |distinct keys|, not |parent rows|.
  *
  * Both produce the same (rule, n_violations, n_rows) schema, so a
  * suite is `check(...).unionAll(refCheck(...))` — one relation a
  * quality dashboard or a circuit-breaker can gate on.
  */
object Expectations {

  /** Row-local rule suite in one aggregate pass: `rules` maps rule name
    * → the PASS predicate; the result has one row per rule with its
    * violation count and the common row count.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, pass) =>
        sum(when(!coalesce(pass, lit(false)), 1L).otherwise(0L)).as(s"v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) =>
      s"'$name', v_$name" }.mkString(", ")
    one.selectExpr(
        s"stack(${rules.size}, $stacked) AS (rule, n_violations)", "n_rows")
      .select(col("rule"), col("n_violations"), col("n_rows"))
  }

  /** Referential-integrity rule: child rows whose `childKey` has no
    * match among the parent's `parentKey`s (NULL child keys are
    * violations too — a NULL FK resolves nowhere).
    */
  def refCheck(name: String, child: DataFrame, childKey: String,
               parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(keys, col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(child.agg(count(lit(1)).as("n_rows"))))
      .select(lit(name).as("rule"), col("n_violations"), col("n_rows"))
  }
}
