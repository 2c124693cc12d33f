package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (mandate: "salting for skew, AQE
  * for runtime re-plan"). AQE's skew-join split handles most cases at
  * runtime; explicit salting remains the tool when one key dominates a
  * broadcast-ineligible join or a two-phase aggregation is wanted.
  *
  * Shape: the SKEWED (big) side gets a deterministic salt in
  * [0, saltFactor); the small side is replicated `saltFactor`× with
  * every salt value; the join key becomes (key, salt) — the hot key's
  * rows spread over `saltFactor` tasks instead of one straggler.
  */
object Skew {

  /** Deterministic per-row salt: hash of the whole row's key column +
    * a disambiguating column (salting must not depend on
    * nondeterministic rand() — retries would reshuffle rows).
    */
  def salt(disambig: Column, saltFactor: Int): Column =
    pmod(xxhash64(disambig), lit(saltFactor))

  /** Salted inner equi-join: `big ⋈ small ON bigKey = smallKey` with the
    * big side spread over `saltFactor` sub-keys per join key.
    * `bigDisambig` drives the salt (any roughly-unique column, e.g. the
    * fact's primary key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, bigDisambig: String,
                 saltFactor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(col(bigDisambig), saltFactor))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedBig.join(replicatedSmall,
        saltedBig("__salt") === replicatedSmall("__salt") &&
          col(bigKey) === col(smallKey))
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation: count per key without a single
    * reducer per hot key — partial counts per (key, salt), then final
    * sum per key. (Spark's hash aggregate already does map-side partial
    * aggregation; this explicit form is for algebraic aggregates
    * composed of non-trivial state where the built-in partial path
    * doesn't apply.)
    */
  def saltedCount(df: DataFrame, key: String, disambig: String,
                  saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", salt(col(disambig), saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
