package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality filters (the public heuristic battery
  * from Rae et al. 2021, "Scaling Language Models", appendix A1.1 —
  * the de-facto standard pretraining-corpus gate): per-document
  * token-shape metrics plus a repetition metric, each a hard
  * pass/fail. All per-row metrics are linear HOF projections; the
  * repetition metric (top-bigram fraction) aggregates instead of
  * scanning O(d²) per row — see [[topBigramFraction]].
  */
object TextFilters {

  /** Mean token length (characters). Gopher keeps docs in [3, 10]. */
  def meanWordLen(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Fraction of tokens containing at least one letter (tokenizer
    * yields [a-z0-9]+ runs, so "letterless" = pure digit runs).
    * Gopher requires > 0.8.
    */
  def alphaWordFraction(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / size(toks))

  /** Hash/ellipsis symbols per token ('#' and '...'), Gopher cap 0.1. */
  def symbolWordRatio(norm: Column, toks: Column): Column = {
    val hashes = length(norm) - length(regexp_replace(norm, "#", ""))
    val ellipses = (length(norm) - length(regexp_replace(norm, "\\.\\.\\.", ""))) / 3
    when(size(toks) === 0, lit(0.0))
      .otherwise((hashes + ellipses).cast("double") / size(toks))
  }

  /** PII redaction patterns — the pre-training scrub every public
    * corpus pipeline runs (emails, phone numbers, IPv4s, SSN-shaped
    * ids). Deliberately restricted to regex constructs with identical
    * semantics in Java regex and RE2 (DuckDB), so the whole redaction
    * is DuckDB-recomputable: explicit character classes (no `\\s`,
    * whose class differs between engines), `\\b` word boundaries,
    * bounded repetition. Application ORDER is part of the contract
    * (email before phone, or the phone pattern eats the digits of an
    * address's local part) — keep [[PiiPatterns]] ordered.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("phone", "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "[PHONE]"))

  /** `text` with every PII pattern replaced by its tag, in contract
    * order. A chain of codegen'd `regexp_replace` projections — linear
    * per row, no shuffle, safe at any scale.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, java.util.regex.Matcher.quoteReplacement(tag))
    }

  /** Match count of one PII pattern in `text` (BIGINT — audit metric
    * for redaction reporting).
    */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Per-document fraction of token bigrams taken by the single most
    * frequent bigram (repetition proxy; Gopher caps it at 0.2). Runs
    * as explode → (doc, bigram) count → per-doc max/total: two
    * map-side-combining aggregates, never an O(d²) per-row scan (a
    * 10k-token doc would cost 10⁸ HOF steps per row).
    * Returns (idCol, top_bigram_frac) for docs with ≥ 1 bigram.
    */
  def topBigramFraction(docs: DataFrame, toksCol: String, idCol: String): DataFrame = {
    val bigrams = docs
      .select(col(idCol).as("id"),
        // slice length = full array size (start+length must stay in Int
        // range — a literal Int.MaxValue length overflows to an empty
        // slice); trailing over-read is truncated
        explode(zip_with(col(toksCol), slice(col(toksCol), lit(2), size(col(toksCol))),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
      // zip_with pads the tail with null; concat_ws drops nulls, so the
      // padded element has no space — filter it by that
      .filter(col("bg").contains(" "))
    bigrams.groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg((max(col("c")).cast("double") /
        sum(col("c")).cast("double")).as("top_bigram_frac"))
  }

  /** Per-document fraction of n-gram-occurrence CHARACTERS belonging to
    * n-grams that occur ≥ 2 times within the document — the second half
    * of Gopher's repetition battery (Rae et al. 2021 A1.1: the
    * duplicate-n-gram family, capped at 0.15 for n=5 sliding to 0.10
    * for n=10). Character mass counts token characters only:
    * chars(gram) = length(space-joined gram) − (n−1), identical in both
    * engines by construction.
    *
    * Same scale contract as [[topBigramFraction]]: explode ALL n-gram
    * occurrences → (id, gram) counts → per-doc ratio, two
    * map-side-combining aggregates. Gram STRINGS never shuffle — a
    * 48-bit md5 hash plus the char length travel instead, and the
    * grouping key includes `chars`, so a hash collision between
    * different-length grams cannot merge groups differently across
    * engines (the oracle groups on the identical (hash, chars) pair).
    * Docs with fewer than n tokens produce no row — callers left-join
    * and coalesce to 0 ("no n-grams" means "no repetition").
    */
  def dupNgramCharFraction(docs: DataFrame, toksCol: String, idCol: String,
                           n: Int): DataFrame =
    dupNgramCharFractions(docs, toksCol, idCol, Seq(n))
      .withColumnRenamed(s"dup_${n}gram_char_frac", "dup_char_frac")

  /** The whole n-family in ONE pass: a tagged explode (each n-gram
    * occurrence becomes (n, hash, chars)) feeds a single
    * (id, n, gh, chars) count and one per-id aggregate with a
    * conditional sum pair per n — one corpus scan and one doc-keyed
    * shuffle chain regardless of |ns| (the per-n composition would scan
    * and shuffle once per n; at corpus scale the scans dominate).
    * A doc with n-grams for SOME of `ns` gets 0.0 for the others
    * (no n-grams = no repetition); a doc shorter than every n is
    * absent.
    */
  def dupNgramCharFractions(docs: DataFrame, toksCol: String, idCol: String,
                            ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be non-empty, each >= 1")
    val toks = col(toksCol)
    val perN = ns.map { n =>
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n), i =>
          struct(lit(n).as("n"), array_join(slice(toks, i + 1, lit(n)), " ").as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
    }
    val tagged = docs
      .select(col(idCol).as("id"), explode(flatten(array(perN: _*))).as("t"))
      .select(col("id"), col("t.n").as("n"),
        TextAnalysis.md5Long48(col("t.g")).as("gh"),
        (length(col("t.g")) - (col("t.n") - lit(1))).cast("long").as("chars"))
    val counts = tagged.groupBy("id", "n", "gh", "chars").agg(count(lit(1)).as("c"))
    val fracs = ns.map { n =>
      val dup = sum(when(col("n") === n && col("c") >= 2, col("c") * col("chars"))
        .otherwise(lit(0L)))
      val total = sum(when(col("n") === n, col("c") * col("chars")).otherwise(lit(0L)))
      when(total > 0, dup.cast("double") / total.cast("double"))
        .otherwise(lit(0.0)).as(s"dup_${n}gram_char_frac")
    }
    counts.groupBy("id").agg(fracs.head, fracs.tail: _*)
  }
}
