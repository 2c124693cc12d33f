package graft.queries

/** Shared DuckDB-SQL fragments mirroring the Spark-side operators
  * bit-for-bit (see [[graft.operators.TextAnalysis]] scaladoc for the
  * portability rules). Centralised so a change to a Spark operator and
  * its oracle stays in lock-step.
  */
object Duck {

  /** Mirror of `TextAnalysis.normalize`. */
  val norm = """lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"""

  /** Mirror of `TextAnalysis.tokens` applied to a column named `norm`. */
  val toks = """list_filter(string_split_regex(norm, '[^a-z0-9]+'), x -> x <> '')"""

  /** CTE prefix producing (doc_id, lang, source, n_chars, norm, toks)
    * from `documents`.
    */
  val docToks: String =
    s"""WITH t0 AS (
       |  SELECT doc_id, lang, source, n_chars, $norm AS norm FROM documents
       |), tt AS (
       |  SELECT *, $toks AS toks FROM t0
       |)""".stripMargin

  /** Mirror of `TextAnalysis.punctCount` over a column named `norm`. */
  val punct =
    """(length(norm) - length(regexp_replace(norm, '[!-/:-@\[-`{-~]', '', 'g')))::BIGINT"""

  /** Mirror of `TextAnalysis.stopwordHits` for a word list. */
  def hits(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(toks, x -> list_contains($arr, x)))::BIGINT"
  }

  /** Mirror of `TextAnalysis.md5Long48`. */
  def md5Long48(e: String): String = s"('0x' || substring(md5($e), 1, 12))::BIGINT"

  /** Mirror of `TextAnalysis.shingles(k)` over a column named `toks`. */
  def shingles(k: Int): String =
    s"""CASE WHEN len(toks) < $k THEN [array_to_string(toks, ' ')]
       |ELSE list_distinct(list_transform(range(len(toks) - ${k - 1}),
       |  i -> array_to_string(list_slice(toks, i + 1, i + $k), ' '))) END""".stripMargin
}
