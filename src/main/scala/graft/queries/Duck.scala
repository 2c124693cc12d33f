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

  /** Exact decimal literal of a float32 (parses to the identical double
    * in DuckDB — shortest-float repr would not).
    */
  def floatLit(f: Float): String =
    new java.math.BigDecimal(f.toDouble).toPlainString

  def vecLit(v: Array[Float]): String =
    v.map(floatLit).mkString("[", ", ", "]::DOUBLE[]")

  /** Cosine distance ≡ [[graft.functions.CosineDistance]]: sequential
    * double dot products, 1 − dot/(√na·√nb).
    */
  def cosine(vecExpr: String, qLit: String): String =
    s"(1.0 - (list_dot_product($vecExpr, $qLit) / " +
      s"(sqrt(list_dot_product($vecExpr, $vecExpr)) * " +
      s"sqrt(list_dot_product($qLit, $qLit)))))"

  /** CTE chain (appended after [[docToks]]'s `tt`) recomputing
    * [[graft.functions.Md5PortableEmbedder]] per document: md5-bucketed
    * ±1 token votes, dense `dim`-vector, L2-normalized with a float32
    * quantization step (`CAST(w/norm AS FLOAT)` ≡ JVM `.toFloat`) so the
    * resulting `vecs(doc_id, v DOUBLE[])` holds bit-identical values to
    * the Spark pipeline's `array<float>` column. Empty/cancelled docs
    * fall back to e₀ exactly like the encoder.
    */
  def md5EmbedVecs(dim: Int, src: String = "tt"): String =
    s"""tok AS (
       |  SELECT doc_id, unnest(toks) AS t FROM $src
       |), b AS (
       |  SELECT doc_id,
       |         (('0x' || substring(md5(t), 1, 12))::BIGINT % $dim) AS bucket,
       |         CASE WHEN ('0x' || substring(md5(t), 13, 1))::BIGINT < 8 THEN 1 ELSE -1 END AS sign
       |  FROM tok
       |), acc AS (
       |  SELECT doc_id, bucket, sum(sign)::DOUBLE AS w FROM b GROUP BY 1, 2
       |), dense AS (
       |  SELECT $src.doc_id, r.i AS bucket, COALESCE(a.w, 0.0) AS w
       |  FROM $src CROSS JOIN (SELECT unnest(range($dim)) AS i) r
       |  LEFT JOIN acc a ON a.doc_id = $src.doc_id AND a.bucket = r.i
       |), nrm AS (
       |  SELECT doc_id, sqrt(sum(w * w)) AS nn FROM dense GROUP BY doc_id
       |), comp AS (
       |  SELECT d.doc_id, d.bucket,
       |         CASE WHEN n.nn = 0 THEN (CASE WHEN d.bucket = 0 THEN 1.0 ELSE 0.0 END)
       |              ELSE CAST(CAST(d.w / n.nn AS FLOAT) AS DOUBLE) END AS c
       |  FROM dense d JOIN nrm n ON d.doc_id = n.doc_id
       |), vecs AS (
       |  SELECT doc_id, list(c ORDER BY bucket) AS v FROM comp GROUP BY doc_id
       |)""".stripMargin
}
