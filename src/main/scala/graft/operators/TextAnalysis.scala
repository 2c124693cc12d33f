package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Text-analysis operators for the training-data pipeline surface
  * (driver mandate; the reference's only text processing is the
  * embed-text concat, `ingest_hotels.py:22`): token statistics, quality
  * scoring, language-ID heuristic, and document fingerprinting.
  *
  * Every function here is built from codegen'd builtin expressions
  * (no UDFs) and has an exact DuckDB-SQL mirror, so each can be
  * differentially tested by the driver's oracle gate. Portability rules:
  *   - tokenization is `lower` + split on `[^a-z0-9]+` (ASCII-stable in
  *     both regex engines; Java and RE2 agree on this class);
  *   - hashes go through md5 (bit-identical in Spark / DuckDB); never
  *     Spark's `hash`/`xxhash64` (engine-private seeds);
  *   - ratios are single double divisions rounded late (deterministic,
  *     no accumulation-order dependence).
  *
  * Scale: all per-document work — a narrow projection over a parquet
  * scan, fully parallel, no shuffle. The only shuffles in this module's
  * query surface are the final small aggregations (top-k tokens etc.).
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lower-cased text.
    * DuckDB mirror: `lower(trim(regexp_replace(text, '\s+', ' ', 'g')))`.
    */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Non-empty alphanumeric tokens of the normalized text.
    * DuckDB: `list_filter(string_split_regex(norm, '[^a-z0-9]+'), t -> t <> '')`.
    *
    * Queries that derive several statistics from the same document
    * should project this ONCE as a named column and use the
    * `…FromTokens` variants below — the regex split is the expensive
    * part, and Catalyst's CollapseProject keeps a non-cheap alias
    * referenced more than once materialized instead of inlining it.
    */
  def tokens(text: Column): Column = tokensFromNorm(normalize(text))

  /** Tokens from an already-normalized column. */
  def tokensFromNorm(norm: Column): Column =
    filter(split(norm, "[^a-z0-9]+"), t => t =!= "")

  /** Token count as BIGINT (DuckDB `len()` is BIGINT; keep schemas equal). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Mean token length = total token chars / token count (one division). */
  def avgTokenLen(text: Column): Column = avgTokenLenFromTokens(tokens(text))

  def avgTokenLenFromTokens(toks: Column): Column = {
    val totalChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    totalChars.cast("double") / size(toks).cast("double")
  }

  /** Language-scoring stopword lists. ASCII-only on purpose: the fixture
    * corpus is ASCII and the heuristic must behave identically in both
    * engines.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai"))

  /** Number of tokens of `text` that appear in `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    stopwordHitsFromTokens(tokens(text), words)

  def stopwordHitsFromTokens(toks: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(wordArr, t))).cast("long")
  }

  /** Heuristic language-ID: arg-max of per-language stopword hits,
    * ties broken by language code ascending, no hits at all → "und"
    * (undetermined — BCP-47's code for it).
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Arg-max over (hits, -ordinal, lang) structs: `array_max` is
    * lexicographic, so max hits first, then the SMALLEST ordinal (ties
    * → alphabetically first language).
    */
  def langIdFromTokens(toks: Column): Column = {
    val withOrd = stopwords.keys.toSeq.sorted.zipWithIndex.map { case (lang, i) =>
      struct(stopwordHitsFromTokens(toks, stopwords(lang)).as("hits"),
        lit(-i).as("negOrd"), lit(lang).as("lang"))
    }
    val best = array_max(array(withOrd: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Punctuation character count (ASCII punctuation class, identical
    * in Java regex and RE2). DuckDB:
    * `length(l) - length(regexp_replace(l, '[!-/:-@\[-`{-~]', '', 'g'))`.
    */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("long")

  /** Composite quality score in [0,1]:
    * 0.4·stopword-ratio-capped + 0.3·length-saturation + 0.3·(1 − punct-ratio).
    * Deterministic: three divisions, fixed weights, rounded by caller.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromParts(tokens(text), text)

  def qualityScoreFromParts(toks: Column, text: Column): Column = {
    val n = size(toks).cast("long")
    val enHits = stopwordHitsFromTokens(toks, stopwords("en"))
    val stopRatio = least(lit(1.0), enHits.cast("double") * 8.0 / n.cast("double"))
    val lenSat = least(lit(1.0), n.cast("double") / 50.0)
    val punctRatio = punctCount(text).cast("double") / length(text).cast("double")
    when(n === 0, 0.0).otherwise(
      lit(0.4) * stopRatio + lit(0.3) * lenSat + lit(0.3) * (lit(1.0) - punctRatio))
  }

  /** BPE-ish pre-tokenization pattern (GPT-2-style word/number/symbol
    * split, simplified to the lookahead-free subset both Java regex and
    * RE2 support): leading-space word runs, digit runs, and symbol
    * runs each form one pre-token.
    */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Pre-token count under [[BpePattern]] — the LLM-pipeline "token
    * budget" estimator (a real tokenizer refines these pre-tokens into
    * subwords; the split is the engine-side part).
    * DuckDB: `len(regexp_extract_all(norm, pattern))`.
    */
  def bpeTokenCount(norm: Column): Column =
    size(regexp_extract_all(norm, lit(BpePattern), lit(0))).cast("long")

  /** Exact-dedup fingerprint: md5 of the normalized text (bit-identical
    * in DuckDB: `md5(lower(trim(regexp_replace(...))))`).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Word k-shingles of the normalized text, distinct, space-joined.
    * DuckDB mirror uses the same token list + list slicing.
    */
  def shingles(text: Column, k: Int): Column = shinglesFromTokens(tokens(text), k)

  def shinglesFromTokens(toks: Column, k: Int): Column = {
    val n = size(toks)
    array_distinct(
      when(n < k, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(0), n - k), i =>
          array_join(slice(toks, i + 1, lit(k)), " "))))
  }

  /** First 12 md5 hex chars as a non-negative 48-bit BIGINT — the
    * portable token hash shared with the DuckDB oracle
    * (`('0x' || substring(md5(t), 1, 12))::BIGINT`).
    */
  def md5Long48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  val SimHashBits = 48

  /** Column-valued shift amounts (the Scala API only exposes Int shifts;
    * the Catalyst expressions take any expression — needed inside HOF
    * lambdas where the bit index is a lambda variable).
    */
  private[graft] def shr(v: Column, bits: Column): Column =
    ColumnShim.column(ShiftRight(ColumnShim.expression(v), ColumnShim.expression(bits)))
  private[graft] def shl(v: Column, bits: Column): Column =
    ColumnShim.column(ShiftLeft(ColumnShim.expression(v), ColumnShim.expression(bits)))

  /** 48-bit SimHash over the distinct tokens: per bit, sum ±1 votes from
    * each token's md5-derived hash; bit set iff the vote sum is
    * positive. Computed as a single-pass higher-order-function pipeline
    * (no explode, no shuffle — each row independent):
    * vote-vector accumulate via `aggregate` + `zip_with`, then pack.
    */
  def simhash48(text: Column): Column = simhash48FromTokens(tokens(text))

  /** SimHash from an already-computed token array column. The md5 is
    * hoisted OUT of the per-bit loop (one hash per distinct token, then
    * 48 shift-and-test votes on the long) — inlining it into the
    * zip_with lambda would recompute the digest 48× per token.
    */
  def simhash48FromTokens(toks: Column): Column =
    simhash48FromHashes(transform(array_distinct(toks), t => md5Long48(t)))

  /** SimHash from an already-hashed feature array (48-bit longs) — the
    * entry point for non-token feature domains: mm_phash_near_dup
    * sketches a video from its FRAME fingerprints through this, the
    * text path from its distinct tokens.
    */
  def simhash48FromHashes(hashes: Column): Column = {
    val bitIdx = sequence(lit(0), lit(SimHashBits - 1))
    val votes = aggregate(
      hashes,
      transform(bitIdx, _ => lit(0L)),
      (acc, h) =>
        zip_with(acc, bitIdx, (a, b) =>
          a + when(shr(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, bitIdx, (v, b) =>
        when(v > 0, shl(lit(1L), b)).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two packed SimHash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}

/** Corpus-relative term scoring (TF-IDF): needs a corpus-wide document
  * frequency per term, so unlike [[TextAnalysis]]'s pure projections it
  * owns a small aggregation pipeline. Kept separate so the projection
  * operators stay trivially shuffle-free.
  */
object TfIdf {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window

  /** Top-`k` TF-IDF terms per document: `tfidf = tf · ln(N / df)`.
    *
    * Scale shape: one explode + (doc, term) aggregate (map-side
    * partials), one term-keyed aggregate for df (each (doc, term) row
    * counts once — no DISTINCT pass), one broadcast of the single-row
    * corpus count, and a per-doc window where `WindowGroupLimit` keeps
    * k rows per partition before the rank. The vocabulary-sized df
    * relation joins on the term key — a shuffle join, NOT a broadcast
    * (vocab at 100 TB is billions of terms).
    *
    * Deterministic: rank orders by (ROUNDED score desc, term asc) —
    * ranking on the raw double would let a 1-ulp `ln` difference
    * between engines flip an ordering; after round-6 any residual tie
    * falls to the term.
    */
  def topTerms(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).cast("double").as("n_docs"))
    val score = round(col("tf") * log(col("n_docs") / col("df")), 6)
    val w = Window.partitionBy(col("doc_id")).orderBy(score.desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("tok"), score.as("tfidf"))
  }
}

/** Cross-document n-gram novelty: how much of a document's n-gram
  * vocabulary appears HERE first (by ascending doc id — ingestion
  * order in a real pipeline). The corpus-level complement of the
  * dedup family: near-dup detection asks "how much of this doc exists
  * elsewhere", novelty scoring asks "how much of this doc is new" —
  * the signal data-mixing uses to prefer fresh sources over
  * boilerplate re-crawls (CCNet/RefinedWeb-style corpus curation).
  */
object Novelty {
  import org.apache.spark.sql.DataFrame
  import TextAnalysis.{md5Long48, shinglesFromTokens}

  /** Per-doc (id, n_grams, n_novel): distinct k-gram count and how many
    * of them first occur (min doc id over the corpus) in this doc.
    *
    * Scale shape: gram STRINGS never shuffle — each occurrence travels
    * as (48-bit md5, char length), the same collision-safe key pair as
    * the dup-ngram family. Two hash-keyed exchanges (the first-doc
    * aggregate, map-side combining, and the join back — the aggregate's
    * output partitioning satisfies the join's distribution so only the
    * gram stream re-shuffles) plus one id-keyed aggregate. Skew is
    * bounded by true mega-duplicate grams: a boilerplate gram's group
    * is (df × 16 bytes), combined map-side before the exchange.
    */
  def ngramNoveltyPerDoc(docs: DataFrame, toksCol: String, idCol: String,
                         k: Int): DataFrame = {
    // shinglesFromTokens is array_distinct per doc → (id, gram) unique
    val grams = docs.select(col(idCol).as("id"),
        explode(shinglesFromTokens(col(toksCol), k)).as("g"))
      .select(col("id"), md5Long48(col("g")).as("gh"),
        length(col("g")).as("glen"))
    val first = grams.groupBy(col("gh"), col("glen"))
      .agg(min(col("id")).as("first_id"))
    grams.join(first, Seq("gh", "glen"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L)).as("n_novel"))
  }
}
